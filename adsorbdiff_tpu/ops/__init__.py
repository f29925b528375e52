from adsorbdiff_tpu.ops.segment import (
    masked_mean,
    masked_max,
    segment_mean_fixed,
    segment_sum_fixed,
)
from adsorbdiff_tpu.ops.pbc import (
    compute_cell_reps,
    frac_wrap_center,
    min_image_diff,
    radius_graph_pbc,
    wrap_positions,
)
from adsorbdiff_tpu.ops.rotation import axis_angle_to_matrix, kabsch

__all__ = [
    "masked_mean",
    "masked_max",
    "segment_mean_fixed",
    "segment_sum_fixed",
    "compute_cell_reps",
    "frac_wrap_center",
    "min_image_diff",
    "radius_graph_pbc",
    "wrap_positions",
    "axis_angle_to_matrix",
    "kabsch",
]
