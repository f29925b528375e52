"""Placement toolkit (ref: adsorbdiff/placement/__init__.py)."""
from adsorbdiff_tpu.placement.adsorbate import Adsorbate
from adsorbdiff_tpu.placement.adsorbate_slab_config import AdsorbateSlabConfig
from adsorbdiff_tpu.placement.bulk import Bulk
from adsorbdiff_tpu.placement.flag_anomaly import DetectTrajAnomaly
from adsorbdiff_tpu.placement.slab import Slab

__all__ = ["Adsorbate", "AdsorbateSlabConfig", "Bulk", "DetectTrajAnomaly", "Slab"]
