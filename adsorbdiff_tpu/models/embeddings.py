"""Static element data tables.

The reference ships ~17k LoC of static element feature tables
(ref: adsorbdiff/models/embeddings/__init__.py: ATOMIC_RADII, KHOT_EMBEDDINGS,
QMOF_KHOT_EMBEDDINGS, CONTINUOUS_EMBEDDINGS).  Of these, only ATOMIC_RADII is
consumed by the AdsorbDiff model set (the denoising models' edge-distance
offset, ref: equiformer_v2_denoising.py:208-213, painn_denoising.py:110-114);
the khot/continuous tables feed legacy OCP models (CGCNN-era) that AdsorbDiff
never instantiates.  This module is the canonical home for the radii table;
the khot tables are intentionally out of scope until a model needs them.
"""
from __future__ import annotations

import numpy as np

# Pauling-style atomic radii (Å), index = Z, zeros where the reference table
# has missing entries (ref: models/embeddings ATOMIC_RADII, divided by 100
# at the use sites there; stored here already in Å).
from adsorbdiff_tpu.models.equiformer_v2 import ATOMIC_RADII_A as ATOMIC_RADII  # noqa: F401

__all__ = ["ATOMIC_RADII"]
