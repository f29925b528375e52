"""Static element data tables.

The reference ships ~17k LoC of static element feature tables
(ref: adsorbdiff/models/embeddings/__init__.py: ATOMIC_RADII, KHOT_EMBEDDINGS,
QMOF_KHOT_EMBEDDINGS, CONTINUOUS_EMBEDDINGS).  Of these, only ATOMIC_RADII is
consumed by the AdsorbDiff model set (the denoising models' edge-distance
offset, ref: equiformer_v2_denoising.py:208-213, painn_denoising.py:110-114);
the khot/continuous tables feed legacy OCP models (CGCNN-era) that AdsorbDiff
never instantiates.  This module is the canonical home for the radii table.

The khot / qmof-khot / continuous tables are published element-property DATA
(CGCNN k-hot vectors; QMOF k-hot vectors; continuous CGCNN-style properties)
— they ship here as one 5.5 kB npz asset (`assets/element_embeddings.npz`,
regenerate with scripts/gen_embedding_tables.py) instead of 17k lines of
literal python, loaded lazily with the reference's dict[int, list] API.
"""
from __future__ import annotations

import functools
import os

import numpy as np

# Pauling-style atomic radii in picometers, dict[Z] -> pm with zeros where
# the reference table has missing entries (ref: models/embeddings
# ATOMIC_RADII — same dict API and pm unit; the models divide by 100 at the
# use sites, see equiformer_v2.py:741).
from adsorbdiff_tpu.models.equiformer_v2 import ATOMIC_RADII_PM as _RADII_PM

ATOMIC_RADII: dict = {z: float(r) for z, r in enumerate(_RADII_PM) if z > 0}

_ASSET = os.path.join(os.path.dirname(__file__), "..", "assets", "element_embeddings.npz")


@functools.lru_cache(maxsize=None)
def _tables() -> dict:
    with np.load(_ASSET) as f:
        return {k: f[k] for k in f.files}


def _as_dict(name: str) -> dict:
    t = _tables()
    mat, zs = t[name], t[f"{name}_z"]
    return {int(z): mat[int(z)].tolist() for z in zs}


def khot_embeddings() -> dict:
    """CGCNN k-hot vectors, dict[Z] -> 92 floats (ref: khot_embeddings.py)."""
    return _as_dict("khot")


def qmof_khot_embeddings() -> dict:
    """QMOF k-hot vectors, dict[Z] -> 72 floats (ref: qmof_khot_embeddings.py)."""
    return _as_dict("qmof_khot")


def continuous_embeddings() -> dict:
    """Continuous element properties (group, period, electronegativity,
    covalent radius, valence e-, first IE, EA, block, atomic volume), NaN for
    unavailable — dict[Z] -> 9 floats (ref: continuous_embeddings.py)."""
    return _as_dict("continuous")


def __getattr__(name: str):
    # Reference-parity module attributes, loaded lazily from the asset.
    lazy = {
        "KHOT_EMBEDDINGS": khot_embeddings,
        "QMOF_KHOT_EMBEDDINGS": qmof_khot_embeddings,
        "CONTINUOUS_EMBEDDINGS": continuous_embeddings,
    }
    if name in lazy:
        return lazy[name]()
    raise AttributeError(name)


__all__ = [
    "ATOMIC_RADII",
    "KHOT_EMBEDDINGS",
    "QMOF_KHOT_EMBEDDINGS",
    "CONTINUOUS_EMBEDDINGS",
]
