"""Registry bootstrap: import every module that registers classes.

Replaces the reference's rglob dynamic import of trainers/datasets/models/
tasks (ref: adsorbdiff/utils/utils.py:312-337 ``setup_imports``) with an
explicit module list — same effect (decorators fire), no filesystem walking.
"""
from __future__ import annotations

import importlib

_MODULES = (
    "adsorbdiff_tpu.models.painn",
    "adsorbdiff_tpu.models.gemnet_oc",
    "adsorbdiff_tpu.models.equiformer_v2",
    "adsorbdiff_tpu.data.store",
    "adsorbdiff_tpu.train.trainer",
    "adsorbdiff_tpu.diffusion.sampler",
    "adsorbdiff_tpu.common.logging_utils",
    "adsorbdiff_tpu.tasks",
)

_done = False


def setup_imports() -> None:
    global _done
    if _done:
        return
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # optional model families may not exist yet in early rounds
            if not str(e).startswith("No module named 'adsorbdiff_tpu"):
                raise
    _done = True
