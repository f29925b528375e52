"""Per-item data transforms (ref: adsorbdiff/modules/transforms.py:7-50).

The reference dispatches transform names with ``eval()`` (transforms.py:20,
a footgun flagged in SURVEY.md §7); here it's an explicit registry dict.
"""
from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from adsorbdiff_tpu.common.irreps import cg_change_mat, irreps_sum
from adsorbdiff_tpu.data.schema import System

TRANSFORM_FNS: Dict[str, Callable] = {}


def register_transform(name: str):
    def wrap(fn):
        TRANSFORM_FNS[name] = fn
        return fn

    return wrap


class DataTransforms:
    """Config: {name: config} applied in order (ref: transforms.py:7-24)."""

    def __init__(self, config: dict) -> None:
        self.config = config or {}

    def __call__(self, system: System) -> System:
        for name, cfg in self.config.items():
            if name == "normalizer":
                continue  # handled by the trainer (ref: :16-17)
            system = TRANSFORM_FNS[name](system, cfg)
        return system


@register_transform("decompose_tensor")
def decompose_tensor(system: System, config: dict) -> System:
    """Rank-2 tensor target -> irreps components (ref: transforms.py:27-50)."""
    tensor_key = config["tensor"]
    rank = config["rank"]
    if rank != 2:
        raise NotImplementedError
    value = np.asarray(getattr(system, tensor_key)).reshape(9)
    decomposition = value @ cg_change_mat(rank)
    for irrep_key, irrep_cfg in config["decomposition"].items():
        lo = irreps_sum(irrep_cfg["irrep_dim"] - 1) if irrep_cfg["irrep_dim"] > 0 else 0
        hi = irreps_sum(irrep_cfg["irrep_dim"])
        setattr(system, irrep_key, decomposition[lo:hi])
    return system
