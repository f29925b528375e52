"""Target metadata guesser (ref: adsorbdiff/datasets/target_metadata_guesser.py:1-197).

Samples items and guesses, per target: shape (scalar / per-atom / other),
level (atom vs system), and extensive vs intensive — used to auto-configure
output heads when the config doesn't specify them.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def uses_extensive(targets: np.ndarray, natoms: np.ndarray) -> bool:
    """Extensive if the per-atom-normalized target has lower relative spread
    than the raw target (ref: target_metadata_guesser.py extensivity probe)."""
    targets = np.asarray(targets, np.float64)
    natoms = np.asarray(natoms, np.float64)
    raw_cv = np.std(targets) / (np.abs(np.mean(targets)) + 1e-12)
    per_atom = targets / np.maximum(natoms, 1)
    pa_cv = np.std(per_atom) / (np.abs(np.mean(per_atom)) + 1e-12)
    return bool(pa_cv < raw_cv)


def guess_target_metadata(dataset, num_samples: int = 100) -> Dict[str, dict]:
    """Inspect up to ``num_samples`` systems and describe the targets."""
    n = min(len(dataset), num_samples)
    idx = np.linspace(0, len(dataset) - 1, n).astype(int)
    energies, natoms, has_forces = [], [], True
    for i in idx:
        s = dataset[int(i)]
        energies.append(0.0 if s.energy is None else s.energy)
        natoms.append(s.natoms)
        has_forces &= s.forces is not None
    energies = np.asarray(energies)
    natoms = np.asarray(natoms)

    meta: Dict[str, dict] = {}
    if np.any(energies != 0):
        meta["energy"] = {
            "shape": [1],
            "level": "system",
            "extensive": uses_extensive(energies, natoms),
            "mean": float(np.mean(energies)),
            "std": float(np.std(energies)),
        }
    if has_forces and n:
        meta["forces"] = {"shape": [3], "level": "atom", "extensive": False}
    return meta
