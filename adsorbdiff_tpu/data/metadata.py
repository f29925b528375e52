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


def neighbor_counts(
    dataset,
    cutoff: float = 12.0,
    max_neighbors: int = 50,
    reps=(2, 2, 0),
    limit: Optional[int] = None,
) -> np.ndarray:
    """Per-system neighbor (edge) counts under (cutoff, max_neighbors) — the
    'neighbors' sizes array the reference precomputes offline for its
    BalancedBatchSampler (ref: datasets/data_parallel.py:72 'neighbors' key;
    generated there by scripts/make_lmdb_sizes.py).  Brute-force numpy
    min-image over the in-plane periodic images; run once and cache."""
    n = len(dataset) if limit is None else min(len(dataset), limit)
    counts = np.zeros(n, np.int64)
    offs = [
        (i, j, k)
        for i in range(-reps[0], reps[0] + 1)
        for j in range(-reps[1], reps[1] + 1)
        for k in range(-reps[2], reps[2] + 1)
    ]
    for i in range(n):
        s = dataset[i]
        pos = np.asarray(s.pos, np.float64)
        cell = np.asarray(s.cell, np.float64)
        per_target = np.zeros(len(pos), np.int64)
        for off in offs:
            shift = off[0] * cell[0] + off[1] * cell[1] + off[2] * cell[2]
            d2 = ((pos[:, None, :] - (pos[None, :, :] + shift)) ** 2).sum(-1)
            per_target += ((d2 <= cutoff * cutoff) & (d2 > 1e-8)).sum(1)
        counts[i] = int(np.minimum(per_target, max_neighbors).sum())
    return counts


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
