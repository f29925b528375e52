"""Offline evaluation toolkit — success rate, anomaly filtering, DwT/ADwT.

Rebuild of the north-star evaluation (ref: scripts/eval.py): the AdsorbDiff
success metric is, per system, the minimum anomaly-free ML energy over all
sampled placements/sites being within 0.1 eV of the DFT minimum
(ref: eval.py:582-586 ``is_successful``, :566-579 ``anomalous_structure``).
Operates on our ``.adtraj.npz`` trajectory dirs (one per sampling seed/site).
"""
from __future__ import annotations

import glob
import os
import re
from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from adsorbdiff_tpu.placement.flag_anomaly import DetectTrajAnomaly
from adsorbdiff_tpu.runtime.trajectory import SUFFIX, Trajectory

SUCCESS_THRESHOLD = 0.1  # eV (ref: eval.py:582)


def is_successful(best_pred_energy: float, best_dft_energy: float, threshold: float = SUCCESS_THRESHOLD) -> bool:
    """ML min within `threshold` of (or below) the DFT min (ref: eval.py:582-586)."""
    return (best_pred_energy - best_dft_energy) <= threshold


def anomalous_structure(traj: Trajectory) -> np.ndarray:
    """4-flag anomaly vector for a trajectory (ref: eval.py:566-579)."""
    init_atoms, final_atoms = traj[0], traj[len(traj) - 1]
    detector = DetectTrajAnomaly(init_atoms, final_atoms, init_atoms.tags)
    return np.array(
        [
            detector.is_adsorbate_dissociated(),
            detector.is_adsorbate_desorbed(),
            detector.has_surface_changed(),
            detector.is_adsorbate_intercalated(),
        ]
    )


def min_energy_per_system(
    traj_dirs: Sequence[str],
    filter_anomalies: bool = True,
) -> Dict[str, Tuple[float, str]]:
    """Scan trajectory dirs (one per sampling seed/site); return per-sid
    (min final energy, traj path) over anomaly-free candidates
    (ref: eval.py traj-dir variants :111-553)."""
    best: Dict[str, Tuple[float, str]] = {}
    for d in traj_dirs:
        for path in sorted(glob.glob(os.path.join(d, f"*{SUFFIX}"))):
            traj = Trajectory.load(path)
            if traj.energy is None:
                continue
            if filter_anomalies and anomalous_structure(traj).any():
                continue
            e = float(traj.energy[-1])
            sid = str(traj.sid)
            if sid not in best or e < best[sid][0]:
                best[sid] = (e, path)
    return best


def success_rate(
    traj_dirs: Sequence[str],
    dft_targets: Dict[str, float],
    filter_anomalies: bool = True,
    threshold: float = SUCCESS_THRESHOLD,
) -> Tuple[float, Dict[str, bool]]:
    """North-star success rate over the DFT target denominator
    (ref: eval.py:556-563 — systems with no valid candidate count as failures)."""
    best = min_energy_per_system(traj_dirs, filter_anomalies)
    per_system: Dict[str, bool] = {}
    for sid, dft_e in dft_targets.items():
        if sid in best:
            per_system[sid] = bool(is_successful(best[sid][0], dft_e, threshold))
        else:
            per_system[sid] = False
    rate = sum(per_system.values()) / max(len(per_system), 1)
    return rate, per_system


def min_diff(diff: np.ndarray, cell: np.ndarray) -> np.ndarray:
    """PBC minimum-image wrap of displacement rows (ref: eval.py:765-777)."""
    fractional = np.linalg.solve(cell.T, diff.T).T
    fractional %= 1.0
    fractional %= 1.0
    fractional[fractional > 0.5] -= 1
    return np.matmul(fractional, cell)


def mean_ads_distance(traj: Trajectory, target_pos: np.ndarray, step: int = -1) -> float:
    """Mean adsorbate atom distance to target positions at a trajectory step,
    under the minimum image (ref: eval.py get_mean_distances_from_traj)."""
    ads = traj.tags == 2
    diff = traj.positions[step][ads] - np.asarray(target_pos)[ads]
    return float(np.mean(np.linalg.norm(min_diff(diff, traj.cell), axis=1)))


def compute_metrics(distances: Iterable[float]) -> Tuple[float, float]:
    """(DwT, ADwT): % of systems with mean distance < 0.1 Å, and the mean over
    thresholds 0.01..0.5 Å (ref: eval.py:751-762)."""
    distances = np.asarray(list(distances))
    intv = np.arange(0.01, 0.5, 0.001)
    dwts = [100 * float((distances < t).sum()) / len(distances) for t in intv]
    adwt = float(np.mean(dwts))
    dwt = 100 * float((distances < 0.1).sum()) / len(distances)
    return dwt, adwt


def dft_targets_from_pkl(path: str) -> Dict[str, float]:
    """Per-sid DFT minimum energies from an OC20-Dense style mapping pickle
    {sid: [(config, energy), ...]} (ref: eval.py:603-636)."""
    import pickle

    with open(path, "rb") as f:
        targets = pickle.load(f)
    out: Dict[str, float] = {}
    for system, adslabs in targets.items():
        out[str(system)] = min(float(a[1]) for a in adslabs)
    return out
