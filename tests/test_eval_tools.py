"""Anomaly detection + success-rate / DwT evaluation toolkit."""
import numpy as np
import pytest

from adsorbdiff_tpu.eval_tools import (
    anomalous_structure,
    compute_metrics,
    is_successful,
    mean_ads_distance,
    min_energy_per_system,
    success_rate,
)
from adsorbdiff_tpu.placement.flag_anomaly import COVALENT_RADII, DetectTrajAnomaly, connectivity_matrix
from adsorbdiff_tpu.runtime.atoms import Atoms
from adsorbdiff_tpu.runtime.trajectory import Trajectory


def slab_with_co(z_ads=8.0, co_bond=1.15):
    """Cu slab (2 layers of 4) + CO adsorbate."""
    cell = np.diag([7.0, 7.0, 25.0])
    slab = []
    for iz, z in enumerate([0.0, 2.0]):
        for ix in range(2):
            for iy in range(2):
                slab.append([1.0 + 3 * ix, 1.0 + 3 * iy, z])
    pos = np.array(slab + [[1.0, 1.0, z_ads], [1.0, 1.0, z_ads + co_bond]])
    numbers = np.array([29] * 8 + [6, 8])
    tags = np.array([0] * 4 + [1] * 4 + [2, 2])
    return Atoms(positions=pos, numbers=numbers, cell=cell, tags=tags, fixed=tags == 0)


def test_connectivity_pbc():
    cell = np.diag([5.0, 5.0, 20.0])
    # two Cu atoms across the x-boundary: distance 1.0 via min image
    pos = np.array([[0.2, 2.0, 5.0], [4.8, 2.0, 5.0]])
    conn = connectivity_matrix(pos, [29, 29], cell, (True, True, True))
    assert conn[0, 1] == 1 and conn[1, 0] == 1
    conn_nopbc = connectivity_matrix(pos, [29, 29], cell, (False, False, False))
    assert conn_nopbc[0, 1] == 0


def test_anomaly_clean_relaxation():
    init = slab_with_co(z_ads=4.1)  # bound: C ~2.1 A above surface Cu
    final = slab_with_co(z_ads=4.0)
    det = DetectTrajAnomaly(init, final, init.tags)
    assert not det.is_adsorbate_dissociated()
    assert not det.is_adsorbate_desorbed()
    assert not det.has_surface_changed()
    assert not det.is_adsorbate_intercalated()


def test_anomaly_dissociation():
    init = slab_with_co(z_ads=4.1)
    final = slab_with_co(z_ads=4.1, co_bond=4.0)  # C-O bond broken
    det = DetectTrajAnomaly(init, final, init.tags)
    assert det.is_adsorbate_dissociated()


def test_anomaly_desorption():
    init = slab_with_co(z_ads=4.1)
    final = slab_with_co(z_ads=15.0)  # flew away
    det = DetectTrajAnomaly(init, final, init.tags)
    assert det.is_adsorbate_desorbed()


def test_anomaly_intercalation():
    init = slab_with_co(z_ads=4.1)
    final = slab_with_co(z_ads=0.0)  # C sits in the frozen layer
    det = DetectTrajAnomaly(init, final, init.tags)
    assert det.is_adsorbate_intercalated()


def test_anomaly_surface_change():
    init = slab_with_co(z_ads=4.1)
    final = slab_with_co(z_ads=4.1)
    moved = final.positions.copy()
    # migration must exceed the 1.5x covalent cushion (ref cutoff ~4.26 A for
    # Cu-Cu) to count as reconstruction
    moved[4] += np.array([0.0, 0.0, 6.0])
    final.set_positions(moved)
    det = DetectTrajAnomaly(init, final, init.tags)
    assert det.has_surface_changed()


def make_traj(tmp_path, sid, final_energy, desorbed=False, name=None):
    init = slab_with_co(z_ads=4.1)
    final = slab_with_co(z_ads=15.0 if desorbed else 4.0)
    t = Trajectory(
        positions=np.stack([init.positions, final.positions]).astype(np.float32),
        numbers=init.numbers, cell=init.cell, tags=init.tags, fixed=init.fixed,
        energy=np.array([0.0, final_energy], np.float32), sid=sid,
    )
    t.save(str(tmp_path / (name or str(sid))))
    return t


def test_success_rate_pipeline(tmp_path):
    d1 = tmp_path / "seed0"; d1.mkdir()
    d2 = tmp_path / "seed1"; d2.mkdir()
    # sid 1: candidate energies -1.0 (seed0) and -2.5 (seed1, but desorbed -> filtered)
    make_traj(d1, 1, -1.0)
    make_traj(d2, 1, -2.5, desorbed=True)
    # sid 2: min candidate -3.0, within 0.1 of dft -3.05
    make_traj(d1, 2, -2.0)
    make_traj(d2, 2, -3.0)
    best = min_energy_per_system([str(d1), str(d2)])
    assert best["1"][0] == pytest.approx(-1.0)  # desorbed candidate filtered
    assert best["2"][0] == pytest.approx(-3.0)

    dft = {"1": -2.0, "2": -3.05, "3": -1.0}  # sid 3 has no candidates
    rate, per = success_rate([str(d1), str(d2)], dft)
    assert per["1"] is False  # -1.0 vs -2.0 -> off by 1.0
    assert per["2"] is True  # -3.0 vs -3.05 -> within 0.1
    assert per["3"] is False  # missing candidate = failure
    assert rate == pytest.approx(1 / 3)


def test_dwt_metrics():
    dwt, adwt = compute_metrics([0.05, 0.2, 0.02, 0.4])
    assert dwt == pytest.approx(50.0)
    assert 0 < adwt < 100


def test_mean_ads_distance(tmp_path):
    t = make_traj(tmp_path, 9, -1.0)
    target = t.positions[-1].copy()
    assert mean_ads_distance(t, target) == pytest.approx(0.0, abs=1e-6)
    target2 = target.copy()
    target2[-2:] += [0.3, 0.0, 0.0]
    assert mean_ads_distance(t, target2) == pytest.approx(0.3, abs=1e-5)
