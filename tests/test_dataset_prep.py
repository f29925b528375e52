"""Dataset-prep utilities: conditional sets, placement inputs, dedup, VASP."""
import os

import numpy as np
import pytest

from adsorbdiff_tpu.data.store import ShardDataset
from adsorbdiff_tpu.dataset_prep import (
    VASP_FLAGS,
    build_conditional_train_set,
    build_placement_dataset,
    dedup_sids,
    launch_vasp,
    write_vasp_inputs,
)
from adsorbdiff_tpu.runtime.atoms import Atoms
from adsorbdiff_tpu.runtime.trajectory import Trajectory


def make_traj_tree(tmp_path, rng):
    """traj_root/<sid>/<site>.adtraj.npz with known energies."""
    energies = {0: [-1.0, -3.0, -2.0], 1: [0.5, -0.5]}
    for sid, es in energies.items():
        d = tmp_path / "trajs" / str(sid)
        d.mkdir(parents=True)
        for site, e in enumerate(es):
            n = 8
            pos = rng.random((2, n, 3)).astype(np.float32) * 5
            Trajectory(
                positions=pos, numbers=rng.integers(1, 30, n),
                cell=np.eye(3, dtype=np.float32) * 8, tags=np.array([1] * 6 + [2] * 2),
                fixed=np.zeros(n, bool), energy=np.array([0.0, e], np.float32),
                sid=sid, fid=site,
            ).save(str(d / f"site{site}"))
    return str(tmp_path / "trajs"), energies


def test_conditional_train_set(tmp_path, rng):
    root, energies = make_traj_tree(tmp_path, rng)
    n = build_conditional_train_set(root, str(tmp_path / "cond"))
    assert n == 5
    ds = ShardDataset({"src": str(tmp_path / "cond")})
    by_sid = {}
    for i in range(len(ds)):
        s = ds[i]
        by_sid.setdefault(s.sid, []).append(s)
    # relative energies: per-sid min is exactly 0 and marked fid == -1
    for sid, es in energies.items():
        rel = sorted(s.energy for s in by_sid[sid])
        want = sorted(np.asarray(es) - min(es))
        np.testing.assert_allclose(rel, want, atol=1e-6)
        min_entries = [s for s in by_sid[sid] if s.fid == -1]
        assert len(min_entries) == 1 and min_entries[0].energy == 0.0


def test_placement_dataset_and_dedup(tmp_path, rng):
    atoms = [
        Atoms(positions=rng.random((5, 3)) * 4, numbers=rng.integers(1, 20, 5),
              cell=np.eye(3) * 8, tags=np.array([1, 1, 1, 2, 2]))
        for _ in range(4)
    ]
    n = build_placement_dataset(atoms, str(tmp_path / "place"), sids=[7, 7, 8, 9])
    assert n == 4
    ds = ShardDataset({"src": str(tmp_path / "place")})
    m = dedup_sids(ds, str(tmp_path / "uniq"))
    assert m == 3
    uniq = ShardDataset({"src": str(tmp_path / "uniq")})
    assert sorted(uniq[i].sid for i in range(len(uniq))) == [7, 8, 9]


def test_vasp_inputs(tmp_path, rng):
    atoms = Atoms(
        positions=rng.random((6, 3)) * 5, numbers=[29, 29, 29, 29, 6, 8],
        cell=np.diag([8.0, 8.0, 20.0]), tags=np.array([0, 0, 1, 1, 2, 2]),
        fixed=np.array([1, 1, 0, 0, 0, 0], bool),
    )
    write_vasp_inputs(atoms, str(tmp_path / "vasp"))
    poscar = open(tmp_path / "vasp" / "POSCAR").read()
    assert "Selective dynamics" in poscar and "Cu" in poscar and "F F F" in poscar
    incar = open(tmp_path / "vasp" / "INCAR").read()
    assert "ENCUT = 350.0" in incar and "LWAVE = .FALSE." in incar
    cmds = launch_vasp([str(tmp_path / "vasp")])
    assert cmds[0].startswith("cd ") and "vasp_std" in cmds[0]


def test_min_energy_subsplit(tmp_path, rng):
    """ref: preprocess_train_lmdb_subsplits.py — min-E config per sid, shuffled
    sub-split selection, surface trajs excluded, no energy targets."""
    from adsorbdiff_tpu.dataset_prep import build_min_energy_subsplit

    root, energies = make_traj_tree(tmp_path, rng)
    # a bare-surface traj that must be ignored (ref glob *[!surface].traj)
    d0 = tmp_path / "trajs" / "0"
    Trajectory(
        positions=np.zeros((1, 8, 3), np.float32), numbers=np.full(8, 29),
        cell=np.eye(3, dtype=np.float32) * 8, tags=np.zeros(8, np.int64),
        fixed=np.zeros(8, bool), energy=np.array([-99.0], np.float32), sid=0,
    ).save(str(d0 / "0_surface"))

    out = tmp_path / "sub"
    n = build_min_energy_subsplit(root, str(out), skip_first=0, num_shards=2)
    assert n == 2  # one (min-E) entry per sid; surface traj NOT the -99 winner
    ds = ShardDataset({"src": str(out)})
    got = {ds[i].sid: ds[i] for i in range(len(ds))}
    assert set(got) == {0, 1}
    assert got[0].energy is None or got[0].energy == 0.0  # no conditional target

    # skip_first drops systems after the seeded shuffle
    n1 = build_min_energy_subsplit(root, str(tmp_path / "sub1"), skip_first=1)
    assert n1 == 1
