"""L-BFGS relaxation, trajectory IO, drivers, calculator."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adsorbdiff_tpu.data.schema import System, collate
from adsorbdiff_tpu.relaxation.lbfgs import lbfgs_relax
from adsorbdiff_tpu.relaxation.ml_relaxation import DiffusionEngine, RelaxationEngine
from adsorbdiff_tpu.runtime.atoms import Atoms, atoms_to_system, batch_to_atoms
from adsorbdiff_tpu.runtime.trajectory import SUFFIX, Trajectory, check_traj_files


def make_batch(rng, b=2, n=6, n_pad=8, spread=1.0):
    systems = []
    for i in range(b):
        cell = np.diag([10.0, 10.0, 20.0]).astype(np.float32)
        pos = (rng.random((n, 3)).astype(np.float32) - 0.5) * spread + np.array([5, 5, 10], np.float32)
        tags = np.full(n, 2, np.int32)
        systems.append(System(pos=pos, atomic_numbers=rng.integers(1, 20, n), cell=cell, tags=tags, sid=i))
    return collate(systems, max_atoms=n_pad)


def harmonic_fn(target):
    """E = 0.5 * sum |p - target|^2 restricted to real atoms."""

    def fn(batch):
        diff = (batch.pos - target) * batch.atom_mask[..., None]
        e = 0.5 * jnp.sum(diff**2, axis=(1, 2))
        return e, -diff

    return fn


def test_lbfgs_minimizes_harmonic(rng):
    batch = make_batch(rng, spread=2.0)
    target = batch.pos + jnp.asarray(rng.normal(0, 0.5, batch.pos.shape).astype(np.float32))
    res = jax.jit(lambda b: lbfgs_relax(harmonic_fn(target), b, steps=150, fmax=0.01, maxstep=0.04, memory=50))(batch)
    mask = np.asarray(batch.atom_mask)
    err = np.linalg.norm(np.asarray(res.batch.pos - target), axis=-1)[mask]
    assert err.max() < 0.02, err.max()
    assert bool(np.asarray(res.converged).all())
    assert int(res.nsteps) < 150  # early convergence freeze
    # trajectory monotone-ish energy decrease overall
    te = np.asarray(res.traj_energy).sum(1)
    assert te[min(int(res.nsteps), 149)] < te[0]
    # padded atoms never move
    pad = ~mask
    np.testing.assert_array_equal(np.asarray(res.batch.pos)[pad], np.asarray(batch.pos)[pad])


def test_lbfgs_uses_history_immediately(rng):
    """Regression: the two-loop must read the ring buffer from the TAIL.

    With the tail-write/head-read mismatch, the recursion read only zero slots
    until `memory` pushes accumulated, silently degrading to H0-scaled
    gradient descent.  On this ill-conditioned quadratic, H0=1/70 gradient
    descent moves ~0.004 A/step on the soft mode (needs hundreds of steps);
    true L-BFGS, using history from iteration 2, converges within 40.
    """
    batch = make_batch(rng, spread=1.0)
    target = batch.pos + jnp.asarray(rng.normal(0, 0.3, batch.pos.shape).astype(np.float32))
    k = jnp.asarray(np.linspace(0.5, 10.0, batch.pos.shape[1]).astype(np.float32))[None, :, None]

    def fn(b):
        diff = (b.pos - target) * b.atom_mask[..., None]
        return 0.5 * jnp.sum(k * diff**2, axis=(1, 2)), -k * diff

    res = lbfgs_relax(fn, batch, steps=40, fmax=1e-3, maxstep=0.2, memory=50)
    assert bool(np.asarray(res.converged).all()), np.asarray(res.forces).max()
    assert int(res.nsteps) < 40
    # last trajectory frame IS the final relaxed state
    np.testing.assert_array_equal(np.asarray(res.traj_pos[-1]), np.asarray(res.batch.pos))
    np.testing.assert_array_equal(np.asarray(res.traj_energy[-1]), np.asarray(res.energy))


def test_lbfgs_fixed_atoms_and_maxstep(rng):
    batch = make_batch(rng, spread=2.0)
    fixed = np.zeros(np.asarray(batch.fixed).shape, bool)
    fixed[:, 0] = True  # first atom of each system fixed
    batch = batch.replace(fixed=jnp.asarray(fixed))
    target = batch.pos + 3.0

    def fn(b):
        diff = (b.pos - target) * b.atom_mask[..., None]
        f = -diff
        f = jnp.where(b.fixed[..., None], 0.0, f)  # calculator contract
        return 0.5 * jnp.sum(diff**2, axis=(1, 2)), f

    res = lbfgs_relax(fn, batch, steps=3, fmax=1e-9, maxstep=0.04, damping=1.0)
    moved = np.asarray(res.traj_pos[-1] - batch.pos)
    # fixed atoms immobile
    assert np.abs(moved[np.asarray(batch.fixed)]).max() == 0
    # every per-atom step bounded by maxstep (3 steps -> <= 0.12 + eps)
    assert np.abs(moved).max() <= 3 * 0.04 + 1e-5


def test_trajectory_roundtrip(tmp_path, rng):
    traj = Trajectory(
        positions=rng.normal(0, 1, (5, 7, 3)).astype(np.float32),
        numbers=rng.integers(1, 30, 7),
        cell=np.eye(3, dtype=np.float32) * 8,
        tags=rng.integers(0, 3, 7),
        fixed=rng.integers(0, 2, 7).astype(bool),
        energy=rng.normal(0, 1, 5).astype(np.float32),
        forces=rng.normal(0, 1, (5, 7, 3)).astype(np.float32),
        sid=42,
        fid=3,
    )
    p = traj.save(str(tmp_path / "42"))
    back = Trajectory.load(p)
    assert len(back) == 5 and back.sid == 42 and back.fid == 3
    np.testing.assert_allclose(back.positions, traj.positions)
    np.testing.assert_allclose(back.energy, traj.energy)
    atoms = back[2]
    assert isinstance(atoms, Atoms) and len(atoms) == 7
    assert atoms.get_potential_energy() == pytest.approx(float(traj.energy[2]))
    assert check_traj_files([42], str(tmp_path))
    assert not check_traj_files([42, 43], str(tmp_path))


def test_relaxation_engine_writes_trajs(tmp_path, rng):
    batch = make_batch(rng)
    target = batch.pos + 0.3
    eng = RelaxationEngine(harmonic_fn(target), {"maxstep": 0.04, "memory": 20}, steps=50, fmax=0.01)
    res = eng.run(batch, traj_dir=str(tmp_path / "trajs"))
    assert res is not None
    # resumability holds even while the async write is still queued
    assert eng.run(batch, traj_dir=str(tmp_path / "trajs")) is None
    eng.flush()
    assert os.path.exists(str(tmp_path / "trajs" / ("0" + SUFFIX)))
    assert os.path.exists(str(tmp_path / "trajs" / ("1" + SUFFIX)))
    # resumability: second run skips (files now on disk, pending set drained)
    assert eng.run(batch, traj_dir=str(tmp_path / "trajs")) is None


def test_diffusion_engine_runs_and_writes(tmp_path, rng):
    batch = make_batch(rng)

    def score_fn(cur):
        return jnp.ones_like(cur.pos), jnp.zeros_like(cur.pos)

    eng = DiffusionEngine(score_fn, dict(num_steps=8, ads_std_low=0.1, ads_std_high=10, rot_std_low=0.01, rot_std_high=1.55))
    res = eng.run(batch, jax.random.PRNGKey(0), traj_dir=str(tmp_path / "d"))
    assert res is not None and res.traj_pos.shape[0] == 9
    eng.flush()
    t = Trajectory.load(str(tmp_path / "d" / ("0" + SUFFIX)))
    assert len(t) == 9


def test_atoms_roundtrip(rng):
    batch = make_batch(rng)
    atoms_list = batch_to_atoms(batch, energy=np.array([1.0, 2.0]), forces=np.zeros(batch.pos.shape))
    assert len(atoms_list) == 2 and atoms_list[1].get_potential_energy() == 2.0
    sys0 = atoms_to_system(atoms_list[0])
    np.testing.assert_allclose(sys0.pos, np.asarray(batch.pos)[0, :6], atol=1e-6)


def test_lbfgs_early_exit_matches_full_scan(rng):
    """The while-loop early exit (ref lbfgs_torch.py:93-117 loop break) must
    reproduce the fixed-scan result bit-for-bit, trajectory included."""
    batch = make_batch(rng, spread=2.0)
    target = batch.pos + jnp.asarray(rng.normal(0, 0.5, batch.pos.shape).astype(np.float32))
    kw = dict(steps=150, fmax=0.01, maxstep=0.04, memory=50)
    full = jax.jit(lambda b: lbfgs_relax(harmonic_fn(target), b, early_exit=False, **kw))(batch)
    fast = jax.jit(lambda b: lbfgs_relax(harmonic_fn(target), b, early_exit=True, **kw))(batch)
    assert int(fast.nsteps) < 150
    np.testing.assert_array_equal(np.asarray(fast.batch.pos), np.asarray(full.batch.pos))
    np.testing.assert_array_equal(np.asarray(fast.traj_pos), np.asarray(full.traj_pos))
    np.testing.assert_array_equal(np.asarray(fast.traj_energy), np.asarray(full.traj_energy))
    np.testing.assert_array_equal(np.asarray(fast.traj_forces), np.asarray(full.traj_forces))
    assert int(fast.nsteps) == int(full.nsteps)


def test_lbfgs_verlet_graph_parity(rng):
    """L-BFGS with Verlet candidate tables (lax.cond margin rebuilds) ==
    full graph builds every step — bit-exact trajectories (GemNet-OC tiny,
    covering the static_graph dict path and the derived subgraphs)."""
    from adsorbdiff_tpu.models.gemnet_oc import GemNetOC
    from adsorbdiff_tpu.relaxation.lbfgs import make_mlff_energy_forces
    from tests.test_painn import make_batch as painn_batch

    nprng = np.random.default_rng(7)
    batch = painn_batch(nprng)
    model = GemNetOC(
        mode="s2ef", num_blocks=1, emb_size_atom=16, emb_size_edge=16,
        cutoff=6.0, cutoff_aeaint=6.0, cutoff_qint=6.0,
        max_neighbors=8, max_neighbors_aeaint=6, max_neighbors_qint=4,
        cell_reps=(1, 1, 0),
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    ef = make_mlff_energy_forces(model, variables)
    cf = lambda b: model.prepare_candidates(b, 24)  # noqa: E731
    kw = dict(steps=15, fmax=0.0, maxstep=0.2)
    full = jax.jit(lambda b: lbfgs_relax(ef, b, **kw))(batch)
    fast = jax.jit(lambda b: lbfgs_relax(ef, b, candidate_fn=cf, **kw))(batch)
    np.testing.assert_array_equal(np.asarray(full.batch.pos), np.asarray(fast.batch.pos))
    np.testing.assert_array_equal(np.asarray(full.traj_energy), np.asarray(fast.traj_energy))
    np.testing.assert_array_equal(np.asarray(full.traj_forces), np.asarray(fast.traj_forces))


def test_async_writer_pending_and_error_surfacing():
    from adsorbdiff_tpu.relaxation.ml_relaxation import _AsyncWriter
    import threading

    w = _AsyncWriter()
    gate = threading.Event()
    done = []

    def slow_write(x):
        gate.wait(timeout=10)
        done.append(x)

    w.submit(slow_write, 1, pending_keys=[("d", 1), ("d", 2)])
    assert w.is_pending(("d", 1)) and w.is_pending(("d", 2))
    assert not w.is_pending(("d", 3))
    gate.set()
    w.flush()
    assert done == [1]
    assert not w.is_pending(("d", 1))

    # errors queue up and surface at flush, then clear
    def boom():
        raise RuntimeError("disk full")

    w.submit(boom, pending_keys=[("d", 9)])
    try:
        w.flush()
        raised = False
    except RuntimeError:
        raised = True
    assert raised
    assert not w.is_pending(("d", 9))
    w.flush()  # error cleared; idempotent
