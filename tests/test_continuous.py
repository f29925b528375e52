"""Continuous-batching relaxation engine (relaxation/continuous.py).

Semantics contract: every system follows EXACTLY the trajectory that
``lbfgs_relax`` would give it alone in a batch of one (per-system history ==
shared history at B=1), regardless of which systems share its slots, when it
entered the engine, or how many slots exist.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adsorbdiff_tpu.data.schema import System, collate
from adsorbdiff_tpu.relaxation.continuous import ContinuousRelaxationEngine
from adsorbdiff_tpu.relaxation.lbfgs import lbfgs_relax
from adsorbdiff_tpu.runtime.trajectory import Trajectory


def make_systems(rng, count=6, n=5, spread=2.0):
    """Harmonic-well systems with per-system stiffness so convergence times
    spread (stiff systems converge fast, soft ones slowly)."""
    systems, targets, ks = [], {}, {}
    for i in range(count):
        cell = np.diag([10.0, 10.0, 20.0]).astype(np.float32)
        pos = (rng.random((n, 3)).astype(np.float32) - 0.5) * spread + np.array([5, 5, 10], np.float32)
        systems.append(
            System(pos=pos, atomic_numbers=rng.integers(1, 20, n), cell=cell,
                   tags=np.full(n, 2, np.int32), sid=100 + i)
        )
        targets[100 + i] = pos + rng.normal(0, 0.4, pos.shape).astype(np.float32)
        ks[100 + i] = float(0.5 + 2.0 * (i % 3))
    return systems, targets, ks


def harmonic_by_sid(targets, ks, n_pad):
    """Per-system harmonic well keyed on sid (works for any slot layout)."""
    sids = sorted(targets)
    tgt = jnp.stack([jnp.asarray(np.pad(targets[s], ((0, n_pad - targets[s].shape[0]), (0, 0)))) for s in sids])
    kvec = jnp.asarray([ks[s] for s in sids], jnp.float32)
    sid_arr = jnp.asarray(sids, jnp.int32)

    def fn(batch):
        idx = jnp.argmax(batch.sid[:, None] == sid_arr[None, :], axis=1)  # [B]
        t = tgt[idx]
        k = kvec[idx][:, None, None]
        diff = (batch.pos - t) * batch.atom_mask[..., None]
        return 0.5 * jnp.sum(k * diff**2, axis=(1, 2)), -k * diff

    return fn


KW = dict(fmax=1e-3, maxstep=0.1, memory=10)


def test_continuous_matches_single_system_lbfgs(rng, tmp_path):
    systems, targets, ks = make_systems(rng)
    n_pad = 6
    fn = harmonic_by_sid(targets, ks, n_pad)
    eng = ContinuousRelaxationEngine(fn, dict(KW), steps=80, slots=3, chunk_steps=7)
    traj_dir = str(tmp_path / "trajs")
    results = eng.run_systems(systems, traj_dir=traj_dir, max_atoms=n_pad)
    assert sorted(results) == [s.sid for s in systems]
    for s in systems:
        ref = lbfgs_relax(fn, collate([s], max_atoms=n_pad), steps=80, **KW)
        got = results[s.sid]
        assert got.converged == bool(np.asarray(ref.converged)[0])
        np.testing.assert_allclose(got.pos, np.asarray(ref.batch.pos)[0, : s.natoms], atol=1e-5)
        np.testing.assert_allclose(got.energy, float(np.asarray(ref.energy)[0]), atol=1e-5)
        # ref.nsteps = converging iteration index; ours counts executed iterations
        assert got.nsteps == int(ref.nsteps) + 1
        # trajectory: frames 0..nsteps-1 match the reference scan's emitted
        # frames; the extra last frame is the recomputed final state
        traj = Trajectory.load(os.path.join(traj_dir, f"{s.sid}"))
        assert traj.positions.shape[0] == got.nsteps + 1
        np.testing.assert_allclose(
            traj.positions, np.asarray(ref.traj_pos)[: got.nsteps + 1, 0, : s.natoms], atol=1e-5
        )
        np.testing.assert_allclose(
            traj.energy, np.asarray(ref.traj_energy)[: got.nsteps + 1, 0], atol=1e-5
        )


def test_continuous_slot_composition_invariance(rng):
    """Results must not depend on the slot count (row-independent forwards +
    per-system history => identical per-system trajectories)."""
    systems, targets, ks = make_systems(rng, count=4)
    fn = harmonic_by_sid(targets, ks, 6)
    r2 = ContinuousRelaxationEngine(fn, dict(KW), steps=60, slots=2, chunk_steps=5).run_systems(
        systems, max_atoms=6
    )
    r4 = ContinuousRelaxationEngine(fn, dict(KW), steps=60, slots=4, chunk_steps=13).run_systems(
        systems, max_atoms=6
    )
    for sid in r2:
        np.testing.assert_allclose(r2[sid].pos, r4[sid].pos, atol=1e-6)
        assert r2[sid].nsteps == r4[sid].nsteps
        assert r2[sid].converged == r4[sid].converged


def test_continuous_budgets_and_more_systems_than_slots(rng, tmp_path):
    """Per-system budgets cap iterations; refill processes the whole pool."""
    systems, targets, ks = make_systems(rng, count=7)
    fn = harmonic_by_sid(targets, ks, 6)
    budgets = [3, 80, 5, 80, 4, 80, 2]
    eng = ContinuousRelaxationEngine(fn, dict(KW), steps=80, slots=2, chunk_steps=6)
    traj_dir = str(tmp_path / "t")
    results = eng.run_systems(systems, traj_dir=traj_dir, budgets=budgets, max_atoms=6)
    assert len(results) == 7
    for s, bd in zip(systems, budgets):
        got = results[s.sid]
        assert got.nsteps <= bd
        if not got.converged:
            assert got.nsteps == bd
        traj = Trajectory.load(os.path.join(traj_dir, f"{s.sid}"))
        # budget-exhausted trajectories end one frame after the last move
        assert traj.positions.shape[0] == got.nsteps + 1
        np.testing.assert_allclose(traj.positions[-1], got.pos, atol=0)
    # budget-capped system matches the same-budget lbfgs run (final frame is
    # the post-update state, like lbfgs's appended final frame)
    ref = lbfgs_relax(fn, collate([systems[0]], max_atoms=6), steps=3, **KW)
    np.testing.assert_allclose(results[systems[0].sid].pos, np.asarray(ref.batch.pos)[0, :5], atol=1e-5)


def test_continuous_skip_existing(rng, tmp_path):
    systems, targets, ks = make_systems(rng, count=3)
    fn = harmonic_by_sid(targets, ks, 6)
    traj_dir = str(tmp_path / "t")
    eng = ContinuousRelaxationEngine(fn, dict(KW), steps=40, slots=2, chunk_steps=5)
    first = eng.run_systems(systems[:2], traj_dir=traj_dir, max_atoms=6)
    assert len(first) == 2
    second = eng.run_systems(systems, traj_dir=traj_dir, max_atoms=6)
    assert sorted(second) == [systems[2].sid]


def test_continuous_fewer_systems_than_slots(rng):
    systems, targets, ks = make_systems(rng, count=2)
    fn = harmonic_by_sid(targets, ks, 6)
    results = ContinuousRelaxationEngine(fn, dict(KW), steps=60, slots=5, chunk_steps=8).run_systems(
        systems, max_atoms=6
    )
    assert len(results) == 2
    for s in systems:
        ref = lbfgs_relax(fn, collate([s], max_atoms=6), steps=60, **KW)
        np.testing.assert_allclose(results[s.sid].pos, np.asarray(ref.batch.pos)[0, :5], atol=1e-5)


def test_continuous_verlet_candidates_parity(rng):
    """Candidate tables (eager rebuild at refill) must not change results —
    tiny GemNet-OC, covering the static_graph dict path through the engine."""
    from adsorbdiff_tpu.models.gemnet_oc import GemNetOC
    from adsorbdiff_tpu.relaxation.lbfgs import make_mlff_energy_forces
    from tests.test_painn import make_batch as painn_batch
    from adsorbdiff_tpu.data.schema import uncollate

    nprng = np.random.default_rng(7)
    batch = painn_batch(nprng, b=3)
    systems = uncollate(batch)
    model = GemNetOC(
        mode="s2ef", num_blocks=1, emb_size_atom=16, emb_size_edge=16,
        cutoff=6.0, cutoff_aeaint=6.0, cutoff_qint=6.0,
        max_neighbors=8, max_neighbors_aeaint=6, max_neighbors_qint=4,
        cell_reps=(1, 1, 0),
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    ef = make_mlff_energy_forces(model, variables)
    cf = lambda b: model.prepare_candidates(b, 24)  # noqa: E731
    kw = dict(fmax=0.05, maxstep=0.2, memory=10)
    plain = ContinuousRelaxationEngine(ef, dict(kw), steps=8, slots=2, chunk_steps=3).run_systems(
        systems, max_atoms=batch.max_atoms
    )
    verlet = ContinuousRelaxationEngine(
        ef, dict(kw), steps=8, slots=2, chunk_steps=3, candidate_fn=cf
    ).run_systems(systems, max_atoms=batch.max_atoms)
    for sid in plain:
        np.testing.assert_allclose(plain[sid].pos, verlet[sid].pos, atol=1e-6)
        np.testing.assert_allclose(plain[sid].energy, verlet[sid].energy, atol=1e-6)
        assert plain[sid].nsteps == verlet[sid].nsteps


def test_continuous_mesh_parity(rng):
    """dp-sharding the slot axis must not change any result (systems are
    independent; refill is a dynamic row update on the sharded axis)."""
    from adsorbdiff_tpu.parallel import mesh as meshlib

    systems, targets, ks = make_systems(rng, count=6)
    fn = harmonic_by_sid(targets, ks, 6)
    plain = ContinuousRelaxationEngine(fn, dict(KW), steps=60, slots=4, chunk_steps=6).run_systems(
        systems, max_atoms=6
    )
    mesh = meshlib.make_mesh(4)
    sharded = ContinuousRelaxationEngine(
        fn, dict(KW), steps=60, slots=4, chunk_steps=6, mesh=mesh
    ).run_systems(systems, max_atoms=6)
    for sid in plain:
        np.testing.assert_allclose(plain[sid].pos, sharded[sid].pos, atol=1e-6)
        assert plain[sid].nsteps == sharded[sid].nsteps
        assert plain[sid].converged == sharded[sid].converged


def test_continuous_run_dataset_buckets(rng, tmp_path):
    """run_dataset buckets by atom count and processes every system."""
    systems = []
    targets, ks = {}, {}
    for i, n in enumerate([4, 5, 9, 10, 11, 3]):
        cell = np.diag([10.0, 10.0, 20.0]).astype(np.float32)
        pos = (rng.random((n, 3)).astype(np.float32) - 0.5) * 2 + np.array([5, 5, 10], np.float32)
        systems.append(System(pos=pos, atomic_numbers=rng.integers(1, 20, n), cell=cell,
                              tags=np.full(n, 2, np.int32), sid=200 + i))
        targets[200 + i] = np.pad(pos + rng.normal(0, 0.3, pos.shape).astype(np.float32),
                                  ((0, 16 - n), (0, 0)))
        ks[200 + i] = 1.0

    class DS:
        def __len__(self):
            return len(systems)

        def __getitem__(self, i):
            return systems[i]

    fn = harmonic_by_sid({k: v for k, v in targets.items()}, ks, 16)

    def fn_anypad(batch):
        # harmonic_by_sid assumed a fixed pad; rebuild per pad width
        sids = sorted(targets)
        tgt = jnp.stack([jnp.asarray(targets[s][: batch.max_atoms]) for s in sids])
        idx = jnp.argmax(batch.sid[:, None] == jnp.asarray(sids, jnp.int32)[None, :], axis=1)
        diff = (batch.pos - tgt[idx]) * batch.atom_mask[..., None]
        return 0.5 * jnp.sum(diff**2, axis=(1, 2)), -diff

    eng = ContinuousRelaxationEngine(fn_anypad, dict(KW), steps=60, slots=2, chunk_steps=6)
    results = eng.run_dataset(DS(), traj_dir=str(tmp_path / "t"), num_buckets=2)
    assert sorted(results) == [s.sid for s in systems]
    assert all(results[s.sid].converged for s in systems)


def test_trainer_run_relaxations_continuous(tmp_path, rng):
    """relax_opt: {continuous: true} drives run_relaxations end-to-end
    (engine + metrics + write_pos + trajectory files)."""
    from adsorbdiff_tpu.runtime.trajectory import SUFFIX
    from adsorbdiff_tpu.train.trainer import S2EFTrainer
    from tests.test_s2ef_and_tasks import make_s2ef_dataset, s2ef_config

    train = make_s2ef_dataset(tmp_path, rng, 8, "train")
    relax = make_s2ef_dataset(tmp_path, rng, 6, "relax")
    cfg = s2ef_config(train, relax_src=relax, run_dir=str(tmp_path))
    cfg["task"]["relax_opt"].update(
        continuous=True, chunk_steps=4, slots=4, traj_dir=str(tmp_path / "trajs")
    )
    tr = S2EFTrainer(cfg, mesh=None)
    tr.init_state(next(iter(tr.train_batcher)))
    tr.run_relaxations()
    out = np.load(os.path.join(tr.results_dir, "relaxed_positions.npz"), allow_pickle=True)
    assert len(out["ids"]) == 6
    assert len([f for f in os.listdir(tmp_path / "trajs") if f.endswith(SUFFIX)]) == 6


def test_continuous_drain_narrowing_parity(rng):
    """Drain narrowing (gather survivors into a smaller batch once the pool
    is empty) must not change any result — per-system history rows move with
    their system."""
    systems, targets, ks = make_systems(rng, count=6)
    fn = harmonic_by_sid(targets, ks, 6)
    budgets = [5, 5, 40, 40, 5, 5]
    kw = dict(KW, fmax=1e-12)  # budget-controlled retirement: the drain
    # phase (2 live slots of 4) is guaranteed, so narrowing must trigger
    base = ContinuousRelaxationEngine(fn, kw, steps=80, slots=4, chunk_steps=6).run_systems(
        systems, budgets=budgets, max_atoms=6
    )
    eng = ContinuousRelaxationEngine(
        fn, dict(kw, drain_narrowing=True), steps=80, slots=4, chunk_steps=6
    )
    narrow = eng.run_systems(systems, budgets=budgets, max_atoms=6)
    assert eng.narrow_events, "narrowing never triggered — adjust the workload"
    assert sorted(narrow) == sorted(base)
    for sid in base:
        np.testing.assert_allclose(base[sid].pos, narrow[sid].pos, atol=1e-6)
        np.testing.assert_allclose(base[sid].energy, narrow[sid].energy, atol=1e-6)
        assert base[sid].nsteps == narrow[sid].nsteps
        assert base[sid].converged == narrow[sid].converged


def test_continuous_drain_narrowing_with_verlet(rng):
    """Narrowing + candidate tables: eager rebuild after the gather keeps the
    Verlet margin invariant (tiny GemNet, results equal to no-narrowing)."""
    from adsorbdiff_tpu.data.schema import uncollate
    from adsorbdiff_tpu.models.gemnet_oc import GemNetOC
    from adsorbdiff_tpu.relaxation.lbfgs import make_mlff_energy_forces
    from tests.test_painn import make_batch as painn_batch

    nprng = np.random.default_rng(11)
    batch = painn_batch(nprng, b=3)
    systems = uncollate(batch)
    model = GemNetOC(
        mode="s2ef", num_blocks=1, emb_size_atom=16, emb_size_edge=16,
        cutoff=6.0, cutoff_aeaint=6.0, cutoff_qint=6.0,
        max_neighbors=8, max_neighbors_aeaint=6, max_neighbors_qint=4,
        cell_reps=(1, 1, 0),
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    ef = make_mlff_energy_forces(model, variables)
    cf = lambda b: model.prepare_candidates(b, 24)  # noqa: E731
    kw = dict(fmax=1e-9, maxstep=0.2, memory=10)
    budgets = [2, 2, 9]
    base = ContinuousRelaxationEngine(ef, dict(kw), steps=9, slots=2, chunk_steps=3,
                                      candidate_fn=cf).run_systems(
        systems, budgets=budgets, max_atoms=batch.max_atoms
    )
    eng = ContinuousRelaxationEngine(ef, dict(kw, drain_narrowing=True), steps=9, slots=2,
                                     chunk_steps=3, candidate_fn=cf)
    narrow = eng.run_systems(systems, budgets=budgets, max_atoms=batch.max_atoms)
    assert eng.narrow_events
    for sid in base:
        # a real model forward is row-independent in exact arithmetic but not
        # bitwise across COMPILED BATCH WIDTHS (XLA reassociates reductions
        # per shape), so narrowed trajectories drift at fp level — the same
        # caveat as the reference's OOM batch bisection.  1e-3 bounds the
        # drift over this budget; exactness at fixed width is covered by
        # test_continuous_slot_composition_invariance.
        np.testing.assert_allclose(base[sid].pos, narrow[sid].pos, atol=1e-3)
        assert base[sid].nsteps == narrow[sid].nsteps


def test_resolve_continuous_auto():
    """Engine auto-selection (resolve_continuous): continuous exactly when
    fmax-based stopping makes convergence spread possible; explicit
    True/False override; barrier on meshes that don't divide the slots."""
    from adsorbdiff_tpu.relaxation.continuous import resolve_continuous

    assert resolve_continuous({"continuous": True}, fmax=0.0) is True
    assert resolve_continuous({"continuous": False}, fmax=0.01) is False
    assert resolve_continuous({}, fmax=0.01) is True
    assert resolve_continuous(None, fmax=0.01) is True
    assert resolve_continuous({}, fmax=0.0) is False  # fixed budget -> barrier
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]).reshape(8), ("dp",))
    assert resolve_continuous({}, fmax=0.01, mesh=mesh, slots=8) is True
    assert resolve_continuous({}, fmax=0.01, mesh=mesh, slots=6) is False
    # relax_opt['fmax'] is the authoritative threshold (both engines read it):
    # opt fmax 0 + task fmax 0.01 is a fixed-budget run -> barrier, and the
    # converse selects continuous (ADVICE round 4).
    assert resolve_continuous({"fmax": 0.0}, fmax=0.01) is False
    assert resolve_continuous({"fmax": 0.05}, fmax=0.0) is True
    # num_relaxation_batches caps batches; the continuous engine streams
    # systems and cannot honor it -> barrier under auto, override still wins.
    assert resolve_continuous({}, fmax=0.01, num_relaxation_batches=2) is False
    assert resolve_continuous({}, fmax=0.01, num_relaxation_batches=int(1e9)) is True
    assert resolve_continuous({"continuous": True}, fmax=0.01,
                              num_relaxation_batches=2) is True
    # quoted YAML strings parse, unknown strings raise (no bool() coercion)
    assert resolve_continuous({"continuous": "false"}, fmax=0.01) is False
    assert resolve_continuous({"continuous": "off"}, fmax=0.01) is False
    assert resolve_continuous({"continuous": "true"}, fmax=0.0) is True
    with pytest.raises(ValueError):
        resolve_continuous({"continuous": "maybe"}, fmax=0.01)
