"""PBC radius graph vs a brute-force numpy reference (SURVEY.md §4/§7)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adsorbdiff_tpu.ops.pbc import (
    compute_cell_reps,
    frac_wrap_center,
    min_image_diff,
    radius_graph_pbc,
    radius_graph_pbc_batched,
    wrap_positions,
)


def brute_force_edges(pos, cell, reps, radius):
    """All (target, source, offset) edges with 1e-4 < d^2 <= r^2, reference
    semantics (ref: adsorbdiff/utils/utils.py:694-709)."""
    edges = {}
    n = len(pos)
    offs = [
        (i, j, k)
        for i in range(-reps[0], reps[0] + 1)
        for j in range(-reps[1], reps[1] + 1)
        for k in range(-reps[2], reps[2] + 1)
    ]
    for tgt in range(n):
        for src in range(n):
            for off in offs:
                d = pos[src].astype(np.float64) + np.asarray(off, dtype=np.float64) @ cell.astype(np.float64) - pos[tgt]
                d2 = float(np.dot(d, d))
                if 1e-4 < d2 <= radius * radius:
                    edges[(tgt, src, off)] = np.sqrt(d2)
    return edges


def make_system(rng, n=12):
    cell = np.diag([6.0, 7.0, 20.0]) + rng.normal(0, 0.2, (3, 3)) * np.tri(3, 3, -1)
    frac = rng.random((n, 3)) * [1, 1, 0.4]
    pos = frac @ cell
    return pos.astype(np.float32), cell.astype(np.float32)


def test_radius_graph_matches_bruteforce(rng):
    pos, cell = make_system(rng)
    radius = 5.0
    reps = compute_cell_reps(cell, radius)
    nl = radius_graph_pbc(
        jnp.asarray(pos), jnp.asarray(cell), jnp.ones(len(pos), bool),
        radius=radius, max_neighbors=64, reps=reps,
    )
    got = {}
    mask_np, src_np, off_np, dist_np = (np.asarray(a) for a in (nl.mask, nl.src, nl.cell_offsets, nl.dist))
    for i in range(len(pos)):
        for k in range(src_np.shape[1]):
            if mask_np[i, k]:
                got[(i, int(src_np[i, k]), tuple(int(x) for x in off_np[i, k]))] = float(dist_np[i, k])
    want = brute_force_edges(pos, cell, reps, radius)
    # max_neighbors=64 is above the true degree here, so edge sets must match
    # exactly up to f32-vs-f64 boundary jitter right at the radius cutoff
    boundary = {k for k, d in want.items() if abs(d - radius) < 1e-3} | {
        k for k, d in got.items() if abs(d - radius) < 1e-3
    }
    assert set(got) - boundary == set(want) - boundary
    for key in set(got) & set(want):
        assert abs(got[key] - want[key]) < 2e-3


def test_radius_graph_cap_keeps_nearest(rng):
    pos, cell = make_system(rng, n=16)
    radius, k = 6.0, 4
    reps = compute_cell_reps(cell, radius)
    nl = radius_graph_pbc(
        jnp.asarray(pos), jnp.asarray(cell), jnp.ones(len(pos), bool),
        radius=radius, max_neighbors=k, reps=reps,
    )
    want = brute_force_edges(pos, cell, reps, radius)
    for i in range(len(pos)):
        dists_i = sorted(d for (t, s, o), d in want.items() if t == i)
        got_i = sorted(float(d) for d, m in zip(np.asarray(nl.dist[i]), np.asarray(nl.mask[i])) if m)
        assert len(got_i) == min(k, len(dists_i))
        np.testing.assert_allclose(got_i, dists_i[: len(got_i)], atol=2e-4)


def test_radius_graph_padding_excluded(rng):
    pos, cell = make_system(rng, n=8)
    pos_pad = np.concatenate([pos, np.zeros((4, 3), np.float32)])
    mask = np.array([True] * 8 + [False] * 4)
    reps = compute_cell_reps(cell, 5.0)
    nl = radius_graph_pbc(
        jnp.asarray(pos_pad), jnp.asarray(cell), jnp.asarray(mask),
        radius=5.0, max_neighbors=32, reps=reps,
    )
    nl_mask = np.asarray(nl.mask)
    src = np.asarray(nl.src)
    assert not nl_mask[8:].any()  # padded targets have no edges
    assert (src[nl_mask] < 8).all()  # no edges point at padded atoms


def test_radius_graph_vec_consistency(rng):
    pos, cell = make_system(rng)
    reps = compute_cell_reps(cell, 5.0)
    nl = radius_graph_pbc(
        jnp.asarray(pos), jnp.asarray(cell), jnp.ones(len(pos), bool),
        radius=5.0, max_neighbors=32, reps=reps,
    )
    d = np.linalg.norm(np.asarray(nl.vec), axis=-1)
    np.testing.assert_allclose(d[np.asarray(nl.mask)], np.asarray(nl.dist)[np.asarray(nl.mask)], rtol=1e-5, atol=1e-5)


def test_radius_graph_batched(rng):
    pos1, cell1 = make_system(rng)
    pos2, cell2 = make_system(rng)
    reps = compute_cell_reps(np.stack([cell1, cell2]), 5.0)
    nl = radius_graph_pbc_batched(
        jnp.stack([jnp.asarray(pos1), jnp.asarray(pos2)]),
        jnp.stack([jnp.asarray(cell1), jnp.asarray(cell2)]),
        jnp.ones((2, len(pos1)), bool),
        radius=5.0, max_neighbors=16, reps=reps,
    )
    single = radius_graph_pbc(
        jnp.asarray(pos2), jnp.asarray(cell2), jnp.ones(len(pos2), bool),
        radius=5.0, max_neighbors=16, reps=reps,
    )
    np.testing.assert_array_equal(np.asarray(nl.src[1]), np.asarray(single.src))
    np.testing.assert_allclose(np.asarray(nl.dist[1]), np.asarray(single.dist), atol=1e-6)


def test_frac_wrap_center_range(rng):
    cell = jnp.asarray(np.diag([5.0, 6.0, 30.0]).astype(np.float32))
    vec = jnp.asarray(rng.normal(0, 10, (32, 3)).astype(np.float32))
    w = frac_wrap_center(vec, cell)
    frac = np.asarray(w) @ np.linalg.inv(np.asarray(cell))
    assert (frac > -0.5 - 1e-5).all() and (frac <= 0.5 + 1e-5).all()
    # wrapping is idempotent
    np.testing.assert_allclose(np.asarray(frac_wrap_center(w, cell)), np.asarray(w), atol=1e-5)


def test_wrap_positions_lattice_invariant(rng):
    cell_np = (np.diag([5.0, 6.0, 30.0]) + rng.normal(0, 0.3, (3, 3)) * np.tri(3, 3, -1)).astype(np.float32)
    cell = jnp.asarray(cell_np)
    pos = jnp.asarray(rng.normal(0, 8, (16, 3)).astype(np.float32))
    w = wrap_positions(pos, cell)
    # difference must be an integer lattice combination (rows)
    frac_diff = (np.asarray(pos) - np.asarray(w)) @ np.linalg.inv(cell_np)
    np.testing.assert_allclose(frac_diff, np.round(frac_diff), atol=1e-4)
    frac = np.asarray(w) @ np.linalg.inv(cell_np)
    assert (frac >= -1e-5).all() and (frac < 1 + 1e-5).all()


def test_min_image_diff_small(rng):
    cell = jnp.asarray(np.diag([5.0, 5.0, 20.0]).astype(np.float32))
    target = jnp.asarray(rng.random((8, 3)).astype(np.float32) * 4)
    shift = jnp.asarray(np.array([5.0, -10.0, 0.0], np.float32))
    pred = target + shift + 0.01
    d = min_image_diff(pred, target, cell)
    np.testing.assert_allclose(np.asarray(d), 0.01 * np.ones((8, 3)), atol=1e-4)


def test_incremental_graph_matches_full(rng):
    """Incremental rebuild (static slab-slab + fresh adsorbate rows) must
    reproduce radius_graph_pbc exactly — including after the adsorbate moves
    away from the positions the static part was prepared at."""
    from adsorbdiff_tpu.ops.pbc import radius_graph_pbc_incremental, slab_static_topk

    pos, cell = make_system(rng, n=14)
    n = len(pos)
    ads = np.zeros(n, bool)
    ads[-3:] = True  # last 3 atoms are the adsorbate
    pos[-3:] += np.array([0.5, 0.5, 3.0], np.float32)
    atom_mask = np.ones(n, bool)
    atom_mask[-1] = False  # one padded slot inside the adsorbate block
    ads[-1] = False
    radius, k = 5.0, 10
    reps = compute_cell_reps(cell, radius)

    static = slab_static_topk(
        jnp.asarray(pos), jnp.asarray(cell), jnp.asarray(atom_mask), jnp.asarray(ads),
        radius=radius, max_neighbors=k, reps=reps,
    )
    # move the adsorbate, as the sampler does between steps
    moved = pos.copy()
    moved[-3:-1] += np.asarray(rng.normal(0, 1.5, (2, 3)), np.float32)

    for max_ads in (4, 8):
        inc = radius_graph_pbc_incremental(
            jnp.asarray(moved), jnp.asarray(cell), jnp.asarray(atom_mask), jnp.asarray(ads), static,
            radius=radius, max_neighbors=k, reps=reps, max_ads=max_ads,
        )
        full = radius_graph_pbc(
            jnp.asarray(moved), jnp.asarray(cell), jnp.asarray(atom_mask),
            radius=radius, max_neighbors=k, reps=reps,
        )
        np.testing.assert_array_equal(np.asarray(inc.mask), np.asarray(full.mask))
        np.testing.assert_array_equal(np.asarray(inc.src), np.asarray(full.src))
        np.testing.assert_array_equal(np.asarray(inc.cell_offsets), np.asarray(full.cell_offsets))
        np.testing.assert_allclose(np.asarray(inc.dist), np.asarray(full.dist), atol=1e-5)
        np.testing.assert_allclose(np.asarray(inc.vec), np.asarray(full.vec), atol=1e-5)


def test_incremental_graph_model_parity(rng):
    """PaiNN forward with static_graph == without, after adsorbate motion."""
    from adsorbdiff_tpu.data.schema import System, collate
    from adsorbdiff_tpu.models.base import prepare_static_graph
    from adsorbdiff_tpu.models.painn import PaiNN

    systems = []
    for i in range(2):
        cell = np.diag([8.0, 8.0, 24.0]).astype(np.float32)
        n_slab, n_ads = 10, 3
        slab = (rng.random((n_slab, 3)) * [1, 1, 0.3]) @ cell
        ads = rng.random((n_ads, 3)).astype(np.float32) + np.array([4, 4, 9], np.float32)
        pos = np.concatenate([slab, ads]).astype(np.float32)
        tags = np.array([0] * 5 + [1] * 5 + [2] * n_ads, np.int32)
        z = np.concatenate([rng.integers(20, 60, n_slab), rng.integers(1, 9, n_ads)])
        systems.append(System(pos=pos, atomic_numbers=z, cell=cell, tags=tags, sid=i))
    batch = collate(systems, max_atoms=16)

    kw = dict(hidden_channels=32, num_layers=2, num_rbf=8, cutoff=6.0, max_neighbors=12,
              cell_reps=(1, 1, 0), so3_denoising=True, max_ads=4)
    model = PaiNN(**kw)
    variables = model.init(jax.random.PRNGKey(0), batch)
    static = prepare_static_graph(batch, cutoff=6.0, max_neighbors=12, cell_reps=(1, 1, 0))
    # move adsorbate atoms
    delta = np.zeros(batch.pos.shape, np.float32)
    delta[np.asarray(batch.ads_mask)] = rng.normal(0, 0.8, (int(np.asarray(batch.ads_mask).sum()), 3))
    moved = batch.replace(pos=batch.pos + jnp.asarray(delta))

    ref = model.apply(variables, moved)
    inc = model.apply(variables, moved, static)
    np.testing.assert_allclose(np.asarray(inc[0]), np.asarray(ref[0]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(inc[1]), np.asarray(ref[1]), atol=1e-5, rtol=1e-5)


def _moved_ads(rng, batch):
    delta = np.zeros(batch.pos.shape, np.float32)
    delta[np.asarray(batch.ads_mask)] = rng.normal(0, 0.8, (int(np.asarray(batch.ads_mask).sum()), 3))
    return batch.replace(pos=batch.pos + jnp.asarray(delta))


def test_incremental_graph_eqv2_parity(rng):
    """EquiformerV2 forward with static_graph == without, after ads motion."""
    from adsorbdiff_tpu.models.equiformer_v2 import EquiformerV2
    from tests.test_equiformer_v2 import TINY
    from tests.test_painn import make_batch

    model = EquiformerV2(**TINY, so3_denoising=True, for_denoising=True, max_ads=8)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch)
    static = model.prepare_static(batch)
    moved = _moved_ads(rng, batch)

    ref = model.apply(variables, moved)
    inc = model.apply(variables, moved, static)
    np.testing.assert_allclose(np.asarray(inc[0]), np.asarray(ref[0]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(inc[1]), np.asarray(ref[1]), atol=1e-5, rtol=1e-5)


def test_incremental_graph_gemnet_parity(rng):
    """GemNet-OC forward with static_graph (3 sparse graphs) == without."""
    from adsorbdiff_tpu.models.gemnet_oc import GemNetOC
    from tests.test_gemnet_oc import TINY
    from tests.test_painn import make_batch

    model = GemNetOC(**TINY, mode="denoising", so3_denoising=True, max_ads=8)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch)
    static = model.prepare_static(batch)
    # aeaint/qint are derived as K-prefix views at TINY's equal cutoffs
    assert set(static) == {"main"}
    moved = _moved_ads(rng, batch)

    ref = model.apply(variables, moved)
    inc = model.apply(variables, moved, static)
    np.testing.assert_allclose(np.asarray(inc[0]), np.asarray(ref[0]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(inc[1]), np.asarray(ref[1]), atol=1e-5, rtol=1e-5)


def test_auto_cell_reps_vacuum_pruning(rng):
    """auto reps: reciprocal geometry + vacuum pruning; conservative on
    boundary-straddling bands."""
    from adsorbdiff_tpu.ops.pbc import auto_cell_reps, compute_cell_reps

    cell = np.diag([11.4, 11.4, 36.0])
    slab = rng.random((20, 3)) * [11.4, 11.4, 15.0]  # 21 A vacuum > cutoff 12
    assert auto_cell_reps([slab], [cell], 12.0) == (2, 2, 0)
    # plain reciprocal geometry would keep the z image
    assert compute_cell_reps(cell, 12.0)[2] == 1

    # atoms filling the cell: no vacuum anywhere -> no pruning
    dense = rng.random((20, 3)) @ cell
    assert auto_cell_reps([dense], [cell], 12.0) == compute_cell_reps(cell, 12.0)

    # band straddling the z boundary: wrapped extent overestimates -> images kept
    straddle = rng.random((20, 3)) * [11.4, 11.4, 6.0]
    straddle[:, 2] = (straddle[:, 2] - 3.0) % 36.0
    assert auto_cell_reps([straddle], [cell], 12.0)[2] == 1

    # elementwise max over systems
    assert auto_cell_reps([slab, dense], [cell, cell], 12.0) == compute_cell_reps(cell, 12.0)


def test_trainer_resolves_auto_cell_reps(tmp_path, rng):
    from adsorbdiff_tpu.data.schema import System
    from adsorbdiff_tpu.data.store import write_shard
    from adsorbdiff_tpu.train.trainer import DenoisingTrainer

    systems = []
    for i in range(4):
        n = 12
        cell = np.diag([9.0, 9.0, 30.0]).astype(np.float32)
        pos = (rng.random((n, 3)) * [9, 9, 8]).astype(np.float32)
        systems.append(System(pos=pos, atomic_numbers=rng.integers(1, 30, n),
                              cell=cell, tags=np.array([0]*4 + [1]*4 + [2]*4, np.int32), sid=i))
    write_shard(str(tmp_path / "d"), systems)
    config = dict(
        model=dict(name="painn", hidden_channels=16, num_layers=1, num_rbf=8,
                   cutoff=6.0, max_neighbors=8, so3_denoising=True, cell_reps="auto"),
        dataset=[{"src": str(tmp_path / "d")}],
        optim=dict(batch_size=2, lr_initial=1e-4, use_denoising_pos=True,
                   denoising_pos_params=dict(num_steps=4, ads_std_low=0.1, ads_std_high=10,
                                             rot_std_low=0.01, rot_std_high=1.55)),
        task={}, seed=0, is_debug=True,
    )
    tr = DenoisingTrainer(config)
    # 9 A cell, 6 A cutoff -> 1 in-plane image; 22 A z-vacuum prunes z
    assert tr.model_cfg["cell_reps"] == (1, 1, 0)
    assert tr.model.cell_reps == (1, 1, 0)


def test_derive_subgraph_exact(rng):
    """A K-prefix view of the big table == the independently built sub-graph
    (same candidate axis, nearest-first top-k) — field-for-field."""
    from adsorbdiff_tpu.models.base import derive_subgraph, generate_graph
    from tests.test_painn import make_batch

    batch = make_batch(rng)
    big, _, _ = generate_graph(batch, cutoff=6.0, max_neighbors=12, cell_reps=(1, 1, 0))
    for k_sub, cut_sub in [(8, 6.0), (8, 4.5), (4, 3.0), (12, 5.0)]:
        ref, ref_d, ref_u = generate_graph(batch, cutoff=cut_sub, max_neighbors=k_sub, cell_reps=(1, 1, 0))
        got, got_d, got_u = derive_subgraph(big, max_neighbors=k_sub, cutoff=cut_sub)
        np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(ref.mask))
        np.testing.assert_array_equal(np.asarray(got.src), np.asarray(ref.src))
        np.testing.assert_array_equal(np.asarray(got.cell_offsets) * np.asarray(got.mask)[..., None],
                                      np.asarray(ref.cell_offsets) * np.asarray(ref.mask)[..., None])
        np.testing.assert_allclose(np.asarray(got.dist), np.asarray(ref.dist), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got.vec), np.asarray(ref.vec), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u), atol=1e-6)


def test_candidate_refresh_exact(rng):
    """Verlet candidate refresh == the full builder while the displacement
    margin holds (see ops/pbc.py::CandidateTable) — bit-exact."""
    from adsorbdiff_tpu.ops.pbc import (
        candidate_topk_batched,
        radius_graph_pbc_batched,
        refresh_from_candidates_batched,
    )
    from tests.test_painn import make_batch

    batch = make_batch(rng)
    cand = candidate_topk_batched(
        batch.pos, batch.cell, batch.atom_mask, k_cand=24, max_neighbors=8, reps=(1, 1, 0)
    )
    margin = float(np.asarray(cand.margin).min())
    assert margin > 0
    # per-atom displacement delta keeps 4*delta < margin -> exactness holds
    delta = margin / 4 * 0.9
    step = rng.uniform(-1, 1, batch.pos.shape).astype(np.float32)
    step *= delta / np.linalg.norm(step, axis=-1, keepdims=True).max()
    pos2 = batch.pos + jnp.asarray(step)
    ref = radius_graph_pbc_batched(
        pos2, batch.cell, batch.atom_mask, radius=6.0, max_neighbors=8, reps=(1, 1, 0)
    )
    got = refresh_from_candidates_batched(pos2, batch.cell, cand, radius=6.0, max_neighbors=8)
    for name in ["src", "mask", "dist", "vec"]:
        np.testing.assert_array_equal(np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)))
    # a smaller cutoff applied at refresh time is exact too (radius-free table)
    ref2 = radius_graph_pbc_batched(
        pos2, batch.cell, batch.atom_mask, radius=4.0, max_neighbors=6, reps=(1, 1, 0)
    )
    got2 = refresh_from_candidates_batched(pos2, batch.cell, cand, radius=4.0, max_neighbors=6)
    np.testing.assert_array_equal(np.asarray(got2.src), np.asarray(ref2.src))
    np.testing.assert_array_equal(np.asarray(got2.mask), np.asarray(ref2.mask))


def test_neighbor_cap_binding_dense_crystal(rng):
    """VERDICT round-4 missing #3 closure: quantify the cap semantics on a
    fixture where the cap BINDS (>50 in-radius periodic neighbors per atom).

    Finding (documented in ops/pbc.py): the published reference runs use the
    DEFAULT ``enforce_max_neighbors_strictly=True`` (ref: models/base.py:56,
    gemnet_oc.py:221, equiformer_v2_oc20.py:164; no config overrides it) —
    the same strict nearest-K our builder implements, with ties at the K-th
    distance broken arbitrarily ON BOTH SIDES (ref docstring:
    equiformer_v2_oc20.py:112).  So on the production path there is NO
    semantic divergence to quantify; this asserts the strict contract where
    it binds: exactly K kept, every kept distance <= every dropped distance
    (up to f32 tie jitter), and a tolerance-K builder recovers the
    degenerate tail."""
    # compact FCC-ish crystal: 4-atom cubic cell, radius spanning ~3 shells
    a0 = 3.6
    frac = np.array([[0, 0, 0], [0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]], np.float32)
    cell = (np.eye(3) * a0).astype(np.float32)
    pos = (frac @ cell).astype(np.float32)
    radius, k = 7.3, 30
    reps = compute_cell_reps(cell, radius)
    want = brute_force_edges(pos, cell, reps, radius)
    degree = {i: sorted(d for (t, _, _), d in want.items() if t == i) for i in range(4)}
    assert min(len(v) for v in degree.values()) > 50  # the cap truly binds

    nl = radius_graph_pbc(
        jnp.asarray(pos), jnp.asarray(cell), jnp.ones(4, bool),
        radius=radius, max_neighbors=k, reps=reps,
    )
    dist = np.asarray(nl.dist)
    mask = np.asarray(nl.mask)
    for i in range(4):
        kept = sorted(float(d) for d, m in zip(dist[i], mask[i]) if m)
        assert len(kept) == k
        # strict nearest-K: kept distances == the brute-force K smallest
        np.testing.assert_allclose(kept, degree[i][:k], atol=2e-4)
        # the K-th shell is degenerate here — quantify what strict top-K cuts
        dropped_at_tie = sum(1 for d in degree[i][k:] if d - degree[i][k - 1] < 1e-3)
        assert dropped_at_tie > 0  # the fixture exercises a real tie
        # the documented recovery: a larger cap keeps the whole tied shell
        nl_wide = radius_graph_pbc(
            jnp.asarray(pos), jnp.asarray(cell), jnp.ones(4, bool),
            radius=radius, max_neighbors=k + dropped_at_tie, reps=reps,
        )
        kept_w = sorted(float(d) for d, m in zip(np.asarray(nl_wide.dist)[i], np.asarray(nl_wide.mask)[i]) if m)
        np.testing.assert_allclose(kept_w, degree[i][: k + dropped_at_tie], atol=2e-4)
