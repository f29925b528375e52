"""GemNet-OC: shapes, invariance/equivariance, padding, grads, denoising heads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from adsorbdiff_tpu.models.gemnet_oc import GemNetOC, legendre_y_l0
from tests.test_painn import make_batch

TINY = dict(
    num_spherical=4,
    num_radial=12,
    num_blocks=2,
    emb_size_atom=32,
    emb_size_edge=48,
    emb_size_trip_in=12,
    emb_size_trip_out=12,
    emb_size_quad_in=8,
    emb_size_quad_out=8,
    emb_size_aint_in=12,
    emb_size_aint_out=12,
    emb_size_rbf=8,
    emb_size_cbf=8,
    emb_size_sbf=8,
    num_before_skip=1,
    num_after_skip=1,
    num_concat=1,
    num_atom=1,
    num_output_afteratom=1,
    num_atom_emb_layers=1,
    num_global_out_layers=1,
    cutoff=6.0,
    cutoff_qint=6.0,
    cutoff_aeaint=6.0,
    cutoff_aint=6.0,
    max_neighbors=12,
    max_neighbors_qint=4,
    max_neighbors_aeaint=8,
    cell_reps=(1, 1, 0),
)


@pytest.fixture(scope="module")
def model_and_params():
    model = GemNetOC(**TINY)
    rng = np.random.default_rng(3)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch)
    return model, variables


def test_legendre_basis():
    cos = jnp.asarray([-1.0, 0.0, 0.5, 1.0])
    y = np.asarray(legendre_y_l0(cos, 4))
    assert y.shape == (4, 4)
    # P_0 = 1, P_1 = x, P_2 = (3x^2-1)/2 with Y_l0 normalization
    np.testing.assert_allclose(y[:, 0], np.sqrt(1 / (4 * np.pi)), atol=1e-6)
    np.testing.assert_allclose(y[2, 1], np.sqrt(3 / (4 * np.pi)) * 0.5, atol=1e-6)
    np.testing.assert_allclose(y[2, 2], np.sqrt(5 / (4 * np.pi)) * (3 * 0.25 - 1) / 2, atol=1e-6)


def test_forward_shapes_and_padding(model_and_params, rng):
    model, variables = model_and_params
    batch = make_batch(rng)
    out = model.apply(variables, batch)
    assert out["energy"].shape == (2,)
    assert out["forces"].shape == (2, 24, 3)
    assert np.isfinite(np.asarray(out["energy"])).all()
    assert np.abs(np.asarray(out["forces"])[:, 20:]).max() == 0  # padded rows zero


def test_energy_invariance_forces_equivariance(model_and_params, rng):
    model, variables = model_and_params
    batch = make_batch(rng)
    out = model.apply(variables, batch)
    r = jnp.asarray(Rotation.random(random_state=11).as_matrix().astype(np.float32))
    rot = batch.replace(
        pos=jnp.einsum("bnd,ed->bne", batch.pos, r),
        cell=jnp.einsum("bnd,ed->bne", batch.cell, r),
    )
    out_r = model.apply(variables, rot)
    np.testing.assert_allclose(np.asarray(out_r["energy"]), np.asarray(out["energy"]), rtol=2e-4, atol=2e-4)
    want_f = np.einsum("bnd,ed->bne", np.asarray(out["forces"]), np.asarray(r))
    np.testing.assert_allclose(np.asarray(out_r["forces"]), want_f, atol=5e-4)
    # translation invariance
    out_t = model.apply(variables, batch.replace(pos=batch.pos + jnp.asarray([1.0, -2.0, 0.7])))
    np.testing.assert_allclose(np.asarray(out_t["energy"]), np.asarray(out["energy"]), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_a2a_supercell_size_consistency():
    """Energy must be size-consistent under a 2x1 in-plane supercell: every
    atom keeps an identical periodic environment, so E doubles exactly.  This
    discriminates the a2a periodic-image handling — with home-cell-only a2a
    pairs (pre-fix), boundary atoms see different aint sets in the supercell
    (ref: gemnet_oc.py max_neighbors_aint: 1000 under full PBC)."""
    from adsorbdiff_tpu.data.schema import System, collate

    cell = np.diag([4.0, 4.0, 30.0]).astype(np.float32)
    pos1 = np.array(
        [[0.2, 0.3, 5.0], [2.1, 2.2, 5.1], [1.0, 3.0, 6.4], [3.3, 1.1, 7.6]], np.float32
    )
    z1 = np.array([29, 29, 29, 8], np.int32)
    tags1 = np.array([0, 0, 1, 2], np.int32)

    cell2 = cell.copy()
    cell2[0, 0] *= 2
    pos2 = np.concatenate([pos1, pos1 + np.array([4.0, 0, 0], np.float32)])

    def batch_of(pos, z, tags, c):
        sys = System(pos=pos, atomic_numbers=z, cell=c, tags=tags,
                     fixed=tags == 0, sid=0, pos_relaxed=pos)
        return collate([sys], max_atoms=len(pos) + 2)

    kw = dict(TINY)
    # cap-free neighbor tables + reps that cover the cutoffs in both cells
    kw.update(cutoff=3.5, cutoff_qint=3.5, cutoff_aeaint=3.5, cutoff_aint=6.0,
              max_neighbors=16, max_neighbors_aeaint=16, max_neighbors_qint=8,
              cell_reps=(2, 2, 0))
    model = GemNetOC(**kw)
    b1 = batch_of(pos1, z1, tags1, cell)
    b2 = batch_of(pos2, np.tile(z1, 2), np.tile(tags1, 2), cell2)
    variables = model.init(jax.random.PRNGKey(0), b1)
    e1 = float(model.apply(variables, b1)["energy"][0])
    out2 = model.apply(variables, b2)
    e2 = float(out2["energy"][0])
    assert e2 == pytest.approx(2 * e1, rel=2e-3), (e1, e2)
    # forces replicate across the supercell copies
    f2 = np.asarray(out2["forces"])[0]
    np.testing.assert_allclose(f2[:4], f2[4:8], atol=5e-4)


@pytest.mark.slow
def test_padding_invariance(rng):
    model = GemNetOC(**TINY)
    rng1 = np.random.default_rng(7)
    b24 = make_batch(rng1)
    variables = model.init(jax.random.PRNGKey(1), b24)
    rng1 = np.random.default_rng(9)
    b24 = make_batch(rng1)
    rng1 = np.random.default_rng(9)
    b40 = make_batch(rng1, n_pad=40)
    o24 = model.apply(variables, b24)
    o40 = model.apply(variables, b40)
    np.testing.assert_allclose(np.asarray(o40["energy"]), np.asarray(o24["energy"]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o40["forces"])[:, :24], np.asarray(o24["forces"]), atol=1e-4)


def test_gradients_finite(model_and_params, rng):
    model, variables = model_and_params
    batch = make_batch(rng)

    def loss(params):
        out = model.apply({"params": params, "scale_factors": variables.get("scale_factors", {})}, batch)
        return jnp.sum(out["energy"] ** 2) + jnp.sum(out["forces"] ** 2)

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in flat)


def test_denoising_mode_two_heads(rng):
    model = GemNetOC(**TINY, mode="denoising", so3_denoising=True)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(2), batch)
    f1, f2 = model.apply(variables, batch)
    assert f1.shape == (2, 24, 3) and f2.shape == (2, 24, 3)
    assert np.abs(np.asarray(f1) - np.asarray(f2)).max() > 1e-8  # distinct heads


def test_interactions_toggle(rng):
    """All-off vs all-on changes outputs; both run."""
    batch = make_batch(rng)
    base = dict(TINY)
    m_off = GemNetOC(**base, quad_interaction=False, atom_edge_interaction=False,
                     edge_atom_interaction=False, atom_interaction=False)
    v_off = m_off.init(jax.random.PRNGKey(3), batch)
    out_off = m_off.apply(v_off, batch)
    assert np.isfinite(np.asarray(out_off["energy"])).all()


def test_reverse_edge_table(rng):
    """Every edge's reverse is found at (src row, matching slot), and the
    reverse relation is an involution wherever both directions are in-table."""
    from adsorbdiff_tpu.models.gemnet_oc import _reverse_edge_table
    from adsorbdiff_tpu.ops.pbc import radius_graph_pbc_batched

    batch = make_batch(rng)
    # max_neighbors above the true degree: the radius graph is then symmetric
    nl = radius_graph_pbc_batched(
        batch.pos, batch.cell, batch.atom_mask, radius=5.0, max_neighbors=64, reps=(1, 1, 0)
    )
    rev_flat, rev_valid = _reverse_edge_table(nl)
    src, off, mask = (np.asarray(a) for a in (nl.src, nl.cell_offsets, nl.mask))
    rf, rv = np.asarray(rev_flat), np.asarray(rev_valid)
    b_, n_, k_ = src.shape
    checked = 0
    for b in range(b_):
        for i in range(n_):
            for k in range(k_):
                if not mask[b, i, k]:
                    assert not rv[b, i, k]
                    continue
                # with max_neighbors above the true degree, the radius graph is
                # symmetric, so every edge's reverse must be found
                assert rv[b, i, k], (b, i, k)
                j, kk = rf[b, i, k] // k_, rf[b, i, k] % k_
                assert j == src[b, i, k]
                assert src[b, j, kk] == i
                np.testing.assert_array_equal(off[b, j, kk], -off[b, i, k])
                # involution
                assert rf[b, j, kk] == i * k_ + k
                checked += 1
    assert checked > 50


def test_symmetric_mp_toggles_output(rng, model_and_params):
    """symmetric_mp must be live: grafting the symmetric tree's shared params
    into the asymmetric variant changes the forward."""
    model, variables = model_and_params
    batch = make_batch(rng)
    out_sym = model.apply(variables, batch)

    model_off = GemNetOC(**TINY, symmetric_mp=False)
    v_off = model_off.init(jax.random.PRNGKey(0), batch)
    # shared-param graft: the asymmetric tree is a subset of the symmetric one
    import flax

    flat_sym = flax.traverse_util.flatten_dict(variables)
    flat_off = flax.traverse_util.flatten_dict(v_off)
    grafted = flax.traverse_util.unflatten_dict({k: flat_sym[k] for k in flat_off})
    out_off = model_off.apply(grafted, batch)
    d = np.abs(np.asarray(out_sym["forces"]) - np.asarray(out_off["forces"])).max()
    assert d > 1e-6


def test_compute_dtype_bf16(model_and_params, rng):
    """--amp path: feature matmuls in bf16, f32 params/outputs, results close
    to the f32 forward (replaces torch.cuda.amp autocast)."""
    model, variables = model_and_params
    batch = make_batch(rng)
    out32 = model.apply(variables, batch)
    m16 = GemNetOC(**TINY, compute_dtype="bfloat16")
    out16 = m16.apply(variables, batch)
    assert out16["energy"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out16["forces"])).all()
    scale = np.abs(np.asarray(out32["forces"])).max()
    np.testing.assert_allclose(
        np.asarray(out16["forces"]), np.asarray(out32["forces"]), atol=0.05 * scale + 1e-6
    )
    # same param pytree (bf16 is compute-only)
    v16 = m16.init(jax.random.PRNGKey(0), batch)
    assert jax.tree.structure(v16["params"]) == jax.tree.structure(variables["params"])
