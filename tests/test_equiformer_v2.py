"""EquiformerV2: shapes, equivariance, padding, conditioning, s2ef mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from adsorbdiff_tpu.models.equiformer_v2 import EquiformerV2
from tests.test_painn import make_batch

TINY = dict(
    num_layers=2,
    sphere_channels=16,
    attn_hidden_channels=16,
    num_heads=2,
    attn_alpha_channels=8,
    attn_value_channels=4,
    ffn_hidden_channels=16,
    lmax=2,
    mmax=1,
    # res >= ~2.5x lmax keeps S2-grid aliasing (the only approximate-equivariance
    # source, same class as the reference's e3nn grids) below f32 noise
    grid_resolution=16,
    edge_channels=16,
    num_distance_basis=16,
    cutoff=6.0,
    max_neighbors=12,
    cell_reps=(1, 1, 0),
)


@pytest.fixture(scope="module")
def model_and_params():
    model = EquiformerV2(**TINY, so3_denoising=True, for_denoising=True)
    rng = np.random.default_rng(3)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch)
    return model, variables


def test_forward_shapes(model_and_params, rng):
    model, variables = model_and_params
    batch = make_batch(rng)
    f1, f2 = model.apply(variables, batch)
    assert f1.shape == (2, 24, 3) and f2.shape == (2, 24, 3)
    assert np.isfinite(np.asarray(f1)).all()
    assert np.abs(np.asarray(f1)[:, 20:]).max() == 0
    assert np.abs(np.asarray(f1) - np.asarray(f2)).max() > 1e-9


def test_rotation_equivariance(model_and_params, rng):
    model, variables = model_and_params
    batch = make_batch(rng)
    f1, f2 = model.apply(variables, batch)
    r = jnp.asarray(Rotation.random(random_state=12).as_matrix().astype(np.float32))
    rot = batch.replace(
        pos=jnp.einsum("bnd,ed->bne", batch.pos, r),
        cell=jnp.einsum("bnd,ed->bne", batch.cell, r),
    )
    g1, g2 = model.apply(variables, rot)
    np.testing.assert_allclose(np.asarray(g1), np.einsum("bnd,ed->bne", np.asarray(f1), np.asarray(r)), atol=3e-4)
    np.testing.assert_allclose(np.asarray(g2), np.einsum("bnd,ed->bne", np.asarray(f2), np.asarray(r)), atol=3e-4)


def test_translation_invariance(model_and_params, rng):
    model, variables = model_and_params
    batch = make_batch(rng)
    f1, _ = model.apply(variables, batch)
    g1, _ = model.apply(variables, batch.replace(pos=batch.pos + jnp.asarray([0.9, -1.7, 2.2])))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(f1), atol=3e-4)


def test_padding_invariance(rng):
    model = EquiformerV2(**TINY, so3_denoising=False, for_denoising=False)
    rng1 = np.random.default_rng(7)
    b24 = make_batch(rng1)
    variables = model.init(jax.random.PRNGKey(1), b24)
    rng1 = np.random.default_rng(9)
    b24 = make_batch(rng1)
    rng1 = np.random.default_rng(9)
    b40 = make_batch(rng1, n_pad=40)
    f24 = model.apply(variables, b24)
    f40 = model.apply(variables, b40)
    np.testing.assert_allclose(np.asarray(f40)[:, :24], np.asarray(f24), atol=2e-4)


def test_s2ef_mode(rng):
    model = EquiformerV2(**TINY, mode="s2ef")
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(2), batch)
    out = model.apply(variables, batch)
    assert out["energy"].shape == (2,)
    r = jnp.asarray(Rotation.random(random_state=5).as_matrix().astype(np.float32))
    rot = batch.replace(pos=jnp.einsum("bnd,ed->bne", batch.pos, r), cell=jnp.einsum("bnd,ed->bne", batch.cell, r))
    out_r = model.apply(variables, rot)
    np.testing.assert_allclose(np.asarray(out_r["energy"]), np.asarray(out["energy"]), rtol=1e-4, atol=1e-4)


def test_energy_conditioning(rng):
    model = EquiformerV2(**TINY, so3_denoising=False, for_denoising=False, energy_encoding="scalar")
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(4), batch)
    f_a = model.apply(variables, batch)
    f_b = model.apply(variables, batch.replace(energy=batch.energy + 2.0))
    assert np.abs(np.asarray(f_a) - np.asarray(f_b)).max() > 1e-7
    model_s = EquiformerV2(**TINY, so3_denoising=False, for_denoising=False,
                           energy_encoding="scalar", sampling=True)
    f_c = model_s.apply(variables, batch)
    f_d = model_s.apply(variables, batch.replace(energy=batch.energy + 2.0))
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_d), atol=0)


@pytest.mark.slow
def test_dropout_train_eval(model_and_params, rng):
    """alpha_drop / drop_path / proj_drop: stochastic in train mode (keyed off
    the flax 'dropout' RNG), exactly off at eval, params shared between the
    train and eval instances (ref: equiformer_v2/drop.py:13-151)."""
    model, variables = model_and_params
    batch = make_batch(rng)
    drop = dict(alpha_drop=0.3, drop_path_rate=0.3, proj_drop=0.3)
    train_model = EquiformerV2(**TINY, so3_denoising=True, for_denoising=True,
                               training=True, **drop)
    eval_model = EquiformerV2(**TINY, so3_denoising=True, for_denoising=True,
                              training=False, **drop)

    # same param pytree — the regularizers hold no params
    tv = train_model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch)
    assert jax.tree.structure(tv["params"]) == jax.tree.structure(variables["params"])

    a1, _ = train_model.apply(variables, batch, rngs={"dropout": jax.random.PRNGKey(10)})
    a2, _ = train_model.apply(variables, batch, rngs={"dropout": jax.random.PRNGKey(11)})
    assert np.abs(np.asarray(a1) - np.asarray(a2)).max() > 1e-6  # stochastic
    # same key → deterministic
    a1b, _ = train_model.apply(variables, batch, rngs={"dropout": jax.random.PRNGKey(10)})
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a1b), atol=0)

    # eval: bit-identical to the rate-0 baseline, no RNG needed
    e1, _ = eval_model.apply(variables, batch)
    f1, _ = model.apply(variables, batch)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(f1), atol=0)

    # grads flow through the stochastic forward
    def loss(params):
        f1, f2 = train_model.apply({"params": params}, batch, rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.sum(f1**2) + jnp.sum(f2**2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_gradients_finite(model_and_params, rng):
    model, variables = model_and_params
    batch = make_batch(rng)

    def loss(params):
        f1, f2 = model.apply({"params": params}, batch)
        return jnp.sum(f1**2) + jnp.sum(f2**2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_compute_dtype_bf16(model_and_params, rng):
    """--amp path: SO(2)-conv/grid-FFN matmuls in bf16, f32 outputs close to
    the full-precision forward."""
    model, variables = model_and_params
    batch = make_batch(rng)
    f32, _ = model.apply(variables, batch)
    m16 = EquiformerV2(**TINY, so3_denoising=True, for_denoising=True, compute_dtype="bfloat16")
    f16, _ = m16.apply(variables, batch)
    assert f16.dtype == jnp.float32
    assert np.isfinite(np.asarray(f16)).all()
    scale = np.abs(np.asarray(f32)).max()
    np.testing.assert_allclose(np.asarray(f16), np.asarray(f32), atol=0.05 * scale + 1e-6)
    v16 = m16.init(jax.random.PRNGKey(0), batch)
    assert jax.tree.structure(v16["params"]) == jax.tree.structure(variables["params"])


def test_grid_mode_e3nn(model_and_params, rng):
    """grid_mode="e3nn" (the checkpoint-import quadrature: soft midpoint grid
    + e3nn component per-l scale, so3.s2_grid_matrices) runs the SAME params,
    stays equivariant, and genuinely changes the function (the quadrature of
    the non-bandlimited silu projection is part of the model)."""
    model, variables = model_and_params
    batch = make_batch(rng)
    f1, _ = model.apply(variables, batch)
    m_e3 = EquiformerV2(**TINY, so3_denoising=True, for_denoising=True, grid_mode="e3nn")
    g1, g2 = m_e3.apply(variables, batch)
    assert np.isfinite(np.asarray(g1)).all() and np.isfinite(np.asarray(g2)).all()
    d, ref = np.abs(np.asarray(g1) - np.asarray(f1)).max(), np.abs(np.asarray(f1)).max()
    assert d > 1e-6  # different quadrature => different function
    assert d < 10 * ref  # but the same model up to S^2-act differences
    r = jnp.asarray(Rotation.random(random_state=5).as_matrix().astype(np.float32))
    rot = batch.replace(
        pos=jnp.einsum("bnd,ed->bne", batch.pos, r),
        cell=jnp.einsum("bnd,ed->bne", batch.cell, r),
    )
    h1, _ = m_e3.apply(variables, rot)
    np.testing.assert_allclose(
        np.asarray(h1), np.einsum("bnd,ed->bne", np.asarray(g1), np.asarray(r)), atol=3e-4)
