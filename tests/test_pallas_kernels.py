"""Pallas kernels vs XLA reference implementations (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adsorbdiff_tpu.models.layers import gaussian_basis, polynomial_envelope
from adsorbdiff_tpu.ops.pallas_kernels import fused_rbf_filter


def xla_reference(dist, mask, weights, bias, cutoff, exponent=5):
    d_scaled = dist / cutoff
    env = polynomial_envelope(d_scaled, exponent)
    basis = gaussian_basis(d_scaled, 0.0, 1.0, weights.shape[0]) * env[..., None]
    filt = basis @ weights + bias
    return jnp.where(mask[..., None], filt, 0.0)


@pytest.mark.parametrize("shape", [(3, 10, 8), (127,), (2, 5, 50)])
def test_fused_rbf_filter_matches_xla(rng, shape):
    cutoff = 6.0
    num_radial, f = 16, 128
    dist = jnp.asarray(rng.uniform(0, cutoff * 1.2, shape).astype(np.float32))
    mask = jnp.asarray(rng.random(shape) > 0.3)
    w = jnp.asarray(rng.normal(0, 0.3, (num_radial, f)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, f).astype(np.float32))

    want = np.asarray(xla_reference(dist, mask, w, b, cutoff))
    got = np.asarray(fused_rbf_filter(dist, mask, w, b, cutoff=cutoff, tile=128))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_fused_rbf_filter_beyond_cutoff_zero(rng):
    """Envelope zeroes the basis beyond the cutoff even on unmasked edges."""
    cutoff = 5.0
    dist = jnp.asarray([[cutoff * 1.5, cutoff * 0.5]], jnp.float32)
    mask = jnp.asarray([[True, True]])
    w = jnp.ones((8, 128), jnp.float32)
    b = jnp.zeros(128, jnp.float32)
    out = np.asarray(fused_rbf_filter(dist, mask, w, b, cutoff=cutoff, tile=128))
    assert np.abs(out[0, 0]).max() == 0.0
    assert np.abs(out[0, 1]).max() > 0.0


def test_painn_message_consumer_matches_xla_path(rng):
    """Full-model parity: use_pallas=True == use_pallas=False (f32)."""
    import jax

    from adsorbdiff_tpu.models.painn import PaiNN
    from tests.test_painn import MODEL_KW, make_batch

    batch = make_batch(rng)
    m_ref = PaiNN(**MODEL_KW, so3_denoising=True)
    variables = m_ref.init(jax.random.PRNGKey(0), batch)
    m_pal = PaiNN(**MODEL_KW, so3_denoising=True, use_pallas=True, sampling=True)
    f_ref = m_ref.apply(variables, batch)
    f_pal = m_pal.apply(variables, batch)
    np.testing.assert_allclose(np.asarray(f_pal[0]), np.asarray(f_ref[0]), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f_pal[1]), np.asarray(f_ref[1]), atol=5e-5, rtol=1e-4)


def test_painn_training_grads_through_pallas_match_xla(rng):
    """Full-model training parity: param gradients with use_pallas=True
    (custom-VJP kernel, training mode) match the XLA path."""
    import jax

    from adsorbdiff_tpu.models.painn import PaiNN
    from tests.test_painn import MODEL_KW, make_batch

    batch = make_batch(rng)
    m_ref = PaiNN(**MODEL_KW, so3_denoising=True)
    m_pal = PaiNN(**MODEL_KW, so3_denoising=True, use_pallas=True)  # NOT sampling
    variables = m_ref.init(jax.random.PRNGKey(0), batch)

    def loss(model):
        def f(params):
            f1, f2 = model.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}}, batch)
            return jnp.mean(f1**2) + jnp.mean(f2**2)

        return f

    g_ref = jax.grad(loss(m_ref))(variables["params"])
    g_pal = jax.grad(loss(m_pal))(variables["params"])
    flat_ref = jax.tree.leaves(g_ref)
    flat_pal = jax.tree.leaves(g_pal)
    assert len(flat_ref) == len(flat_pal)
    for a, b in zip(flat_pal, flat_ref):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=1e-5 + 1e-3 * np.abs(b).max())


def test_tiled_consumer_matches_single(rng):
    from adsorbdiff_tpu.ops.pallas_kernels import painn_message_consumer, painn_message_consumer_tiled

    m, k, r, h = 13, 10, 16, 64  # deliberately non-multiple of ti
    dist = jnp.asarray(rng.uniform(0, 7, (m, k)).astype(np.float32))
    mask = jnp.asarray(rng.random((m, k)) > 0.2)
    unit = jnp.asarray(rng.normal(0, 1, (m, k, 3)).astype(np.float32))
    xh = jnp.asarray(rng.normal(0, 1, (m, k, 3 * h)).astype(np.float32))
    vec = jnp.asarray(rng.normal(0, 1, (m, k, 3 * h)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (r, 3 * h)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, 3 * h).astype(np.float32))
    dx1, dv1 = painn_message_consumer(dist, mask, unit, xh, vec, w, b, cutoff=6.0)
    dx2, dv2 = painn_message_consumer_tiled(dist, mask, unit, xh, vec, w, b, cutoff=6.0, ti=8)
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx1), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dv2), np.asarray(dv1), atol=1e-4, rtol=1e-4)


def test_fused_gather_kernel_matches_tiled(rng):
    """painn_message_fused (gather-in-kernel) == tiled consumer fed by an
    explicit XLA gather, on ragged shapes (n not a multiple of ti)."""
    from adsorbdiff_tpu.ops.pallas_kernels import painn_message_consumer_tiled, painn_message_fused

    b, n, k, r, h = 2, 13, 10, 16, 64
    src = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    dist = jnp.asarray(rng.uniform(0, 7, (b, n, k)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, n, k)) > 0.2)
    unit = jnp.asarray(rng.normal(0, 1, (b, n, k, 3)).astype(np.float32))
    xh = jnp.asarray(rng.normal(0, 1, (b, n, 3 * h)).astype(np.float32))
    vec = jnp.asarray(rng.normal(0, 1, (b, n, 3 * h)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (r, 3 * h)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, 3 * h).astype(np.float32))

    xh_g = jnp.take_along_axis(xh, src.reshape(b, n * k)[..., None], axis=1).reshape(b * n, k, 3 * h)
    vec_g = jnp.take_along_axis(vec, src.reshape(b, n * k)[..., None], axis=1).reshape(b * n, k, 3 * h)
    dx_ref, dv_ref = painn_message_consumer_tiled(
        dist.reshape(b * n, k), mask.reshape(b * n, k), unit.reshape(b * n, k, 3),
        xh_g, vec_g, w, bias, cutoff=6.0, ti=8,
    )
    dx, dv = painn_message_fused(xh, vec, src, dist, mask, unit, w, bias, cutoff=6.0, ti=8)
    np.testing.assert_allclose(np.asarray(dx).reshape(b * n, h), np.asarray(dx_ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dv).reshape(b * n, 3, h), np.asarray(dv_ref), atol=1e-4, rtol=1e-4)


def _jnp_message_reference(xh, vec, src, dist, mask, unit, w, bias, cutoff, exponent=5):
    """Pure-jnp forward of painn_message_fused for autodiff comparison."""
    b, n, k = src.shape
    f3 = w.shape[1]
    h = f3 // 3
    d = dist / cutoff
    p = float(exponent)
    env = 1 + (-(p + 1) * (p + 2) / 2) * d**p + p * (p + 2) * d ** (p + 1) + (-p * (p + 1) / 2) * d ** (p + 2)
    env = jnp.where(d < 1.0, env, 0.0)
    r = w.shape[0]
    offs = jnp.arange(r) / (r - 1)
    basis = jnp.exp(-0.5 * (r - 1) ** 2 * (d[..., None] - offs) ** 2) * env[..., None]
    filt = jnp.where(mask[..., None], basis @ w + bias, 0.0)  # [B,N,K,3H]
    xh_g = jnp.take_along_axis(xh, src.reshape(b, n * k)[..., None], axis=1).reshape(b, n, k, f3)
    vec_g = jnp.take_along_axis(vec, src.reshape(b, n * k)[..., None], axis=1).reshape(b, n, k, f3)
    g = xh_g * filt
    g1, g2, g3 = g[..., :h], g[..., h : 2 * h] / jnp.sqrt(3.0), g[..., 2 * h :]
    dx = jnp.sum(g1, axis=2)
    dvec = jnp.einsum("bnkd,bnkh->bndh", unit, g3) + jnp.stack(
        [jnp.sum(vec_g[..., d * h : (d + 1) * h] * g2, axis=2) for d in range(3)], axis=2
    )
    return dx, dvec


def test_fused_kernel_custom_vjp_matches_autodiff(rng):
    """Gradients through the Pallas backward kernel == autodiff through the
    pure-jnp reference, for xh / vec / weights / bias (the training paths)."""
    from adsorbdiff_tpu.ops.pallas_kernels import painn_message_fused

    b, n, k, r, h = 2, 13, 10, 16, 64
    src = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    dist = jnp.asarray(rng.uniform(0, 7, (b, n, k)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, n, k)) > 0.2)
    unit = jnp.asarray(rng.normal(0, 1, (b, n, k, 3)).astype(np.float32))
    xh = jnp.asarray(rng.normal(0, 1, (b, n, 3 * h)).astype(np.float32))
    vec = jnp.asarray(rng.normal(0, 1, (b, n, 3 * h)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (r, 3 * h)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, 3 * h).astype(np.float32))
    # a non-trivial cotangent structure: weighted sums of both outputs
    cx = jnp.asarray(rng.normal(0, 1, (b, n, h)).astype(np.float32))
    cv = jnp.asarray(rng.normal(0, 1, (b, n, 3, h)).astype(np.float32))

    def loss_fused(xh, vec, w, bias):
        dx, dv = painn_message_fused(xh, vec, src, dist, mask, unit, w, bias, cutoff=6.0, ti=4)
        return jnp.sum(dx * cx) + jnp.sum(dv * cv)

    def loss_ref(xh, vec, w, bias):
        dx, dv = _jnp_message_reference(xh, vec, src, dist, mask, unit, w, bias, 6.0)
        return jnp.sum(dx * cx) + jnp.sum(dv * cv)

    # forward parity first
    np.testing.assert_allclose(
        float(loss_fused(xh, vec, w, bias)), float(loss_ref(xh, vec, w, bias)), rtol=1e-4
    )
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(xh, vec, w, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xh, vec, w, bias)
    for a, b_, name in zip(g_fused, g_ref, ("xh", "vec", "w", "bias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-4, err_msg=name)


def test_fused_kernel_vjp_inside_train_like_step(rng):
    """value_and_grad through a 2-layer composition (jit + donation-style use)."""
    from adsorbdiff_tpu.ops.pallas_kernels import painn_message_fused

    b, n, k, r, h = 1, 8, 6, 8, 32
    src = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    dist = jnp.asarray(rng.uniform(0, 5, (b, n, k)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, n, k)) > 0.2)
    unit = jnp.asarray(rng.normal(0, 1, (b, n, k, 3)).astype(np.float32))
    xh0 = jnp.asarray(rng.normal(0, 1, (b, n, 3 * h)).astype(np.float32))
    params = {
        "w1": jnp.asarray(rng.normal(0, 0.2, (r, 3 * h)).astype(np.float32)),
        "b1": jnp.zeros(3 * h),
        "w2": jnp.asarray(rng.normal(0, 0.2, (r, 3 * h)).astype(np.float32)),
        "b2": jnp.zeros(3 * h),
    }

    @jax.jit
    def loss(params):
        vec = jnp.zeros_like(xh0)
        dx, dv = painn_message_fused(xh0, vec, src, dist, mask, unit, params["w1"], params["b1"], cutoff=6.0, ti=4)
        xh1 = jnp.tile(dx, (1, 1, 3))
        dx2, dv2 = painn_message_fused(
            xh1, dv.reshape(b, n, 3 * h), src, dist, mask, unit, params["w2"], params["b2"], cutoff=6.0, ti=4
        )
        return jnp.mean(dx2**2) + jnp.mean(dv2**2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in flat)


def test_s2_grid_silu_kernel_parity_and_grad():
    """Fused S^2 activation (interpret mode): forward matches the XLA
    formulation and the custom VJP matches autodiff."""
    import jax
    import jax.numpy as jnp

    from adsorbdiff_tpu.models.so3 import m_primary_order, m_trunc_rescale, s2_grid_matrices
    from adsorbdiff_tpu.ops.pallas_kernels import s2_grid_silu

    lmax, mmax, res, c = 4, 2, 18, 16
    order, ranges = m_primary_order(lmax, mmax)
    n_active = ranges[-1][1]
    to_grid, from_grid = s2_grid_matrices(lmax, res, res)
    rescale = m_trunc_rescale(lmax, mmax)[order[:n_active]]
    to_m = jnp.asarray(to_grid[:, order[:n_active]] * rescale[None, :])
    from_m = jnp.asarray(rescale[:, None] * from_grid[order[:n_active], :])

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(3, 5, n_active, c)), jnp.float32)

    def ref(hh):
        g = jnp.einsum("gc,...cf->...gf", to_m, hh)
        return jnp.einsum("cg,...gf->...cf", from_m, jax.nn.silu(g))

    got = s2_grid_silu(h, to_m, from_m, tile_m=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(h)), atol=1e-5, rtol=1e-5)

    # gradient parity (custom VJP with in-kernel recompute)
    w = jnp.asarray(rng.normal(size=got.shape), jnp.float32)
    g_kernel = jax.grad(lambda hh: jnp.sum(s2_grid_silu(hh, to_m, from_m, tile_m=128, interpret=True) * w))(h)
    g_ref = jax.grad(lambda hh: jnp.sum(ref(hh) * w))(h)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref), atol=2e-5, rtol=2e-5)


def test_eqv2_edge_rotate_kernel_parity_and_grad():
    """Fused edge-frame rotation (interpret): both directions match the XLA
    decomposed chain (so3.rotate_to/from_edge_m) and the custom VJP (the
    dual-direction chain) matches autodiff."""
    import jax
    import jax.numpy as jnp

    from adsorbdiff_tpu.models.so3 import (
        n_act_rows,
        rotate_from_edge_m,
        rotate_to_edge_m,
    )
    from adsorbdiff_tpu.ops.pallas_kernels import eqv2_edge_rotate

    lmax, mmax, c = 4, 2, 16
    na = n_act_rows(lmax, mmax)
    rng = np.random.default_rng(0)
    b, n, k = 2, 5, 4
    x = jnp.asarray(rng.normal(size=(b, n, k, (lmax + 1) ** 2, c)), jnp.float32)
    g = jnp.asarray(rng.uniform(-np.pi, np.pi, (b, n, k)), jnp.float32)
    be = jnp.asarray(rng.uniform(0, np.pi, (b, n, k)), jnp.float32)

    got = eqv2_edge_rotate(x, g, be, lmax, mmax, direction="to", interpret=True)
    ref = rotate_to_edge_m(x, g, be, lmax, mmax)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    # target-half broadcast (node-level x enters with a singleton K axis)
    got_t = eqv2_edge_rotate(x[:, :, :1], g, be, lmax, mmax, direction="to", interpret=True)
    ref_t = rotate_to_edge_m(x[:, :, :1], g, be, lmax, mmax)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t), atol=2e-6)

    v = jnp.asarray(rng.normal(size=(b, n, k, na, c)), jnp.float32)
    got_f = eqv2_edge_rotate(v, g, be, lmax, mmax, direction="from", n_sel=na, interpret=True)
    ref_f = rotate_from_edge_m(v, g, be, lmax, mmax)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f), atol=2e-6)

    # edge-degree path: n_sel = n0 < n_act input rows
    v5 = jnp.asarray(rng.normal(size=(b, n, k, lmax + 1, c)), jnp.float32)
    got_5 = eqv2_edge_rotate(v5, g, be, lmax, mmax, direction="from", n_sel=lmax + 1, interpret=True)
    ref_5 = rotate_from_edge_m(v5, g, be, lmax, mmax)
    np.testing.assert_allclose(np.asarray(got_5), np.asarray(ref_5), atol=2e-6)

    # gradient parity through the custom VJP, both directions
    w = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)
    g_ref = jax.grad(lambda xx: jnp.sum(rotate_to_edge_m(xx, g, be, lmax, mmax) * w))(x)
    g_got = jax.grad(
        lambda xx: jnp.sum(eqv2_edge_rotate(xx, g, be, lmax, mmax, direction="to", interpret=True) * w)
    )(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=2e-6)
    w2 = jnp.asarray(rng.normal(size=ref_f.shape), jnp.float32)
    g_ref2 = jax.grad(lambda vv: jnp.sum(rotate_from_edge_m(vv, g, be, lmax, mmax) * w2))(v)
    g_got2 = jax.grad(
        lambda vv: jnp.sum(
            eqv2_edge_rotate(vv, g, be, lmax, mmax, direction="from", n_sel=na, interpret=True) * w2
        )
    )(v)
    np.testing.assert_allclose(np.asarray(g_got2), np.asarray(g_ref2), atol=2e-6)


def test_eqv2_use_pallas_matches_xla():
    """EqV2 forward with the fused S^2 kernel (interpret) == XLA path."""
    import jax

    from adsorbdiff_tpu.models.equiformer_v2 import EquiformerV2
    from tests.test_equiformer_v2 import TINY
    from tests.test_painn import make_batch

    batch = make_batch(np.random.default_rng(3))
    m_x = EquiformerV2(**TINY, so3_denoising=True, for_denoising=True)
    v = m_x.init(jax.random.PRNGKey(0), batch)
    f1_x, f2_x = m_x.apply(v, batch)

    import adsorbdiff_tpu.ops.pallas_kernels as pk
    import functools as ft

    orig = pk.s2_grid_silu
    orig_rot = pk.eqv2_edge_rotate
    orig_gr = pk.eqv2_gather_rotate_to
    pk.s2_grid_silu = ft.partial(orig, interpret=True)
    pk.eqv2_edge_rotate = ft.partial(orig_rot, interpret=True)
    pk.eqv2_gather_rotate_to = ft.partial(orig_gr, interpret=True)
    try:
        m_p = EquiformerV2(**TINY, so3_denoising=True, for_denoising=True,
                           use_pallas=True, use_pallas_rotate=True)
        f1_p, f2_p = m_p.apply(v, batch)
    finally:
        pk.s2_grid_silu = orig
        pk.eqv2_edge_rotate = orig_rot
        pk.eqv2_gather_rotate_to = orig_gr
    np.testing.assert_allclose(np.asarray(f1_p), np.asarray(f1_x), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f2_p), np.asarray(f2_x), atol=5e-5, rtol=1e-4)


@pytest.mark.slow
def test_eqv2_attn_conv1_kernel_parity_and_grad():
    """Fused basis+trunk+gates+conv1 (interpret): forward and parameter
    gradients match the XLA SO2Conv path; the stand-in parameter tree is
    path- and value-identical to the real submodules."""
    import functools as ft

    import jax
    import jax.numpy as jnp

    import adsorbdiff_tpu.ops.pallas_kernels as pk
    from adsorbdiff_tpu.models.equiformer_v2 import EquiformerV2
    from tests.test_equiformer_v2 import TINY
    from tests.test_painn import make_batch

    batch = make_batch(np.random.default_rng(3))
    m_x = EquiformerV2(**TINY, so3_denoising=True, for_denoising=False)
    v = m_x.init(jax.random.PRNGKey(0), batch)

    m_p = EquiformerV2(**TINY, so3_denoising=True, for_denoising=False, use_pallas_conv1=True)
    orig = pk.eqv2_attn_conv1
    pk.eqv2_attn_conv1 = ft.partial(orig, interpret=True)
    try:
        v_p = m_p.init(jax.random.PRNGKey(0), batch)
        flat_x = jax.tree_util.tree_flatten_with_path(v)[0]
        flat_p = jax.tree_util.tree_flatten_with_path(v_p)[0]
        assert {jax.tree_util.keystr(k) for k, _ in flat_x} == {
            jax.tree_util.keystr(k) for k, _ in flat_p
        }
        for (_, a), (_, b) in zip(flat_x, flat_p):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        f_p = m_p.apply(v, batch)
        g_p = jax.grad(lambda p: jnp.mean(m_p.apply(p, batch) ** 2))(v)
    finally:
        pk.eqv2_attn_conv1 = orig
    f_x = m_x.apply(v, batch)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_x), atol=5e-6, rtol=1e-4)
    g_x = jax.grad(lambda p: jnp.mean(m_x.apply(p, batch) ** 2))(v)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6, rtol=2e-3)


def test_eqv2_use_pallas_grad_matches_xla():
    """Gradients through the fused rotation + S^2 kernels (interpret) match
    the XLA path — the use_pallas forward is trainable."""
    import functools as ft

    import jax
    import jax.numpy as jnp

    import adsorbdiff_tpu.ops.pallas_kernels as pk
    from adsorbdiff_tpu.models.equiformer_v2 import EquiformerV2
    from tests.test_equiformer_v2 import TINY
    from tests.test_painn import make_batch

    batch = make_batch(np.random.default_rng(5))
    m_x = EquiformerV2(**TINY, so3_denoising=True, for_denoising=False)
    v = m_x.init(jax.random.PRNGKey(0), batch)

    def loss_fn(model):
        def loss(params):
            f = model.apply(params, batch)
            return jnp.mean(f**2)

        return jax.grad(loss)(v)

    g_x = loss_fn(m_x)
    orig_s2, orig_rot = pk.s2_grid_silu, pk.eqv2_edge_rotate
    orig_gr = pk.eqv2_gather_rotate_to
    pk.s2_grid_silu = ft.partial(orig_s2, interpret=True)
    pk.eqv2_edge_rotate = ft.partial(orig_rot, interpret=True)
    pk.eqv2_gather_rotate_to = ft.partial(orig_gr, interpret=True)
    try:
        g_p = loss_fn(EquiformerV2(**TINY, so3_denoising=True, for_denoising=False,
                                   use_pallas=True, use_pallas_rotate=True))
    finally:
        pk.s2_grid_silu = orig_s2
        pk.eqv2_edge_rotate = orig_rot
        pk.eqv2_gather_rotate_to = orig_gr
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-3)


def test_gemnet_quad_basis_kernel_parity():
    """Fused quad dihedral basis (interpret): matches the XLA formulation."""
    import jax
    import jax.numpy as jnp

    from adsorbdiff_tpu.models.gemnet_oc import legendre_y_l0
    from adsorbdiff_tpu.ops.pallas_kernels import gemnet_quad_basis

    rng = np.random.default_rng(0)
    b, n, k1, kq, k2, s = 2, 4, 6, 3, 6, 7
    n1 = jnp.asarray(rng.normal(size=(b, n, k1, kq, 3)), jnp.float32)
    n2 = jnp.asarray(rng.normal(size=(b, n, kq, k2, 3)), jnp.float32)
    # a few exact-zero rows: masked/padded edges produce zero cross products
    n1 = n1.at[0, 0, 0].set(0.0)
    n2 = n2.at[1, 2, 1, 3].set(0.0)
    keep = jnp.asarray(rng.random((b, n, k1, kq, k2)) > 0.3)

    got = gemnet_quad_basis(n1, n2, keep, s, interpret=True)

    eps = 1e-9
    n1e = n1[:, :, :, :, None, :]
    n2e = n2[:, :, None, :, :, :]
    cos = jnp.sum(n1e * n2e, axis=-1) / jnp.maximum(
        jnp.linalg.norm(n1e, axis=-1) * jnp.linalg.norm(n2e, axis=-1), eps
    )
    cos = jnp.clip(cos, -1.0, 1.0)
    ref = jnp.where(~keep[..., None], 0.0, legendre_y_l0(cos, s))  # [B,N,K1,Kq,K2,S]
    ref = jnp.transpose(ref, (0, 1, 5, 3, 2, 4))  # -> [B,N,S,Kq,K1,K2]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_gemnet_use_pallas_matches_xla():
    """GemNet-OC forward with the fused quad-basis kernel (interpret) == XLA."""
    import functools as ft

    import jax

    import adsorbdiff_tpu.ops.pallas_kernels as pk
    from adsorbdiff_tpu.models.gemnet_oc import GemNetOC
    from tests.test_gemnet_oc import TINY
    from tests.test_painn import make_batch

    batch = make_batch(np.random.default_rng(3))
    m_x = GemNetOC(**TINY)
    v = m_x.init(jax.random.PRNGKey(0), batch)
    o_x = m_x.apply(v, batch)

    orig_q, orig_c = pk.gemnet_quad_basis, pk.gemnet_cbf_basis
    pk.gemnet_quad_basis = ft.partial(orig_q, interpret=True)
    pk.gemnet_cbf_basis = ft.partial(orig_c, interpret=True)
    try:
        o_p = GemNetOC(**TINY, use_pallas=True).apply(v, batch)
    finally:
        pk.gemnet_quad_basis, pk.gemnet_cbf_basis = orig_q, orig_c
    for k in o_x:
        np.testing.assert_allclose(
            np.asarray(o_p[k]), np.asarray(o_x[k]), atol=5e-6, rtol=1e-5
        )


@pytest.mark.slow
def test_eqv2_kernels_large_geometry():
    """Kernel family at the EqV2-153M geometry (lmax=6, mmax=3): rotation
    parity at the op level and full-model use_pallas(+conv1) parity."""
    import functools as ft

    import jax
    import jax.numpy as jnp

    import adsorbdiff_tpu.ops.pallas_kernels as pk
    from adsorbdiff_tpu.models.equiformer_v2 import EquiformerV2
    from adsorbdiff_tpu.models.so3 import n_act_rows, rotate_from_edge_m, rotate_to_edge_m
    from tests.test_painn import make_batch

    lmax, mmax, c = 6, 3, 8
    rng = np.random.default_rng(0)
    b, n, k = 2, 5, 4
    x = jnp.asarray(rng.normal(size=(b, n, k, (lmax + 1) ** 2, c)), jnp.float32)
    g = jnp.asarray(rng.uniform(-3, 3, (b, n, k)), jnp.float32)
    be = jnp.asarray(rng.uniform(0, 3, (b, n, k)), jnp.float32)
    na = n_act_rows(lmax, mmax)
    got = pk.eqv2_edge_rotate(x, g, be, lmax, mmax, direction="to", interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(rotate_to_edge_m(x, g, be, lmax, mmax)), atol=2e-6
    )
    v = jnp.asarray(rng.normal(size=(b, n, k, na, c)), jnp.float32)
    got_f = pk.eqv2_edge_rotate(v, g, be, lmax, mmax, direction="from", n_sel=na, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_f), np.asarray(rotate_from_edge_m(v, g, be, lmax, mmax)), atol=2e-6
    )

    kw = dict(
        num_layers=1, sphere_channels=8, attn_hidden_channels=8, num_heads=2,
        attn_alpha_channels=4, attn_value_channels=4, ffn_hidden_channels=8,
        lmax=lmax, mmax=mmax, grid_resolution=14, edge_channels=8,
        num_distance_basis=16, cutoff=6.0, max_neighbors=6, cell_reps=(1, 1, 0),
        so3_denoising=True, for_denoising=False,
    )
    batch = make_batch(np.random.default_rng(3))
    m_x = EquiformerV2(**kw)
    var = m_x.init(jax.random.PRNGKey(0), batch)
    f_x = m_x.apply(var, batch)
    origs = {nm: getattr(pk, nm) for nm in
             ["s2_grid_silu", "eqv2_edge_rotate", "eqv2_gather_rotate_to", "eqv2_attn_conv1"]}
    for nm, fn in origs.items():
        setattr(pk, nm, ft.partial(fn, interpret=True))
    try:
        m_p = EquiformerV2(**kw, use_pallas=True, use_pallas_rotate=True,
                           use_pallas_conv1=True)
        f_p = m_p.apply(var, batch)
    finally:
        for nm, fn in origs.items():
            setattr(pk, nm, fn)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_x), atol=1e-5, rtol=1e-4)


def test_gemnet_quad_chain_kernel_parity():
    """Fused quadruplet chain (basis + c==d keys + d2 + outer in one kernel)
    vs the XLA reference einsum chain, forward and xm/qp grads."""
    from adsorbdiff_tpu.ops.pallas_kernels import _quad_chain_ref, gemnet_quad_chain

    rng = np.random.default_rng(0)
    B, N, U, Q, K2, S, E, F = 1, 4, 30, 8, 30, 7, 16, 16
    n1 = jnp.asarray(rng.normal(size=(B, N, U, Q, 3)), jnp.float32)
    n2 = jnp.asarray(rng.normal(size=(B, N, Q, K2, 3)), jnp.float32)
    key1 = np.asarray(rng.integers(0, 50, size=(B, N, U)), np.int32)
    key1[..., -3:] = -1  # invalid main edges never match
    key1 = jnp.asarray(key1)
    key2 = jnp.asarray(rng.integers(0, 50, size=(B, N, Q, K2)), np.int32)
    xm = jnp.asarray(rng.normal(size=(B, N, Q, K2, E)), jnp.float32)
    qp = jnp.asarray(rng.normal(size=(B, N, U, S, Q, F)), jnp.float32)

    import functools as ft

    got = gemnet_quad_chain(n1, n2, key1, key2, xm, qp, S, interpret=True)
    ref = _quad_chain_ref(n1, n2, key1, key2, xm, qp, S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

    def loss(fn, xm_, qp_):
        return jnp.sum(fn(n1, n2, key1, key2, xm_, qp_, S) ** 2)

    g = jax.grad(lambda a, b: loss(ft.partial(gemnet_quad_chain, interpret=True), a, b), argnums=(0, 1))(xm, qp)
    r = jax.grad(lambda a, b: loss(_quad_chain_ref, a, b), argnums=(0, 1))(xm, qp)
    for gi, ri in zip(g, r):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(ri), atol=5e-3, rtol=1e-3)

    # pre-padded qp (the model pads the small einsum operands to u32,
    # gemnet_oc.py:593-601): the backward recompute must slice qp to n1's U
    # — regression for the u-mismatch ValueError hit in training
    u32 = ((U + 31) // 32) * 32
    qp_pad = jnp.pad(qp, ((0, 0), (0, 0), (0, u32 - U), (0, 0), (0, 0), (0, 0)))
    got_p = gemnet_quad_chain(n1, n2, key1, key2, xm, qp_pad, S, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref), atol=2e-4)
    gp = jax.grad(lambda a, b: loss(ft.partial(gemnet_quad_chain, interpret=True), a, b), argnums=(0, 1))(xm, qp_pad)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(r[0]), atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gp[1][:, :, :U]), np.asarray(r[1]), atol=5e-3, rtol=1e-3)
    assert not np.asarray(gp[1][:, :, U:]).any()  # pad rows get zero grads


def test_gemnet_fused_trip_model_parity():
    """GemNetOC(fused_trip=True) == the XLA formulation on a real batch
    (same params): the e2e/a2e/e2a triplet consumers routed through
    gemnet_quad_chain at q=1, with identical-edge / cross-table b==c
    exclusions evaluated from the compact edge keys."""
    from adsorbdiff_tpu.models.gemnet_oc import GemNetOC
    from tests.test_painn import make_batch

    rng = np.random.default_rng(3)
    batch = make_batch(rng)
    kw = dict(mode="s2ef", cell_reps=(1, 1, 0))
    m0 = GemNetOC(**kw)
    mf = GemNetOC(**kw, fused_trip=True)
    v = m0.init(jax.random.PRNGKey(0), batch)
    o0 = m0.apply(v, batch)
    of = mf.apply(v, batch)
    np.testing.assert_allclose(
        np.asarray(of["energy"]), np.asarray(o0["energy"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(of["forces"]), np.asarray(o0["forces"]), atol=2e-5)

    def eloss(m, v_):
        return jnp.sum(m.apply(v_, batch)["energy"] ** 2)

    g0 = jax.grad(lambda v_: eloss(m0, v_))(v)
    gf = jax.grad(lambda v_: eloss(mf, v_))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-4, rtol=2e-3)


def test_gemnet_fused_quad_model_parity():
    """GemNetOC(fused_quad=True) == the XLA formulation on a real batch
    (same params): the kernel's key-based c==d exclusion, padding, and
    layouts reproduce the model chain exactly."""
    from adsorbdiff_tpu.models.gemnet_oc import GemNetOC
    from tests.test_painn import make_batch

    rng = np.random.default_rng(3)
    batch = make_batch(rng)
    kw = dict(mode="s2ef", cell_reps=(1, 1, 0))
    m0 = GemNetOC(**kw)
    mf = GemNetOC(**kw, fused_quad=True)
    v = m0.init(jax.random.PRNGKey(0), batch)
    o0 = m0.apply(v, batch)
    of = mf.apply(v, batch)
    np.testing.assert_allclose(
        np.asarray(of["energy"]), np.asarray(o0["energy"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(of["forces"]), np.asarray(o0["forces"]), atol=2e-5)

    # parameter grads through the fused kernel (training path: the crash
    # regressed here was the custom-VJP recompute on the model's u32-padded
    # qp when K1 is not a multiple of 32)
    def eloss(m, v_):
        return jnp.sum(m.apply(v_, batch)["energy"] ** 2)

    g0 = jax.grad(lambda v_: eloss(m0, v_))(v)
    gf = jax.grad(lambda v_: eloss(mf, v_))(v)
    flat0 = jax.tree_util.tree_leaves(g0)
    flatf = jax.tree_util.tree_leaves(gf)
    for a, b in zip(flat0, flatf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-4, rtol=2e-3)
