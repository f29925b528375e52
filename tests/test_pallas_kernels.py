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
    # sampling=True: the pallas path is inference-gated (no custom VJP yet)
    m_pal = PaiNN(**MODEL_KW, so3_denoising=True, use_pallas=True, sampling=True)
    f_ref = m_ref.apply(variables, batch)
    f_pal = m_pal.apply(variables, batch)
    np.testing.assert_allclose(np.asarray(f_pal[0]), np.asarray(f_ref[0]), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f_pal[1]), np.asarray(f_ref[1]), atol=5e-5, rtol=1e-4)


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
