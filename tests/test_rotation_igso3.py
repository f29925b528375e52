import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from adsorbdiff_tpu.ops import igso3
from adsorbdiff_tpu.ops.rotation import axis_angle_to_matrix, kabsch


def test_axis_angle_to_matrix_vs_scipy(rng):
    vecs = rng.normal(0, 1.2, (64, 3)).astype(np.float32)
    got = np.asarray(axis_angle_to_matrix(jnp.asarray(vecs)))
    want = Rotation.from_rotvec(vecs).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_axis_angle_small_angle_stable():
    tiny = jnp.asarray([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    m = np.asarray(axis_angle_to_matrix(tiny))
    np.testing.assert_allclose(m, np.stack([np.eye(3)] * 2), atol=1e-6)
    # grad must not NaN at zero
    g = jax.grad(lambda v: jnp.sum(axis_angle_to_matrix(v)))(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()


def test_kabsch_recovers_rotation(rng):
    a = rng.normal(0, 1, (3, 10))
    r_true = Rotation.random(random_state=1).as_matrix()
    t_true = rng.normal(0, 1, (3, 1))
    b = r_true @ a + t_true
    r, t = kabsch(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r) @ a + np.asarray(t), b, atol=1e-4)


# ---------------- IGSO(3) tables ----------------


def direct_expansion(omega, eps, L=2000):
    """Reference series, literal transcription (ref: rot_utils.py:150-159)."""
    p = 0.0
    for l in range(L):
        p += (2 * l + 1) * np.exp(-l * (l + 1) * eps**2) * np.sin(omega * (l + 0.5)) / np.sin(omega / 2)
    return p


def direct_score(omega, eps, L=2000):
    exp = direct_expansion(omega, eps, L)
    dsig = 0.0
    for l in range(L):
        hi = np.sin(omega * (l + 0.5))
        dhi = (l + 0.5) * np.cos(omega * (l + 0.5))
        lo = np.sin(omega / 2)
        dlo = 0.5 * np.cos(omega / 2)
        dsig += (2 * l + 1) * np.exp(-l * (l + 1) * eps**2) * (lo * dhi - hi * dlo) / lo**2
    return dsig / exp


@pytest.fixture(scope="module")
def tables():
    return igso3.get_tables()


def test_tables_shapes(tables):
    assert tables.omegas.shape == (igso3.X_N,)
    assert tables.cdf.shape == (igso3.N_EPS, igso3.X_N)
    assert tables.score_norms.shape == (igso3.N_EPS, igso3.X_N)
    assert tables.exp_score_norms.shape == (igso3.N_EPS,)


def test_cdf_monotone_and_normalized(tables):
    cdf = np.asarray(tables.cdf)
    assert (np.diff(cdf, axis=1) >= -1e-4).all()
    # total mass ~ 1 for all eps (trapezoidal-ish cumsum)
    np.testing.assert_allclose(cdf[:, -1], 1.0, atol=0.05)


def test_score_matches_direct_series(tables):
    """Compare at CDF quantiles of each eps row: outside the bulk of the
    density the truncated series is pure cancellation noise for BOTH the table
    and the reference implementation (density underflows below f64), and that
    region is never queried (inverse-CDF sampling cannot land there)."""
    eps_grid = 10 ** np.linspace(np.log10(igso3.MIN_EPS), np.log10(igso3.MAX_EPS), igso3.N_EPS)
    score = np.asarray(tables.score_norms)
    cdf = np.asarray(tables.cdf)
    omegas = np.asarray(tables.omegas)
    for e_idx in [0, 250, 500, 999]:
        eps = eps_grid[e_idx]
        for q in [0.2, 0.5, 0.9]:
            w_idx = int(np.searchsorted(cdf[e_idx], q * cdf[e_idx, -1]))
            want = direct_score(omegas[w_idx], eps)
            got = score[e_idx, w_idx]
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_sample_vec_and_score_vec_shapes(tables):
    key = jax.random.PRNGKey(0)
    eps = jnp.asarray([0.05, 0.5, 1.5])
    v = igso3.sample_vec(key, eps)
    assert v.shape == (3, 3)
    om = np.linalg.norm(np.asarray(v), axis=-1)
    assert (om > 0).all() and (om <= np.pi + 1e-5).all()
    s = igso3.score_vec(eps, v)
    assert s.shape == (3, 3)
    # score is (anti)parallel to vec
    cos = np.sum(np.asarray(s) * np.asarray(v), axis=-1) / (
        np.linalg.norm(np.asarray(s), axis=-1) * om
    )
    np.testing.assert_allclose(np.abs(cos), 1.0, atol=1e-4)


def test_small_eps_samples_small_angles(tables):
    key = jax.random.PRNGKey(1)
    om = igso3.sample_omega(key, jnp.full((512,), 0.01))
    assert float(jnp.mean(om)) < 0.2  # tight concentration near identity


def test_score_norm_decreasing(tables):
    eps = jnp.asarray([0.02, 0.1, 0.5, 1.5])
    sn = np.asarray(igso3.score_norm(eps))
    assert (np.diff(sn) < 0).all()  # wider noise -> flatter density -> smaller score


def test_lookups_jittable(tables):
    @jax.jit
    def f(key, eps):
        v = igso3.sample_vec(key, eps)
        return igso3.score_vec(eps, v), igso3.score_norm(eps)

    s, n = f(jax.random.PRNGKey(2), jnp.asarray([0.3, 0.9]))
    assert np.isfinite(np.asarray(s)).all() and np.isfinite(np.asarray(n)).all()
