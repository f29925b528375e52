"""SO(3) core: Wigner-D correctness, grids, edge frames, layouts."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from adsorbdiff_tpu.models.so3 import (
    _rotation_matrix_to_D,
    edge_frame_rotation,
    l1_coeffs_to_vector,
    m_index_tables,
    real_sph_harm,
    s2_grid_matrices,
    wigner_D_from_rot,
    z_rot_D,
)

LMAX = 4


def test_real_sph_harm_orthonormal():
    # Monte-Carlo orthonormality sanity on l<=2
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(200000, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    y = real_sph_harm(2, pts)
    gram = (y @ y.T) / pts.shape[0] * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_wigner_D_matches_lstsq(seed):
    r = Rotation.random(random_state=seed).as_matrix()
    want = _rotation_matrix_to_D(LMAX, r)
    got = np.asarray(wigner_D_from_rot(LMAX, jnp.asarray(r, jnp.float32)))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_wigner_D_is_representation():
    r1 = Rotation.random(random_state=3).as_matrix()
    r2 = Rotation.random(random_state=4).as_matrix()
    d1 = np.asarray(wigner_D_from_rot(LMAX, jnp.asarray(r1, jnp.float32)))
    d2 = np.asarray(wigner_D_from_rot(LMAX, jnp.asarray(r2, jnp.float32)))
    d12 = np.asarray(wigner_D_from_rot(LMAX, jnp.asarray(r1 @ r2, jnp.float32)))
    np.testing.assert_allclose(d1 @ d2, d12, atol=1e-4)
    # orthogonality
    np.testing.assert_allclose(d1 @ d1.T, np.eye(d1.shape[0]), atol=1e-4)


def test_wigner_D_transforms_sh():
    """Y(R v) == D(R) Y(v) — the defining property."""
    rng = np.random.default_rng(5)
    r = Rotation.random(random_state=6).as_matrix()
    pts = rng.normal(size=(50, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    y = real_sph_harm(LMAX, pts)
    y_rot = real_sph_harm(LMAX, pts @ r.T)
    d = np.asarray(wigner_D_from_rot(LMAX, jnp.asarray(r, jnp.float32)))
    np.testing.assert_allclose(d @ y, y_rot, atol=5e-5)


def test_z_rot_batched():
    angles = jnp.asarray([0.0, 0.7, -2.1])
    d = np.asarray(z_rot_D(2, angles))
    assert d.shape == (3, 9, 9)
    np.testing.assert_allclose(d[0], np.eye(9), atol=1e-6)
    rz = Rotation.from_euler("z", 0.7).as_matrix()
    want = _rotation_matrix_to_D(2, rz)
    np.testing.assert_allclose(d[1], want, atol=1e-5)


def test_edge_frame_maps_to_z(rng):
    u = rng.normal(size=(40, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    r = np.asarray(edge_frame_rotation(jnp.asarray(u, jnp.float32)))
    out = np.einsum("nij,nj->ni", r, u)
    np.testing.assert_allclose(out, np.tile([0, 0, 1.0], (40, 1)), atol=1e-5)
    # orthonormal
    np.testing.assert_allclose(np.einsum("nij,nkj->nik", r, r), np.tile(np.eye(3), (40, 1, 1)), atol=1e-5)


def test_s2_grid_roundtrip():
    to_grid, from_grid = s2_grid_matrices(LMAX, 18, 18)
    eye = from_grid @ to_grid
    np.testing.assert_allclose(eye, np.eye((LMAX + 1) ** 2), atol=1e-5)


def test_m_index_tables():
    idx0, pos, neg, mask = m_index_tables(4, 2)
    assert list(idx0) == [0, 2, 6, 12, 20]
    assert mask.sum() == sum(2 * min(l, 2) + 1 for l in range(5))
    assert list(pos[1]) == [l * l + l + 2 for l in range(2, 5)]


def test_l1_coeffs_vector_equivariance():
    """rotating coeffs by D(R) must rotate the extracted vector by R."""
    rng = np.random.default_rng(8)
    r = Rotation.random(random_state=9).as_matrix()
    c = rng.normal(size=3)
    d = np.asarray(wigner_D_from_rot(1, jnp.asarray(r, jnp.float32)))[1:4, 1:4]
    v = np.asarray(l1_coeffs_to_vector(jnp.asarray(c, jnp.float32)))
    v_rot = np.asarray(l1_coeffs_to_vector(jnp.asarray(d @ c, jnp.float32)))
    np.testing.assert_allclose(v_rot, r @ v, atol=1e-5)


def test_decomposed_edge_rotation_matches_dense_wigner(rng):
    """rotate_to_edge_m / rotate_from_edge_m == perm-truncated dense Wigner
    apply for the alpha=0 gauge R_e = Ry(beta) Rz(gamma) (incl. the poles)."""
    from adsorbdiff_tpu.models.so3 import (
        edge_euler_angles,
        m_primary_order,
        rotate_from_edge_m,
        rotate_to_edge_m,
    )

    lmax, mmax = 4, 2
    u = rng.normal(size=(6, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    u = np.concatenate([u, [[0, 0, 1.0], [0, 0, -1.0]]])  # degenerate poles
    gamma, beta = edge_euler_angles(jnp.asarray(u, jnp.float32))
    order, ranges = m_primary_order(lmax, mmax)
    n_act = ranges[-1][1]
    n0 = ranges[0][1]
    x = rng.normal(size=(len(u), (lmax + 1) ** 2, 5)).astype(np.float32)
    got = np.asarray(rotate_to_edge_m(jnp.asarray(x), gamma, beta, lmax, mmax))
    v = rng.normal(size=(len(u), n_act, 5)).astype(np.float32)
    got_inv = np.asarray(rotate_from_edge_m(jnp.asarray(v), gamma, beta, lmax, mmax))
    got_n0 = np.asarray(rotate_from_edge_m(jnp.asarray(v[:, :n0]), gamma, beta, lmax, mmax))
    p = np.zeros((n_act, (lmax + 1) ** 2), np.float32)
    p[np.arange(n_act), order[:n_act]] = 1.0
    for e in range(len(u)):
        b, g = float(beta[e]), float(gamma[e])
        ry = Rotation.from_euler("y", b).as_matrix()
        rz = Rotation.from_euler("z", g).as_matrix()
        r = ry @ rz
        np.testing.assert_allclose(r @ u[e], [0, 0, 1], atol=1e-5)
        d = _rotation_matrix_to_D(lmax, r)
        np.testing.assert_allclose(got[e], p @ d @ x[e], atol=2e-5)
        np.testing.assert_allclose(got_inv[e], d.T @ p.T @ v[e], atol=2e-5)
        np.testing.assert_allclose(got_n0[e], d.T @ p.T[:, :n0] @ v[e, :n0], atol=2e-5)


def test_soft_grid_weights_match_closed_form():
    """Moment-system weights == the closed-form Driscoll-Healy/SOFT weights
    e3nn packages (o3._s2grid._quadrature_weights): for midpoint betas
    b_j = (2j+1)pi/(2n),  w_j = (4/n) sin(b_j) sum_{k<n/2} sin((2k+1)b_j)/(2k+1)."""
    from adsorbdiff_tpu.models.so3 import soft_grid_weights

    for n in (8, 18, 32):
        b = (np.arange(n) + 0.5) / n * np.pi
        k = np.arange(n // 2)
        cf = 4.0 / n * np.sin(b) * (
            np.sin((2 * k[None, :] + 1) * b[:, None]) / (2 * k[None, :] + 1)
        ).sum(1)
        got = soft_grid_weights(n)
        np.testing.assert_allclose(got, cf, atol=1e-13)
        assert abs(got.sum() - 2.0) < 1e-12  # integrates sin(b) db exactly


def test_s2_grid_e3nn_mode_invariants():
    """mode="e3nn" (soft grid + component scale): exact roundtrip, and the
    e3nn 'component' contract — iid unit-variance coefficients produce a grid
    signal with EQUAL per-degree variance summing to 1 (the property that
    pins the per-l scale; see s2_grid_matrices docstring)."""
    from adsorbdiff_tpu.models.so3 import soft_grid_weights

    lmax, res = 6, 18
    to_grid, from_grid = s2_grid_matrices(lmax, res, res, "e3nn")
    dim = (lmax + 1) ** 2
    np.testing.assert_allclose(
        np.asarray(from_grid, np.float64) @ np.asarray(to_grid, np.float64),
        np.eye(dim), atol=1e-5)
    # uniform-measure weights over the grid: w_beta x (2pi/res_alpha) / 4pi
    w = (np.outer(soft_grid_weights(res), np.ones(res)) * (2 * np.pi / res)).ravel()
    w = w / (4 * np.pi)
    t64 = np.asarray(to_grid, np.float64)
    per_l = np.array([
        (w[:, None] * t64[:, l * l:(l + 1) * (l + 1)] ** 2).sum()
        for l in range(lmax + 1)
    ])
    np.testing.assert_allclose(per_l, np.full(lmax + 1, 1.0 / (lmax + 1)), atol=1e-6)
    # the gauss mode is the plain orthonormal-basis evaluation (variance
    # (2l+1)/4pi per degree) — the two modes genuinely differ
    tg, _ = s2_grid_matrices(lmax, res, res, "gauss")
    assert not np.allclose(tg, to_grid)
