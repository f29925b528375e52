"""SO(3) machinery for EquiformerV2: real spherical harmonics, Wigner-D
matrices, S^2 grids, coefficient layouts.

Rebuild of the reference's e3nn-based SO(3) core (ref: adsorbdiff/models/
equiformer_v2/so3.py:30-748, wigner.py:8-43) WITHOUT e3nn or the shipped
``Jd.pt`` asset (flagged in SURVEY.md §7 hard-part 4):

- real spherical harmonics come from scipy (host-side, used only to build
  static tables);
- the fixed change-of-frame matrix ``J_l = D_l(Q)`` (Q = rotation taking the
  z-axis onto the y-axis) is solved ONCE numerically by least squares from
  ``Y(Q v) = J Y(v)`` — exact to f64 roundoff — replacing the opaque Jd.pt;
- runtime Wigner-D is the jit-friendly composition
  ``D(R) = Dz(alpha) @ J @ Dz(beta) @ J^T @ Dz(gamma)`` with analytic
  z-rotations (block-diagonal cos/sin in the +-m pairs), zyz Euler angles
  extracted from R with degeneracy-safe atan2;
- S^2 grids use Gauss-Legendre beta nodes x uniform alpha so that
  from_grid @ to_grid == identity exactly for bandlimited signals
  (the e3nn ToS2Grid/FromS2Grid contract, ref: so3.py:534-643).

Convention: z-up physics real SH, coefficient order within l is m=-l..l,
flattened over l as one [(lmax+1)^2] axis.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np
try:  # scipy >= 1.15 renamed sph_harm (and swapped angle arguments)
    from scipy.special import sph_harm_y as _sph_harm_y

    def _sph_harm(m, l, phi, theta):
        return _sph_harm_y(l, m, theta, phi)

except ImportError:  # pragma: no cover
    from scipy.special import sph_harm as _sph_harm_legacy

    def _sph_harm(m, l, phi, theta):
        return _sph_harm_legacy(m, l, phi, theta)


# ------------------------------------------------------------------ host side
def real_sph_harm(lmax: int, vecs: np.ndarray) -> np.ndarray:
    """Real SH values Y[(l,m), point] for unit vectors [P, 3] (z-up,
    Condon-Shortley absorbed: m>0 ~ sqrt2 (-1)^m Re Y_l^m, m<0 ~ sqrt2 (-1)^m Im Y_l^|m|)."""
    vecs = np.asarray(vecs, np.float64)
    theta = np.arccos(np.clip(vecs[:, 2], -1, 1))  # polar from +z
    phi = np.arctan2(vecs[:, 1], vecs[:, 0])
    out = np.zeros(((lmax + 1) ** 2, len(vecs)))
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            idx = l * l + l + m
            y = _sph_harm(abs(m), l, phi, theta)  # (order m, degree l, azimuth, polar)
            if m > 0:
                out[idx] = math.sqrt(2.0) * (-1) ** m * y.real
            elif m < 0:
                out[idx] = math.sqrt(2.0) * (-1) ** m * y.imag
            else:
                out[idx] = y.real
    return out


def _rotation_matrix_to_D(lmax: int, rot: np.ndarray) -> np.ndarray:
    """Numerical block-diag D(R): solve Y(R v) = D Y(v) by least squares."""
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(4 * (lmax + 1) ** 2 + 16, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    y = real_sph_harm(lmax, pts)  # [(L)^2, P]
    y_rot = real_sph_harm(lmax, pts @ rot.T)
    d = np.zeros(((lmax + 1) ** 2, (lmax + 1) ** 2))
    for l in range(lmax + 1):
        sl = slice(l * l, (l + 1) * (l + 1))
        d[sl, sl] = np.linalg.lstsq(y[sl].T, y_rot[sl].T, rcond=None)[0].T
    return d


@functools.lru_cache(maxsize=8)
def get_J_matrix(lmax: int) -> np.ndarray:
    """J = D(Q) for Q = R_x(-pi/2) (maps z-axis onto y-axis), block-diag
    [(L)^2, (L)^2] — the Jd.pt replacement."""
    q = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0]])  # R_x(-pi/2): z -> +y
    return _rotation_matrix_to_D(lmax, q)


@functools.lru_cache(maxsize=8)
def _zrot_indices(lmax: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Static index/coefficient tables for the analytic z-rotation.

    In the real basis, R_z(t) acts on each (l, +-m) pair as
      [[cos mt, -s sin mt], [s sin mt, cos mt]]  (sign s fixed numerically).
    We encode Dz(t) = C(t-dependent cos part) + S(sin part) with static
    scatter structure: diag cos(m_diag * t) plus antidiag sin entries.
    """
    dim = (lmax + 1) ** 2
    m_diag = np.zeros(dim)
    pair_i, pair_j, pair_m = [], [], []
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            idx = l * l + l + m
            m_diag[idx] = abs(m)
            if m > 0:
                i_pos, i_neg = l * l + l + m, l * l + l - m
                pair_i.append(i_pos)
                pair_j.append(i_neg)
                pair_m.append(m)
    # determine the sin sign numerically once
    t = 0.3
    rz = np.array([[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0], [0, 0, 1.0]])
    d = _rotation_matrix_to_D(lmax, rz)
    signs = []
    for i, j, m in zip(pair_i, pair_j, pair_m):
        signs.append(np.sign(d[i, j] / np.sin(m * t)))
    return m_diag, np.asarray(pair_i), np.asarray(pair_j), np.asarray(signs) * np.asarray(pair_m)


# ------------------------------------------------------------------ jit side
def z_rot_D(lmax: int, angle: jnp.ndarray) -> jnp.ndarray:
    """Analytic Dz(angle) [..., (L)^2, (L)^2], jit-friendly."""
    m_diag, pi, pj, signed_m = _zrot_indices(lmax)
    dim = (lmax + 1) ** 2
    cos_part = jnp.cos(angle[..., None] * jnp.asarray(m_diag))  # [..., dim]
    d = jnp.zeros(angle.shape + (dim, dim))
    d = d + jnp.eye(dim) * cos_part[..., None, :]  # diagonal cos(m t)
    sin_vals = jnp.sin(angle[..., None] * jnp.abs(jnp.asarray(signed_m, jnp.float32)))
    sin_vals = sin_vals * jnp.sign(jnp.asarray(signed_m, jnp.float32))
    d = d.at[..., pi, pj].add(sin_vals)
    d = d.at[..., pj, pi].add(-sin_vals)
    return d


def euler_zyz(rot: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """zyz Euler angles with R = Rz(alpha) Ry(beta) Rz(gamma), beta in [0, pi];
    degeneracy-safe at beta ~ {0, pi} (gamma folded into alpha)."""
    beta = jnp.arccos(jnp.clip(rot[..., 2, 2], -1.0, 1.0))
    degenerate = jnp.abs(jnp.abs(rot[..., 2, 2]) - 1.0) < 1e-6
    alpha = jnp.where(
        degenerate,
        jnp.arctan2(rot[..., 1, 0], rot[..., 0, 0]),
        jnp.arctan2(rot[..., 1, 2], rot[..., 0, 2]),
    )
    gamma = jnp.where(degenerate, 0.0, jnp.arctan2(rot[..., 2, 1], -rot[..., 2, 0]))
    return alpha, beta, gamma


def wigner_D_from_rot(lmax: int, rot: jnp.ndarray) -> jnp.ndarray:
    """Block-diagonal real Wigner-D [..., (L)^2, (L)^2] from rotation matrices.

    D(R) = Dz(alpha) J Dz(beta) J^T Dz(gamma)  (ref contract: wigner.py:16-43,
    so3.py RotationToWignerDMatrix :509-533 — built here without e3nn).
    """
    j = jnp.asarray(get_J_matrix(lmax), jnp.float32)
    alpha, beta, gamma = euler_zyz(rot)
    da = z_rot_D(lmax, alpha)
    db = z_rot_D(lmax, beta)
    dg = z_rot_D(lmax, gamma)
    return da @ (j @ (db @ (j.T @ dg)))


def edge_euler_angles(unit: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gauge-fixed Euler angles (gamma, beta) of an edge frame mapping the
    unit vector onto e_z: R_e = Ry(beta) Rz(gamma) (alpha == 0 gauge), so

        D(R_e) = J Dz(beta) J^T Dz(gamma).

    The SO(2)-conv structure is invariant to the in-plane gauge (the reference
    even randomizes it, ref: equiformer_v2/edge_rot_mat.py:6-60), so fixing
    alpha = 0 drops one z-rotation stage from every rotation apply and needs
    no 3x3 frame or degeneracy-safe zyz extraction: beta = arccos(u_z),
    gamma = atan2(u_y, -u_x) directly.
    """
    beta = jnp.arccos(jnp.clip(unit[..., 2], -1.0, 1.0))
    gamma = jnp.arctan2(unit[..., 1], -unit[..., 0])
    return gamma, beta


@functools.lru_cache(maxsize=8)
def zrot_swap_sign(lmax: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static per-row tables for applying Dz(t) elementwise in the l-primary
    layout:  (Dz(t) x)[i] = cos(m_i t) x[i] + sign_i sin(m_i t) x[swap_i]
    with swap the (l, m) <-> (l, -m) partner (self for m = 0, sign 0).

    Returns (m_row [dim] float32, swap [dim] int64, sign [dim] float32).
    """
    m_diag, pi, pj, signed_m = _zrot_indices(lmax)
    dim = (lmax + 1) ** 2
    swap = np.arange(dim)
    sign = np.zeros(dim, np.float32)
    swap[pi], swap[pj] = pj, pi
    sign[pi] = np.sign(signed_m)  # Dz[pi, pj] = sign * sin(m t)
    sign[pj] = -np.sign(signed_m)  # Dz[pj, pi] = -sign * sin(m t)
    return m_diag.astype(np.float32), swap, sign


@functools.lru_cache(maxsize=8)
def _rot_decomp_mats(lmax: int, mmax: int, n_rows: int):
    """Constant matrices for the decomposed edge-frame rotation applies.

    For the forward (global l-primary -> truncated m-primary edge frame)
    rotate P J Dz(beta) J^T Dz(gamma); the two per-edge Dz stages need each
    intermediate AND its (+m <-> -m) swap, so the constant matmuls are stacked
    with their row-swapped copies:

      swap_mat [dim, dim]          row-swap of the input (for Dz(gamma)),
      jt2 [2 dim, dim]             [J^T; swap . J^T]  (for Dz(beta)),
      pj [n_act, dim]              P J (final truncation),
      m tables                     Dz tables in the truncated m-primary layout.

    For the inverse (truncated m-primary, first ``n_rows`` rows -> global)
    rotate Dz(-gamma) J Dz(-beta) J^T P^T:

      jtp2 [2 dim, n_rows]         [J^T P^T; swap . J^T P^T],
      j2 [2 dim, dim]              [J; swap . J].
    """
    dim = (lmax + 1) ** 2
    m_row, swap, sign = zrot_swap_sign(lmax)
    order, ranges = m_primary_order(lmax, mmax)
    n_act = ranges[-1][1]
    j = np.asarray(get_J_matrix(lmax), np.float32)

    swap_mat = np.zeros((dim, dim), np.float32)
    swap_mat[np.arange(dim), swap] = 1.0
    jt = j.T
    jt2 = np.concatenate([jt, jt[swap]], axis=0)
    pj = j[order[:n_act], :]

    # truncated m-primary Dz tables (every |m| <= mmax row keeps its partner)
    keep = order[:n_act]
    inv = {int(o): r for r, o in enumerate(keep)}
    m_row_m = m_row[keep]
    sign_m = sign[keep]
    swap_m = np.asarray([inv[int(swap[o])] for o in keep])
    pj2 = np.concatenate([pj, pj[swap_m]], axis=0)  # [2 n_act, dim]

    jtp = j[order[:n_rows], :].T  # J^T P^T restricted to n_rows columns
    jtp2 = np.concatenate([jtp, jtp[swap]], axis=0)
    j2 = np.concatenate([j, j[swap]], axis=0)
    return swap_mat, jt2, pj2, (m_row_m, sign_m), (m_row, sign), jtp2, j2, n_act


def _cs(angle: jnp.ndarray, m_row: np.ndarray, sign: np.ndarray, dtype):
    """cos(m t) and sign-folded sin(m t) row tables, [..., n_rows]."""
    a = angle[..., None] * jnp.asarray(m_row)
    return jnp.cos(a).astype(dtype), (jnp.sin(a) * jnp.asarray(sign)).astype(dtype)


def rotate_to_edge_m(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                     lmax: int, mmax: int) -> jnp.ndarray:
    """Apply the truncated m-primary edge-frame rotation P D(R_e) to
    ``x [..., (L)^2, C]`` WITHOUT materializing per-edge Wigner matrices.

    D(R_e) = J Dz(beta) J^T Dz(gamma) (edge_euler_angles gauge) splits into
    per-edge ELEMENTWISE +-m pair mixing (the Dz factors — VPU) and constant
    SHARED matmuls (J / P J — full-utilization MXU), replacing the batched
    [n_act, (L)^2] x [(L)^2, C] per-edge matmuls that profiled as the
    dominant EqV2 cost (docs/PERF.md round-3: XLA lowers them to
    multiply+reduce fusions over an [E, n_act, (L)^2, C]-extent product).

    ``gamma``/``beta`` broadcast against x's batch dims; extra trailing axes
    on them (e.g. a neighbor axis when x is node-level) broadcast x up.
    """
    dt = x.dtype
    swap_mat, jt2, pj2, (m_row_m, sign_m), (m_row, sign), _, _, n_act = (
        _rot_decomp_mats(lmax, mmax, n_act_rows(lmax, mmax))
    )
    dim = x.shape[-2]
    cg, sg = _cs(gamma, m_row, sign, dt)
    cb, sb = _cs(beta, m_row, sign, dt)
    del m_row_m, sign_m  # forward chain ends on the constant P J matmul
    xs = jnp.einsum("ij,...jc->...ic", jnp.asarray(swap_mat, dt), x)
    t1 = x * cg[..., None] + xs * sg[..., None]  # Dz(gamma); broadcasts edges
    t2 = jnp.einsum("ij,...jc->...ic", jnp.asarray(jt2, dt), t1)
    a, b = t2[..., :dim, :], t2[..., dim:, :]
    t3 = a * cb[..., None] + b * sb[..., None]  # Dz(beta)
    pj = jnp.asarray(pj2[:n_act], dt)
    return jnp.einsum("ij,...jc->...ic", pj, t3)


def rotate_from_edge_m(v: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                       lmax: int, mmax: int) -> jnp.ndarray:
    """Inverse of :func:`rotate_to_edge_m` on the leading ``n_rows =
    v.shape[-2]`` truncated m-primary rows: applies D(R_e)^T P^T as
    Dz(-gamma) J Dz(-beta) (J^T P^T) with shared constant matmuls and
    elementwise Dz stages (cos terms unchanged, sin terms negated)."""
    dt = v.dtype
    n_rows = v.shape[-2]
    _, _, _, _, (m_row, sign), jtp2, j2, _ = _rot_decomp_mats(lmax, mmax, n_rows)
    dim = (lmax + 1) ** 2
    cb, sb = _cs(beta, m_row, sign, dt)
    cg, sg = _cs(gamma, m_row, sign, dt)
    t1 = jnp.einsum("ij,...jc->...ic", jnp.asarray(jtp2, dt), v)
    a, b = t1[..., :dim, :], t1[..., dim:, :]
    t2 = a * cb[..., None] - b * sb[..., None]  # Dz(-beta)
    t3 = jnp.einsum("ij,...jc->...ic", jnp.asarray(j2, dt), t2)
    a, b = t3[..., :dim, :], t3[..., dim:, :]
    return a * cg[..., None] - b * sg[..., None]  # Dz(-gamma)


@functools.lru_cache(maxsize=8)
def n_act_rows(lmax: int, mmax: int) -> int:
    """Number of active rows in the truncated m-primary layout."""
    return int(m_primary_order(lmax, mmax)[1][-1][1])


def edge_frame_rotation(unit: jnp.ndarray) -> jnp.ndarray:
    """Rotation R with R @ u = e_z (rows form an orthonormal frame).

    Deterministic replacement for the reference's random-perpendicular edge
    frame (ref: equiformer_v2/edge_rot_mat.py:6-60) — the SO(2) structure is
    invariant to the in-plane gauge, so determinism costs nothing and buys
    reproducibility.
    """
    u = unit
    near_x = jnp.abs(u[..., 0:1]) > 0.9
    ref = jnp.where(near_x, jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0]))
    v1 = jnp.cross(u, ref)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-9)
    v2 = jnp.cross(u, v1)
    return jnp.stack([v1, v2, u], axis=-2)  # rows: maps u -> e_z


# ------------------------------------------------------------------ layouts
@functools.lru_cache(maxsize=8)
def m_index_tables(lmax: int, mmax: int):
    """Static coefficient-index tables for SO(2) convs in the edge frame.

    Returns (idx_m0 [n0], idx_pos [list per m], idx_neg [list per m],
    mmax_mask [(L)^2]).
    """
    idx_m0 = np.asarray([l * l + l for l in range(lmax + 1)])
    idx_pos = [np.asarray([l * l + l + m for l in range(m, lmax + 1)]) for m in range(1, mmax + 1)]
    idx_neg = [np.asarray([l * l + l - m for l in range(m, lmax + 1)]) for m in range(1, mmax + 1)]
    mask = np.zeros((lmax + 1) ** 2, bool)
    for l in range(lmax + 1):
        for m in range(-min(l, mmax), min(l, mmax) + 1):
            mask[l * l + l + m] = True
    return idx_m0, idx_pos, idx_neg, mask


@functools.lru_cache(maxsize=64)
def coeff_select_matrix(dim: int, idx: tuple) -> np.ndarray:
    """One-hot [len(idx), dim] selection matrix: ``S @ x`` gathers coefficient
    rows, ``S.T @ y`` scatters them back.  On TPU, XLA lowers explicit
    gather/concatenate ops on the coefficient axis to while-loops /
    dynamic-update-slice chains (profiled: they dominated the EqV2 attention);
    tiny constant matmuls run on the MXU instead."""
    s = np.zeros((len(idx), dim), np.float32)
    s[np.arange(len(idx)), np.asarray(idx)] = 1.0
    return s


@functools.lru_cache(maxsize=8)
def l_expand_matrix(lmax: int) -> np.ndarray:
    """[ (lmax+1)^2, lmax+1 ] one-hot: row (l,m) selects column l — expands a
    per-l vector to the full coefficient axis with one matmul (replaces the
    repeat/concatenate chain)."""
    dim = (lmax + 1) ** 2
    e = np.zeros((dim, lmax + 1), np.float32)
    for l in range(lmax + 1):
        e[l * l : (l + 1) * (l + 1), l] = 1.0
    return e


def scatter_as_gather_perm(dim: int, positions) -> np.ndarray:
    """Inverse permutation that turns ``out.at[positions].set(values)`` into a
    constant-index gather: with ``full = concat([values, zeros[1]])`` (values
    stacked in ``positions`` order), ``take(full, perm, axis)`` equals the
    scatter result.  XLA lowers constant gathers far better than the
    non-contiguous scatters the (l, m) coefficient layout otherwise needs.
    ``positions``: unique target indices in value order (list/array)."""
    positions = np.concatenate([np.asarray(p).ravel() for p in positions])
    inv = np.full(dim, len(positions), np.int32)  # default -> trailing zero slot
    inv[positions] = np.arange(len(positions), dtype=np.int32)
    return inv


def soft_grid_weights(res_beta: int) -> np.ndarray:
    """Beta quadrature weights for the midpoint (``(j+0.5)/n*pi``) grid.

    Unique weights making ``sum_j w_j P_l(cos beta_j)`` exact against
    ``int_0^pi P_l(cos b) sin b db = 2*delta_{l0}`` for every degree
    l = 0..res_beta-1 (full Legendre-Vandermonde moment system, float64).
    By the Driscoll–Healy theorem these coincide with the closed-form
    SOFT/Kostelec–Rockmore weights e3nn packages as
    ``o3._s2grid._quadrature_weights(res_beta//2)`` (up to e3nn's global
    rescale, which its ``FromS2Grid`` normalization folds back out) — so a
    soft-grid transform built on them reproduces e3nn bit-for-bit in f64.
    Checked against the closed form in tests/test_so3.py.
    """
    betas = (np.arange(res_beta) + 0.5) / res_beta * np.pi
    ct = np.cos(betas)
    # moments: rows l, columns j; P_l via recurrence in float64
    p = np.zeros((res_beta, res_beta))
    p[0] = 1.0
    if res_beta > 1:
        p[1] = ct
    for l in range(2, res_beta):
        p[l] = ((2 * l - 1) * ct * p[l - 1] - (l - 1) * p[l - 2]) / l
    rhs = np.zeros(res_beta)
    rhs[0] = 2.0
    return np.linalg.solve(p, rhs)


@functools.lru_cache(maxsize=16)
def s2_grid_matrices(lmax: int, res_beta: int, res_alpha: int,
                     mode: str = "gauss") -> Tuple[np.ndarray, np.ndarray]:
    """(to_grid [G, (L)^2], from_grid [(L)^2, G]) with from @ to == I.

    ``mode="gauss"``: Gauss-Legendre nodes in cos(beta) x uniform alpha,
    'integral'-normalized basis — this repo's original quadrature (exact
    roundtrip, NOT what e3nn checkpoints were trained with).

    ``mode="e3nn"``: reference-exact reconstruction of e3nn's
    ``ToS2Grid``/``FromS2Grid`` with ``normalization="component"`` as the
    reference's ``SO3_Grid`` builds them (ref: so3.py:534-643 +
    equiformer_v2_oc20.py:306-312): midpoint betas ``(j+0.5)/n*pi``,
    uniform alphas ``2*pi*j/n``, e3nn's y-up grid embedding
    (``angles_to_xyz``: x = sin b sin a, y = cos b, z = sin b cos a),
    Driscoll–Healy beta weights, and the component per-l scale
    ``c_l = sqrt(4*pi / ((2l+1)(lmax+1)))`` applied before / removed after
    the grid (it reaches the pointwise nonlinearity, so it is part of the
    model function).  ``c_l`` is pinned by e3nn's documented semantics, not
    copied code (e3nn is unavailable in this image): (i) the roundtrip
    ``FromS2Grid(ToS2Grid(x)) == x`` forces the from-side scale to be the
    exact inverse; (ii) e3nn's stated contract for ``component`` — iid
    unit-variance coefficients give a grid signal where every degree l
    contributes EQUAL variance, total 1 — with orthonormal-basis evaluation
    (Unsold: sum_m Y_lm(x)^2 = (2l+1)/(4pi)) uniquely gives
    ``c_l^2 (2l+1)/(4pi) = 1/(lmax+1)``; (iii) the companion ``norm`` mode
    (per-component variance 1/(2l+1)) must differ by exactly sqrt(2l+1),
    matching e3nn's constant-in-l ``norm`` factor.  The matrices are
    expressed directly in OUR real-SH basis: for any orthogonal per-l basis
    change ``P`` between e3nn's harmonics and ours, ``T_ours = T_e3nn @ P``
    and ``Y_e3nn = P @ Y_ours`` cancel (and diag(c_l) commutes with the
    per-l blocks of P), leaving exactly "our basis evaluated at e3nn's
    physical points" — so imported e3nn-trained checkpoints see the
    quadrature and scaling they were trained with.
"""
    alphas = np.linspace(0, 2 * np.pi, res_alpha, endpoint=False)
    if mode == "e3nn":
        betas = (np.arange(res_beta) + 0.5) / res_beta * np.pi
        ct, st = np.cos(betas), np.sin(betas)
        # e3nn angles_to_xyz (y-up): beta from +y, alpha about y from +z
        pts = np.stack(
            [
                np.outer(st, np.sin(alphas)).ravel(),
                np.outer(ct, np.ones_like(alphas)).ravel(),
                np.outer(st, np.cos(alphas)).ravel(),
            ],
            axis=-1,
        )
        w_beta = soft_grid_weights(res_beta)
    elif mode == "gauss":
        ct, w_beta = np.polynomial.legendre.leggauss(res_beta)
        st = np.sqrt(1 - ct**2)
        pts = np.stack(
            [
                np.outer(st, np.cos(alphas)).ravel(),
                np.outer(st, np.sin(alphas)).ravel(),
                np.outer(ct, np.ones_like(alphas)).ravel(),
            ],
            axis=-1,
        )
    else:
        raise ValueError(f"unknown s2 grid mode {mode!r}")
    y = real_sph_harm(lmax, pts)  # [(L)^2, G]
    w = (np.outer(w_beta, np.ones_like(alphas)) * (2 * np.pi / res_alpha)).ravel()
    to_grid = y.T
    from_grid = y * w  # quadrature: integral of Y_i Y_j over S^2 = delta_ij
    if mode == "e3nn":
        c = np.concatenate(
            [np.full(2 * l + 1, math.sqrt(4 * np.pi / ((2 * l + 1) * (lmax + 1))))
             for l in range(lmax + 1)]
        )
        to_grid = to_grid * c[None, :]
        from_grid = from_grid / c[:, None]
    return to_grid.astype(np.float32), from_grid.astype(np.float32)


@functools.lru_cache(maxsize=8)
def m_primary_order(lmax: int, mmax: int) -> Tuple[np.ndarray, tuple]:
    """Row order for the m-primary coefficient layout and its block ranges.

    Order: [m=0 block (l=0..lmax)], then for m=1..mmax [+m block (l=m..lmax),
    -m block], then the (unused, |m|>mmax) coefficients.  This is the
    reference's ``to_m`` relayout (ref: so3.py CoefficientMappingModule
    :79-100) — with the permutation BAKED INTO the per-edge Wigner matrices,
    SO(2) convs slice contiguous row ranges instead of doing per-m one-hot
    select/scatter matmuls (profiled at ~45% of the EqV2 forward).

    Returns (perm [dim] — perm[new_row] = old l-primary index, ranges: tuple
    of (start, stop) per block in slice order m0, +1, -1, +2, -2, ...).
    """
    order = []
    ranges = []
    start = 0
    idx0 = [l * l + l for l in range(lmax + 1)]
    order += idx0
    ranges.append((start, start + len(idx0)))
    start += len(idx0)
    for m in range(1, mmax + 1):
        pos = [l * l + l + m for l in range(m, lmax + 1)]
        neg = [l * l + l - m for l in range(m, lmax + 1)]
        order += pos
        ranges.append((start, start + len(pos)))
        start += len(pos)
        order += neg
        ranges.append((start, start + len(neg)))
        start += len(neg)
    used = set(order)
    tail = [i for i in range((lmax + 1) ** 2) if i not in used]
    order += tail
    return np.asarray(order, np.int64), tuple(ranges)


@functools.lru_cache(maxsize=8)
def m_primary_perm(lmax: int, mmax: int) -> np.ndarray:
    """Permutation matrix P [dim, dim] with (P x)[new] = x[perm[new]]."""
    order, _ = m_primary_order(lmax, mmax)
    dim = (lmax + 1) ** 2
    p = np.zeros((dim, dim), np.float32)
    p[np.arange(dim), order] = 1.0
    return p


@functools.lru_cache(maxsize=8)
def m_trunc_rescale(lmax: int, mmax: int) -> np.ndarray:
    """Per-coefficient rescale for m-truncated rotate_inv / S^2 grids
    (ref: so3.py CoefficientMappingModule.get_rotate_inv_rescale :158-186 and
    SO3_Grid :576-611): rows with l > mmax scale by sqrt((2l+1)/(2mmax+1)) to
    compensate the dropped |m| > mmax components.  Returns [(lmax+1)^2]."""
    scale = np.ones((lmax + 1) ** 2, np.float32)
    for l in range(mmax + 1, lmax + 1):
        scale[l * l : (l + 1) * (l + 1)] = math.sqrt((2 * l + 1) / (2 * mmax + 1))
    return scale


def l1_coeffs_to_vector(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Real-SH l=1 coefficients (m=-1,0,1) -> cartesian vector.

    With our convention Y_{1,-1} ~ y, Y_{1,0} ~ z, Y_{1,1} ~ x (up to one
    common constant, which a learned head absorbs); signs verified by the
    equivariance tests.
    """
    return jnp.stack([coeffs[..., 2], coeffs[..., 0], coeffs[..., 1]], axis=-1)
