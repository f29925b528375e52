"""IGSO(3) (isotropic Gaussian on SO(3)) sampling and score tables.

TPU-native rebuild of the reference's SO(3) diffusion math
(ref: adsorbdiff/utils/rot_utils.py:140-264):

- the truncated-series expansion f(w; eps) = sum_l (2l+1) e^{-l(l+1) eps^2}
  sin(w(l+1/2)) / sin(w/2) (ref: ``_expansion`` rot_utils.py:150-159),
  its marginal density over [0, pi] (``_density`` :162-170), the score
  d/dw log f (``_score`` :173-186), and the expected score norm.
- tables over a log-spaced eps grid [MIN_EPS, MAX_EPS] x omega grid (0, pi]
  are precomputed ONCE as two float64 matmuls (exp-factors @ sin-basis) —
  seconds on CPU vs the reference's minutes-long python loop — and cached to
  an npz next to the package (fixing the reference's absolute scratch-path
  cache bug at rot_utils.py:189, flagged in SURVEY.md §7).
- lookups (`sample`, `score_vec`, `score_norm`) are pure jnp interpolation,
  fully jit/vmap-safe so the sampler's hot loop never leaves the device
  (the reference round-trips to numpy per system per step,
  ref: sde_denoising_trainer.py:104-126).

Grid-index convention matches the reference exactly, including its rounding
(``round(log-relative * N_EPS)`` — note *N_EPS*, not N_EPS-1; ref:
rot_utils.py:226-233).
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MIN_EPS, MAX_EPS, N_EPS = 0.01, 2.0, 1000  # ref: rot_utils.py:9
X_N = 2000  # omega grid size, ref: rot_utils.py:10
L_TRUNC = 2000  # series truncation, ref: rot_utils.py:150

_CACHE_ENV = "ADSORBDIFF_TPU_CACHE"


def _cache_dir() -> str:
    d = os.environ.get(_CACHE_ENV)
    if d is None:
        d = os.path.join(os.path.dirname(__file__), "..", "assets")
    d = os.path.abspath(d)
    os.makedirs(d, exist_ok=True)
    return d


def _build_tables() -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Compute (omegas [X_N], cdf [N_EPS, X_N], score [N_EPS, X_N],
    exp_score_norm [N_EPS]) in float64 via matmuls."""
    eps = 10.0 ** np.linspace(np.log10(MIN_EPS), np.log10(MAX_EPS), N_EPS)  # [E]
    omegas = np.linspace(0, np.pi, X_N + 1)[1:]  # (0, pi], ref: rot_utils.py:140
    ls = np.arange(L_TRUNC, dtype=np.float64)  # [L]

    # exp_factors[e, l] = (2l+1) exp(-l(l+1) eps^2)
    exp_factors = (2 * ls + 1)[None, :] * np.exp(-ls[None, :] * (ls[None, :] + 1) * (eps**2)[:, None])

    lo = np.sin(omegas / 2)  # [W]
    dlo = 0.5 * np.cos(omegas / 2)
    hi = np.sin(np.outer(ls + 0.5, omegas))  # [L, W]
    dhi = (ls + 0.5)[:, None] * np.cos(np.outer(ls + 0.5, omegas))

    basis = hi / lo[None, :]  # sin(w(l+1/2)) / sin(w/2)
    expansion = exp_factors @ basis  # [E, W]  (ref: _expansion)

    pdf = expansion * (1 - np.cos(omegas))[None, :] / np.pi  # marginal density
    cdf = pdf.cumsum(axis=1) / X_N * np.pi  # ref: rot_utils.py:206

    # d/dw [hi/lo] = (lo*dhi - hi*dlo) / lo^2
    score_basis = (lo[None, :] * dhi - hi * dlo[None, :]) / (lo[None, :] ** 2)
    dsigma = exp_factors @ score_basis  # [E, W]
    score = dsigma / expansion  # ref: _score

    exp_score_norm = np.sqrt(np.sum(score**2 * pdf, axis=1) / np.sum(pdf, axis=1) / np.pi)
    return omegas, cdf, score, exp_score_norm


class IGSO3Tables(NamedTuple):
    """Held as NUMPY float32 arrays: callers may hit :func:`get_tables` for the
    first time *inside* a jit trace, and caching device arrays created during
    tracing would leak tracers; numpy tables are embedded as constants."""

    omegas: np.ndarray  # [X_N]
    cdf: np.ndarray  # [N_EPS, X_N]
    score_norms: np.ndarray  # [N_EPS, X_N]
    exp_score_norms: np.ndarray  # [N_EPS]


@functools.lru_cache(maxsize=1)
def get_tables() -> IGSO3Tables:
    path = os.path.join(_cache_dir(), f"igso3_e{N_EPS}_w{X_N}_l{L_TRUNC}.npz")
    if os.path.exists(path):
        z = np.load(path)
        arrs = (z["omegas"], z["cdf"], z["score"], z["exp_score_norm"])
    else:
        arrs = _build_tables()
        omegas, cdf, score, exp_score_norm = arrs
        tmp = path[: -len(".npz")] + ".tmp.npz"  # savez appends .npz if missing
        np.savez_compressed(tmp, omegas=omegas, cdf=cdf, score=score, exp_score_norm=exp_score_norm)
        os.replace(tmp, path)
    omegas, cdf, score, exp_score_norm = arrs
    f32 = lambda a: np.asarray(a, dtype=np.float32)  # noqa: E731
    return IGSO3Tables(f32(omegas), f32(cdf), f32(score), f32(exp_score_norm))


def eps_index(eps: jnp.ndarray) -> jnp.ndarray:
    """Log-spaced grid index with the reference's rounding (ref: rot_utils.py:227-232)."""
    idx = (jnp.log10(eps) - np.log10(MIN_EPS)) / (np.log10(MAX_EPS) - np.log10(MIN_EPS)) * N_EPS
    return jnp.clip(jnp.round(idx).astype(jnp.int32), 0, N_EPS - 1)


def sample_omega(key: jax.Array, eps: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF sample of the rotation angle, batched over eps [...].

    ref: rot_utils.py:226-235.
    """
    t = get_tables()
    idx = eps_index(eps)
    u = jax.random.uniform(key, eps.shape)
    omegas = jnp.asarray(t.omegas)
    interp = lambda x, row: jnp.interp(x, row, omegas)  # noqa: E731
    for _ in range(eps.ndim):
        interp = jax.vmap(interp)
    return interp(u, jnp.asarray(t.cdf)[idx])


def sample_vec(key: jax.Array, eps: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle samples from IGSO(3), shape eps.shape + (3,) (ref: rot_utils.py:238-241)."""
    k_dir, k_om = jax.random.split(key)
    x = jax.random.normal(k_dir, eps.shape + (3,))
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x * sample_omega(k_om, eps)[..., None]


def score_vec(eps: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """Score of IGSO(3) at axis-angle ``vec`` (eps [...], vec [..., 3]).

    ref: rot_utils.py:244-253.
    """
    t = get_tables()
    idx = eps_index(eps)
    om = jnp.linalg.norm(vec, axis=-1)
    omegas = jnp.asarray(t.omegas)
    interp = lambda x, row: jnp.interp(x, omegas, row)  # noqa: E731
    for _ in range(eps.ndim):
        interp = jax.vmap(interp)
    mag = interp(om, jnp.asarray(t.score_norms)[idx])
    return mag[..., None] * vec / jnp.maximum(om, 1e-12)[..., None]


def score_norm(eps: jnp.ndarray) -> jnp.ndarray:
    """Expected score norm sqrt(E[|score|^2]) at eps (ref: rot_utils.py:256-264)."""
    t = get_tables()
    return jnp.asarray(t.exp_score_norms)[eps_index(eps)]
