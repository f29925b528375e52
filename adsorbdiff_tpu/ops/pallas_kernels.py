"""Pallas TPU kernels for the hot edge ops.

First kernel: :func:`fused_rbf_filter` — builds PaiNN's per-edge filters in
one pass: Gaussian radial basis + polynomial envelope (computed in VMEM, never
materialized to HBM) -> MXU projection with the layer's filter weights ->
edge masking.  Replaces the XLA chain ``gaussian_basis -> envelope mul ->
Dense -> where`` (ref hot path: adsorbdiff/models/painn/painn_denoising.py
:534 ``rbf_proj``; our models/painn.py PaiNNMessage) whose intermediate
``[B, N, K, R]`` basis otherwise round-trips HBM.

Grid: one program per (flattened-edge tile); the basis tile lives only in
registers/VMEM.  Shapes are padded to the (8, 128) f32 tile grid by the
wrapper.  Accuracy: matches the XLA path to ~2e-3 on TPU (mosaic's exp/pow
approximations; well below the bf16 compute noise of the message path) and to
f32 roundoff in interpret mode (tested in tests/test_pallas_kernels.py).
Wiring into PaiNN is deferred until per-op profiling is reliable on this
runtime — the standalone op is the building block for round-2 fused
gather/reduce kernels.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fused_rbf_filter_kernel(
    dist_ref,  # [TILE, 1] f32 edge distances (flattened edges)
    mask_ref,  # [TILE, 1] f32 1/0 edge validity
    w_ref,  # [R, F] f32 projection weights
    b_ref,  # [1, F] f32 projection bias
    out_ref,  # [TILE, F] f32
    *,
    num_radial: int,
    inv_cutoff: float,
    envelope_exponent: int,
):
    d_scaled = dist_ref[:] * inv_cutoff  # [TILE, 1]
    # polynomial envelope (ref: gemnet_oc/layers/radial_basis.py:18-43)
    p = float(envelope_exponent)
    a = -(p + 1) * (p + 2) / 2
    b = p * (p + 2)
    c = -p * (p + 1) / 2
    dp = d_scaled**p
    env = 1 + a * dp + b * dp * d_scaled + c * dp * d_scaled * d_scaled
    env = jnp.where(d_scaled < 1.0, env, 0.0)

    # gaussian basis on [0, 1] (ref: radial_basis.py:64-82), built in VMEM
    # mosaic iota must be integer-typed; cast after
    offsets = jax.lax.broadcasted_iota(jnp.int32, (1, num_radial), 1).astype(jnp.float32) / (num_radial - 1)
    coeff = -0.5 * ((num_radial - 1) ** 2)
    diff = d_scaled - offsets  # [TILE, R]
    basis = jnp.exp(coeff * diff * diff) * env  # envelope fused in

    # MXU projection + bias + edge mask
    filt = jnp.dot(basis, w_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (filt + b_ref[:]) * mask_ref[:]


@functools.partial(jax.jit, static_argnames=("envelope_exponent", "cutoff", "tile"))
def fused_rbf_filter(
    dist: jnp.ndarray,  # [..., K] distances
    mask: jnp.ndarray,  # [..., K] bool
    weights: jnp.ndarray,  # [R, F]
    bias: jnp.ndarray,  # [F]
    *,
    cutoff: float,
    envelope_exponent: int = 5,
    tile: int = 512,
) -> jnp.ndarray:
    """[..., K, F] masked edge filters = (gauss_rbf(d) * envelope(d)) @ W + b."""
    num_radial, f = weights.shape
    lead = dist.shape
    m = 1
    for s in lead:
        m *= s
    m_pad = _round_up(max(m, tile), tile)

    d_flat = jnp.zeros((m_pad, 1), jnp.float32).at[:m, 0].set(dist.reshape(-1).astype(jnp.float32))
    k_flat = jnp.zeros((m_pad, 1), jnp.float32).at[:m, 0].set(mask.reshape(-1).astype(jnp.float32))

    kernel = functools.partial(
        _fused_rbf_filter_kernel,
        num_radial=num_radial,
        inv_cutoff=1.0 / cutoff,
        envelope_exponent=envelope_exponent,
    )
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_radial, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, f), jnp.float32),
        interpret=jax.default_backend() == "cpu",  # CPU tests run interpreted
    )(d_flat, k_flat, weights.astype(jnp.float32), bias.reshape(1, f).astype(jnp.float32))
    return out[:m].reshape(lead + (f,))
