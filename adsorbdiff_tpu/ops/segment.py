"""Masked/segment reductions for fixed-shape padded batches.

The reference leans on torch_scatter CUDA kernels (``scatter``,
``segment_coo``, ``segment_csr``) throughout (ref:
adsorbdiff/trainers/sde_denoising_trainer.py:84-86, relaxation/optimizers/
lbfgs_torch.py:79-90). On TPU we use a dense ``[B, N]`` layout where each
system owns a padded row of atoms, so "scatter over batch" becomes a masked
reduction over the atom axis — which XLA turns into plain vector reductions
(deterministic by construction; the reference needed a special
``set_deterministic_scatter`` toggle, ref: utils/utils.py:1126-1137).

``segment_sum_fixed`` is kept for flat-edge layouts (static ``num_segments``),
where it lowers to ``jax.ops.segment_sum``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int, keepdims: bool = False, eps: float = 1e-12) -> jnp.ndarray:
    """Mean of ``x`` over ``axis`` counting only ``mask`` entries.

    ``mask`` is broadcast against ``x`` (trailing feature dims allowed).
    """
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    total = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    count = jnp.sum(m, axis=axis, keepdims=keepdims)
    return total / jnp.maximum(count, eps)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis: int, initial: float = 0.0, keepdims: bool = False) -> jnp.ndarray:
    m = mask
    while m.ndim < x.ndim:
        m = m[..., None]
    return jnp.max(jnp.where(m, x, initial), axis=axis, keepdims=keepdims)


def segment_sum_fixed(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Deterministic segment sum with a static segment count."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean_fixed(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int, eps: float = 1e-12) -> jnp.ndarray:
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    count = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    count = count.reshape(count.shape + (1,) * (total.ndim - count.ndim))
    return total / jnp.maximum(count, eps)
