"""Losses.

- :func:`denoising_loss` — the sigma^2-weighted score-matching loss of the
  DenoisingTrainer (ref: adsorbdiff/trainers/sde_denoising_trainer.py:675-728).
- masked S2EF losses (``l2mae``/``mae``/``mse``/``atomwise_l2``) mirroring
  modules/loss.py:10-46.

The reference wraps losses in ``DDPLoss`` which rescales a sum-reduced loss by
``world_size / all_reduce(num_samples)`` so per-sample means match single-GPU
semantics under DDP gradient averaging (ref: modules/loss.py:48-102).  In the
single-controller JAX design the jitted step computes the GLOBAL mean over the
full (mesh-sharded) batch directly, so that machinery is unnecessary — XLA
inserts the psum.  NaN handling matches the reference: non-finite predictions
are zeroed inside the loss (ref: loss.py:78-82), and the trainer skips the
update when the total loss is non-finite (ref: sde_denoising_trainer.py:428-440).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from adsorbdiff_tpu.data.schema import AtomsBatch
from adsorbdiff_tpu.diffusion.schedules import NoiseTargets
from adsorbdiff_tpu.ops import igso3
from adsorbdiff_tpu.ops.segment import masked_mean


def denoising_loss(
    out_positions: jnp.ndarray,  # [B, N, 3] translation-score head
    out_positions_free: Optional[jnp.ndarray],  # [B, N, 3] rotation-score head (so3)
    batch: AtomsBatch,
    targets: NoiseTargets,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Score-matching loss (ref: sde_denoising_trainer.py:675-728).

    Translation head: scatter-mean over tag-2 atoms, / sigma_tr, z zeroed,
    MSE vs tr_score weighted by sigma_tr^2.  Rotation head: same mean,
    / sigma_rot, normalized by the IGSO(3) expected score norm, MSE vs
    rot_score.  (The reference reads a ``denoising_pos_coefficient`` but never
    applies it — dead code at :679-681; we follow the actual math.)
    """
    # deliberately no nan_to_num here: the reference's custom denoising loss
    # propagates NaNs so the trainer's NaN-skip guard can fire (the zeroing at
    # modules/loss.py:78-82 applies only to the DDPLoss-wrapped s2ef losses)
    pred_tr = masked_mean(out_positions, batch.ads_mask, axis=1)  # [B, 3]
    pred_tr = pred_tr / targets.tr_sigma[:, None]
    pred_tr = pred_tr.at[:, -1].set(0.0)
    loss_tr = jnp.mean((pred_tr - targets.tr_score) ** 2 * targets.tr_sigma[:, None] ** 2)

    aux = {"loss_tr": loss_tr}
    loss = loss_tr
    if out_positions_free is not None:
        pred_rot = masked_mean(out_positions_free, batch.ads_mask, axis=1)
        pred_rot = pred_rot / targets.rot_sigma[:, None]
        norm = igso3.score_norm(targets.rot_sigma)[:, None]
        loss_rot = jnp.mean(((pred_rot - targets.rot_score) / norm) ** 2)
        aux["loss_rot"] = loss_rot
        loss = loss + loss_rot
    aux["loss"] = loss
    return loss, aux


def l2mae(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over rows of the L2 norm of the row error (ref: modules/loss.py:10-21)."""
    err = jnp.linalg.norm(jnp.nan_to_num(pred) - target, axis=-1)
    return jnp.sum(jnp.where(mask, err, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def mae(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    err = jnp.abs(jnp.nan_to_num(pred) - target)
    m = mask
    while m.ndim < err.ndim:
        m = m[..., None]
    return jnp.sum(jnp.where(m, err, 0.0)) / jnp.maximum(jnp.sum(m * jnp.ones_like(err)), 1)


def mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    err = (jnp.nan_to_num(pred) - target) ** 2
    m = mask
    while m.ndim < err.ndim:
        m = m[..., None]
    return jnp.sum(jnp.where(m, err, 0.0)) / jnp.maximum(jnp.sum(m * jnp.ones_like(err)), 1)


def atomwise_l2(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray, natoms: jnp.ndarray) -> jnp.ndarray:
    """natoms-weighted row-L2 loss (ref: modules/loss.py:24-45)."""
    err = jnp.linalg.norm(jnp.nan_to_num(pred) - target, axis=-1)  # [B, N]
    w = jnp.sqrt(natoms.astype(err.dtype))[:, None]
    return jnp.sum(jnp.where(mask, w * err, 0.0)) / jnp.maximum(jnp.sum(mask), 1)
