"""Noise schedules — the training-time forward diffusion, fully vectorized.

Rebuild of the reference's schedules, which run as data augmentation on each
batch before the model forward (ref: adsorbdiff/trainers/
sde_denoising_trainer.py:67-177).  The reference loops over systems in Python
and round-trips to numpy for every IGSO(3) draw (ref: :104-126); here the whole
schedule is one jitted, vmapped function on device.

Semantics preserved exactly:
- per-system t ~ U(0,1); geometric sigma interpolation lo^(1-t) * hi^t (:76-78)
- adsorbate COM from a tag-2 masked mean (:84-86)
- translation noise drawn isotropic N(0, sigma^2) in 3D, PBC-wrapped via the
  centered fractional double-mod, THEN z zeroed (:88-94, pbc_correction :45-64)
- rigid IGSO(3) rotation of the adsorbate about its COM (:104-126)
- +1 Angstrom z-lift of the adsorbate (:127-129)
- targets: tr_score = -noise / sigma_tr^2 (:134); rot_score from the IGSO(3)
  score table at the sampled rotation (:111-119)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from adsorbdiff_tpu.data.schema import AtomsBatch
from adsorbdiff_tpu.ops import igso3
from adsorbdiff_tpu.ops.pbc import frac_wrap_center
from adsorbdiff_tpu.ops.rotation import axis_angle_to_matrix
from adsorbdiff_tpu.ops.segment import masked_mean


@struct.dataclass
class NoiseTargets:
    """Per-system diffusion targets attached to a noised batch."""

    tr_sigma: jnp.ndarray  # [B]
    rot_sigma: jnp.ndarray  # [B]
    tr_score: jnp.ndarray  # [B, 3]
    rot_score: jnp.ndarray  # [B, 3]
    noise_vec: jnp.ndarray  # [B, 3] (the wrapped translation noise actually applied)


def geometric_sigma(t: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    """sigma(t) = lo^(1-t) * hi^t (ref: sde_denoising_trainer.py:77)."""
    return lo ** (1.0 - t) * hi**t


def ads_center(batch: AtomsBatch) -> jnp.ndarray:
    """[B, 3] adsorbate center of mass (tag-2 masked mean, ref: :84-86)."""
    return masked_mean(batch.pos, batch.ads_mask, axis=1)


def tr_so3_schedule(
    key: jax.Array, batch: AtomsBatch, params: dict
) -> Tuple[AtomsBatch, NoiseTargets]:
    """Translation (2D torus) + rotation (SO(3)) forward noising.

    params: ads_std_low/high, rot_std_low/high (ref config:
    configs/denoising/painn_so3.yml:79-83).
    """
    b = batch.batch_size
    k_t, k_tr, k_rot = jax.random.split(key, 3)

    t = jax.random.uniform(k_t, (b,))
    tr_sigma = geometric_sigma(t, float(params["ads_std_low"]), float(params["ads_std_high"]))
    rot_sigma = geometric_sigma(t, float(params["rot_std_low"]), float(params["rot_std_high"]))

    center = ads_center(batch)  # [B, 3]

    noise = jax.random.normal(k_tr, (b, 3)) * tr_sigma[:, None]
    noise = frac_wrap_center(noise, batch.cell)  # wrap BEFORE zeroing z (ref order)
    noise = noise.at[:, -1].set(0.0)

    rot_update = igso3.sample_vec(k_rot, rot_sigma)  # [B, 3]
    rot_score = igso3.score_vec(rot_sigma, rot_update)  # [B, 3]
    rot_mat = axis_angle_to_matrix(rot_update)  # [B, 3, 3]

    rel = batch.pos - center[:, None, :]
    rotated = jnp.einsum("bnd,bed->bne", rel, rot_mat)  # rel @ R^T per system
    new_ads = rotated + center[:, None, :] + noise[:, None, :]
    new_ads = new_ads.at[:, :, -1].add(1.0)  # +1 A z-lift (ref: :129)

    ads = batch.ads_mask[..., None]
    noised = batch.replace(pos=jnp.where(ads, new_ads, batch.pos))

    targets = NoiseTargets(
        tr_sigma=tr_sigma,
        rot_sigma=rot_sigma,
        tr_score=-noise / tr_sigma[:, None] ** 2,
        rot_score=rot_score,
        noise_vec=noise,
    )
    return noised, targets


def ads_com_gaussian_schedule(
    key: jax.Array, batch: AtomsBatch, params: dict
) -> Tuple[AtomsBatch, NoiseTargets]:
    """Translation-only schedule collapsing the adsorbate to its COM point
    (ref: sde_denoising_trainer.py:138-177).

    Matches the reference: noise is NOT PBC-wrapped before building the score
    target; the noised COM is wrapped into the home cell; every adsorbate atom
    is placed AT the COM.
    """
    b = batch.batch_size
    k_t, k_tr = jax.random.split(key)

    t = jax.random.uniform(k_t, (b,))
    tr_sigma = geometric_sigma(t, float(params["ads_std_low"]), float(params["ads_std_high"]))

    center = ads_center(batch)
    noise = jax.random.normal(k_tr, (b, 3)) * tr_sigma[:, None]
    noise = noise.at[:, -1].set(0.0)

    new_center = center + noise
    # reference wraps with the column-lattice here (:163-168); we use the row
    # lattice consistently (see ops.pbc.wrap_positions docstring)
    from adsorbdiff_tpu.ops.pbc import wrap_positions

    new_center = wrap_positions(new_center, batch.cell)
    new_center = new_center.at[:, -1].add(1.0)

    ads = batch.ads_mask[..., None]
    noised = batch.replace(pos=jnp.where(ads, new_center[:, None, :], batch.pos))

    targets = NoiseTargets(
        tr_sigma=tr_sigma,
        rot_sigma=jnp.ones_like(tr_sigma),
        tr_score=-noise / tr_sigma[:, None] ** 2,
        rot_score=jnp.zeros((b, 3), batch.pos.dtype),
        noise_vec=noise,
    )
    return noised, targets
