"""Reverse-diffusion samplers — the inference engine, as one jitted scan.

Rebuild of the reference ``Denoiser`` (ref: adsorbdiff/relaxation/diffusers/
denoising_torch.py:18-511).  The reference runs a 100-step Python loop with a
model forward, per-system Python rotation loops, numpy IGSO(3) lookups and an
ASE traj write *per step* — every step syncs the host.  Here the entire
reverse process is a ``lax.scan`` over the schedule: one device dispatch per
batch, trajectory frames stacked on device and written to disk once at the
end.

Semantics preserved (reverse_sde_sampling_rot, ref: :198-367):
- init: random uniform fractional xy COM placement keeping the initial COM z
  (:215-232) — NOTE the reference draws this placement in the COLUMN lattice
  (``noise @ cell.T``); we place uniformly over the ROW (physical) lattice,
  see ops/pbc.py docstring;
- t-schedule linspace(1, 0, T+1)[:-1]; geometric sigmas; diffusion
  coefficients g_tr = sigma*sqrt(2 ln hi/lo), g_rot = 2*sigma*sqrt(ln hi/lo)
  (:237-255); dt = s[t]-s[t+1], final step uses s[-1] (:257-261);
- ODE update dx = 1/2 g^2 dt score (or SDE with injected noise, :269-293);
- xy-only translation, COM wrapped into the cell (:296-310);
- early stop after 10 consecutive converged steps (|dx| <= 1e-3), realized as
  a permanent update freeze instead of a loop break so the scan stays static
  (:312-320);
- per-system rigid rotation of the adsorbate about its COM (:322-338), with
  the rotation-score head zeroed on fixed atoms upstream
  (ref: denoising_torch.py:496-499).

Also provided: the translation-only ``reverse_sde`` (ref: :96-196) and
annealed ``langevin_dynamics`` (ref: :369-458) variants.
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adsorbdiff_tpu.common.registry import registry
from adsorbdiff_tpu.data.schema import AtomsBatch
from adsorbdiff_tpu.diffusion.schedules import ads_center
from adsorbdiff_tpu.ops.pbc import wrap_positions
from adsorbdiff_tpu.ops.rotation import axis_angle_to_matrix
from adsorbdiff_tpu.ops.segment import masked_mean

ScoreFn = Callable[[AtomsBatch], Tuple[jnp.ndarray, Optional[jnp.ndarray]]]
# score_fn(batch) -> (tr_score [B,N,3], rot_score [B,N,3] | None)


class SampleResult(NamedTuple):
    batch: AtomsBatch  # final state
    traj_pos: jnp.ndarray  # [T+1, B, N, 3] positions (frame 0 = initialized state)
    converged_at: jnp.ndarray  # [ ] int32 step where updates froze (T if never)


def _ads_mean(pred: jnp.ndarray, batch: AtomsBatch) -> jnp.ndarray:
    """tag-2 scatter-mean (ref: denoising_torch.py:460-467)."""
    return masked_mean(pred, batch.ads_mask, axis=1)


def init_placement(key: jax.Array, batch: AtomsBatch) -> AtomsBatch:
    """Random uniform fractional xy COM placement, preserving each system's
    initial COM z (ref: denoising_torch.py:215-232)."""
    b = batch.batch_size
    frac = jax.random.uniform(key, (b, 3))
    com_noise = jnp.einsum("bi,bij->bj", frac, batch.cell)  # row lattice
    com0 = ads_center(batch)
    com_noise = com_noise.at[:, -1].set(com0[:, -1])
    rel = batch.pos - com0[:, None, :]
    new_pos = rel + com_noise[:, None, :]
    return batch.replace(pos=jnp.where(batch.ads_mask[..., None], new_pos, batch.pos))


def _schedule_consts(params: dict):
    lo, hi = float(params["ads_std_low"]), float(params["ads_std_high"])
    rlo, rhi = float(params.get("rot_std_low", 0.01)), float(params.get("rot_std_high", 1.55))
    t = int(params["num_steps"])
    return lo, hi, rlo, rhi, t


def reverse_diffusion(
    score_fn: ScoreFn,
    batch: AtomsBatch,
    params: dict,
    key: jax.Array,
    *,
    with_rotation: bool = True,
    static_fn: Optional[Callable[[AtomsBatch], object]] = None,
) -> SampleResult:
    """reverse_sde_sampling_rot / reverse_sde_sampling as a lax.scan.

    ``static_fn``: optional ``batch -> static`` precomputation run ONCE per
    trajectory (after init placement); when given, the score function is
    called as ``score_fn(batch, static)``.  Used to hoist the static slab-slab
    graph candidates out of the 100-step loop
    (:func:`adsorbdiff_tpu.models.base.prepare_static_graph`) — only
    adsorbate-involving graph rows are recomputed per step.
    """
    lo, hi, rlo, rhi, num_steps = _schedule_consts(params)
    ode = bool(params.get("ode", True))
    k_init, k_noise = jax.random.split(key)
    batch = init_placement(k_init, batch)
    if static_fn is not None:
        static = static_fn(batch)
        base_score_fn = score_fn
        score_fn = lambda cur: base_score_fn(cur, static)  # noqa: E731

    s = np.linspace(1.0, 0.0, num_steps + 1)[:-1]
    dt_arr = np.empty(num_steps, np.float32)
    dt_arr[:-1] = s[:-1] - s[1:]
    dt_arr[-1] = s[-1]
    s = jnp.asarray(s, jnp.float32)
    dt_arr = jnp.asarray(dt_arr)

    log_tr = math.log(hi / lo)
    log_rot = math.log(rhi / rlo) if rhi > rlo else 0.0
    ads3 = batch.ads_mask[..., None]

    def step(carry, inp):
        pos, cvg_count, frozen_at = carry
        t_s, dt, k, it = inp
        cur = batch.replace(pos=pos)

        tr_sigma = lo ** (1 - t_s) * hi**t_s
        rot_sigma = rlo ** (1 - t_s) * rhi**t_s
        tr_g = tr_sigma * jnp.sqrt(2.0 * log_tr)
        rot_g = 2.0 * rot_sigma * jnp.sqrt(jnp.asarray(log_rot))

        noise_pred, rot_pred = score_fn(cur)
        noise_pred = _ads_mean(noise_pred, batch)  # [B, 3]

        if ode:
            dx = 0.5 * tr_g**2 * dt * noise_pred
        else:
            k1, _ = jax.random.split(k)
            z = jax.random.normal(k1, noise_pred.shape)
            dx = tr_g**2 * dt * noise_pred + tr_g * jnp.sqrt(dt) * z

        # xy only + COM wrap into the home cell (ref: :296-310)
        com = _ads_mean(pos, batch)
        dx = dx.at[:, -1].set(0.0)
        dx = wrap_positions(com + dx, batch.cell) - com

        # convergence freeze (ref: :312-320): |dx| <= 1e-3 everywhere
        converged_now = jnp.all(jnp.abs(dx) <= 1.0e-3)
        cvg_count = jnp.where(converged_now, cvg_count + 1, cvg_count)
        frozen = cvg_count >= 10
        # record the step where updates actually froze (first time cvg hits 10)
        frozen_at = jnp.minimum(frozen_at, jnp.where(frozen, it, num_steps))
        scale = jnp.where(frozen, 0.0, 1.0)
        dx = dx * scale

        if with_rotation:
            rot_pred_mean = _ads_mean(rot_pred, batch)
            if ode:
                rot_vec = 0.5 * rot_pred_mean * dt * rot_g**2
            else:
                _, k2 = jax.random.split(k)
                zr = jax.random.normal(k2, rot_pred_mean.shape)
                rot_vec = rot_pred_mean * dt * rot_g**2 + rot_g * jnp.sqrt(dt) * zr
            rot_vec = rot_vec * scale
            rot_mat = axis_angle_to_matrix(rot_vec)  # [B, 3, 3]
            rel = pos - com[:, None, :]
            new_ads = jnp.einsum("bnd,bed->bne", rel, rot_mat) + com[:, None, :] + dx[:, None, :]
        else:
            new_ads = pos + dx[:, None, :]

        new_pos = jnp.where(ads3, new_ads, pos)
        return (new_pos, cvg_count, frozen_at), new_pos

    keys = jax.random.split(k_noise, num_steps)
    init_carry = (batch.pos, jnp.zeros((), jnp.int32), jnp.asarray(num_steps, jnp.int32))
    steps_idx = jnp.arange(num_steps, dtype=jnp.int32)
    (final_pos, _, frozen_at), traj = jax.lax.scan(step, init_carry, (s, dt_arr, keys, steps_idx))
    traj = jnp.concatenate([batch.pos[None], traj], axis=0)
    final = batch.replace(pos=final_pos)
    return SampleResult(batch=final, traj_pos=traj, converged_at=frozen_at)


def langevin_dynamics(
    score_fn: ScoreFn,
    batch: AtomsBatch,
    params: dict,
    key: jax.Array,
) -> SampleResult:
    """Annealed Langevin dynamics variant (ref: denoising_torch.py:369-458).

    sigma ladder exp-spaced hi -> lo, ``n_step_each`` inner steps with
    step size ``step_lr * (sigma/sigma_min)^2`` and injected noise.
    """
    lo, hi, _, _, num_steps = _schedule_consts(params)
    n_step_each = int(params.get("n_step_each", 1))
    step_lr = float(params.get("step_lr", 1e-4))
    k_init, k_noise = jax.random.split(key)
    batch = init_placement(k_init, batch)

    sigmas = jnp.asarray(np.exp(np.linspace(np.log(hi), np.log(lo), num_steps)), jnp.float32)
    sigmas_rep = jnp.repeat(sigmas, n_step_each)
    total = num_steps * n_step_each
    ads3 = batch.ads_mask[..., None]

    def step(pos, inp):
        sigma, k = inp
        cur = batch.replace(pos=pos)
        step_size = step_lr * (sigma / sigmas[-1]) ** 2
        noise_pred, _ = score_fn(cur)
        noise_pred = _ads_mean(noise_pred, batch)
        z = jax.random.normal(k, noise_pred.shape) * jnp.sqrt(step_size * 2.0)
        dx = step_size * noise_pred + z
        com = _ads_mean(pos, batch)
        dx = dx.at[:, -1].set(0.0)
        dx = wrap_positions(com + dx, batch.cell) - com
        new_pos = jnp.where(ads3, pos + dx[:, None, :], pos)
        return new_pos, new_pos

    keys = jax.random.split(k_noise, total)
    final_pos, traj = jax.lax.scan(step, batch.pos, (sigmas_rep, keys))
    traj = jnp.concatenate([batch.pos[None], traj], axis=0)
    return SampleResult(batch=batch.replace(pos=final_pos), traj_pos=traj, converged_at=jnp.asarray(total, jnp.int32))


registry.register_sampler("reverse_sde_rot")(reverse_diffusion)
registry.register_sampler("langevin")(langevin_dynamics)
