"""LR schedules as optax-compatible functions.

Exact rebuild of the reference lambdas (ref: adsorbdiff/models/equiformer_v2/
trainers/lr_scheduler.py:20-90): linear warmup from ``warmup_factor`` to 1
over ``warmup_epochs`` *steps* (the trainer pre-multiplies epochs by steps per
epoch, ref: sde_denoising_trainer.py:254-274), then cosine decay to
``lr_min_factor`` at ``epochs`` steps (or multistep gamma decay), all scaled
by ``lr_initial``.  The default OCP warmup+milestones lambda
(ref: adsorbdiff/utils/utils.py:95-116) is ``warmup_multistep``.
"""
from __future__ import annotations

from typing import Callable, List, Sequence

import jax.numpy as jnp


def cosine_lr(lr_initial: float, warmup_steps: int, max_steps: int, warmup_factor: float, lr_min_factor: float) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = step / jnp.maximum(float(warmup_steps), 1.0)
        warm = warmup_factor * (1.0 - alpha) + alpha
        frac = step / float(max_steps)
        cos = lr_min_factor + 0.5 * (1 - lr_min_factor) * (1 + jnp.cos(jnp.pi * frac))
        scale = jnp.where(step <= warmup_steps, warm, jnp.where(step >= max_steps, lr_min_factor, cos))
        return lr_initial * scale

    return schedule


def multistep_lr(lr_initial: float, warmup_steps: int, warmup_factor: float, decay_steps: Sequence[int], decay_rate: float) -> Callable:
    decay = jnp.asarray(sorted(decay_steps), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = step / jnp.maximum(float(warmup_steps), 1.0)
        warm = warmup_factor * (1.0 - alpha) + alpha
        idx = jnp.sum(step > decay)
        return lr_initial * jnp.where(step <= warmup_steps, warm, decay_rate**idx)

    return schedule


def build_lr_schedule(optim_config: dict, n_iter_per_epoch: int) -> Callable:
    """From the reference optim config block, converting epoch-keys to steps
    (ref: sde_denoising_trainer.py:254-274: every scheduler_params key
    containing 'epochs' is multiplied by steps-per-epoch)."""
    lr_initial = float(optim_config["lr_initial"])
    params = dict(optim_config.get("scheduler_params", {}) or {})
    name = optim_config.get("scheduler", "LambdaLR")

    def steps(key, default):
        v = params.get(key, default)
        if isinstance(v, list):
            return [int(x * n_iter_per_epoch) for x in v]
        return int(v * n_iter_per_epoch)

    if name == "LambdaLR":
        lambda_type = params.get("lambda_type", "cosine")
        if lambda_type == "cosine":
            return cosine_lr(
                lr_initial,
                warmup_steps=steps("warmup_epochs", 1),
                max_steps=steps("epochs", optim_config.get("max_epochs", 1)),
                warmup_factor=float(params.get("warmup_factor", 0.2)),
                lr_min_factor=float(params.get("lr_min_factor", 0.01)),
            )
        if lambda_type == "multistep":
            return multistep_lr(
                lr_initial,
                warmup_steps=steps("warmup_epochs", 1),
                warmup_factor=float(params.get("warmup_factor", 0.2)),
                decay_steps=steps("decay_epochs", [1]),
                decay_rate=float(params.get("decay_rate", 0.1)),
            )
        raise ValueError(f"unknown lambda_type {lambda_type}")
    if name == "constant":
        return lambda step: lr_initial
    raise ValueError(f"unknown scheduler {name}")
