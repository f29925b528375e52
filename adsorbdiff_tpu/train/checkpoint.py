"""Checkpoint / resume via orbax.

Replaces the reference's single-file ``torch.save`` dict of
{epoch, step, state_dict, optimizer, scheduler, ema, normalizers, config,
best_val_metric, ...} (ref: adsorbdiff/trainers/base_trainer.py:625-684) with
an orbax pytree checkpoint (params / opt_state / EMA / scale_factors / step)
plus a sidecar ``config.yaml``.  The reference's DDP ``module.``-prefix
reconciliation (base_trainer.py:476-495) has no analogue — JAX params are the
same pytree on 1 or N devices.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp
import yaml


def save_checkpoint(run_dir: str, name: str, state: Any, config: Optional[dict] = None) -> str:
    """Save pytree ``state`` under ``run_dir/name`` (overwrites)."""
    path = os.path.abspath(os.path.join(run_dir, name))
    ckptr = ocp.StandardCheckpointer()
    # get_abstract/concrete state on host to avoid device-order coupling
    state = jax.device_get(state)
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    if config is not None:
        with open(path + ".config.yaml", "w") as f:
            yaml.safe_dump(_plain(config), f)
    return path


def load_checkpoint(path: str, target: Any) -> Tuple[Any, Optional[dict]]:
    """Restore a pytree shaped like ``target``; returns (state, config|None).

    ``target=None`` returns the raw saved tree (nested dicts) — used by
    callers that need to merge a structurally-different checkpoint (e.g. a
    converted torch import whose opt_state does not match the trainer's
    optimizer chain; see BaseTrainer.load_checkpoint)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        state = ckptr.restore(path)
    else:
        state = ckptr.restore(path, target=jax.device_get(target))
    config = None
    if os.path.exists(path + ".config.yaml"):
        with open(path + ".config.yaml") as f:
            config = yaml.safe_load(f)
    return state, config


def _plain(obj):
    if isinstance(obj, dict):
        return {str(k): _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)
