"""Trainers: denoising score-model training and S2EF (energy/forces) training.

TPU-native rebuild of the reference trainer stack (ref: adsorbdiff/trainers/
base_trainer.py:48-878, ocp_trainer.py:27-733, sde_denoising_trainer.py:
180-951).  The god-object torch trainer becomes:

- a pure jitted ``train_step`` (noise-inject -> forward -> sigma^2-weighted
  score loss -> grad -> AdamW+clip -> EMA), compiled once per bucket shape;
- a functional :class:`TrainState` pytree (params, opt_state, EMA, step);
- a thin Python driver loop handling data, logging, checkpoint cadence and
  the reference's divergence guards (NaN skip / loss>1e6 break,
  ref: sde_denoising_trainer.py:428-440) — the NaN "skip" is implemented
  *inside* the jitted step by masking the update, so the step graph is fixed;
- GSPMD data parallelism: the batch is sharded over the mesh's ``dp`` axis,
  params replicated; XLA inserts the gradient psum that DDP did by hand.
"""
from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from adsorbdiff_tpu.common.logging_utils import setup_logging
from adsorbdiff_tpu.common.registry import registry
from adsorbdiff_tpu.data.buckets import BucketedBatcher
from adsorbdiff_tpu.data.schema import AtomsBatch
from adsorbdiff_tpu.data.store import ShardDataset, concat_datasets
from adsorbdiff_tpu.diffusion.schedules import ads_com_gaussian_schedule, tr_so3_schedule
from adsorbdiff_tpu.models.painn import PaiNN
from adsorbdiff_tpu.parallel import mesh as meshlib
from adsorbdiff_tpu.train import checkpoint as ckpt
from adsorbdiff_tpu.train.evaluator import Evaluator
from adsorbdiff_tpu.train.loss import atomwise_l2, denoising_loss, l2mae, mae
from adsorbdiff_tpu.train.lr import build_lr_schedule


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    params: Any
    scale_factors: Any
    opt_state: Any
    ema_params: Any


def _model_from_config(model_cfg: dict, *, sampling: bool = False, mode: Optional[str] = None) -> PaiNN:
    cfg = dict(model_cfg)
    name = cfg.pop("name", "painn")
    cls = registry.get_model_class(name) if isinstance(name, str) else name
    # accept reference YAML keys; drop ones the TPU build handles elsewhere
    for k in ("scale_file", "regress_forces", "direct_forces", "use_pbc", "otf_graph", "num_elements_alias"):
        cfg.pop(k, None)
    if mode is not None:
        cfg["mode"] = mode
    if sampling:
        cfg["sampling"] = True
    if "cell_reps" in cfg:
        cfg["cell_reps"] = tuple(cfg["cell_reps"])
    return cls(**cfg)


class DenoisingTrainer:
    """Score-model training + denoising prediction (ref: sde_denoising_trainer.py:180-951)."""

    def __init__(self, config: dict, mesh="auto") -> None:
        setup_logging()
        self.config = config
        if mesh == "auto":
            # dp mesh over all local devices, capped so the configured batch
            # size divides evenly
            n = jax.device_count()
            bs = int(config["optim"].get("batch_size", 4))
            while n > 1 and bs % n != 0:
                n -= 1
            mesh = meshlib.make_mesh(n) if n > 1 else None
        self.mesh = mesh
        self.optim_cfg = config["optim"]
        self.model_cfg = config["model"]
        self.task_cfg = config.get("task", {})
        self.seed = int(config.get("seed", 0) or 0)
        self.run_dir = config.get("run_dir", "./")
        self.identifier = config.get("identifier", "run")
        self.ckpt_dir = os.path.join(self.run_dir, "checkpoints", self.identifier)
        os.makedirs(self.ckpt_dir, exist_ok=True)

        self.so3 = bool(self.model_cfg.get("so3_denoising", False))
        self.denoising_pos_params = self.optim_cfg.get("denoising_pos_params", {}) or {}
        self.schedule_fn = tr_so3_schedule if self.so3 else ads_com_gaussian_schedule

        self.model = _model_from_config(self.model_cfg)
        self.sampling_model = _model_from_config(self.model_cfg, sampling=True)

        self._datasets(config)
        self._optimizer()
        self.state: Optional[TrainState] = None
        self._step_fns: Dict[Tuple[int, int], Any] = {}
        self._predict_fns: Dict[Tuple[int, int], Any] = {}
        self.evaluator = Evaluator(task="ocp")
        self.logger = self._logger(config)
        self.step = 0
        self.epoch = 0.0
        self.best_val_metric = float(config.get("best_val_metric", 1e9))

    # ------------------------------------------------------------------ setup
    def _logger(self, config):
        if config.get("is_debug") or not config.get("logger"):
            return None
        logger_cfg = config["logger"]
        name = logger_cfg if isinstance(logger_cfg, str) else logger_cfg.get("name", "tensorboard")
        cls = registry.get_logger_class(name)
        return cls({"cmd": {"logs_dir": os.path.join(self.run_dir, "logs", self.identifier)}, "logger": logger_cfg if isinstance(logger_cfg, dict) else {}})

    def _datasets(self, config) -> None:
        ds_cfg = config.get("dataset")
        self.train_dataset = self.val_dataset = self.relax_dataset = None
        self.train_batcher = self.val_batcher = self.relax_batcher = None
        bs = int(self.optim_cfg.get("batch_size", 4))
        eval_bs = int(self.optim_cfg.get("eval_batch_size", bs))
        if ds_cfg:
            entries = ds_cfg if isinstance(ds_cfg, list) else [ds_cfg]
            self.train_dataset = ShardDataset(entries[0]) if entries[0].get("src") else None
            if self.train_dataset is not None:
                self.train_batcher = BucketedBatcher(self.train_dataset, bs, seed=self.seed, shuffle=True)
            if len(entries) > 1 and entries[1].get("src"):
                self.val_dataset = ShardDataset(entries[1])
                self.val_batcher = BucketedBatcher(self.val_dataset, eval_bs, seed=self.seed, shuffle=False)
        relax_cfg = self.task_cfg.get("relax_dataset")
        if relax_cfg and relax_cfg.get("src"):
            self.relax_dataset = ShardDataset(relax_cfg)
            self.relax_batcher = BucketedBatcher(self.relax_dataset, eval_bs, seed=self.seed, shuffle=False)

    def _optimizer(self) -> None:
        n_iter = len(self.train_batcher) if self.train_batcher is not None else 1
        self.lr_schedule = build_lr_schedule(
            {**self.optim_cfg, "scheduler_params": {**(self.optim_cfg.get("scheduler_params", {}) or {}), "epochs": self.optim_cfg.get("max_epochs", 1)}},
            n_iter,
        )
        wd = float((self.optim_cfg.get("optimizer_params", {}) or {}).get("weight_decay", 0.0))
        clip = self.optim_cfg.get("clip_grad_norm")
        chain = []
        if clip:
            chain.append(optax.clip_by_global_norm(float(clip)))
        chain.append(optax.adamw(self.lr_schedule, weight_decay=wd))
        self.tx = optax.chain(*chain)
        self.ema_decay = self.optim_cfg.get("ema_decay")

    # ------------------------------------------------------------ state mgmt
    def init_state(self, example_batch: AtomsBatch) -> TrainState:
        variables = self.model.init(jax.random.PRNGKey(self.seed), example_batch)
        params = variables["params"]
        scale_factors = variables.get("scale_factors", {})
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            scale_factors=scale_factors,
            opt_state=self.tx.init(params),
            # distinct buffers: the step donates its input state, and donating
            # aliased params/ema twice is an XLA error
            ema_params=jax.tree.map(jnp.copy, params),
        )
        if self.mesh is not None:
            state = meshlib.replicate_tree(state, self.mesh)
        self.state = state
        return state

    def load_checkpoint(self, path: str) -> None:
        if self.state is None:
            raise RuntimeError("init_state(example_batch) before load_checkpoint")
        self.state, _ = ckpt.load_checkpoint(path, self.state)
        self.step = int(self.state.step)

    def save(self, name: str = "checkpoint") -> str:
        return ckpt.save_checkpoint(self.ckpt_dir, name, self.state, config=self.config)

    # -------------------------------------------------------------- step fns
    def _make_train_step(self):
        model, tx, schedule_fn = self.model, self.tx, self.schedule_fn
        so3 = self.so3
        params_cfg = self.denoising_pos_params
        ema_decay = self.ema_decay

        def train_step(state: TrainState, batch: AtomsBatch, key: jax.Array):
            noised, targets = schedule_fn(key, batch, params_cfg)

            def loss_fn(params):
                out = model.apply({"params": params, "scale_factors": state.scale_factors}, noised)
                out1, out2 = (out if so3 else (out, None))
                return denoising_loss(out1, out2, noised, targets)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            # reference guard: skip the update on non-finite loss
            # (sde_denoising_trainer.py:428-434) — masked update keeps one graph
            good = jnp.isfinite(loss)
            grads = jax.tree.map(lambda g: jnp.where(good, g, 0.0), grads)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_params = jax.tree.map(lambda n, o: jnp.where(good, n, o), new_params, state.params)
            new_opt = jax.tree.map(
                lambda n, o: jnp.where(good, n, o) if hasattr(n, "shape") else n, new_opt, state.opt_state
            )
            if ema_decay:
                d = jnp.where(good, float(ema_decay), 1.0)
                new_ema = jax.tree.map(lambda e, p: e * d + (1 - d) * p, state.ema_params, new_params)
            else:
                new_ema = new_params
            aux = dict(aux)
            aux["grad_norm"] = optax.global_norm(grads)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt,
                ema_params=new_ema,
            )
            return new_state, aux

        return jax.jit(train_step, donate_argnums=(0,))

    def _get_step_fn(self, batch: AtomsBatch):
        key = (batch.batch_size, batch.max_atoms)
        if key not in self._step_fns:
            self._step_fns[key] = self._make_train_step()
        return self._step_fns[key]

    def _make_predict_fn(self, use_ema: bool = True):
        model = self.sampling_model
        so3 = self.so3

        def predict(state: TrainState, batch: AtomsBatch):
            params = state.ema_params if use_ema else state.params
            out = model.apply({"params": params, "scale_factors": state.scale_factors}, batch)
            out1, out2 = (out if so3 else (out, None))
            if out2 is not None:
                # zero rotation output on fixed atoms (ref: denoising_torch.py:496-499)
                out2 = jnp.where(batch.fixed[..., None], 0.0, out2)
            return out1, out2

        return jax.jit(predict)

    def predict_denoising(self, batch: AtomsBatch):
        """Score prediction for the sampler (ref: sde_denoising_trainer.py:555-673,
        per_image=False path)."""
        key = (batch.batch_size, batch.max_atoms)
        if key not in self._predict_fns:
            self._predict_fns[key] = self._make_predict_fn()
        return self._predict_fns[key](self.state, batch)

    # ------------------------------------------------------------------ train
    def train(self, disable_eval_tqdm: bool = True) -> None:
        assert self.train_batcher is not None, "no training dataset configured"
        optim = self.optim_cfg
        n_iter = len(self.train_batcher)
        eval_every = int(optim.get("eval_every", n_iter))
        checkpoint_every = int(optim.get("checkpoint_every", eval_every))
        max_epochs = int(optim.get("max_epochs", 1))
        print_every = int(self.config.get("print_every", 100))
        root_key = jax.random.PRNGKey(self.seed)

        if self.state is None:
            first = next(iter(self.train_batcher))
            self.init_state(first)

        start_epoch = self.step // n_iter
        nan_count = 0
        metrics: Dict[str, Any] = {}
        t_last = time.time()
        pending: list = []  # device loss scalars since last sync (async dispatch)

        def drain() -> bool:
            """Sync pending losses in ONE readback; returns False to stop.

            Per-step device->host syncs pay a full tunnel round-trip each; the
            divergence guards only need loss values at logging granularity
            because the jitted step already masks NaN updates on device.
            """
            nonlocal nan_count, metrics
            if not pending:
                return True
            vals = np.asarray(jax.device_get(jnp.stack(pending)))
            pending.clear()
            for loss in vals:
                loss = float(loss)
                if not np.isfinite(loss):
                    nan_count += 1
                    if nan_count > 10:
                        logging.warning("Too many NaN losses, stopping training")
                        return False
                    continue
                nan_count = 0
                if loss > 1e6:
                    logging.warning(f"Loss too high: {loss}")
                    return False
                metrics = self.evaluator.update("loss", loss, metrics)
            return True

        for epoch in range(start_epoch, max_epochs):
            self.train_batcher.set_epoch(epoch)
            skip_steps = self.step % n_iter
            for i, batch in enumerate(self.train_batcher):
                if i < skip_steps:
                    continue
                self.epoch = epoch + (i + 1) / n_iter
                self.step = epoch * n_iter + i + 1
                batch = meshlib.shard_batch(batch, self.mesh)
                step_fn = self._get_step_fn(batch)
                key = jax.random.fold_in(root_key, self.step)
                self.state, aux = step_fn(self.state, batch, key)
                pending.append(aux["loss"])

                boundary = self.step % print_every == 0 or i == 0 or i == n_iter - 1
                if boundary:
                    if not drain():
                        return
                    dt = time.time() - t_last
                    t_last = time.time()
                    lr = float(self.lr_schedule(self.step))
                    log = {k: metrics[k]["metric"] for k in metrics}
                    log.update({"lr": lr, "epoch": self.epoch, "step": self.step})
                    logging.info(", ".join(f"{k}: {v:.2e}" for k, v in log.items()) + f" ({dt:.1f}s)")
                    if self.logger:
                        self.logger.log(log, step=self.step, split="train")

                if checkpoint_every != -1 and self.step % checkpoint_every == 0:
                    if not drain():
                        return
                    self.save("checkpoint")
                if self.step % eval_every == 0 and self.val_batcher is not None:
                    if not drain():
                        return
                    val_metrics = self.validate("val")
                    self._update_best(val_metrics)
            if checkpoint_every == -1:
                if not drain():
                    return
                self.save("checkpoint")
        drain()

    def _update_best(self, val_metrics: dict) -> None:
        primary = self.task_cfg.get("primary_metric", "loss")
        if primary in val_metrics and val_metrics[primary]["metric"] < self.best_val_metric:
            self.best_val_metric = val_metrics[primary]["metric"]
            self.save("best_checkpoint")

    def validate(self, split: str = "val") -> dict:
        """EMA-weighted validation loss under freshly sampled noise
        (ref: sde_denoising_trainer.py:286-368)."""
        batcher = self.val_batcher if split == "val" else self.relax_batcher
        assert batcher is not None
        model, so3 = self.model, self.so3
        params_cfg = self.denoising_pos_params
        schedule_fn = self.schedule_fn

        @partial(jax.jit)
        def eval_step(state: TrainState, batch: AtomsBatch, key):
            noised, targets = schedule_fn(key, batch, params_cfg)
            out = model.apply({"params": state.ema_params, "scale_factors": state.scale_factors}, noised)
            out1, out2 = (out if so3 else (out, None))
            return denoising_loss(out1, out2, noised, targets)

        metrics: Dict[str, Any] = {}
        key = jax.random.PRNGKey(self.seed + 1)
        for i, batch in enumerate(batcher):
            batch = meshlib.shard_batch(batch, self.mesh)
            loss, aux = eval_step(self.state, batch, jax.random.fold_in(key, i))
            metrics = self.evaluator.update("loss", float(loss), metrics)
        log = {k: metrics[k]["metric"] for k in metrics}
        logging.info(f"[{split}] " + ", ".join(f"{k}: {v:.4f}" for k, v in log.items()))
        if self.logger:
            self.logger.log(log, step=self.step, split=split)
        return metrics


registry.register_trainer("denoising")(DenoisingTrainer)
registry.register_trainer("adsorbdiff_tpu.train.trainer.DenoisingTrainer")(DenoisingTrainer)
