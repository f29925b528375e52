"""Trainers: base machinery + denoising score training + S2EF training.

TPU-native rebuild of the reference trainer stack (ref: adsorbdiff/trainers/
base_trainer.py:48-878, ocp_trainer.py:27-733, sde_denoising_trainer.py:
180-951).  The god-object torch trainer becomes:

- a pure jitted ``train_step`` compiled once per bucket shape;
- a functional :class:`TrainState` pytree (params, opt_state, EMA, step);
- a thin Python driver loop handling data, logging, checkpoint cadence and
  the reference's divergence guards (NaN skip / loss>1e6 break,
  ref: sde_denoising_trainer.py:428-440) — the NaN "skip" is implemented
  *inside* the jitted step by masking the update, so the step graph is fixed;
- GSPMD data parallelism: the batch is sharded over the mesh's ``dp`` axis,
  params replicated; XLA inserts the gradient psum that DDP did by hand.

Host->device syncs are batched: loss scalars accumulate as device arrays and
drain in one readback per logging window (device->host round-trips through
the TPU tunnel are the latency hazard, not dispatch).
"""
from __future__ import annotations

import logging
import os
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from adsorbdiff_tpu.common.logging_utils import setup_logging
from adsorbdiff_tpu.common.registry import registry
from adsorbdiff_tpu.data.buckets import BucketedBatcher
from adsorbdiff_tpu.data.schema import AtomsBatch
from adsorbdiff_tpu.data.store import ShardDataset
from adsorbdiff_tpu.diffusion.schedules import ads_com_gaussian_schedule, tr_so3_schedule
from adsorbdiff_tpu.parallel import mesh as meshlib
from adsorbdiff_tpu.train import checkpoint as ckpt
from adsorbdiff_tpu.train.evaluator import Evaluator
from adsorbdiff_tpu.train.loss import atomwise_l2, denoising_loss, l2mae, mae, mse
from adsorbdiff_tpu.train.lr import build_lr_schedule
from adsorbdiff_tpu.train.normalizer import Normalizer


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    params: Any
    scale_factors: Any
    opt_state: Any
    ema_params: Any


def _model_from_config(
    model_cfg: dict, *, sampling: bool = False, mode: Optional[str] = None, amp: bool = False,
    training: bool = False,
):
    from adsorbdiff_tpu.common.imports import setup_imports

    setup_imports()
    cfg = dict(model_cfg)
    if amp and "compute_dtype" not in cfg:
        # --amp => bfloat16 compute where the model supports it (replaces the
        # reference's torch.cuda.amp autocast + GradScaler, ref:
        # sde_denoising_trainer.py:424, base_trainer.py _backward)
        cfg["compute_dtype"] = "bfloat16"
    name = cfg.pop("name", "painn")
    cls = registry.get_model_class(name) if isinstance(name, str) else name
    # accept reference YAML keys the TPU build handles elsewhere
    for k in ("scale_file", "regress_forces", "direct_forces", "use_pbc", "otf_graph"):
        cfg.pop(k, None)
    if mode is not None:
        cfg["mode"] = mode
    if sampling:
        cfg["sampling"] = True
    if "cell_reps" in cfg:
        cfg["cell_reps"] = tuple(cfg["cell_reps"])
    fields = getattr(cls, "__dataclass_fields__", {})
    if "training" in fields:
        # train-mode instance enables dropout/drop-path (EqV2); dropout holds
        # no params so train/eval instances share the same param pytree
        cfg["training"] = bool(training)
    elif "training" in cfg:
        cfg.pop("training")
    for k in ("alpha_drop", "drop_path_rate", "proj_drop"):
        if k in cfg and k not in fields:
            cfg.pop(k)  # models without the regularizer accept-and-drop the key
    return cls(**cfg)


class BaseTrainer:
    """Common machinery (ref: trainers/base_trainer.py:48-878)."""

    name = "base"

    def __init__(self, config: dict, mesh="auto") -> None:
        setup_logging()
        self.config = config
        if mesh == "auto":
            n = jax.device_count()
            bs = int(config["optim"].get("batch_size", 4))
            while n > 1 and bs % n != 0:
                n -= 1
            mesh = meshlib.make_mesh(n) if n > 1 else None
        self.mesh = mesh
        # pallas ops under a mesh run as per-shard shard_map islands — GSPMD
        # would otherwise replicate them (see set_pallas_mesh).  Always set
        # (including None) so a single-device trainer clears any stale mesh a
        # previous multi-device trainer left in this process.
        from adsorbdiff_tpu.ops.pallas_kernels import set_pallas_mesh

        set_pallas_mesh(self.mesh)
        self.optim_cfg = config["optim"]
        # ZeRO-3 parameter/optimizer/EMA sharding over the dp axis
        # (optim.fsdp: true); see parallel/mesh.py::fsdp_shardings
        self.fsdp = bool(self.optim_cfg.get("fsdp")) and self.mesh is not None
        self.fsdp_min_size = int(self.optim_cfg.get("fsdp_min_size", 8192))
        self.state_shardings = None
        self.model_cfg = config["model"]
        self.task_cfg = config.get("task", {})
        self.seed = int(config.get("seed", 0) or 0)
        self.run_dir = config.get("run_dir", "./")
        self.identifier = config.get("identifier", "run") or "run"
        self.ckpt_dir = os.path.join(self.run_dir, "checkpoints", self.identifier)
        self.results_dir = os.path.join(self.run_dir, "results", self.identifier)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        os.makedirs(self.results_dir, exist_ok=True)

        amp = bool(config.get("amp"))
        self._datasets(config)  # before models: cell_reps:auto reads the data
        self._resolve_auto_cell_reps()
        try:
            self.model = _model_from_config(self.model_cfg, mode=self._model_mode(), amp=amp)
            self.train_model = _model_from_config(
                self.model_cfg, mode=self._model_mode(), amp=amp, training=True
            )
        except TypeError:
            # model class without a compute_dtype field
            self.model = _model_from_config(self.model_cfg, mode=self._model_mode())
            self.train_model = _model_from_config(self.model_cfg, mode=self._model_mode(), training=True)
        self._normalizers(config)
        self._optimizer()
        self.state: Optional[TrainState] = None
        # explicit ScaleFactor fitted-state (ref: scale_factor.py:53-82):
        # True once a scale file / checkpoint supplies fitted values — the
        # value==1.0 heuristic alone false-positives on legitimate 1.0 factors
        self.scale_factors_fitted: Optional[bool] = None
        self._step_fns: Dict[Tuple[int, int], Any] = {}
        self._eval_fns: Dict[Tuple[int, int], Any] = {}
        self.evaluator = Evaluator(task=self.name if self.name in Evaluator.task_metrics else "ocp")
        self.logger = self._logger(config)
        self.step = 0
        self.epoch = 0.0
        self.best_val_metric = float(config.get("best_val_metric", 1e9))

    def _model_mode(self) -> Optional[str]:
        return None

    def _resolve_auto_cell_reps(self, num_samples: int = 64) -> None:
        """``model.cell_reps: auto`` — resolve the static replication counts
        from the data (:func:`adsorbdiff_tpu.ops.pbc.auto_cell_reps`): exact
        reciprocal geometry per axis plus vacuum pruning (slab z-images are
        never neighbors), maxed over a dataset sample."""
        if self.model_cfg.get("cell_reps") != "auto":
            return
        from adsorbdiff_tpu.ops.pbc import auto_cell_reps

        ds = self.train_dataset or self.relax_dataset or self.val_dataset
        cutoff = max(
            [float(v) for k, v in self.model_cfg.items() if k.startswith("cutoff")] or [12.0]
        )
        if ds is None or len(ds) == 0:
            self.model_cfg["cell_reps"] = (2, 2, 1)  # safe general default
            logging.warning("cell_reps: auto with no dataset — falling back to (2, 2, 1)")
            return
        idx = np.linspace(0, len(ds) - 1, min(len(ds), num_samples)).astype(int)
        samples = [ds[int(i)] for i in idx]
        reps = auto_cell_reps([s.pos for s in samples], [s.cell for s in samples], cutoff)
        self.model_cfg["cell_reps"] = tuple(int(r) for r in reps)
        logging.info(f"cell_reps: auto -> {self.model_cfg['cell_reps']} (cutoff {cutoff})")

    # ------------------------------------------------------------------ setup
    def _logger(self, config):
        if config.get("is_debug") or not config.get("logger"):
            return None
        logger_cfg = config["logger"]
        name = logger_cfg if isinstance(logger_cfg, str) else logger_cfg.get("name", "tensorboard")
        cls = registry.get_logger_class(name)
        return cls(
            {
                "cmd": {"logs_dir": os.path.join(self.run_dir, "logs", self.identifier)},
                "logger": logger_cfg if isinstance(logger_cfg, dict) else {},
            }
        )

    def _datasets(self, config) -> None:
        ds_cfg = config.get("dataset")
        self.train_dataset = self.val_dataset = self.relax_dataset = None
        self.train_batcher = self.val_batcher = self.relax_batcher = None
        bs = int(self.optim_cfg.get("batch_size", 4))
        eval_bs = int(self.optim_cfg.get("eval_batch_size", bs))
        with_forces = self.name == "s2ef"
        # optim.atom_budget: atom-balanced per-bucket batch sizes (batch_size
        # becomes the cap); batches stay divisible by the dp mesh
        budget_kw = dict(
            atom_budget=self.optim_cfg.get("atom_budget"),
            multiple_of=int(self.mesh.devices.size) if self.mesh is not None else 1,
        )
        if ds_cfg:
            entries = ds_cfg if isinstance(ds_cfg, list) else [ds_cfg]
            if entries[0].get("src"):
                self.train_dataset = ShardDataset(entries[0])
                self.train_batcher = BucketedBatcher(
                    self.train_dataset, bs, seed=self.seed, shuffle=True,
                    with_forces=with_forces, **budget_kw
                )
            if len(entries) > 1 and entries[1].get("src"):
                self.val_dataset = ShardDataset(entries[1])
                self.val_batcher = BucketedBatcher(
                    self.val_dataset, eval_bs, seed=self.seed, shuffle=False,
                    with_forces=with_forces, **budget_kw
                )
        relax_cfg = self.task_cfg.get("relax_dataset")
        if relax_cfg and relax_cfg.get("src"):
            self.relax_dataset = ShardDataset(relax_cfg)
            self.relax_batcher = BucketedBatcher(
                self.relax_dataset, eval_bs, seed=self.seed, shuffle=False, **budget_kw
            )

    def _normalizers(self, config) -> None:
        """Config-declared target normalizers (ref: base_trainer load_datasets
        normalize_labels/target_mean/target_std handling)."""
        self.normalizers: Dict[str, Normalizer] = {}
        ds_cfg = config.get("dataset")
        entry = (ds_cfg[0] if isinstance(ds_cfg, list) else ds_cfg) or {}
        if entry.get("normalize_labels"):
            self.normalizers["energy"] = Normalizer(
                mean=float(entry.get("target_mean", 0.0)), std=float(entry.get("target_std", 1.0))
            )
            if "grad_target_mean" in entry or "grad_target_std" in entry:
                self.normalizers["forces"] = Normalizer(
                    mean=float(entry.get("grad_target_mean", 0.0)), std=float(entry.get("grad_target_std", 1.0))
                )

    def _optimizer(self) -> None:
        n_iter = len(self.train_batcher) if self.train_batcher is not None else 1
        if str(self.optim_cfg.get("scheduler", "")) == "ReduceLROnPlateau":
            self.lr_schedule = lambda step: float(self.optim_cfg["lr_initial"])
        else:
            self.lr_schedule = build_lr_schedule(
                {
                    **self.optim_cfg,
                    "scheduler_params": {
                        **(self.optim_cfg.get("scheduler_params", {}) or {}),
                        "epochs": self.optim_cfg.get("max_epochs", 1),
                    },
                },
                n_iter,
            )
        wd = float((self.optim_cfg.get("optimizer_params", {}) or {}).get("weight_decay", 0.0))
        clip = self.optim_cfg.get("clip_grad_norm")
        chain = []
        if clip:
            chain.append(optax.clip_by_global_norm(float(clip)))
        self.plateau = str(self.optim_cfg.get("scheduler", "")) == "ReduceLROnPlateau"
        if self.plateau:
            # host-free plateau scheduling (ref: base_trainer/ocp_trainer
            # ReduceLROnPlateau path): constant base LR scaled down on-device
            # when the loss stops improving
            chain.append(optax.adamw(float(self.optim_cfg["lr_initial"]), weight_decay=wd))
            chain.append(
                optax.contrib.reduce_on_plateau(
                    factor=float(self.optim_cfg.get("factor", 0.8)),
                    patience=int(self.optim_cfg.get("patience", 3)),
                )
            )
            self.lr_schedule = lambda step: float(self.optim_cfg["lr_initial"])
        else:
            chain.append(optax.adamw(self.lr_schedule, weight_decay=wd))
        self.tx = optax.chain(*chain)
        # gradient accumulation (ref: grad_accumulation_steps in the published
        # eqv2 config — effective batch = accum * batch_size * n_devices)
        accum = int(self.optim_cfg.get("grad_accumulation_steps", 1) or 1)
        if accum > 1:
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=accum)
        self.ema_decay = self.optim_cfg.get("ema_decay")

    # ------------------------------------------------------------ state mgmt
    def init_state(self, example_batch: AtomsBatch) -> TrainState:
        variables = self.model.init(jax.random.PRNGKey(self.seed), example_batch)
        params = variables["params"]
        scale_factors = variables.get("scale_factors", {})
        scale_file = self.model_cfg.get("scale_file")
        if scale_file:
            # ref: gemnet_relax.yml:87 + modules/scaling/compat.py — fitted
            # scale factors shipped separately from the checkpoint
            from adsorbdiff_tpu.train.scaling import load_scales_compat

            scale_factors = load_scales_compat(scale_factors, scale_file)
            self.scale_factors_fitted = True
        else:
            self.scale_factors_fitted = False
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
            if self.fsdp:
                self.state_shardings = meshlib.fsdp_shardings(
                    state, self.mesh, min_size=self.fsdp_min_size
                )
                state = meshlib.shard_tree(state, self.state_shardings)
            else:
                state = meshlib.replicate_tree(state, self.mesh)
        self.state = state
        return state

    def load_checkpoint(self, path: str) -> None:
        if self.state is None:
            raise RuntimeError("init_state(example_batch) before load_checkpoint")
        try:
            self.state, _ = ckpt.load_checkpoint(path, self.state)
        except ValueError as e:
            if "tree structures do not match" not in str(e):
                raise
            # imported / converted checkpoints (train/torch_import.py) carry
            # a plain-adamw opt_state that will not line up with this
            # trainer's optimizer chain — restore the model state (params,
            # EMA, scale factors, step) and keep a fresh optimizer, which is
            # also the reference's behavior when fine-tuning from a
            # published checkpoint (base_trainer.py load_checkpoint drops
            # the optimizer on mismatch)
            logging.warning(
                "checkpoint %s: optimizer-state structure mismatch "
                "(imported checkpoint?) — restoring model state with a "
                "fresh optimizer", path)
            raw, _ = ckpt.load_checkpoint(path, None)  # raw saved tree
            asarr = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
            self.state = jax.device_get(self.state).replace(
                params=asarr(raw["params"]),
                ema_params=asarr(raw["ema_params"]),
                scale_factors=asarr(raw.get("scale_factors", {})),
                step=jnp.asarray(raw["step"]),
            )
        if self.fsdp and self.state_shardings is not None:
            # restore lands host-side; re-pin to the ZeRO shards
            self.state = meshlib.shard_tree(self.state, self.state_shardings)
        self.step = int(self.state.step)
        # a checkpoint's scale factors count as fitted, matching the reference
        # consistency check on load (scale_factor.py:53-82)
        if jax.tree.leaves(self.state.scale_factors):
            self.scale_factors_fitted = True

    def save(self, name: str = "checkpoint") -> str:
        return ckpt.save_checkpoint(self.ckpt_dir, name, self.state, config=self.config)

    # -------------------------------------------------------------- step fns
    def _make_train_step(self) -> Callable:
        raise NotImplementedError

    def _loss_and_aux(self, params, scale_factors, batch, key):
        raise NotImplementedError

    def _finalize_train_step(self, loss, aux, grads, state: TrainState):
        """Shared update: NaN-masked AdamW + clip + EMA."""
        good = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(good, g, 0.0), grads)
        if getattr(self, "plateau", False):
            updates, new_opt = self.tx.update(
                grads, state.opt_state, state.params, value=jnp.nan_to_num(loss, nan=1e9)
            )
        else:
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = jax.tree.map(lambda n, o: jnp.where(good, n, o), new_params, state.params)
        new_opt = jax.tree.map(
            lambda n, o: jnp.where(good, n, o) if hasattr(n, "shape") else n, new_opt, state.opt_state
        )
        if self.ema_decay:
            d = jnp.where(good, float(self.ema_decay), 1.0)
            new_ema = jax.tree.map(lambda e, p: e * d + (1 - d) * p, state.ema_params, new_params)
        else:
            new_ema = new_params
        aux = dict(aux)
        aux["grad_norm"] = optax.global_norm(grads)
        return state.replace(step=state.step + 1, params=new_params, opt_state=new_opt, ema_params=new_ema), aux

    def _jit_step(self, train_step: Callable):
        """jit the step fn; under FSDP pin the output state to the ZeRO
        shardings so the optimizer math stays sharded (XLA then lowers the dp
        gradient all-reduce to a reduce-scatter + all-gathers at use sites)."""
        if self.state_shardings is not None:
            return jax.jit(
                train_step, donate_argnums=(0,),
                out_shardings=(self.state_shardings, None),
            )
        return jax.jit(train_step, donate_argnums=(0,))

    def _get_step_fn(self, batch: AtomsBatch):
        key = (batch.batch_size, batch.max_atoms)
        if key not in self._step_fns:
            self._step_fns[key] = self._make_train_step()
        return self._step_fns[key]

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
            """Sync pending losses in ONE readback; False => stop training."""
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

        prefetch_depth = int(self.optim_cfg.get("prefetch_depth", 2))

        def _indexed_batches(source, skip):
            # enumerate + skip BEFORE any device transfer, so a mid-epoch
            # resume doesn't device_put the batches it then discards
            for i, b in enumerate(source):
                if i >= skip:
                    yield i, b

        for epoch in range(start_epoch, max_epochs):
            self.train_batcher.set_epoch(epoch)
            skip_steps = self.step % n_iter
            batches: Any = _indexed_batches(self.train_batcher, skip_steps)
            if prefetch_depth > 0:
                # collation + host->device transfer of batch t+1 overlap the
                # device step on batch t (data/prefetch.py)
                from adsorbdiff_tpu.data.prefetch import Prefetcher

                batches = Prefetcher(
                    batches,
                    lambda t: (t[0], meshlib.shard_batch(t[1], self.mesh)),
                    depth=prefetch_depth,
                )
            for i, batch in batches:
                self.epoch = epoch + (i + 1) / n_iter
                self.step = epoch * n_iter + i + 1
                if prefetch_depth <= 0:
                    batch = meshlib.shard_batch(batch, self.mesh)
                step_fn = self._get_step_fn(batch)
                key = jax.random.fold_in(root_key, self.step)
                self.state, aux = step_fn(self.state, batch, key)
                pending.append(aux["loss"])

                if self.step % print_every == 0 or i == 0 or i == n_iter - 1:
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
                    # periodic sampling/relaxation eval during training
                    # (ref: sde_denoising_trainer.py:504-518)
                    if self.task_cfg.get("eval_relaxations", False) and self.relax_batcher is not None:
                        self.run_relaxations()
            if checkpoint_every == -1:
                if not drain():
                    return
                self.save("checkpoint")
        drain()

    def _update_best(self, val_metrics: dict) -> None:
        primary = self.task_cfg.get("primary_metric") or "loss"
        if primary in val_metrics and val_metrics[primary]["metric"] < self.best_val_metric:
            self.best_val_metric = val_metrics[primary]["metric"]
            self.save("best_checkpoint")

    def validate(self, split: str = "val") -> dict:
        raise NotImplementedError

    # --------------------------------------------------- relaxation plumbing
    def _write_relaxed_positions(self, ids, positions, chunk_idx) -> None:
        """npz results write with repeated-sid dedup (ref: base_trainer.py:
        822-878, sde_denoising_trainer.py:862-909).  Single-controller JAX:
        one host writes the whole result — no per-rank files to merge."""
        full_path = os.path.join(self.results_dir, "relaxed_positions.npz")
        ids = np.asarray(ids)
        _, idx = np.unique(ids, return_index=True)
        pos_arr = np.array(positions, dtype=object)
        np.savez_compressed(
            full_path,
            ids=ids[idx],
            pos=np.concatenate([np.asarray(p) for p in pos_arr[idx]]) if len(idx) else np.zeros((0, 3)),
            chunk_idx=np.cumsum(np.asarray(chunk_idx)[idx])[:-1] if len(idx) else np.zeros(0, np.int64),
        )
        logging.info(f"Writing results to {full_path}")

    def _relax_metrics(self, batch: AtomsBatch, final_pos, final_energy, metrics_is2rs, metrics_is2re):
        """IS2RS / IS2RE metrics on free atoms (ref: sde_denoising_trainer.py:
        825-860, ocp_trainer.py:607-641)."""
        ev_rs, ev_re = Evaluator(task="is2rs"), Evaluator(task="is2re")
        free = np.asarray(batch.free_mask)
        natoms_free = free.sum(1)
        cells = np.asarray(batch.cell)
        pred_pos = np.asarray(final_pos)[free]
        tgt_pos = np.asarray(batch.pos_relaxed)[free]
        target = {
            "energy": np.asarray(batch.y_relaxed),
            "positions": tgt_pos,
            "cell": cells,
            "pbc": (True, True, True),
            "natoms": natoms_free,
        }
        pred = {
            "energy": np.asarray(final_energy),
            "positions": pred_pos,
            "cell": cells,
            "pbc": (True, True, True),
            "natoms": natoms_free,
        }
        metrics_is2rs = ev_rs.eval(pred, target, metrics_is2rs)
        metrics_is2re = ev_re.eval({"energy": pred["energy"]}, {"energy": target["energy"]}, metrics_is2re)
        return metrics_is2rs, metrics_is2re

    def _log_relax_metrics(self, metrics_is2rs, metrics_is2re, split="val") -> None:
        for task_name, metrics in (("is2rs", metrics_is2rs), ("is2re", metrics_is2re)):
            log = {f"{task_name}_{k}": v["metric"] for k, v in metrics.items()}
            if log:
                logging.info(f"[{task_name}] " + ", ".join(f"{k}: {v:.4f}" for k, v in log.items()))
                if self.logger:
                    self.logger.log(log, step=self.step, split=split)


@registry.register_trainer("denoising")
class DenoisingTrainer(BaseTrainer):
    """Score-model training + denoising prediction + diffusion sampling
    (ref: sde_denoising_trainer.py:180-951)."""

    name = "ocp"

    def _model_mode(self) -> Optional[str]:
        # force score-model heads regardless of the model class default
        # (PaiNN defaults to denoising, GemNetOC/EqV2 default to s2ef)
        return "denoising" if "mode" not in self.model_cfg else None

    def __init__(self, config: dict, mesh="auto") -> None:
        self.so3 = bool(config["model"].get("so3_denoising", False))
        super().__init__(config, mesh)
        self.denoising_pos_params = self.optim_cfg.get("denoising_pos_params", {}) or {}
        self.schedule_fn = tr_so3_schedule if self.so3 else ads_com_gaussian_schedule
        try:
            self.sampling_model = _model_from_config(
                self.model_cfg, sampling=True, mode=self._model_mode(), amp=bool(config.get("amp"))
            )
        except TypeError:
            self.sampling_model = _model_from_config(self.model_cfg, sampling=True, mode=self._model_mode())
        self._predict_fns: Dict[Tuple[int, int], Any] = {}

    def _make_train_step(self):
        model, so3 = self.train_model, self.so3
        schedule_fn, params_cfg = self.schedule_fn, self.denoising_pos_params

        def train_step(state: TrainState, batch: AtomsBatch, key: jax.Array):
            # pos <- pos_relaxed before noising (ref: :413-414)
            batch = batch.replace(pos=batch.pos_relaxed)
            noised, targets = schedule_fn(key, batch, params_cfg)
            # fold_in keeps the noise stream identical to the no-dropout build
            drop_key = jax.random.fold_in(key, 1)

            def loss_fn(params):
                out = model.apply(
                    {"params": params, "scale_factors": state.scale_factors}, noised,
                    rngs={"dropout": drop_key},
                )
                out1, out2 = (out if so3 else (out, None))
                return denoising_loss(out1, out2, noised, targets)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            return self._finalize_train_step(loss, aux, grads, state)

        return self._jit_step(train_step)

    def _eval_step_fn(self):
        """Cached jitted eval step (a fresh jit per validate() call would
        recompile every epoch)."""
        if "denoise_eval" not in self._eval_fns:
            model, so3 = self.model, self.so3
            schedule_fn, params_cfg = self.schedule_fn, self.denoising_pos_params

            @jax.jit
            def eval_step(state: TrainState, batch: AtomsBatch, key):
                batch = batch.replace(pos=batch.pos_relaxed)
                noised, targets = schedule_fn(key, batch, params_cfg)
                out = model.apply({"params": state.ema_params, "scale_factors": state.scale_factors}, noised)
                out1, out2 = (out if so3 else (out, None))
                return denoising_loss(out1, out2, noised, targets)

            self._eval_fns["denoise_eval"] = eval_step
        return self._eval_fns["denoise_eval"]

    def validate(self, split: str = "val") -> dict:
        """EMA-weighted validation under freshly sampled noise (ref: :286-368)."""
        batcher = self.val_batcher if split == "val" else self.relax_batcher
        assert batcher is not None
        eval_step = self._eval_step_fn()
        metrics: Dict[str, Any] = {}
        key = jax.random.PRNGKey(self.seed + 1)
        losses = []  # device scalars; ONE readback at the end (tunnel RTT)
        from adsorbdiff_tpu.data.prefetch import Prefetcher

        batches = Prefetcher(batcher, lambda b: meshlib.shard_batch(b, self.mesh))
        for i, batch in enumerate(batches):
            loss, aux = eval_step(self.state, batch, jax.random.fold_in(key, i))
            losses.append(loss)
        if losses:
            for v in np.asarray(jax.device_get(jnp.stack(losses))):
                metrics = self.evaluator.update("loss", float(v), metrics)
        log = {k: metrics[k]["metric"] for k in metrics}
        logging.info(f"[{split}] " + ", ".join(f"{k}: {v:.4f}" for k, v in log.items()))
        if self.logger:
            self.logger.log(log, step=self.step, split=split)
        return metrics

    def _make_predict_fn(self, use_ema: bool = True):
        model, so3 = self.sampling_model, self.so3

        def predict(state: TrainState, batch: AtomsBatch):
            params = state.ema_params if use_ema else state.params
            out = model.apply({"params": params, "scale_factors": state.scale_factors}, batch)
            out1, out2 = (out if so3 else (out, None))
            if out2 is not None:
                # zero rotation head on fixed atoms (ref: denoising_torch.py:496-499)
                out2 = jnp.where(batch.fixed[..., None], 0.0, out2)
            return out1, out2

        return jax.jit(predict)

    def predict_denoising(self, batch: AtomsBatch):
        """Score prediction for the sampler (ref: :555-673, per_image=False)."""
        key = (batch.batch_size, batch.max_atoms)
        if key not in self._predict_fns:
            self._predict_fns[key] = self._make_predict_fn()
        return self._predict_fns[key](self.state, batch)

    def score_fn(self, batch: AtomsBatch, static_graph=None):
        """Traceable score function for jitted samplers."""
        out = self.sampling_model.apply(
            {"params": self.state.ema_params, "scale_factors": self.state.scale_factors},
            batch, static_graph,
        )
        out1, out2 = (out if self.so3 else (out, None))
        if out2 is not None:
            out2 = jnp.where(batch.fixed[..., None], 0.0, out2)
        return out1, out2

    def sampling_static_fn(self):
        """``batch -> static-graph`` hoist for the sampling scan, or None.

        Enabled by default (exact-same-table incremental graphs; disable with
        ``task.incremental_graph: false``)."""
        if not self.task_cfg.get("incremental_graph", True):
            return None
        return getattr(self.sampling_model, "prepare_static", None)

    def run_relaxations(self, split: str = "val") -> None:
        """Diffusion sampling over the relax dataset (ref: :750-951)."""
        from adsorbdiff_tpu.relaxation.ml_relaxation import DiffusionEngine
        from adsorbdiff_tpu.train.scaling import ensure_fitted

        # hard guard, matching the reference (sde_denoising_trainer.py:751)
        ensure_fitted(self.state.scale_factors, warn=bool(self.config.get("is_debug")),
                      fitted=self.scale_factors_fitted)
        assert self.relax_batcher is not None, "no relax_dataset configured"
        engine = DiffusionEngine(self.score_fn, self.denoising_pos_params, static_fn=self.sampling_static_fn(), mesh=self.mesh)
        traj_dir = (self.task_cfg.get("relax_opt", {}) or {}).get("traj_dir")
        save_full = self.task_cfg.get("save_full_traj", True)
        write_pos = self.task_cfg.get("write_pos", False)
        num_batches = self.task_cfg.get("num_relaxation_batches", int(1e9))

        key = jax.random.PRNGKey(self.seed + 2)
        metrics_is2rs: Dict[str, Any] = {}
        metrics_is2re: Dict[str, Any] = {}
        ids, positions, chunk_idx = [], [], []
        has_targets = None
        for i, batch in enumerate(self.relax_batcher):
            if i >= num_batches:
                break
            res = engine.run(batch, jax.random.fold_in(key, i), traj_dir=traj_dir, save_full_traj=save_full)
            if res is None:
                continue
            final = res.batch
            if write_pos:
                natoms = np.asarray(batch.natoms)
                for b in range(batch.batch_size):
                    ids.append(str(int(np.asarray(batch.sid)[b])))
                    positions.append(np.asarray(final.pos)[b, : natoms[b]])
                    chunk_idx.append(int(natoms[b]))
            if has_targets is None:
                has_targets = bool(np.any(np.asarray(batch.y_relaxed) != 0))
            if has_targets:
                metrics_is2rs, metrics_is2re = self._relax_metrics(
                    batch, final.pos, np.zeros(batch.batch_size), metrics_is2rs, metrics_is2re
                )
        engine.flush()  # join async trajectory writes before returning
        if write_pos:
            self._write_relaxed_positions(ids, positions, chunk_idx)
        self._log_relax_metrics(metrics_is2rs, metrics_is2re, split)


@registry.register_trainer("ocp")
@registry.register_trainer("energy")
@registry.register_trainer("forces")
@registry.register_trainer("s2ef")
class S2EFTrainer(BaseTrainer):
    """Energy/forces training — the OCPTrainer (ref: ocp_trainer.py:27-733).

    Loss (ref: _compute_loss :308-356): energy_coefficient * mae(E) +
    force_coefficient * l2mae(F) with forces trained on free atoms when
    ``task.train_on_free_atoms`` (the published configs always set it).
    """

    name = "s2ef"

    def _model_mode(self) -> Optional[str]:
        return "s2ef"

    def _make_train_step(self):
        model = self.train_model
        e_coef = float(self.optim_cfg.get("energy_coefficient", 1.0))
        f_coef = float(self.optim_cfg.get("force_coefficient", 30.0))
        loss_force = str(self.optim_cfg.get("loss_force", "l2mae"))
        loss_energy = str(self.optim_cfg.get("loss_energy", "mae"))
        train_free = bool(self.task_cfg.get("train_on_free_atoms", True))
        e_norm = self.normalizers.get("energy")

        def loss_fn(params, scale_factors, batch, drop_key):
            out = model.apply(
                {"params": params, "scale_factors": scale_factors}, batch,
                rngs={"dropout": drop_key},
            )
            e_target = batch.energy
            if e_norm is not None:
                e_target = e_norm.norm(e_target)
            e_mask = jnp.ones_like(out["energy"], dtype=bool)
            e_fn = mae if loss_energy == "mae" else mse
            loss_e = e_fn(out["energy"], e_target, e_mask)
            f_mask = batch.free_mask if train_free else batch.atom_mask
            if loss_force == "l2mae":
                loss_f = l2mae(out["forces"], batch.forces, f_mask)
            elif loss_force.startswith("atomwise"):
                loss_f = atomwise_l2(out["forces"], batch.forces, f_mask, batch.natoms)
            else:
                loss_f = mae(out["forces"], batch.forces, f_mask)
            loss = e_coef * loss_e + f_coef * loss_f
            return loss, {"loss": loss, "loss_energy": loss_e, "loss_forces": loss_f}

        def train_step(state: TrainState, batch: AtomsBatch, key: jax.Array):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.scale_factors, batch, key
            )
            return self._finalize_train_step(loss, aux, grads, state)

        return self._jit_step(train_step)

    def _predict(self, batch: AtomsBatch):
        key = (batch.batch_size, batch.max_atoms)
        if key not in self._eval_fns:
            model = self.model
            e_norm = self.normalizers.get("energy")

            @jax.jit
            def predict(state: TrainState, batch: AtomsBatch):
                out = model.apply({"params": state.ema_params, "scale_factors": state.scale_factors}, batch)
                energy = out["energy"]
                if e_norm is not None:
                    energy = e_norm.denorm(energy)
                return energy, out["forces"]

            self._eval_fns[key] = predict
        return self._eval_fns[key](self.state, batch)

    def predict(self, batch: AtomsBatch):
        """(energy [B], forces [B,N,3]) with denormalization (ref: predict :405-535)."""
        return self._predict(batch)

    def energy_forces_fn(self, batch: AtomsBatch, static_graph=None):
        """Traceable calculator contract with fixed-atom zeroing
        (ref: lbfgs_torch.py TorchCalc :220-229).  ``static_graph``
        optionally carries Verlet candidate tables (ops/pbc.py)."""
        out = self.model.apply(
            {"params": self.state.ema_params, "scale_factors": self.state.scale_factors},
            batch, static_graph,
        )
        energy = out["energy"]
        e_norm = self.normalizers.get("energy")
        if e_norm is not None:
            energy = e_norm.denorm(energy)
        forces = jnp.where(batch.fixed[..., None], 0.0, out["forces"])
        return energy, forces

    def relax_candidate_fn(self, relax_opt: Optional[dict] = None):
        """Verlet candidate-table builder for the relax loop (None when
        disabled via ``relax_opt: {verlet_graph: false}`` or the model lacks
        the hook) — see ops/pbc.py::CandidateTable."""
        opt = dict(relax_opt or {})
        if not bool(opt.get("verlet_graph", True)) or not hasattr(self.model, "prepare_candidates"):
            return None
        k_cand = int(opt.get("k_cand", 64))
        return lambda b: self.model.prepare_candidates(b, k_cand)

    def validate(self, split: str = "val") -> dict:
        """s2ef metrics on free atoms (ref: base_trainer.validate :712-785 +
        ocp_trainer._compute_metrics :358-402)."""
        batcher = self.val_batcher if split == "val" else self.relax_batcher
        assert batcher is not None
        eval_free = bool(self.task_cfg.get("eval_on_free_atoms", True))
        evaluator = Evaluator(task="s2ef")
        metrics: Dict[str, Any] = {}
        from adsorbdiff_tpu.data.prefetch import Prefetcher

        batches = Prefetcher(batcher, lambda b: meshlib.shard_batch(b, self.mesh))
        for batch in batches:
            energy, forces = self._predict(batch)
            m = np.asarray(batch.free_mask if eval_free else batch.atom_mask)
            pred = {"energy": np.asarray(energy), "forces": np.asarray(forces)[m], "natoms": m.sum(1)}
            tgt = {
                "energy": np.asarray(batch.energy),
                "forces": np.asarray(batch.forces)[m] if batch.forces is not None else np.zeros_like(pred["forces"]),
                "natoms": m.sum(1),
            }
            metrics = evaluator.eval(pred, tgt, metrics)
        log = {k: metrics[k]["metric"] for k in metrics}
        logging.info(f"[{split}] " + ", ".join(f"{k}: {v:.4f}" for k, v in log.items()))
        if self.logger:
            self.logger.log(log, step=self.step, split=split)
        return metrics

    def run_relaxations(self, split: str = "val") -> None:
        """Batched L-BFGS over the relax dataset (ref: ocp_trainer.py:537-733)."""
        from adsorbdiff_tpu.relaxation.ml_relaxation import RelaxationEngine
        from adsorbdiff_tpu.train.scaling import ensure_fitted

        # hard guard, matching the reference (ocp_trainer.py:538): relaxation
        # quality silently collapses with unfitted scale factors
        ensure_fitted(self.state.scale_factors, warn=bool(self.config.get("is_debug")),
                      fitted=self.scale_factors_fitted)
        assert self.relax_batcher is not None, "no relax_dataset configured"
        relax_opt = dict(self.task_cfg.get("relax_opt", {}) or {})
        from adsorbdiff_tpu.relaxation.continuous import resolve_continuous

        if resolve_continuous(
            relax_opt, float(self.task_cfg.get("relaxation_fmax", 0.01)),
            mesh=self.mesh,
            slots=int(relax_opt.get("slots", self.relax_batcher.batch_size)),
            num_relaxation_batches=self.task_cfg.get("num_relaxation_batches"),
        ):
            return self._run_relaxations_continuous(relax_opt, split)
        engine = RelaxationEngine(
            self.energy_forces_fn,
            relax_opt,
            steps=int(self.task_cfg.get("relaxation_steps", 300)),
            fmax=float(self.task_cfg.get("relaxation_fmax", 0.01)),
            candidate_fn=self.relax_candidate_fn(relax_opt),
            mesh=self.mesh,
        )
        traj_dir = relax_opt.get("traj_dir")
        save_full = self.task_cfg.get("save_full_traj", True)
        write_pos = self.task_cfg.get("write_pos", False)
        num_batches = self.task_cfg.get("num_relaxation_batches", int(1e9))

        metrics_is2rs: Dict[str, Any] = {}
        metrics_is2re: Dict[str, Any] = {}
        ids, positions, chunk_idx = [], [], []
        has_targets = None
        for i, batch in enumerate(self.relax_batcher):
            if i >= num_batches:
                break
            res = engine.run(batch, traj_dir=traj_dir, save_full_traj=save_full)
            if res is None:
                continue
            if write_pos:
                natoms = np.asarray(batch.natoms)
                for b in range(batch.batch_size):
                    ids.append(str(int(np.asarray(batch.sid)[b])))
                    positions.append(np.asarray(res.batch.pos)[b, : natoms[b]])
                    chunk_idx.append(int(natoms[b]))
            if has_targets is None:
                has_targets = bool(np.any(np.asarray(batch.y_relaxed) != 0))
            if has_targets:
                metrics_is2rs, metrics_is2re = self._relax_metrics(
                    batch, res.batch.pos, res.energy, metrics_is2rs, metrics_is2re
                )
        engine.flush()  # join async trajectory writes before returning
        if write_pos:
            self._write_relaxed_positions(ids, positions, chunk_idx)
        self._log_relax_metrics(metrics_is2rs, metrics_is2re, split)

    def _run_relaxations_continuous(self, relax_opt: dict, split: str) -> None:
        """run_relaxations via the slot-refill engine (relaxation/
        continuous.py): converged systems retire at chunk boundaries and
        pending ones take their slots, so the relax-bound stage never pays
        forwards for finished systems.  Per-system L-BFGS semantics (each
        system follows its batch-of-one trajectory).  ``num_relaxation_batches``
        does not apply (the engine owns batching)."""
        from adsorbdiff_tpu.relaxation.continuous import ContinuousRelaxationEngine

        engine = ContinuousRelaxationEngine(
            self.energy_forces_fn,
            relax_opt,
            steps=int(self.task_cfg.get("relaxation_steps", 300)),
            fmax=float(self.task_cfg.get("relaxation_fmax", 0.01)),
            candidate_fn=self.relax_candidate_fn(relax_opt),
            slots=int(relax_opt.get("slots", self.relax_batcher.batch_size)),
            mesh=self.mesh,
        )
        results = engine.run_dataset(
            self.relax_dataset,
            traj_dir=relax_opt.get("traj_dir"),
            save_full_traj=self.task_cfg.get("save_full_traj", True),
        )
        # metrics/write_pos: group target rows with the existing batcher and
        # substitute each row's relaxed position/energy from the results
        metrics_is2rs: Dict[str, Any] = {}
        metrics_is2re: Dict[str, Any] = {}
        ids, positions, chunk_idx = [], [], []
        write_pos = self.task_cfg.get("write_pos", False)
        has_targets = None
        for batch in self.relax_batcher:
            sids = np.asarray(batch.sid)
            natoms = np.asarray(batch.natoms)
            if not all(int(s) in results for s in sids):
                continue  # skipped on resume (existing trajectories)
            final_pos = np.asarray(batch.pos).copy()
            final_e = np.zeros(batch.batch_size, np.float32)
            for b in range(batch.batch_size):
                r = results[int(sids[b])]
                final_pos[b, : natoms[b]] = r.pos
                final_e[b] = r.energy
            if write_pos:
                seen = set()
                for b in range(batch.batch_size):
                    sid = int(sids[b])
                    if sid in seen:  # batch padding repeats the tail system
                        continue
                    seen.add(sid)
                    ids.append(str(sid))
                    positions.append(final_pos[b, : natoms[b]])
                    chunk_idx.append(int(natoms[b]))
            if has_targets is None:
                has_targets = bool(np.any(np.asarray(batch.y_relaxed) != 0))
            if has_targets:
                metrics_is2rs, metrics_is2re = self._relax_metrics(
                    batch, final_pos, final_e, metrics_is2rs, metrics_is2re
                )
        if write_pos:
            self._write_relaxed_positions(ids, positions, chunk_idx)
        self._log_relax_metrics(metrics_is2rs, metrics_is2re, split)


registry.register_trainer("adsorbdiff_tpu.train.trainer.DenoisingTrainer")(DenoisingTrainer)
