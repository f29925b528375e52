"""Tasks + trainer context — the thin L7 dispatch layer.

Rebuild of the reference task classes (ref: adsorbdiff/tasks/task.py:15-101)
and ``new_trainer_context`` (ref: adsorbdiff/utils/utils.py:976-1047).  No
process-group setup/teardown: JAX is single-controller, so "distributed
setup" is just building the device mesh inside the trainer.
"""
from __future__ import annotations

import contextlib
import logging
import os
from typing import Optional

from adsorbdiff_tpu.common.registry import registry


class BaseTask:
    def __init__(self, config: dict) -> None:
        self.config = config

    def setup(self, trainer) -> None:
        self.trainer = trainer
        ckpt_path = self.config.get("checkpoint")
        if ckpt_path:
            if self.trainer.state is None and self.trainer.train_batcher is not None:
                self.trainer.init_state(next(iter(self.trainer.train_batcher)))
            elif self.trainer.state is None and self.trainer.relax_batcher is not None:
                self.trainer.init_state(next(iter(self.trainer.relax_batcher)))
            elif self.trainer.state is None and self.trainer.val_batcher is not None:
                self.trainer.init_state(next(iter(self.trainer.val_batcher)))
            self.trainer.load_checkpoint(ckpt_path)

    def run(self) -> None:
        raise NotImplementedError


@registry.register_task("train")
class TrainTask(BaseTask):
    def run(self) -> None:
        try:
            self.trainer.train(disable_eval_tqdm=self.config.get("hide_eval_progressbar", False))
        except FileNotFoundError as e:  # ref: checkpoint_path miss diagnostics
            logging.error(str(e))
            raise


@registry.register_task("predict")
class PredictTask(BaseTask):
    def run(self) -> None:
        assert self.trainer.val_batcher is not None or self.trainer.relax_batcher is not None, (
            "no dataset to predict on"
        )
        batcher = self.trainer.val_batcher or self.trainer.relax_batcher
        import numpy as np

        ids, outs = [], []
        for batch in batcher:
            if hasattr(self.trainer, "predict_denoising"):
                out1, _ = self.trainer.predict_denoising(batch)
                outs.append(np.asarray(out1, dtype=np.float16))
            else:
                energy, forces = self.trainer.predict(batch)
                outs.append(np.asarray(forces, dtype=np.float16))
            sid = np.asarray(batch.sid)
            fid = np.asarray(batch.fid)
            ids.extend(f"{s}_{f}" for s, f in zip(sid.tolist(), fid.tolist()))
        path = os.path.join(self.trainer.results_dir, "predictions.npz")
        np.savez_compressed(path, ids=np.asarray(ids), outputs=np.concatenate(outs))
        logging.info(f"Writing results to {path}")


@registry.register_task("validate")
class ValidateTask(BaseTask):
    def run(self) -> None:
        self.trainer.validate(split=self.config.get("val_split", "val"))


@registry.register_task("run-relaxations")
class RelaxationTask(BaseTask):
    """ref: task.py:90-100 ('RelxationTask' [sic] in the reference)."""

    def run(self) -> None:
        assert self.trainer.relax_dataset is not None, "Relax dataset is required for making predictions"
        assert self.config.get("checkpoint"), "checkpoint required to run relaxations"
        self.trainer.run_relaxations()


@contextlib.contextmanager
def new_trainer_context(config: dict):
    """Build (trainer, task) from a run config (ref: utils.py:976-1047)."""
    from types import SimpleNamespace

    from adsorbdiff_tpu.common.compile_cache import setup_compilation_cache
    from adsorbdiff_tpu.common.imports import setup_imports

    setup_imports()
    setup_compilation_cache(config.get("compilation_cache_dir"))
    if config.get("cpu"):
        # force the CPU backend (ref flag --cpu; the axon sitecustomize
        # otherwise pins jax_platforms=axon,cpu)
        import jax

        jax.config.update("jax_platforms", "cpu")
    trainer_name = config.get("trainer", "denoising")
    trainer_cls = registry.get_trainer_class(trainer_name)
    kw = {}
    if config.get("num_devices"):
        from adsorbdiff_tpu.parallel import mesh as meshlib

        n = int(config["num_devices"])
        kw["mesh"] = meshlib.make_mesh(n) if n > 1 else None
    trainer = trainer_cls(config, **kw)

    task_name = config.get("mode", "train")
    task_cls = registry.get_task_class(task_name)
    task = task_cls(config)
    task.setup(trainer)
    yield SimpleNamespace(config=config, task=task, trainer=trainer)
