"""Logging: split-stream root logger (INFO->stdout, WARNING+->stderr),
mirroring the reference (ref: adsorbdiff/utils/utils.py:924-948), plus the
experiment ``Logger`` ABC with a TensorBoard implementation.

The reference names a "tensorboard" logger by default but never registers one
(only wandb; ref: adsorbdiff/trainers/base_trainer.py:65 vs utils/logger.py) —
we register both names; wandb degrades to tensorboard if the wandb package is
absent (it is not installed in this image).
"""
from __future__ import annotations

import logging
import sys
from typing import Any, Dict, Optional

from adsorbdiff_tpu.common.registry import registry


def setup_logging(level: int = logging.INFO) -> None:
    root = logging.getLogger()
    if getattr(root, "_adsorbdiff_tpu_configured", False):
        return
    root.setLevel(level)
    fmt = logging.Formatter("%(asctime)s (%(levelname)s): %(message)s", datefmt="%Y-%m-%d %H:%M:%S")

    out = logging.StreamHandler(stream=sys.stdout)
    out.setLevel(level)
    out.addFilter(lambda rec: rec.levelno < logging.WARNING)
    out.setFormatter(fmt)
    root.addHandler(out)

    err = logging.StreamHandler(stream=sys.stderr)
    err.setLevel(logging.WARNING)
    err.setFormatter(fmt)
    root.addHandler(err)
    root._adsorbdiff_tpu_configured = True  # type: ignore[attr-defined]


class Logger:
    """Experiment logger ABC (ref: adsorbdiff/utils/logger.py:16-84)."""

    def __init__(self, config: Optional[dict] = None) -> None:
        self.config = config or {}

    def watch(self, model: Any) -> None:  # pragma: no cover - interface
        pass

    def log(self, update_dict: Dict[str, Any], step: Optional[int] = None, split: str = "") -> None:
        raise NotImplementedError

    def log_plots(self, plots) -> None:  # pragma: no cover - interface
        pass

    def mark_preempting(self) -> None:  # pragma: no cover - interface
        pass

    def close(self) -> None:
        pass


@registry.register_logger("tensorboard")
class TensorboardLogger(Logger):
    def __init__(self, config: Optional[dict] = None) -> None:
        super().__init__(config)
        logdir = (self.config.get("cmd", {}) or {}).get("logs_dir", "./logs")
        try:
            from tensorboardX import SummaryWriter

            self.writer: Optional[Any] = SummaryWriter(logdir)
        except Exception:  # pragma: no cover - tensorboardX should exist
            self.writer = None

    def log(self, update_dict: Dict[str, Any], step: Optional[int] = None, split: str = "") -> None:
        if self.writer is None:
            return
        for k, v in update_dict.items():
            tag = f"{split}/{k}" if split else k
            try:
                self.writer.add_scalar(tag, float(v), step or 0)
            except (TypeError, ValueError):
                pass

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()


@registry.register_logger("wandb")
class WandBLogger(Logger):
    """WandB logger (ref: adsorbdiff/utils/logger.py:40-84); wandb is not in
    this image, so it transparently degrades to tensorboard."""

    def __init__(self, config: Optional[dict] = None) -> None:
        super().__init__(config)
        try:
            import wandb  # noqa: F401

            self._wandb = wandb
            self._wandb.init(
                config=self.config,
                name=(self.config.get("cmd", {}) or {}).get("timestamp_id"),
                project=(self.config.get("logger", {}) or {}).get("project"),
            )
            self._fallback = None
        except Exception:
            self._wandb = None
            self._fallback = TensorboardLogger(config)
            logging.warning("wandb unavailable; falling back to tensorboard logging")

    def watch(self, model: Any) -> None:
        if self._wandb is not None:
            self._wandb.watch(model)

    def log(self, update_dict: Dict[str, Any], step: Optional[int] = None, split: str = "") -> None:
        if self._wandb is not None:
            tagged = {f"{split}/{k}" if split else k: v for k, v in update_dict.items()}
            self._wandb.log(tagged, step=step)
        else:
            self._fallback.log(update_dict, step=step, split=split)

    def mark_preempting(self) -> None:
        if self._wandb is not None:
            self._wandb.mark_preempting()
