"""CLI flags (ref: adsorbdiff/utils/flags.py:12-144).

TPU-native differences from the reference: no ``--distributed-backend``
(NCCL/gloo) or per-rank launch plumbing — JAX is single-controller; multi-host
runs use ``jax.distributed.initialize`` and a device mesh
(see :mod:`adsorbdiff_tpu.parallel.mesh`). Slurm/submitit flags are kept for
cluster launches of the host process.
"""
from __future__ import annotations

import argparse


class Flags:
    def __init__(self) -> None:
        self.parser = argparse.ArgumentParser(description="adsorbdiff_tpu")
        self.add_core_args()

    def get_parser(self) -> argparse.ArgumentParser:
        return self.parser

    def add_core_args(self) -> None:
        self.parser.add_argument_group("Core Arguments")
        self.parser.add_argument(
            "--mode",
            choices=["train", "predict", "validate", "run-relaxations"],
            required=True,
            help="Whether to train the model, make predictions, or run relaxations/diffusion sampling",
        )
        self.parser.add_argument("--config-yml", required=True, type=str, help="Path to a config file listing data, model, optim parameters.")
        self.parser.add_argument("--identifier", default="", type=str, help="Experiment identifier to append to checkpoint/log/result directory")
        self.parser.add_argument("--debug", action="store_true", help="Whether this is a debugging run or not")
        self.parser.add_argument("--run-dir", default="./", type=str, help="Directory to store checkpoint/log/result directory")
        self.parser.add_argument("--print-every", default=100, type=int, help="Log every N iterations")
        self.parser.add_argument("--seed", default=0, type=int, help="Seed for all RNGs (jax.random key root)")
        self.parser.add_argument("--amp", action="store_true", help="Use bfloat16 mixed precision for model compute")
        self.parser.add_argument("--checkpoint", default=None, type=str, help="Model checkpoint to load")
        self.parser.add_argument("--timestamp-id", default=None, type=str, help="Override time stamp ID; useful for seamlessly continuing runs")
        self.parser.add_argument("--cpu", action="store_true", help="Run on CPU devices instead of TPU")
        self.parser.add_argument("--num-devices", default=None, type=int, help="Limit the number of local devices used for the data-parallel mesh")
        # cluster launch (host-process scheduling only; ref: flags.py slurm args)
        self.parser.add_argument("--submit", action="store_true", help="Submit job to cluster")
        self.parser.add_argument("--sweep-yml", default=None, type=str, help="Path to a config file with parameter sweeps")
        self.parser.add_argument("--logdir", default="logs", type=str, help="Where to store logs")
        self.parser.add_argument("--slurm-partition", default="ocp", type=str)
        self.parser.add_argument("--slurm-mem", default=80, type=int)
        self.parser.add_argument("--slurm-timeout", default=72, type=int)


flags = Flags()
