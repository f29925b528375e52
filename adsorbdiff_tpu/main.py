"""CLI entry point: ``python -m adsorbdiff_tpu.main --mode train --config-yml ...``

Rebuild of the reference entry (ref: /root/reference/main.py:25-93).  The
submitit/Slurm array-sweep launcher is preserved in spirit: with ``--submit``
and submitit available, sweep configs are mapped over a Slurm executor (one
HOST process per run — TPU topology comes from the environment); without it,
sweeps run sequentially in-process.
"""
from __future__ import annotations

import logging

from adsorbdiff_tpu.common.config import build_config, create_grid
from adsorbdiff_tpu.common.flags import flags
from adsorbdiff_tpu.common.logging_utils import setup_logging
from adsorbdiff_tpu.tasks import new_trainer_context


class Runner:
    """Checkpointable runner (ref: main.py:25-45); submitit preemption
    resubmits with the latest checkpoint when launched through Slurm."""

    def __init__(self) -> None:
        self.config = None

    def __call__(self, config: dict) -> None:
        self.config = config
        with new_trainer_context(config) as ctx:
            self.trainer = ctx.trainer
            ctx.task.run()

    def checkpoint(self, *args, **kwargs):
        import submitit

        self.trainer.save("checkpoint")
        if self.trainer.logger:
            self.trainer.logger.mark_preempting()
        return submitit.helpers.DelayedSubmission(Runner(), self.config)


def main() -> None:
    setup_logging()
    parser = flags.get_parser()
    args, override_args = parser.parse_known_args()
    config = build_config(args, override_args)

    if args.sweep_yml:
        configs = create_grid(config, args.sweep_yml)
    else:
        configs = [config]

    if args.submit:
        try:
            import submitit
        except ImportError:
            raise ImportError("--submit requires submitit (not installed in this image)")
        executor = submitit.AutoExecutor(folder=args.logdir, slurm_max_num_timeout=3)
        executor.update_parameters(
            name=args.identifier,
            mem_gb=args.slurm_mem,
            timeout_min=args.slurm_timeout * 60,
            slurm_partition=args.slurm_partition,
        )
        jobs = executor.map_array(Runner(), configs)
        logging.info(f"Submitted jobs: {', '.join(j.job_id for j in jobs)}")
    else:
        for cfg in configs:
            Runner()(cfg)


if __name__ == "__main__":
    main()
