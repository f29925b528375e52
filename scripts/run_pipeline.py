#!/usr/bin/env python
"""Multi-seed pipeline CLI — the reference ``run.py`` as a real driver.

The reference emits shell command chains gluing torch.distributed.launch
invocations (ref: /root/reference/run.py:34-70); this runs the same 3-stage
pipeline (diffusion sampling -> structure conversion -> MLFF relaxation ->
success-rate eval) in-process against trained checkpoints.

Usage:
  python scripts/run_pipeline.py \
      --diffusion-config configs/denoising/painn_so3.yml --diffusion-ckpt <ckpt> \
      --relax-config configs/relaxation/gemnet_oc/gemnet_relax.yml --relax-ckpt <ckpt> \
      --relax-dataset data/valood_placements --out-dir results/pipeline \
      --nsites 5 [--dft-targets targets.pkl]
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from adsorbdiff_tpu.common.config import load_config  # noqa: E402
from adsorbdiff_tpu.common.logging_utils import setup_logging  # noqa: E402
from adsorbdiff_tpu.pipeline import run_pipeline  # noqa: E402
from adsorbdiff_tpu.tasks import new_trainer_context  # noqa: E402


def build_trainer(config_path: str, ckpt: str, mode: str):
    config, _, _ = load_config(config_path)
    config.setdefault("mode", "run-relaxations")
    config["checkpoint"] = ckpt
    config["is_debug"] = True
    with new_trainer_context(config) as ctx:
        return ctx.trainer


def main() -> None:
    setup_logging()
    ap = argparse.ArgumentParser()
    ap.add_argument("--diffusion-config", required=True)
    ap.add_argument("--diffusion-ckpt", required=True)
    ap.add_argument("--relax-config", required=True)
    ap.add_argument("--relax-ckpt", required=True)
    ap.add_argument("--relax-dataset", required=True, help="placements shard (src)")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--nsites", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--atom-budget", type=int, default=None,
                    help="atom-balanced batching: per-bucket batch size ~ budget/pad "
                         "(batch-size becomes the cap); recommended ~batch_size*80 "
                         "for heterogeneous natoms")
    ap.add_argument("--relaxation-steps", type=int, default=300)
    ap.add_argument("--dft-targets", default=None, help="pkl of {sid: [(cfg, E), ...]}")
    args = ap.parse_args()

    diffusion_trainer = build_trainer(args.diffusion_config, args.diffusion_ckpt, "denoising")
    relax_trainer = build_trainer(args.relax_config, args.relax_ckpt, "s2ef")

    dft_targets = None
    if args.dft_targets:
        from adsorbdiff_tpu.eval_tools import dft_targets_from_pkl

        dft_targets = dft_targets_from_pkl(args.dft_targets)

    rate = run_pipeline(
        diffusion_trainer,
        relax_trainer,
        {"src": args.relax_dataset},
        args.out_dir,
        nsites=args.nsites,
        relaxation_steps=args.relaxation_steps,
        dft_targets=dft_targets,
        batch_size=args.batch_size,
        atom_budget=args.atom_budget,
    )
    if rate is not None:
        logging.info(f"Success rate: {rate * 100:.1f}%")


if __name__ == "__main__":
    main()
