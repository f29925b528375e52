#!/usr/bin/env python
"""Success-rate evaluation CLI — the reference ``scripts/eval.py`` as a
command, over this repo's artifacts.

Wraps :mod:`adsorbdiff_tpu.eval_tools` (the library forms are what the
pipeline and tests call).  Four source modes mirror the reference's eval
entry points (ref: /root/reference/scripts/eval.py:111-553):

  trajs   ML trajectory dir(s)                      (ref: :517-553)
  nsite   <root>/<seed>/relaxations pipeline tree   (ref: :383-425)
  outcars VASP OUTCAR runs under <root>/<sid_fid>/  (ref: :111-294)
  npz     energies from a predictions npz + trajs   (ref: :470-515)

Usage:
  python scripts/eval.py trajs   results/0/relaxations [more dirs ...] --targets dft.pkl
  python scripts/eval.py nsite   results/               --targets dft.pkl
  python scripts/eval.py outcars dft_runs/  --targets dft.pkl [--ref-energies ref.pkl]
  python scripts/eval.py npz     preds.npz  --traj-root results/ --targets dft.pkl

``--targets`` accepts the reference's pkl of {sid: [(config, energy), ...]}
or a flat {sid: energy} mapping.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from adsorbdiff_tpu import eval_tools as ev  # noqa: E402


def load_targets(path: str):
    if path.endswith(".json"):
        with open(path) as f:
            return {str(k): float(v) for k, v in json.load(f).items()}
    return ev.dft_targets_from_pkl(path)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["trajs", "nsite", "outcars", "npz"])
    ap.add_argument("sources", nargs="+", help="traj dirs / tree root / OUTCAR root / npz path")
    ap.add_argument("--targets", required=True, help="DFT targets pkl (or flat json)")
    ap.add_argument("--traj-root", default=None, help="npz mode: root of traj dirs for anomaly filtering")
    ap.add_argument("--ref-energies", default=None, help="outcars mode: per-sid reference-energy pkl")
    ap.add_argument("--threshold", type=float, default=ev.SUCCESS_THRESHOLD)
    ap.add_argument("--keep-anomalies", action="store_true", help="disable the anomaly filter")
    args = ap.parse_args()

    targets = load_targets(args.targets)
    filt = not args.keep_anomalies
    if args.mode == "trajs":
        rate, per = ev.success_rate(args.sources, targets, filter_anomalies=filt, threshold=args.threshold)
    elif args.mode == "nsite":
        (root,) = args.sources
        rate, per = ev.success_rate_nsite(root, targets, filter_anomalies=filt, threshold=args.threshold)
    elif args.mode == "outcars":
        (root,) = args.sources
        refs = ev.ref_energies_from_pkl(args.ref_energies) if args.ref_energies else None
        rate, per = ev.success_rate_from_outcars(root, targets, ref_energies=refs, threshold=args.threshold)
    else:  # npz
        (npz_path,) = args.sources
        assert args.traj_root, "npz mode needs --traj-root for the anomaly filter"
        dirs = ev.nsite_traj_dirs(args.traj_root) or ev.seed_traj_dirs(args.traj_root) or [args.traj_root]
        rate, per = ev.success_rate_from_npz(npz_path, dirs, targets, filter_anomalies=filt, threshold=args.threshold)

    for sid in sorted(per):
        print(f"{sid}: {'success' if per[sid] else 'fail'}")
    print(f"success rate: {rate * 100:.1f}%  ({sum(per.values())}/{len(per)})")


if __name__ == "__main__":
    main()
