"""Convert a reference AdsorbDiff torch checkpoint to our orbax format.

The user-facing migration path (ref checkpoints: README.md:55-63 —
PT_zeroshot_painn.pt, PT_fewshot_eqv2_cond.pt, OCP GemNet-OC MLFFs): reads
the .pt's embedded config, maps the weights through the family importer
(exact, oracle-verified — tests/test_torch_import.py), and writes an orbax
checkpoint + config sidecar that AdsorbDiffCalculator / the trainers load.

Usage:
    python scripts/convert_checkpoint.py PT_zeroshot_painn.pt out_dir/
    python scripts/convert_checkpoint.py ckpt.pt out_dir/ --name mlff \\
        --override cutoff=12.0 --override max_neighbors=30
"""
import argparse
import ast
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_checkpoint")
    ap.add_argument("out_dir")
    ap.add_argument("--name", default="checkpoint")
    ap.add_argument(
        "--override", action="append", default=[],
        help="model-config override key=value (repeatable)",
    )
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (conversion needs no accelerator; avoids "
                         "queueing behind busy TPU compiles)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from adsorbdiff_tpu.train.torch_import import convert_torch_checkpoint

    override = {}
    for kv in args.override:
        k, v = kv.split("=", 1)
        try:
            override[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            override[k] = v

    path = convert_torch_checkpoint(
        args.torch_checkpoint, args.out_dir, name=args.name,
        model_cfg_override=override or None,
    )
    print(f"wrote {path} (+ {path}.config.yaml)")


if __name__ == "__main__":
    main()
