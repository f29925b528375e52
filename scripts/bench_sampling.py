"""Sampling-stage benchmark: published-size reverse diffusion (100 steps,
base.yml schedule) per model family, with and without the hoisted static
slab-slab graph (models/base.py::prepare_static_graph).

One "system-step" = one model forward + rigid-body update for one system;
the whole 100-step trajectory is ONE lax.scan dispatch.  Chained-dependency
timing (see docs/PERF.md methodology).

    BENCH_MODEL=eqv2 BENCH_B=8 python scripts/bench_sampling.py
    BENCH_MODEL=gemnet BENCH_B=8 python scripts/bench_sampling.py
    BENCH_MODEL=painn BENCH_B=16 python scripts/bench_sampling.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_models import example_batch

PARAMS = dict(num_steps=100, ads_std_low=0.1, ads_std_high=10.0,
              rot_std_low=0.01, rot_std_high=1.55, ode=True)


def make_model(which: str):
    # published sizes; pallas/bf16 flags = production configs
    # (configs/denoising/{painn,eqv2,gemnet}_so3.yml + TPU A/B in docs/PERF.md)
    if which == "painn":
        from adsorbdiff_tpu.models.painn import PaiNN

        return PaiNN(sampling=True, cell_reps=(2, 2, 0), use_pallas=True,
                     compute_dtype="bfloat16", max_ads=8)
    if which == "eqv2":
        from adsorbdiff_tpu.models.equiformer_v2 import EquiformerV2

        return EquiformerV2(mode="denoising", so3_denoising=True, for_denoising=True,
                            cell_reps=(2, 2, 0), compute_dtype="bfloat16",
                            use_pallas=True, use_pallas_conv1=True, max_ads=8)
    if which == "gemnet":
        from adsorbdiff_tpu.models.gemnet_oc import GemNetOC

        return GemNetOC(mode="denoising", so3_denoising=True, cell_reps=(2, 2, 0),
                        compute_dtype="bfloat16", max_ads=8)
    raise ValueError(which)


def main() -> None:
    from adsorbdiff_tpu.common.compile_cache import setup_compilation_cache

    setup_compilation_cache()  # reruns skip the model-scale compiles
    from adsorbdiff_tpu.diffusion.sampler import reverse_diffusion

    which = os.environ.get("BENCH_MODEL", "eqv2")
    b = int(os.environ.get("BENCH_B", "8"))
    batch = example_batch(b)
    model = make_model(which)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    print(f"devices: {jax.devices()}  model={which} B={b} steps={PARAMS['num_steps']}", flush=True)

    def score_fn(cur, static=None):
        out1, out2 = model.apply(variables, cur, static)
        return out1, jnp.where(cur.fixed[..., None], 0.0, out2)

    for label, static_fn in (("full-graph", None), ("static-graph", model.prepare_static)):
        sample = jax.jit(lambda bb, k: reverse_diffusion(score_fn, bb, PARAMS, k, static_fn=static_fn))
        t0 = time.time()
        res = sample(batch, jax.random.PRNGKey(1))
        _ = jax.device_get(res.batch.pos[0, 0])
        print(f"  [{which} {label}] compile+first: {time.time()-t0:.1f}s", flush=True)

        def run(reps):
            bb = batch
            t0 = time.perf_counter()
            for i in range(reps):
                r = sample(bb, jax.random.PRNGKey(2 + i))
                bb = bb.replace(pos=r.batch.pos)
            _ = jax.device_get(bb.pos[0, 0])
            return time.perf_counter() - t0

        t1, t4 = run(1), run(4)
        dt = (t4 - t1) / 3
        sps = PARAMS["num_steps"] * b / dt
        print(f"{which} sampling {label}: {dt:.2f} s per 100-step batch of {b} = "
              f"{sps:.1f} system-steps/s ({dt / PARAMS['num_steps'] * 1000:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
