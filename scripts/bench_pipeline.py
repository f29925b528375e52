"""End-to-end pipeline benchmark — the number the north star is defined on.

Measures the production 3-stage path per system at published configs
(BASELINE.md): diffusion sampling (100 steps, incl. trajectory write) ->
shard conversion -> GemNet-OC L-BFGS relaxation (300 steps, incl. trajectory
write), and reports systems/hour/chip plus the v5e-8 extrapolation (the
pipeline is embarrassingly parallel over systems; tests/test_mesh_scaling.py
proves dp sharding preserves semantics).

    BENCH_SAMPLER=painn BENCH_B=16 python scripts/bench_pipeline.py
    BENCH_SAMPLER=eqv2  BENCH_B=8  python scripts/bench_pipeline.py

Reference anchor (docs/PERF.md "Anchoring the A100 baseline"): the CUDA
reference's estimated A100 band is 42-62 ms/system for sampling and
~0.9-1.5 s/system for relaxation (device at 15-25% MFU + its per-step host
syncs) => ~2200-3700 systems/hour/A100.  No published wall-clock exists;
the constant below sits at the generous-to-the-reference end.
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_models import example_batch
from scripts.bench_sampling import PARAMS, make_model

REF_A100_SYSTEMS_PER_HOUR = 3700.0  # generous end of the estimated band


def main() -> None:
    from adsorbdiff_tpu.common.compile_cache import setup_compilation_cache

    setup_compilation_cache()  # reruns skip the model-scale compiles
    from adsorbdiff_tpu.data.buckets import BucketedBatcher
    from adsorbdiff_tpu.data.store import ShardDataset
    from adsorbdiff_tpu.models.gemnet_oc import GemNetOC
    from adsorbdiff_tpu.pipeline import sampled_trajs_to_dataset
    from adsorbdiff_tpu.relaxation.ml_relaxation import DiffusionEngine, RelaxationEngine

    which = os.environ.get("BENCH_SAMPLER", "painn")
    b = int(os.environ.get("BENCH_B", "16"))
    relax_b = int(os.environ.get("BENCH_RELAX_B", "8"))
    relax_steps = int(os.environ.get("BENCH_RELAX_STEPS", "300"))
    n_batches = int(os.environ.get("BENCH_NBATCH", "2"))
    out = tempfile.mkdtemp(prefix="bench_pipeline_")
    print(f"devices: {jax.devices()}  sampler={which} B={b} relax B={relax_b} "
          f"steps={relax_steps}  out={out}", flush=True)

    # ---- stage 1: diffusion sampling (production DiffusionEngine + traj IO)
    model = make_model(which)
    batches = [example_batch(b, seed=s) for s in range(n_batches)]
    for i, bb in enumerate(batches):  # unique sids across batches
        batches[i] = bb.replace(sid=bb.sid + i * b)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batches[0])

    def score_fn(cur, static=None):
        o1, o2 = model.apply(variables, cur, static)
        return o1, jnp.where(cur.fixed[..., None], 0.0, o2)

    engine = DiffusionEngine(score_fn, PARAMS, static_fn=model.prepare_static)
    sample_dir = os.path.join(out, "sampled")
    engine.run(batches[0], jax.random.PRNGKey(1), traj_dir=sample_dir, skip_existing=False)  # warm
    engine.flush()
    shutil.rmtree(sample_dir)
    t0 = time.perf_counter()
    for i, bb in enumerate(batches):
        res = engine.run(bb, jax.random.PRNGKey(2 + i), traj_dir=sample_dir, skip_existing=False)
    _ = jax.device_get(res.batch.pos[0, 0])  # fence the device queue
    engine.flush()  # fence the async trajectory writes
    t_sample = (time.perf_counter() - t0) / (n_batches * b)
    print(f"stage 1 sampling ({which}): {t_sample*1000:.1f} ms/system "
          f"(incl. traj write)", flush=True)

    # ---- stage 2: conversion (host)
    t0 = time.perf_counter()
    n = sampled_trajs_to_dataset(sample_dir, os.path.join(out, "relax_in"))
    t_convert = (time.perf_counter() - t0) / n
    print(f"stage 2 convert: {t_convert*1000:.2f} ms/system ({n} systems)", flush=True)

    # ---- stage 3: MLFF relaxation (production RelaxationEngine + traj IO)
    # (2,2,0) = what cell_reps:auto resolves for these vacuum slabs (+7.5%,
    # docs/PERF.md round 4)
    gem = GemNetOC(mode="s2ef", compute_dtype="bfloat16", cell_reps=(2, 2, 0))
    gvars = jax.jit(gem.init)(jax.random.PRNGKey(0), batches[0])
    rengine = RelaxationEngine.from_model(gem, gvars, relax_opt={"steps": relax_steps, "fmax": 0.0})
    ds = ShardDataset({"src": os.path.join(out, "relax_in")})
    rbatches = list(BucketedBatcher(ds, relax_b, shuffle=False))
    relax_dir = os.path.join(out, "relaxations")
    rengine.run(rbatches[0], traj_dir=relax_dir, skip_existing=False)  # warm
    rengine.flush()
    shutil.rmtree(relax_dir)
    t0 = time.perf_counter()
    n_relaxed = 0
    for bb in rbatches:
        rres = rengine.run(bb, traj_dir=relax_dir, skip_existing=False)
        n_relaxed += bb.batch_size
    _ = jax.device_get(rres.energy[0])  # fence the device queue
    rengine.flush()  # fence the async trajectory writes
    t_relax = (time.perf_counter() - t0) / n_relaxed
    print(f"stage 3 relax ({relax_steps} steps): {t_relax*1000:.1f} ms/system "
          f"(incl. traj write)", flush=True)

    per_system = t_sample + t_convert + t_relax
    sph_chip = 3600.0 / per_system
    print(json.dumps({
        "metric": f"pipeline_systems_per_hour_per_chip[{which}]",
        "per_system_s": round(per_system, 3),
        "stages_ms": {"sample": round(t_sample * 1e3, 1),
                      "convert": round(t_convert * 1e3, 2),
                      "relax": round(t_relax * 1e3, 1)},
        "value": round(sph_chip, 1),
        "v5e8_extrapolated": round(sph_chip * 8, 1),
        "vs_ref_a100_estimate": round(sph_chip / REF_A100_SYSTEMS_PER_HOUR, 2),
        "vs_ref_v5e8": round(sph_chip * 8 / REF_A100_SYSTEMS_PER_HOUR, 2),
    }), flush=True)
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
