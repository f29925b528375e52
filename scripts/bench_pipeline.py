"""End-to-end pipeline benchmark — the number the north star is defined on.

Measures the production 3-stage path per system at published configs
(BASELINE.md): diffusion sampling (100 steps, incl. trajectory write) ->
shard conversion -> GemNet-OC L-BFGS relaxation (300 steps, incl. trajectory
write), and reports systems/hour/chip plus the v5e-8 extrapolation (the
pipeline is embarrassingly parallel over systems; tests/test_mesh_scaling.py
proves dp sharding preserves semantics).

    BENCH_SAMPLER=painn BENCH_B=16 python scripts/bench_pipeline.py
    BENCH_SAMPLER=eqv2  BENCH_B=8  python scripts/bench_pipeline.py
    BENCH_HETERO=64 python scripts/bench_pipeline.py   # OC20-like natoms
        # spread (~30-230) through the production bucket policy; reports
        # padding efficiency + systems/h vs the homogeneous number

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
    hetero = int(os.environ.get("BENCH_HETERO", "0"))  # system count; 0 = off
    out = tempfile.mkdtemp(prefix="bench_pipeline_")
    print(f"devices: {jax.devices()}  sampler={which} B={b} relax B={relax_b} "
          f"steps={relax_steps} hetero={hetero}  out={out}", flush=True)

    # ---- stage 1: diffusion sampling (production DiffusionEngine + traj IO)
    model = make_model(which)
    if hetero:
        # OC20-Dense-like natoms spread (~30-230: lognormal slab sizes
        # clipped to the dataset's observed range, 2-8 adsorbate atoms),
        # batched through the production quantile-bucket policy
        from adsorbdiff_tpu.data.buckets import BucketedBatcher as _BB
        from adsorbdiff_tpu.data.schema import collate as _collate

        hrng = np.random.default_rng(7)
        hetero_systems = []
        for i in range(hetero):
            n_slab = int(np.clip(hrng.lognormal(np.log(70.0), 0.45), 24, 220))
            n_ads = int(hrng.integers(2, 9))
            sys_b = example_batch(1, n_slab=n_slab, n_ads=n_ads,
                                  n_pad=n_slab + n_ads, seed=100 + i)
            hetero_systems.append(sys_b)

        class _ListDS:
            def __len__(self):
                return len(hetero_systems)

            def __getitem__(self, i):
                from adsorbdiff_tpu.data.schema import System

                bb = hetero_systems[i]
                n = int(bb.natoms[0])
                return System(
                    pos=np.asarray(bb.pos[0, :n]),
                    atomic_numbers=np.asarray(bb.atomic_numbers[0, :n]),
                    cell=np.asarray(bb.cell[0]),
                    tags=np.asarray(bb.tags[0, :n]),
                    fixed=np.asarray(bb.fixed[0, :n]),
                    sid=i,
                )

            def natoms_array(self):
                return np.asarray([int(bb.natoms[0]) for bb in hetero_systems])

        sizes = _ListDS().natoms_array()
        # BENCH_BUDGET: atom-balanced per-bucket batch sizes (B becomes the
        # cap).  ~B*80 reproduces the homogeneous per-batch padded-atom work.
        budget = int(os.environ.get("BENCH_BUDGET", "0")) or None
        batches = list(_BB(_ListDS(), b, shuffle=False, atom_budget=budget))
        pad_eff = float(sizes.sum()) / sum(bb.batch_size * bb.pos.shape[1] for bb in batches)
        print(f"hetero: {hetero} systems, natoms {sizes.min()}-{sizes.max()} "
              f"(mean {sizes.mean():.0f}), {len(batches)} sampling batches "
              f"(sizes {sorted({bb.batch_size for bb in batches})}, budget={budget}), "
              f"padding efficiency {pad_eff:.2f}", flush=True)
        n_batches = len(batches)
    else:
        batches = [example_batch(b, seed=s) for s in range(n_batches)]
    if not hetero:
        for i, bb in enumerate(batches):  # unique sids across batches
            batches[i] = bb.replace(sid=bb.sid + i * b)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batches[0])

    def score_fn(cur, static=None):
        o1, o2 = model.apply(variables, cur, static)
        return o1, jnp.where(cur.fixed[..., None], 0.0, o2)

    engine = DiffusionEngine(score_fn, PARAMS, static_fn=model.prepare_static)
    sample_dir = os.path.join(out, "sampled")
    warm_shapes = sorted({(bb.batch_size, bb.pos.shape[1]) for bb in batches})
    for shape in warm_shapes:  # compile warm-up per distinct bucket shape
        wb = next(bb for bb in batches if (bb.batch_size, bb.pos.shape[1]) == shape)
        engine.run(wb, jax.random.PRNGKey(1), traj_dir=sample_dir, skip_existing=False)
    engine.flush()
    shutil.rmtree(sample_dir)
    n_sampled = sum(len(set(np.asarray(bb.sid).tolist())) for bb in batches)
    t0 = time.perf_counter()
    for i, bb in enumerate(batches):
        res = engine.run(bb, jax.random.PRNGKey(2 + i), traj_dir=sample_dir, skip_existing=False)
    _ = jax.device_get(res.batch.pos[0, 0])  # fence the device queue
    engine.flush()  # fence the async trajectory writes
    t_sample = (time.perf_counter() - t0) / n_sampled
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
    gem = GemNetOC(mode="s2ef", compute_dtype="bfloat16", cell_reps=(2, 2, 0),
                   fused_quad=True)  # production flag (gemnet_relax.yml)
    gvars = jax.jit(gem.init)(jax.random.PRNGKey(0), batches[0])
    rengine = RelaxationEngine.from_model(gem, gvars, relax_opt={"steps": relax_steps, "fmax": 0.0})
    ds = ShardDataset({"src": os.path.join(out, "relax_in")})
    r_budget = None
    if hetero and int(os.environ.get("BENCH_BUDGET", "0")):
        r_budget = relax_b * int(os.environ.get("BENCH_BUDGET", "0")) // b
    rbatches = list(BucketedBatcher(ds, relax_b, shuffle=False, atom_budget=r_budget))
    if hetero:
        r_eff = float(sum(int(n) for bb in rbatches for n in np.asarray(bb.natoms))) / sum(
            bb.batch_size * bb.pos.shape[1] for bb in rbatches)
        print(f"relax buckets: {sorted({bb.pos.shape[1] for bb in rbatches})} "
              f"batch sizes {sorted({bb.batch_size for bb in rbatches})} "
              f"(budget={r_budget}) padding efficiency {r_eff:.2f}", flush=True)
    relax_dir = os.path.join(out, "relaxations")
    for shape in sorted({(bb.batch_size, bb.pos.shape[1]) for bb in rbatches}):
        wb = next(bb for bb in rbatches if (bb.batch_size, bb.pos.shape[1]) == shape)
        rengine.run(wb, traj_dir=relax_dir, skip_existing=False)  # warm/compile
    rengine.flush()
    shutil.rmtree(relax_dir)
    t0 = time.perf_counter()
    n_relaxed = 0
    for bb in rbatches:
        rres = rengine.run(bb, traj_dir=relax_dir, skip_existing=False)
        n_relaxed += len(set(np.asarray(bb.sid).tolist()))
    _ = jax.device_get(rres.energy[0])  # fence the device queue
    rengine.flush()  # fence the async trajectory writes
    t_relax = (time.perf_counter() - t0) / n_relaxed
    print(f"stage 3 relax ({relax_steps} steps): {t_relax*1000:.1f} ms/system "
          f"(incl. traj write)", flush=True)

    per_system = t_sample + t_convert + t_relax
    sph_chip = 3600.0 / per_system
    print(json.dumps({
        "metric": f"pipeline_systems_per_hour_per_chip[{which}{'-hetero' if hetero else ''}]",
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
