"""Relaxation-stage benchmark + profile: published-size GemNet-OC under the
batched L-BFGS scan (the production relax path, ref:
configs/relaxation/gemnet_oc/gemnet_relax.yml).

VERDICT round-2 item 5: find whether the bf16 compute-dtype scope reaches the
dominant contractions, and either lift the stage or write the roofline
argument.  Chained-dependency timing (see docs/PERF.md methodology).

    BENCH_B=8 BENCH_STEPS=100 python scripts/bench_relax_stage.py
    BENCH_B=8,16,32,64 BENCH_DTYPES=bf16 ...   # occupancy scaling curve
    BENCH_TRACE=/tmp/relax_trace python scripts/bench_relax_stage.py  # + profiler
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_models import example_batch


def main() -> None:
    from adsorbdiff_tpu.common.compile_cache import setup_compilation_cache

    setup_compilation_cache()  # reruns skip the model-scale compiles
    from adsorbdiff_tpu.models.gemnet_oc import GemNetOC
    from adsorbdiff_tpu.relaxation.lbfgs import lbfgs_relax, make_mlff_energy_forces

    b_list = [int(x) for x in os.environ.get("BENCH_B", "8").split(",")]
    steps = int(os.environ.get("BENCH_STEPS", "100"))
    trace_dir = os.environ.get("BENCH_TRACE")
    print(f"devices: {jax.devices()}  B={b_list} steps={steps}")

    use_pallas = bool(os.environ.get("BENCH_PALLAS"))
    fused_quad = os.environ.get("BENCH_FUSEQ", "0") != "0"  # A/B gemnet_quad_chain
    fused_trip = os.environ.get("BENCH_FUSET", "0") != "0"  # A/B triplet-chain kernels
    dtypes = os.environ.get("BENCH_DTYPES", "f32,bf16").split(",")
    # BENCH_REPS=2,2,0 measures the cell_reps:auto vacuum pruning
    reps = tuple(int(x) for x in os.environ.get("BENCH_REPS", "2,2,1").split(","))
    derive = os.environ.get("BENCH_DERIVE", "1") != "0"  # A/B derive_subgraph
    verlet = os.environ.get("BENCH_VERLET", "0") != "0"  # A/B Verlet candidate lists
    tag = (" pallas" if use_pallas else "") + (" fuseq" if fused_quad else "") + (" fuset" if fused_trip else "") + ("" if derive else " 3-builds") + (" verlet" if verlet else "")
    for b in b_list:
        batch = example_batch(b)
        for dname in dtypes:
            cd = None if dname == "f32" else "bfloat16"
            label = f"relax{tag} {dname} B={b} reps={reps}"
            model = GemNetOC(mode="s2ef", compute_dtype=cd, use_pallas=use_pallas,
                             fused_quad=fused_quad, fused_trip=fused_trip, cell_reps=reps, derive_subgraphs=derive)
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
            ef = make_mlff_energy_forces(model, variables)
            cf = (lambda bb: model.prepare_candidates(bb, 64)) if verlet else None
            run = jax.jit(lambda bb: lbfgs_relax(ef, bb, steps=steps, fmax=0.0, candidate_fn=cf))
            res = run(batch)
            _ = jax.device_get(res.energy[0])  # warm + fence

            def timed(reps):
                bb = batch
                t0 = time.perf_counter()
                for _ in range(reps):
                    r = run(bb)
                    bb = bb.replace(pos=bb.pos + jnp.mean(r.energy) * 1e-12)
                _ = jax.device_get(r.energy[0])
                return time.perf_counter() - t0

            t1, t3 = timed(1), timed(3)
            dt = (t3 - t1) / 2
            sps = b * steps / dt
            print(f"{label}: {dt:.2f} s per {steps}-step batch of {b} = "
                  f"{sps:.1f} system-steps/s ({dt / steps * 1000:.1f} ms/step)", flush=True)

            if trace_dir:
                tdir = f"{trace_dir}_{dname}_B{b}"
                with jax.profiler.trace(tdir):
                    r = run(batch)
                    _ = jax.device_get(r.energy[0])
                print(f"trace written to {tdir}")


if __name__ == "__main__":
    main()
