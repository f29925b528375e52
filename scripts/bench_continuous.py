"""Continuous-batching vs barrier relaxation engine A/B (published-size
GemNet-OC MLFF, the production relax path).

Convergence times on real relaxation workloads are widely spread; the barrier
engine pays ``max(steps in batch)`` forwards per batch while the continuous
engine pays ``~mean(steps)`` per slot (plus chunk quantization and refill
overhead).  Real convergence needs a trained MLFF, so the spread is emulated
with per-system step BUDGETS (the engines do identical per-step work either
way; a budget retirement exercises exactly the same slot-refill machinery as
an fmax retirement).

Protocol (same-session):
  1. measure the barrier per-step cost from a fixed 100-step scan (chained
     timing, docs/PERF.md methodology) — the barrier engine's cost on any
     budget workload is ``sum_batches (max(budgets)) * ms_per_step`` (its
     early-exit while_loop stops at the batch max; compute-only, i.e.
     credited with perfectly hidden trajectory IO);
  2. run the continuous engine END TO END (including trajectory writes,
     chunk readbacks, and refills) on the same budget workloads and compare.

    BENCH_NSYS=64 BENCH_CHUNK=32 python scripts/bench_continuous.py
    BENCH_CHUNK=32,16,64 ...   # chunk-size sweep (one barrier anchor,
                               # shared budget draws, one engine per chunk)
    BENCH_SCENARIOS=uniform300,spread,tail BENCH_DTYPES=bf16 ...
    BENCH_HETERO=1 ...  # OC20-like natoms spread; A/Bs run_dataset's
                        # per-bucket pools (num_buckets=4) vs max-pad (1)
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


def budgets_for(scenario: str, nsys: int, rng: np.random.Generator) -> np.ndarray:
    if scenario == "uniform300":  # no spread: pure engine-overhead comparison
        return np.full(nsys, 300, np.int64)
    if scenario == "spread":  # uniform 50..300 (mild spread)
        return rng.integers(50, 301, nsys)
    if scenario == "tail":  # most systems converge fast, a slow tail runs long
        fast = rng.integers(40, 81, nsys)
        slow = rng.integers(240, 301, nsys)
        return np.where(rng.random(nsys) < 0.8, fast, slow)
    raise ValueError(scenario)


def main() -> None:
    from adsorbdiff_tpu.common.compile_cache import setup_compilation_cache

    setup_compilation_cache()
    from adsorbdiff_tpu.data.schema import uncollate
    from adsorbdiff_tpu.models.gemnet_oc import GemNetOC
    from adsorbdiff_tpu.relaxation.continuous import ContinuousRelaxationEngine
    from adsorbdiff_tpu.relaxation.lbfgs import lbfgs_relax, make_mlff_energy_forces

    nsys = int(os.environ.get("BENCH_NSYS", "64"))
    slots = int(os.environ.get("BENCH_SLOTS", "8"))
    chunks = [int(x) for x in os.environ.get("BENCH_CHUNK", "32").split(",")]
    chunk = chunks[0]
    scenarios = os.environ.get("BENCH_SCENARIOS", "uniform300,spread,tail").split(",")
    dname = os.environ.get("BENCH_DTYPES", "bf16")
    reps = tuple(int(x) for x in os.environ.get("BENCH_REPS", "2,2,0").split(","))
    print(f"devices: {jax.devices()}  nsys={nsys} slots={slots} chunk={chunk} {dname} reps={reps}")

    batch = example_batch(slots)
    if os.environ.get("BENCH_TINY"):  # CPU smoke of the protocol itself
        model = GemNetOC(mode="s2ef", num_blocks=1, emb_size_atom=16, emb_size_edge=16,
                         cutoff=6.0, cutoff_aeaint=6.0, cutoff_qint=6.0, max_neighbors=8,
                         max_neighbors_aeaint=6, max_neighbors_qint=4, cell_reps=reps)
    else:
        model = GemNetOC(mode="s2ef",
                         fused_quad=os.environ.get("BENCH_FUSEQ", "1") != "0",
                         compute_dtype=None if dname == "f32" else "bfloat16",
                         cell_reps=reps)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    ef = make_mlff_energy_forces(model, variables)
    cf = lambda bb: model.prepare_candidates(bb, 64)  # noqa: E731  (production default)

    # --- barrier per-step cost: fixed 100-step scan, chained timing ---
    run = jax.jit(lambda bb: lbfgs_relax(ef, bb, steps=100, fmax=0.0, candidate_fn=cf))
    r = run(batch)
    _ = jax.device_get(r.energy[0])  # warm

    def timed(nreps):
        bb = batch
        t0 = time.perf_counter()
        for _ in range(nreps):
            rr = run(bb)
            bb = bb.replace(pos=bb.pos + jnp.mean(rr.energy) * 1e-12)
        _ = jax.device_get(rr.energy[0])
        return time.perf_counter() - t0

    t1, t3 = timed(1), timed(3)
    ms_step = (t3 - t1) / 2 / 100 * 1000
    print(f"barrier per-step: {ms_step:.1f} ms/step (B={slots})", flush=True)

    if os.environ.get("BENCH_STEPTIME"):
        # device-side cost of the continuous chunk itself (no host loop):
        # chained chunk calls fenced by one device_get
        eng = ContinuousRelaxationEngine(
            ef, dict(maxstep=0.04, memory=50), steps=300, fmax=1e-12,
            candidate_fn=cf, slots=slots, chunk_steps=chunk,
        )
        st = eng._init_state(batch, np.full(slots, 300, np.int64))
        cfn = eng._chunk_fn(slots, batch.max_atoms)
        t0 = time.perf_counter()
        s2 = cfn(st)[0]
        _ = jax.device_get(s2.it)
        print(f"first chunk (compile+run): {time.perf_counter() - t0:.1f} s", flush=True)

        def ctimed(n):
            s = st
            t0 = time.perf_counter()
            for _ in range(n):
                s = cfn(s)[0]
            _ = jax.device_get(s.it)
            return time.perf_counter() - t0

        t1, t4 = ctimed(1), ctimed(4)
        print(f"chunk device: {(t4 - t1) / 3:.2f} s per {chunk}-step chunk = "
              f"{(t4 - t1) / 3 / chunk * 1000:.1f} ms/step (barrier {ms_step:.1f})", flush=True)

    # --- workload systems (published size, unique sids) ---
    hetero = os.environ.get("BENCH_HETERO", "0") != "0"
    if hetero:
        # OC20-like natoms spread: answers VERDICT round-4 weak #5's
        # production question — per-bucket continuous pools vs one max-pad
        # pool (run_dataset's num_buckets) under a budget spread
        hrng = np.random.default_rng(7)
        systems = []
        for i in range(nsys):
            n_slab = int(np.clip(hrng.lognormal(np.log(70.0), 0.45), 24, 220))
            n_ads = int(hrng.integers(2, 9))
            (s,) = uncollate(example_batch(1, n_slab=n_slab, n_ads=n_ads,
                                           n_pad=n_slab + n_ads, seed=100 + i))
            s.sid = i
            systems.append(s)
    else:
        systems = uncollate(example_batch(nsys))
        for i, s in enumerate(systems):
            s.sid = i

    rng = np.random.default_rng(0)
    # one budget draw per scenario, shared by every chunk size in the sweep
    scenarios = [s for s in scenarios if s and s != "none"]
    budget_map = {s: budgets_for(s, nsys, rng) for s in scenarios}
    with_traj = os.environ.get("BENCH_TRAJ", "1") != "0"
    opt = dict(maxstep=0.04, memory=50)
    if os.environ.get("BENCH_NARROW"):
        opt["drain_narrowing"] = True

    for chunk in chunks:
        # ONE engine for every scenario (production shape: the pipeline reuses
        # its engine across seeds), warmed so compile/executable-load stays out
        # of the timed window — the barrier per-step measurement above is
        # warmed too; production amortizes these once per process
        eng = ContinuousRelaxationEngine(
            ef, opt, steps=300, fmax=1e-12,
            candidate_fn=cf, slots=slots, chunk_steps=chunk,
        )
        warm = uncollate(example_batch(slots + 1))
        for i, s in enumerate(warm):
            s.sid = 10_000 + i
        eng.run_systems(warm, budgets=[1] * len(warm), max_atoms=batch.max_atoms)
        print(f"engine warmed (chunk={chunk}: chunk + retire + refill compiled)", flush=True)

        if hetero:
            # per-bucket pools (production run_dataset policy) vs one
            # max-pad pool, same budget draw mapped by sid
            from adsorbdiff_tpu.data.buckets import default_bucket_edges

            budgets = budget_map[scenarios[0] if scenarios else "tail"]
            natoms = np.asarray([s.natoms for s in systems])
            for nb in (4, 1):
                edges = default_bucket_edges(natoms, nb)
                # warm each bucket shape with 1-step runs
                lo = 0
                for hi in edges:
                    grp = [s for s in systems if lo < s.natoms <= hi]
                    lo = hi
                    if grp:
                        eng.run_systems(grp[: min(len(grp), slots)],
                                        budgets=[1] * min(len(grp), slots), max_atoms=hi)
                t0 = time.perf_counter()
                lo, done = 0, 0
                for hi in edges:
                    grp = [s for s in systems if lo < s.natoms <= hi]
                    lo = hi
                    if grp:
                        res = eng.run_systems(
                            grp, budgets=[int(budgets[s.sid]) for s in grp], max_atoms=hi)
                        done += len(res)
                dt = time.perf_counter() - t0
                assert done == nsys
                eff = float(natoms.sum()) / sum(
                    len([s for s in systems if (0 if i == 0 else edges[i - 1]) < s.natoms <= hi]) * hi
                    for i, hi in enumerate(edges))
                print(json.dumps({
                    "scenario": f"hetero-{'buckets' if nb == 4 else 'maxpad'}",
                    "chunk": chunk, "num_buckets": nb,
                    "bucket_edges": edges,
                    "pad_efficiency": round(eff, 3),
                    "continuous_s_measured": round(dt, 1),
                    "systems_per_hour": round(nsys / dt * 3600, 1),
                }), flush=True)
            continue

        for scenario in scenarios:
            budgets = budget_map[scenario]
            # barrier engine cost (derived): arrival-order batches of `slots`,
            # each pays its max budget per step; IO assumed perfectly hidden
            batch_maxes = [int(budgets[i : i + slots].max()) for i in range(0, nsys, slots)]
            barrier_s = sum(batch_maxes) * ms_step / 1000
            ideal_s = float(budgets.sum()) / slots * ms_step / 1000  # zero-overhead bound

            td = tempfile.mkdtemp(prefix="bench_cont_") if with_traj else None
            try:
                t0 = time.perf_counter()
                res = eng.run_systems(systems, traj_dir=td, budgets=budgets.tolist(), max_atoms=batch.max_atoms)
                cont_s = time.perf_counter() - t0
            finally:
                if td:
                    shutil.rmtree(td, ignore_errors=True)
            assert len(res) == nsys
            print(json.dumps({
                "scenario": scenario,
                "chunk": chunk,
                "budget_sum": int(budgets.sum()),
                "barrier_s_derived": round(barrier_s, 1),
                "continuous_s_measured": round(cont_s, 1),
                "ideal_s": round(ideal_s, 1),
                "speedup_vs_barrier": round(barrier_s / cont_s, 2),
                "overhead_vs_ideal": round(cont_s / ideal_s, 2),
                "barrier_systems_per_hour": round(nsys / barrier_s * 3600, 1),
                "continuous_systems_per_hour": round(nsys / cont_s * 3600, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
