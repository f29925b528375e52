"""Continuous-vs-barrier A/B under REAL fmax convergence (VERDICT round-4
weak #1 / next-round #5): instead of emulating convergence spread with
per-system step budgets (scripts/bench_continuous.py), TRAIN a published-size
GemNet-OC on a synthetic Morse-pair landscape, relax fresh placements until
the LEARNED forces genuinely drop below fmax, and measure both engines on the
resulting (not budgeted) convergence distribution.

    BENCH_NSYS=64 BENCH_FMAX=0.05 python scripts/bench_tail_real.py

Ground truth: E = sum over adsorbate-slab pairs of a species-modulated Morse
well; per-system well depths vary with composition, so convergence times
spread the way real MLFF relaxations do (ref stopping semantics:
lbfgs_torch.py:74-90).
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


def morse_targets(pos, z, tags, cell):
    """Morse pair energy/forces between adsorbate (tag 2) and surface atoms.

    Species-dependent depth D(z) spreads landscape stiffness across systems.
    Periodic images ignored (wells are local; training data stays coherent).
    """
    a, r0 = 1.3, 2.2
    ads = np.where(tags == 2)[0]
    surf = np.where(tags != 2)[0]
    f = np.zeros_like(pos)
    e = 0.0
    for i in ads:
        for j in surf:
            d_vec = pos[i] - pos[j]
            d = float(np.linalg.norm(d_vec))
            if d > 6.0 or d < 1e-6:
                continue
            depth = 0.3 + 0.05 * ((int(z[i]) * 7 + int(z[j])) % 10)
            ex = np.exp(-a * (d - r0))
            e += depth * (1 - ex) ** 2 - depth
            dedd = 2 * depth * (1 - ex) * a * ex
            g = dedd * d_vec / d
            f[i] -= g
            f[j] += g
    return float(e), f.astype(np.float32)


def make_systems(rng, count, n_slab=74, n_ads=6, with_targets=True):
    from adsorbdiff_tpu.data.schema import System

    systems = []
    for i in range(count):
        cell = np.diag([11.4, 11.4, 36.0]).astype(np.float32)
        slab = ((rng.random((n_slab, 3)) * [1, 1, 0.35]) @ cell).astype(np.float32)
        # adsorbate: a compact cluster with >=1.4 A clearance above the top
        # slab atom — keeps every pair on the bounded outer Morse branch
        # (ex <= e^{1.3*0.8} ~ 2.8), so energies/forces have no exponential
        # tail and the regression targets are learnable
        top_z = float(slab[:, 2].max())
        center = np.array([rng.uniform(2.5, 8.9), rng.uniform(2.5, 8.9),
                           top_z + rng.uniform(1.4, 3.0)], np.float32)
        ads = center + rng.normal(scale=0.6, size=(n_ads, 3)).astype(np.float32)
        ads[:, 2] = np.maximum(ads[:, 2], top_z + 1.4)
        pos = np.concatenate([slab, ads]).astype(np.float32)
        tags = np.array([0] * (n_slab // 2) + [1] * (n_slab - n_slab // 2) + [2] * n_ads, np.int32)
        z = np.concatenate([rng.integers(20, 80, n_slab), rng.integers(1, 9, n_ads)])
        # only the adsorbate relaxes (the Morse truth has no slab-slab
        # restoring forces, so free surface atoms would collapse into the
        # wells and |F| could never reach fmax) — matches the AdsorbDiff
        # placement problem, where the slab is frozen at its DFT geometry
        kw = {}
        if with_targets:
            e, f = morse_targets(pos, z, tags, cell)
            kw = dict(energy=e, forces=f, y_relaxed=e)
        systems.append(System(pos=pos, atomic_numbers=z, cell=cell, tags=tags,
                              fixed=tags != 2, sid=i, pos_relaxed=pos, **kw))
    return systems


def main() -> None:
    from adsorbdiff_tpu.common.compile_cache import setup_compilation_cache

    setup_compilation_cache()
    from adsorbdiff_tpu.data.store import write_shard
    from adsorbdiff_tpu.relaxation.continuous import ContinuousRelaxationEngine
    from adsorbdiff_tpu.relaxation.ml_relaxation import RelaxationEngine
    from adsorbdiff_tpu.train.trainer import S2EFTrainer

    n_sys = int(os.environ.get("BENCH_NSYS", "64"))
    # comma list = same-trained-model sweep (convergence fraction / spread /
    # engine A/B per threshold; one training pays for all)
    fmax_list = [float(x) for x in os.environ.get("BENCH_FMAX", "0.05,0.1,0.2").split(",")]
    steps = int(os.environ.get("BENCH_RELAX_STEPS", "300"))
    b = int(os.environ.get("BENCH_B", "8"))
    train_epochs = int(os.environ.get("BENCH_EPOCHS", "16"))
    cdtype = os.environ.get("BENCH_DTYPE", "bf16")  # f32 isolates the bf16 force-noise floor
    out = tempfile.mkdtemp(prefix="bench_tail_")
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  nsys={n_sys} fmax={fmax_list} steps={steps} "
          f"dtype={cdtype}", flush=True)

    # ---- train a published-size GemNet-OC on the Morse landscape ----------
    os.makedirs(os.path.join(out, "train"))
    train_systems = make_systems(rng, 256)
    write_shard(os.path.join(out, "train", "part0"), train_systems)
    e_all = np.array([s.energy for s in train_systems])
    f_all = np.concatenate([s.forces.ravel() for s in train_systems])
    print(f"targets: E mean {e_all.mean():.2f} std {e_all.std():.2f}, "
          f"F std {f_all.std():.3f}", flush=True)
    cfg = dict(
        dataset=[{"src": os.path.join(out, "train"),
                  "normalize_labels": True,
                  "target_mean": float(e_all.mean()),
                  "target_std": float(e_all.std() + 1e-8),
                  "grad_target_mean": 0.0,
                  "grad_target_std": float(f_all.std() + 1e-8)}],
        model=dict(name="gemnet_oc", mode="s2ef", num_spherical=7, num_radial=128,
                   num_blocks=4, emb_size_atom=256, emb_size_edge=512,
                   cutoff=12.0, max_neighbors=30, max_neighbors_qint=8,
                   max_neighbors_aeaint=20, qint_tags=(1, 2),
                   compute_dtype=None if cdtype == "f32" else "bfloat16",
                   cell_reps=(2, 2, 0), fused_quad=True),
        optim=dict(batch_size=b, lr_initial=1e-3, optimizer_params={"weight_decay": 0.0},
                   scheduler="LambdaLR",
                   scheduler_params={"lambda_type": "cosine", "warmup_factor": 0.2,
                                     "warmup_epochs": 1, "lr_min_factor": 0.05},
                   max_epochs=train_epochs, clip_grad_norm=50, ema_decay=0.99,
                   energy_coefficient=1, force_coefficient=30,
                   loss_energy="mae", loss_force="l2mae",
                   # checkpoint_every=-1 = save every epoch (reference
                   # semantics); skip saves — training here only produces the
                   # in-memory model for the relax A/B
                   eval_every=10**9, checkpoint_every=10**9, print_every=64),
        task={}, seed=0, run_dir=out, identifier="tail", is_debug=True,
    )
    t0 = time.perf_counter()
    trainer = S2EFTrainer(cfg, mesh=None)
    trainer.train()
    print(f"trained {trainer.step} steps in {time.perf_counter() - t0:.0f} s", flush=True)

    # ---- relax fresh placements with genuine fmax stopping ----------------
    eval_systems = make_systems(np.random.default_rng(1), n_sys, with_targets=False)
    base_opt = {"maxstep": 0.04, "memory": 50, "damping": 1.0, "alpha": 70.0,
                "steps": steps, "slots": b, "chunk_steps": 32}

    # same-session per-step cost (chained fixed-step runs, one fence): the
    # tunnel-robust anchor for the derived-barrier arithmetic below
    from adsorbdiff_tpu.data.schema import collate
    from adsorbdiff_tpu.relaxation.lbfgs import lbfgs_relax

    cf = trainer.relax_candidate_fn(base_opt)
    anchor = collate(eval_systems[:b], max_atoms=80)
    run100 = jax.jit(lambda bb: lbfgs_relax(
        trainer.energy_forces_fn, bb, steps=100, fmax=0.0, candidate_fn=cf))
    _ = jax.device_get(run100(anchor).energy[0])  # warm

    def timed(nreps):
        bb, t0 = anchor, time.perf_counter()
        for _ in range(nreps):
            rr = run100(bb)
            bb = bb.replace(pos=bb.pos + jnp.mean(rr.energy) * 1e-12)
        _ = jax.device_get(rr.energy[0])
        return time.perf_counter() - t0

    t2, t6 = timed(2), timed(6)
    ms_step = (t6 - t2) / 4 / 100 * 1000
    print(f"per-step anchor: {ms_step:.1f} ms/step (B={b})", flush=True)

    for fmax in fmax_list:
        relax_opt = dict(base_opt, fmax=fmax)
        # continuous engine (warm compile outside the timed window;
        # budgets=[1] warms retire + refill too)
        eng = ContinuousRelaxationEngine(
            trainer.energy_forces_fn, relax_opt,
            candidate_fn=trainer.relax_candidate_fn(relax_opt))
        _ = eng.run_systems(eval_systems[: b + 1], budgets=[1] * (b + 1),
                            max_atoms=80, skip_existing=False)
        t0 = time.perf_counter()
        res = eng.run_systems(eval_systems, max_atoms=80, skip_existing=False)
        t_cont = time.perf_counter() - t0
        nsteps = np.array([res[s.sid].nsteps for s in eval_systems])
        conv = np.array([res[s.sid].converged for s in eval_systems])
        print(f"fmax={fmax} continuous: {t_cont:.1f} s for {n_sys} systems "
              f"({3600 * n_sys / t_cont:.0f} systems/h/chip)", flush=True)
        print(f"fmax={fmax} REAL convergence spread: nsteps p10/p50/p90 = "
              f"{np.percentile(nsteps, 10):.0f}/{np.percentile(nsteps, 50):.0f}/"
              f"{np.percentile(nsteps, 90):.0f}, converged {conv.mean() * 100:.0f}%",
              flush=True)
        # derived barrier on the MEASURED convergence distribution (the
        # round-4 protocol, bench_continuous.py): arrival-order batches each
        # pay their slowest member, at the same-session per-step anchor —
        # tunnel-robust
        batch_maxes = [int(nsteps[i:i + b].max()) for i in range(0, n_sys, b)]
        barrier_derived = sum(batch_maxes) * ms_step / 1000
        ideal = float(nsteps.sum()) / b * ms_step / 1000
        print(f"fmax={fmax} barrier (derived from real nsteps): "
              f"{barrier_derived:.1f} s; zero-overhead ideal {ideal:.1f} s", flush=True)

        # barrier engine: same systems, same fmax early-exit (whole batch
        # exits when ALL its systems converge — lbfgs early_exit), B batches
        reng = RelaxationEngine(
            trainer.energy_forces_fn, relax_opt, steps=steps, fmax=fmax,
            candidate_fn=trainer.relax_candidate_fn(relax_opt))
        warm = collate(eval_systems[:b], max_atoms=80)
        _ = reng.run(warm)
        t0 = time.perf_counter()
        for s0 in range(0, n_sys, b):
            bb = collate(eval_systems[s0:s0 + b], max_atoms=80)
            r = reng.run(bb)
        _ = jax.device_get(r.energy[0])
        t_barrier = time.perf_counter() - t0
        print(f"fmax={fmax} barrier: {t_barrier:.1f} s "
              f"({3600 * n_sys / t_barrier:.0f} systems/h/chip)", flush=True)

        print(json.dumps({
            "metric": "tail_real_convergence_speedup[continuous/barrier]",
            "value": round(barrier_derived / t_cont, 3),
            "speedup_vs_barrier_measured": round(t_barrier / t_cont, 3),
            "continuous_s": round(t_cont, 1),
            "barrier_s_derived": round(barrier_derived, 1),
            "barrier_s_measured": round(t_barrier, 1),
            "ideal_s": round(ideal, 1), "ms_step_anchor": round(ms_step, 1),
            "nsteps_p10_p50_p90": [int(np.percentile(nsteps, p)) for p in (10, 50, 90)],
            "converged_frac": round(float(conv.mean()), 3),
            "fmax": fmax, "dtype": cdtype, "n_sys": n_sys,
        }), flush=True)
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
