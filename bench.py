#!/usr/bin/env python
"""Benchmark: PaiNN reverse-diffusion sampling throughput on one chip.

Driver metric (BASELINE.json): diffusion sampling steps/sec/chip on the
published full-size PaiNN denoising model (H=512, 6 layers, cutoff 12 Å,
max 50 neighbors — ref: configs/denoising/painn_so3.yml:38-46) with the
published 100-step sampling schedule (ref: :79-83) on OC20-scale systems
(~80-atom slab+adsorbate).

One "sampling step" = one model forward + rigid-body ODE update for one
system.  steps/sec/chip = num_steps * batch_size / wall_time.  The entire
100-step trajectory is ONE device dispatch (lax.scan), so the number is pure
device throughput.

``vs_baseline``: the reference publishes no wall-clock numbers and its CUDA
stack cannot run in this image (SURVEY.md §6).  The baseline constant below is
an estimated A100 reference throughput derived from the reference's per-step
structure: 100 sequential forwards with per-step host syncs (traj write +
numpy IGSO(3) lookups per system, ref: denoising_torch.py:322-367) at its
published batch size 48 — ~20 ms/forward + ~10 ms host work => ~1600
system-steps/s.  Update when a measured reference number exists.
"""
import json
import time

import numpy as np

BASELINE_SYSTEM_STEPS_PER_SEC = 1600.0


def main() -> None:
    from adsorbdiff_tpu.common.compile_cache import setup_compilation_cache

    setup_compilation_cache()  # reruns skip the model-scale compiles
    import jax
    import jax.numpy as jnp

    from adsorbdiff_tpu.data.schema import System, collate
    from adsorbdiff_tpu.diffusion.sampler import reverse_diffusion
    from adsorbdiff_tpu.models.painn import PaiNN

    rng = np.random.default_rng(0)
    batch_size = 16
    n_slab, n_ads = 74, 6
    n_pad = 80
    systems = []
    for i in range(batch_size):
        cell = np.diag([11.4, 11.4, 36.0]).astype(np.float32)
        slab = (rng.random((n_slab, 3)) * [1, 1, 0.35]) @ cell
        ads = rng.random((n_ads, 3)).astype(np.float32) * 1.6 + np.array([5, 5, 14.5], np.float32)
        pos = np.concatenate([slab, ads]).astype(np.float32)
        tags = np.array([0] * (n_slab // 2) + [1] * (n_slab - n_slab // 2) + [2] * n_ads, np.int32)
        z = np.concatenate([rng.integers(20, 80, n_slab), rng.integers(1, 9, n_ads)])
        systems.append(System(pos=pos, atomic_numbers=z, cell=cell, tags=tags, fixed=tags == 0, sid=i))
    batch = collate(systems, max_atoms=n_pad)

    # cell_reps (2,2,0): the 23 A z-vacuum exceeds the cutoff, so z-images
    # can never be neighbors — identical physics, 3x fewer graph candidates.
    # use_pallas: fused VMEM message-consumer kernel (inference-only) fed by
    # bf16 gathers — same-session A/B vs the XLA f32 path: +50% (docs/PERF.md).
    model = PaiNN(sampling=True, cell_reps=(2, 2, 0), use_pallas=True, compute_dtype="bfloat16", max_ads=8)
    variables = model.init(jax.random.PRNGKey(0), batch)

    def score_fn(cur, static):
        out1, out2 = model.apply(variables, cur, static)
        out2 = jnp.where(cur.fixed[..., None], 0.0, out2)
        return out1, out2

    # incremental graphs: slab-slab candidates are hoisted out of the 100-step
    # scan (only the adsorbate moves); per step only adsorbate-involving graph
    # rows are recomputed — exact same neighbor table (tests/test_pbc.py)
    from adsorbdiff_tpu.models.base import prepare_static_graph

    static_fn = lambda b: prepare_static_graph(b, cutoff=12.0, max_neighbors=50, cell_reps=(2, 2, 0))  # noqa: E731
    params = dict(num_steps=100, ads_std_low=0.1, ads_std_high=10.0, rot_std_low=0.01, rot_std_high=1.55, ode=True)
    sample = jax.jit(lambda b, k: reverse_diffusion(score_fn, b, params, k, static_fn=static_fn))

    # compile + warm; NOTE on timing: through the remote-TPU tunnel,
    # block_until_ready does not reliably fence execution, so reps are chained
    # through a data dependency and fenced with ONE device_get readback.
    res = sample(batch, jax.random.PRNGKey(1))
    _ = jax.device_get(res.batch.pos[0, 0])

    def run(reps: int) -> float:
        b = batch
        t0 = time.perf_counter()
        for i in range(reps):
            res = sample(b, jax.random.PRNGKey(2 + i))
            b = b.replace(pos=res.batch.pos)  # chain dependency
        _ = jax.device_get(b.pos[0, 0])
        return time.perf_counter() - t0

    t1, t6 = run(1), run(6)
    dt = (t6 - t1) / 5  # per-rep cost net of the readback round-trip

    assert np.isfinite(np.asarray(res.batch.pos)).all()
    system_steps_per_sec = params["num_steps"] * batch_size / dt
    print(
        json.dumps(
            {
                "metric": "painn_diffusion_sampling_system_steps_per_sec_per_chip",
                "value": round(system_steps_per_sec, 1),
                "unit": "system-steps/s",
                "vs_baseline": round(system_steps_per_sec / BASELINE_SYSTEM_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
