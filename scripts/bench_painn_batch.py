"""PaiNN sampling occupancy sweep: bench.py's metric at B in {16, 32, 64}.

bench.py measures published-size PaiNN reverse diffusion at B=16; if the chip
is underoccupied there, raising the batch lifts system-steps/s/chip at
identical per-system semantics (the batch axis is embarrassingly parallel).

    python scripts/bench_painn_batch.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def run_for_batch(batch_size: int) -> float:
    from adsorbdiff_tpu.data.schema import System, collate
    from adsorbdiff_tpu.diffusion.sampler import reverse_diffusion
    from adsorbdiff_tpu.models.base import prepare_static_graph
    from adsorbdiff_tpu.models.painn import PaiNN

    rng = np.random.default_rng(0)
    n_slab, n_ads, n_pad = 74, 6, 80
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

    model = PaiNN(sampling=True, cell_reps=(2, 2, 0), use_pallas=True,
                  compute_dtype="bfloat16", max_ads=8)
    variables = model.init(jax.random.PRNGKey(0), batch)

    def score_fn(cur, static):
        out1, out2 = model.apply(variables, cur, static)
        return out1, jnp.where(cur.fixed[..., None], 0.0, out2)

    static_fn = lambda b: prepare_static_graph(  # noqa: E731
        b, cutoff=12.0, max_neighbors=50, cell_reps=(2, 2, 0))
    params = dict(num_steps=100, ads_std_low=0.1, ads_std_high=10.0,
                  rot_std_low=0.01, rot_std_high=1.55, ode=True)
    sample = jax.jit(lambda b, k: reverse_diffusion(score_fn, b, params, k, static_fn=static_fn))

    res = sample(batch, jax.random.PRNGKey(1))
    _ = jax.device_get(res.batch.pos[0, 0])

    def run(reps: int) -> float:
        b = batch
        t0 = time.perf_counter()
        for i in range(reps):
            res = sample(b, jax.random.PRNGKey(2 + i))
            b = b.replace(pos=res.batch.pos)
        _ = jax.device_get(b.pos[0, 0])
        return time.perf_counter() - t0

    t1, t6 = run(1), run(6)
    dt = (t6 - t1) / 5
    return params["num_steps"] * batch_size / dt


def main() -> None:
    from adsorbdiff_tpu.common.compile_cache import setup_compilation_cache

    setup_compilation_cache()  # reruns skip the model-scale compiles
    print(f"devices: {jax.devices()}", flush=True)
    for b in [int(x) for x in os.environ.get("BENCH_B", "16,32,64").split(",")]:
        sps = run_for_batch(b)
        print(f"painn sampling B={b}: {sps:.1f} system-steps/s", flush=True)


if __name__ == "__main__":
    main()
