"""Forward-throughput benchmarks for the relaxation-stage GemNet-OC and
EquiformerV2 at their published sizes (ref configs: gemnet_relax.yml,
eqv2_so3.yml), f32 and bf16, on the current JAX backend.

Timing: reps are chained through a data dependency and fenced with a single
device_get (the remote-TPU tunnel does not fence on block_until_ready); two
run lengths subtract the readback round-trip.  Run:

    BENCH_MODEL=gemnet BENCH_B=8 python scripts/bench_models.py
    BENCH_MODEL=eqv2   BENCH_B=8 python scripts/bench_models.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from adsorbdiff_tpu.data.schema import System, collate


def example_batch(b, n_slab=74, n_ads=6, n_pad=80, seed=0):
    rng = np.random.default_rng(seed)
    systems = []
    for i in range(b):
        cell = np.diag([11.4, 11.4, 36.0]).astype(np.float32)
        slab = (rng.random((n_slab, 3)) * [1, 1, 0.35]) @ cell
        ads = rng.random((n_ads, 3)).astype(np.float32) * 1.6 + np.array([5, 5, 14.5], np.float32)
        pos = np.concatenate([slab, ads]).astype(np.float32)
        tags = np.array([0] * (n_slab // 2) + [1] * (n_slab - n_slab // 2) + [2] * n_ads, np.int32)
        z = np.concatenate([rng.integers(20, 80, n_slab), rng.integers(1, 9, n_ads)])
        systems.append(System(pos=pos, atomic_numbers=z, cell=cell, tags=tags, fixed=tags == 0, sid=i))
    return collate(systems, max_atoms=n_pad)


def timeit(apply_fn, variables, batch, label):
    b = batch.batch_size
    fwd = jax.jit(lambda v, bb: apply_fn(v, bb))
    out = fwd(variables, batch)
    _ = jax.device_get(jnp.ravel(jax.tree.leaves(out)[0])[0])

    def run(reps):
        bb = batch
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fwd(variables, bb)
            eps = jnp.mean(jnp.ravel(jax.tree.leaves(o)[0])) * 1e-12
            bb = bb.replace(pos=bb.pos + eps)  # chain dependency
        _ = jax.device_get(jnp.ravel(jax.tree.leaves(o)[0])[0])
        return time.perf_counter() - t0

    run(2)  # extra warm: first dispatches pay tunnel setup
    t2, t8 = run(2), run(8)
    dt = (t8 - t2) / 6
    print(f"{label}: {dt * 1000:.1f} ms/fwd at B={b}  ({b / dt:.1f} systems/s)")
    return dt


def main():
    which = os.environ.get("BENCH_MODEL", "gemnet")
    b = int(os.environ.get("BENCH_B", "8"))
    batch = example_batch(b)
    print("devices:", jax.devices())
    if which == "gemnet":
        from adsorbdiff_tpu.models.gemnet_oc import GemNetOC

        kw = dict(mode="s2ef", cell_reps=(2, 2, 0))
        v = GemNetOC(**kw).init(jax.random.PRNGKey(0), batch)
        if os.environ.get("BENCH_PALLAS"):
            kw["use_pallas"] = True
        tag = " pallas" if kw.get("use_pallas") else ""
        for label, cd in ((f"gemnet-oc{tag} f32", None), (f"gemnet-oc{tag} bf16", "bfloat16")):
            timeit(GemNetOC(**kw, compute_dtype=cd).apply, v, batch, label)
    else:
        from adsorbdiff_tpu.models.equiformer_v2 import EquiformerV2

        kw = dict(mode="denoising", so3_denoising=True, for_denoising=True, cell_reps=(2, 2, 0))
        if os.environ.get("BENCH_PALLAS"):
            kw["use_pallas"] = True
        v = EquiformerV2(**dict(kw, use_pallas=False)).init(jax.random.PRNGKey(0), batch)
        tag = " pallas" if kw.get("use_pallas") else ""
        for label, cd in ((f"eqv2{tag} f32", None), (f"eqv2{tag} bf16", "bfloat16")):
            timeit(EquiformerV2(**kw, compute_dtype=cd).apply, v, batch, label)


if __name__ == "__main__":
    main()
