"""One-process EqV2 bench + trace session: A/B the kernel stages on the
published size and trace the best variant.

Run:  JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jax_compile python scripts/bench_eqv2_kernels.py
"""
import sys, time, os
sys.path.insert(0, ".")

from adsorbdiff_tpu.common.compile_cache import setup_compilation_cache

setup_compilation_cache()  # reruns skip the model-scale compiles
import numpy as np
import jax, jax.numpy as jnp
from adsorbdiff_tpu.data.schema import System, collate
from adsorbdiff_tpu.models.equiformer_v2 import EquiformerV2

rng = np.random.default_rng(0)
B, n_slab, n_ads, n_pad = 8, 74, 6, 80
systems = []
for i in range(B):
    cell = np.diag([11.4, 11.4, 36.0]).astype(np.float32)
    slab = (rng.random((n_slab, 3)) * [1, 1, 0.35]) @ cell
    ads = rng.random((n_ads, 3)).astype(np.float32) * 1.6 + np.array([5, 5, 14.5], np.float32)
    pos = np.concatenate([slab, ads]).astype(np.float32)
    tags = np.array([0] * (n_slab // 2) + [1] * (n_slab - n_slab // 2) + [2] * n_ads, np.int32)
    z = np.concatenate([rng.integers(20, 80, n_slab), rng.integers(1, 9, n_ads)])
    systems.append(System(pos=pos, atomic_numbers=z, cell=cell, tags=tags, fixed=tags == 0, sid=i))
batch = collate(systems, max_atoms=n_pad)

print("devices:", jax.devices(), flush=True)
ekw = dict(mode="denoising", so3_denoising=True, for_denoising=True, cell_reps=(2, 2, 0))
v = EquiformerV2(**ekw).init(jax.random.PRNGKey(0), batch)
print("init done", flush=True)


def timeit(fwd, label):
    t0 = time.time()
    out = fwd(v, batch)
    _ = jax.device_get(jax.tree.leaves(out)[0][0, 0])
    print(f"  [{label}] compile+first: {time.time()-t0:.1f}s", flush=True)

    def run(reps):
        bb = batch
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fwd(v, bb)
            eps = jnp.mean(jax.tree.leaves(o)[0]) * 1e-12
            bb = bb.replace(pos=bb.pos + eps)
        _ = jax.device_get(jax.tree.leaves(o)[0][0, 0])
        return time.perf_counter() - t0

    run(2)
    t2, t8 = run(2), run(8)
    dt = (t8 - t2) / 6
    print(f"{label}: {dt*1000:.1f} ms/fwd at B={B}  ({B/dt:.1f} systems/s)", flush=True)
    return dt


variants = [
    ("bf16-xla", dict(compute_dtype="bfloat16")),
    ("bf16+s2", dict(compute_dtype="bfloat16", use_pallas=True)),
    ("bf16+s2+rot", dict(compute_dtype="bfloat16", use_pallas=True, use_pallas_rotate=True)),
    ("bf16+s2+conv1", dict(compute_dtype="bfloat16", use_pallas=True, use_pallas_conv1=True)),
]
fwds, times = {}, {}
for label, kw in variants:
    fwds[label] = jax.jit(EquiformerV2(**ekw, **kw).apply)
    times[label] = timeit(fwds[label], f"eqv2 {label}")

best = min(times, key=times.get)
print("best:", best, flush=True)
tdir = os.environ.get("TRACE_DIR", "/tmp/eqv2_trace_r3e")
fwd = fwds[best]
with jax.profiler.trace(tdir):
    bb = batch
    for _ in range(3):
        o = fwd(v, bb)
        bb = bb.replace(pos=bb.pos + jnp.mean(jax.tree.leaves(o)[0]) * 1e-12)
    _ = jax.device_get(jax.tree.leaves(o)[0][0, 0])
print("trace written to", tdir, flush=True)
