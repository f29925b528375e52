"""EqV2 train-step A/B: XLA vs fused kernels (rotation VJP + s2 VJP +
conv1 XLA-recompute VJP).  Published size, B=4, value_and_grad + AdamW.

Run:  JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jax_compile python scripts/bench_eqv2_train.py
"""
import sys, time
sys.path.insert(0, ".")

from adsorbdiff_tpu.common.compile_cache import setup_compilation_cache

setup_compilation_cache()  # reruns skip the model-scale compiles
import numpy as np
import jax, jax.numpy as jnp
import optax
from adsorbdiff_tpu.data.schema import System, collate
from adsorbdiff_tpu.models.equiformer_v2 import EquiformerV2

rng = np.random.default_rng(0)
B, n_slab, n_ads, n_pad = 4, 74, 6, 80
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
target = jnp.asarray(rng.normal(size=(B, n_pad, 3)), jnp.float32)

ekw = dict(mode="denoising", so3_denoising=True, for_denoising=True, cell_reps=(2, 2, 0))
v0 = EquiformerV2(**ekw).init(jax.random.PRNGKey(0), batch)
tx = optax.adamw(1e-4)


def make_step(model):
    def loss_fn(p, b):
        f1, f2 = model.apply(p, b)
        return jnp.mean((f1 - target) ** 2) + jnp.mean((f2 - target) ** 2)

    @jax.jit
    def step(p, o, b):
        l, g = jax.value_and_grad(loss_fn)(p, b)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    return step


def timeit(step, label):
    p, o = v0, tx.init(v0)
    t0 = time.time()
    p, o, l = step(p, o, batch)
    _ = jax.device_get(l)
    print(f"  [{label}] compile+first: {time.time()-t0:.1f}s", flush=True)

    def run(reps):
        nonlocal p, o
        bb = batch
        t0 = time.perf_counter()
        l = 0.0
        for _ in range(reps):
            p, o, l = step(p, o, bb)
        _ = jax.device_get(l)
        return time.perf_counter() - t0

    run(2)
    t2, t8 = run(2), run(8)
    dt = (t8 - t2) / 6
    print(f"{label}: {dt*1000:.1f} ms/step at B={B}  ({B/dt:.1f} systems/s)", flush=True)


variants = [
    ("train bf16 xla", dict(compute_dtype="bfloat16", training=True, alpha_drop=0.1, drop_path_rate=0.05)),
    ("train bf16 +s2+conv1", dict(compute_dtype="bfloat16", training=True, alpha_drop=0.1,
                                  drop_path_rate=0.05, use_pallas=True, use_pallas_conv1=True)),
    ("train bf16 +s2+rot", dict(compute_dtype="bfloat16", training=True, alpha_drop=0.1,
                                drop_path_rate=0.05, use_pallas=True, use_pallas_rotate=True)),
]
for label, kw in variants:
    m = EquiformerV2(**ekw, **kw)
    # training models need dropout rngs
    def make_step_rng(model):
        def loss_fn(p, b):
            f1, f2 = model.apply(p, b, rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.mean((f1 - target) ** 2) + jnp.mean((f2 - target) ** 2)

        @jax.jit
        def step(p, o, b):
            l, g = jax.value_and_grad(loss_fn)(p, b)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, l

        return step

    timeit(make_step_rng(m), label)
