"""Device mesh + sharding helpers — the distributed backend.

Replaces the reference's torch.distributed/NCCL stack (ref: adsorbdiff/utils/
distutils.py:25-178) with single-controller JAX GSPMD:

- ``make_mesh`` builds a 1-D data-parallel mesh (axis ``dp``) over local (or
  all) devices; multi-host setups call :func:`init_distributed` first
  (``jax.distributed.initialize``), after which ``jax.devices()`` spans hosts
  and the same code path shards over ICI/DCN.
- batches are sharded over ``dp`` on the leading (system) axis; params are
  replicated.  Collectives (the DDP gradient all-reduce, the metric
  all_reduces at base_trainer.py:753-766, the balanced-sampler all_gather)
  disappear into XLA-inserted psums inside the jitted step.
- the reference's only implemented parallelism is DP (SURVEY.md §2.2); the
  ``--gp-gpus`` graph-parallel flag is vestigial there and intentionally has
  no analogue here.  Within-graph parallelism comes from XLA on the padded
  [B, N, K] tensors.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(**kwargs) -> None:
    """Multi-host bootstrap (replaces the Slurm/MPI/env:// init paths at
    distutils.py:26-103; coordinator discovery is automatic on TPU pods)."""
    jax.distributed.initialize(**kwargs)


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Optional[Mesh]) -> Any:
    """Put a pytree batch with leading system axis onto the mesh (dp-sharded)."""
    if mesh is None:
        return batch
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh) if hasattr(x, "ndim") and x.ndim >= 1 else x, batch)


def replicate_tree(tree: Any, mesh: Optional[Mesh]) -> Any:
    if mesh is None:
        return tree
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def fsdp_shardings(tree: Any, mesh: Mesh, axis_name: str = "dp",
                   min_size: int = 8192) -> Any:
    """ZeRO-3 (FSDP) sharding specs for a state pytree.

    Each sufficiently large leaf is sharded over ``axis_name`` along its
    largest mesh-divisible dimension; small or indivisible leaves replicate.
    Pinning the jitted train step's OUTPUT state to these specs makes XLA
    all-gather parameters where the forward consumes them and turn the dp
    gradient all-reduce into a reduce-scatter — the scaling-book ZeRO recipe,
    with per-device optimizer/EMA memory dropping ~1/n_devices.  The reference
    has no analogue (torch DDP replicates, ref: trainers/base_trainer.py:
    442-447); this is the TPU-native extension for models that outgrow a
    replicated optimizer state.
    """
    n = int(mesh.shape[axis_name])

    def one(x):
        shape = tuple(getattr(x, "shape", ()) or ())
        if not shape or int(np.prod(shape)) < min_size:
            return NamedSharding(mesh, P())
        cand = [d for d, s in enumerate(shape) if s % n == 0 and s >= n]
        if not cand:
            return NamedSharding(mesh, P())
        d = max(cand, key=lambda i: shape[i])
        spec: list = [None] * len(shape)
        spec[d] = axis_name
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(one, tree)


def shard_tree(tree: Any, shardings: Any) -> Any:
    """device_put every leaf onto its matching sharding (pytrees congruent)."""
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)


def local_device_count() -> int:
    return jax.local_device_count()


def process_index() -> int:
    """Host index (replaces distutils.get_rank at the host level)."""
    return jax.process_index()


def is_master() -> bool:
    return jax.process_index() == 0
