"""Native (C++) shard reader + batch collator bindings.

The reference's data layer leans on the lmdb C library through py-lmdb
(ref: adsorbdiff/datasets/lmdb_dataset.py) and unpickles a torch object per
item.  Our native path is a mmap'd raw-columnar ``.adbin`` shard read by
``runtime/native/adshard.cc``: batch assembly (gather ragged systems ->
padded [B, N, ...] buffers) runs in C++ with a thread pool, bound via ctypes
(pybind11 is not in this image).  Falls back transparently to the pure-Python
:class:`adsorbdiff_tpu.data.store.ShardDataset` when no compiler is available.

Build: compiled once per machine with g++ -O3 -shared, cached next to the
source; set ``ADSORBDIFF_TPU_NO_NATIVE=1`` to force the Python path.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

from adsorbdiff_tpu.common.registry import registry
from adsorbdiff_tpu.data.schema import AtomsBatch, System

MAGIC = b"ADSB"
SUFFIX = ".adbin"
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "runtime", "native")


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    if os.environ.get("ADSORBDIFF_TPU_NO_NATIVE"):
        _LIB_FAILED = True
        return None
    src = os.path.abspath(os.path.join(_native_dir(), "adshard.cc"))
    so = os.path.join(os.path.dirname(src), "libadshard.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", src, "-o", so + ".tmp"],
                check=True,
                capture_output=True,
            )
            os.replace(so + ".tmp", so)
        lib = ctypes.CDLL(so)
    except (subprocess.CalledProcessError, OSError) as e:
        logging.warning(f"native adshard unavailable ({e}); using pure-Python data path")
        _LIB_FAILED = True
        return None
    lib.adb_open.restype = ctypes.c_void_p
    lib.adb_open.argtypes = [ctypes.c_char_p]
    lib.adb_close.argtypes = [ctypes.c_void_p]
    lib.adb_num_systems.restype = ctypes.c_int64
    lib.adb_num_systems.argtypes = [ctypes.c_void_p]
    lib.adb_natoms.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.adb_has_forces.restype = ctypes.c_int
    lib.adb_has_forces.argtypes = [ctypes.c_void_p]
    lib.adb_fill_batch.restype = ctypes.c_int
    lib.adb_fill_batch.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] + [ctypes.c_int64] * 2 + [ctypes.c_void_p] * 13 + [ctypes.c_int]
    _LIB = lib
    return lib


def write_shard_bin(path: str, systems: Sequence[System]) -> str:
    """Write the raw .adbin format (host-side numpy, atomic rename)."""
    if not path.endswith(SUFFIX):
        path = path + SUFFIX
    n = len(systems)
    natoms = np.asarray([s.natoms for s in systems], np.int32)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(natoms, out=offsets[1:])
    has_forces = bool(systems) and all(s.forces is not None for s in systems)

    def cat(fn, dtype, shape_tail=()):
        if not systems:
            return np.zeros((0,) + shape_tail, dtype)
        return np.ascontiguousarray(np.concatenate([np.asarray(fn(s), dtype).reshape((-1,) + shape_tail) for s in systems]))

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        np.uint32(1).tofile(f)
        np.uint64(n).tofile(f)
        np.uint64(int(offsets[-1])).tofile(f)
        offsets.tofile(f)
        natoms.tofile(f)
        np.ascontiguousarray(np.stack([s.cell for s in systems]) if systems else np.zeros((0, 3, 3), np.float32)).astype(np.float32).tofile(f)
        np.asarray([s.sid for s in systems], np.int64).tofile(f)
        np.asarray([s.fid for s in systems], np.int64).tofile(f)
        np.asarray([0.0 if s.energy is None else s.energy for s in systems], np.float32).tofile(f)
        np.asarray([s.y_relaxed for s in systems], np.float32).tofile(f)
        np.uint8(1 if has_forces else 0).tofile(f)
        cat(lambda s: s.pos, np.float32, (3,)).tofile(f)
        cat(lambda s: s.atomic_numbers, np.int32).tofile(f)
        cat(lambda s: s.tags, np.int32).tofile(f)
        cat(lambda s: s.fixed, np.uint8).tofile(f)
        cat(lambda s: s.pos_relaxed, np.float32, (3,)).tofile(f)
        if has_forces:
            cat(lambda s: s.forces, np.float32, (3,)).tofile(f)
    os.replace(tmp, path)
    return path


@registry.register_dataset("adbin")
class NativeShardDataset:
    """mmap'd native shard with C++ padded-batch collation."""

    def __init__(self, config: dict) -> None:
        self.config = dict(config)
        src = str(config["src"])
        if not os.path.exists(src) and os.path.exists(src + SUFFIX):
            src = src + SUFFIX
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native adshard library unavailable")
        self._lib = lib
        self._h = lib.adb_open(src.encode())
        if not self._h:
            raise OSError(f"failed to open adbin shard '{src}'")
        self._n = int(lib.adb_num_systems(self._h))
        self._natoms = np.zeros(self._n, np.int32)
        lib.adb_natoms(self._h, self._natoms.ctypes.data_as(ctypes.c_void_p))
        self.has_forces = bool(lib.adb_has_forces(self._h))

    def __len__(self) -> int:
        return self._n

    def natoms_array(self) -> np.ndarray:
        return self._natoms

    def close_db(self) -> None:
        if self._h:
            self._lib.adb_close(self._h)
            self._h = None

    def collate_indices(self, indices: Sequence[int], max_atoms: int, with_forces: bool = False, n_threads: int = 4) -> AtomsBatch:
        """Padded batch straight from the mmap via the C++ collator."""
        import jax.numpy as jnp

        b = len(indices)
        idx = np.asarray(indices, np.int64)
        pos = np.zeros((b, max_atoms, 3), np.float32)
        z = np.zeros((b, max_atoms), np.int32)
        tags = np.zeros((b, max_atoms), np.int32)
        fixed = np.zeros((b, max_atoms), np.uint8)
        cell = np.zeros((b, 3, 3), np.float32)
        natoms = np.zeros(b, np.int32)
        mask = np.zeros((b, max_atoms), np.uint8)
        sid = np.zeros(b, np.int32)
        fid = np.zeros(b, np.int32)
        energy = np.zeros(b, np.float32)
        y_rel = np.zeros(b, np.float32)
        pos_rel = np.zeros((b, max_atoms, 3), np.float32)
        forces = np.zeros((b, max_atoms, 3), np.float32) if (with_forces and self.has_forces) else None

        ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)  # noqa: E731
        ret = self._lib.adb_fill_batch(
            self._h, ptr(idx), b, max_atoms,
            ptr(pos), ptr(z), ptr(tags), ptr(fixed), ptr(cell), ptr(natoms), ptr(mask),
            ptr(sid), ptr(fid), ptr(energy), ptr(y_rel), ptr(pos_rel),
            ptr(forces) if forces is not None else None, n_threads,
        )
        if ret != 0:
            raise ValueError("adb_fill_batch failed (index out of range or natoms > max_atoms)")
        return AtomsBatch(
            pos=jnp.asarray(pos),
            atomic_numbers=jnp.asarray(z),
            tags=jnp.asarray(tags),
            fixed=jnp.asarray(fixed.astype(bool)),
            cell=jnp.asarray(cell),
            natoms=jnp.asarray(natoms),
            atom_mask=jnp.asarray(mask.astype(bool)),
            sid=jnp.asarray(sid),
            fid=jnp.asarray(fid),
            energy=jnp.asarray(energy),
            y_relaxed=jnp.asarray(y_rel),
            pos_relaxed=jnp.asarray(pos_rel),
            forces=None if forces is None else jnp.asarray(forces),
        )

    def __getitem__(self, i: int) -> System:
        """Single-system access (python-side, for API parity with ShardDataset)."""
        batch = self.collate_indices([int(i)], max_atoms=int(self._natoms[int(i)]), with_forces=True, n_threads=1)
        from adsorbdiff_tpu.data.schema import uncollate

        return uncollate(batch)[0]
