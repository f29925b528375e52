"""Columnar shard storage for atomic systems.

The reference stores pickled PyG ``Data`` objects in LMDB, one env per split
(ref: adsorbdiff/datasets/lmdb_dataset.py:30-223), leaning on the lmdb C
library.  This image has neither lmdb nor torch_geometric, and pickled object
stores are a poor fit for a TPU input pipeline anyway (per-item unpickling on
the host critical path).  Our native format is columnar: each ``*.adshard.npz``
holds the concatenated ragged arrays of S systems plus offsets, so a shard
loads with two ``np.load`` calls and slicing is zero-copy numpy.

An :class:`LmdbDataset` interop shim (reads real OC20 LMDBs when ``lmdb`` +
``torch`` are importable) lives in :mod:`adsorbdiff_tpu.data.lmdb_compat`.
"""
from __future__ import annotations

import glob
import os
from bisect import bisect_right
from typing import Iterable, List, Optional, Sequence

import numpy as np

from adsorbdiff_tpu.common.registry import registry
from adsorbdiff_tpu.data.schema import System

_FIELDS_ATOM = ("pos", "atomic_numbers", "tags", "fixed", "pos_relaxed", "forces")
_FIELDS_SYS = ("cell", "sid", "fid", "energy", "y_relaxed")
SUFFIX = ".adshard.npz"


def write_shard(path: str, systems: Sequence[System]) -> None:
    """Write systems to one columnar shard (atomic rename on completion)."""
    if not path.endswith(SUFFIX):
        path = path + SUFFIX
    natoms = np.asarray([s.natoms for s in systems], np.int32)
    offsets = np.zeros(len(systems) + 1, np.int64)
    np.cumsum(natoms, out=offsets[1:])
    cols = {
        "natoms": natoms,
        "offsets": offsets,
        "pos": np.concatenate([s.pos for s in systems]) if systems else np.zeros((0, 3), np.float32),
        "atomic_numbers": np.concatenate([s.atomic_numbers for s in systems]) if systems else np.zeros(0, np.int32),
        "tags": np.concatenate([s.tags for s in systems]) if systems else np.zeros(0, np.int32),
        "fixed": np.concatenate([s.fixed for s in systems]) if systems else np.zeros(0, bool),
        "pos_relaxed": np.concatenate([s.pos_relaxed for s in systems]) if systems else np.zeros((0, 3), np.float32),
        "cell": np.stack([s.cell for s in systems]) if systems else np.zeros((0, 3, 3), np.float32),
        "sid": np.asarray([s.sid for s in systems], np.int64),
        "fid": np.asarray([s.fid for s in systems], np.int64),
        "energy": np.asarray([0.0 if s.energy is None else s.energy for s in systems], np.float32),
        "y_relaxed": np.asarray([s.y_relaxed for s in systems], np.float32),
    }
    if systems and all(s.forces is not None for s in systems):
        cols["forces"] = np.concatenate([s.forces for s in systems])
    tmp = path[: -len(".npz")] + ".tmp.npz"
    np.savez_compressed(tmp, **cols)
    os.replace(tmp, path)


class _Shard:
    def __init__(self, path: str) -> None:
        self._z = np.load(path, allow_pickle=False)
        self.natoms = self._z["natoms"]
        self.offsets = self._z["offsets"]
        self._cols: Optional[dict] = None

    def __len__(self) -> int:
        return len(self.natoms)

    def _materialize(self) -> dict:
        # NpzFile.__getitem__ re-reads and re-DECOMPRESSES the whole zip
        # member on every access, so routing get() through it decompresses
        # six full columns per system — measured 4.2 batches/s host-side at
        # B=16, which made published-size training input-bound (183 ms/step
        # against an 8.1 ms device step).  Decompress each column exactly
        # once per process; get() is then a zero-copy numpy slice.  Memory =
        # the decompressed shard (~2 MB per 512 published-size systems).
        if self._cols is None:
            self._cols = {k: self._z[k] for k in self._z.files}
        return self._cols

    def get(self, i: int) -> System:
        a, b = int(self.offsets[i]), int(self.offsets[i + 1])
        z = self._materialize()
        return System(
            pos=z["pos"][a:b],
            atomic_numbers=z["atomic_numbers"][a:b],
            tags=z["tags"][a:b],
            fixed=z["fixed"][a:b],
            pos_relaxed=z["pos_relaxed"][a:b],
            forces=z["forces"][a:b] if "forces" in z else None,
            cell=z["cell"][i],
            sid=int(z["sid"][i]),
            fid=int(z["fid"][i]),
            energy=float(z["energy"][i]),
            y_relaxed=float(z["y_relaxed"][i]),
        )


@registry.register_dataset("shards")
@registry.register_dataset("lmdb")  # config-compat: `task.dataset: lmdb` resolves here
class ShardDataset:
    """Dataset over a single shard file or a directory of shards.

    Mirrors the reference LmdbDataset's single-file-or-directory behavior and
    its ``shard/total_shards`` manual subsetting (ref: lmdb_dataset.py:82-116).
    Config key: ``{"src": path, "shard": i, "total_shards": n}``.
    """

    def __init__(self, config: dict) -> None:
        self.config = dict(config)
        src = str(config["src"])
        if os.path.isdir(src):
            paths = sorted(glob.glob(os.path.join(src, f"*{SUFFIX}")))
            if not paths:
                raise FileNotFoundError(f"No *{SUFFIX} shards found in '{src}'")
        else:
            if not os.path.exists(src) and os.path.exists(src + SUFFIX):
                src = src + SUFFIX
            paths = [src]
        self._shards = [_Shard(p) for p in paths]
        lens = [len(s) for s in self._shards]
        self._cum = np.cumsum(lens)
        self._len = int(self._cum[-1]) if len(lens) else 0

        self.indices = np.arange(self._len)
        if "shard" in config and "total_shards" in config:
            # mimic reference manual sharding: contiguous split, drop remainder
            per = self._len // int(config["total_shards"])
            lo = per * int(config["shard"])
            self.indices = self.indices[lo : lo + per]

        self.transforms = list(config.get("transforms", []) or [])

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, idx: int) -> System:
        gi = int(self.indices[idx])
        shard_i = int(bisect_right(self._cum, gi))
        local = gi - (int(self._cum[shard_i - 1]) if shard_i else 0)
        sys = self._shards[shard_i].get(local)
        for t in self.transforms:
            sys = t(sys)
        return sys

    def natoms_array(self) -> np.ndarray:
        """[len] atom counts without materializing systems (for bucketing)."""
        all_natoms = np.concatenate([s.natoms for s in self._shards]) if self._shards else np.zeros(0, np.int32)
        return all_natoms[self.indices]

    def close_db(self) -> None:  # reference-API compat (lmdb_dataset.py:219-223)
        pass


def concat_datasets(datasets: Sequence[ShardDataset]):
    class _Concat:
        def __init__(self, ds):
            self._ds = ds
            self._cum = np.cumsum([len(d) for d in ds])

        def __len__(self):
            return int(self._cum[-1]) if len(self._ds) else 0

        def __getitem__(self, idx):
            di = int(bisect_right(self._cum, int(idx)))
            local = int(idx) - (int(self._cum[di - 1]) if di else 0)
            return self._ds[di][local]

        def natoms_array(self):
            return np.concatenate([d.natoms_array() for d in self._ds])

        def close_db(self):
            for d in self._ds:
                d.close_db()

    return _Concat(list(datasets))
