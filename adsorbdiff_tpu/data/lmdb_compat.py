"""OC20 LMDB interop (gated).

Reads the reference's pickled-PyG LMDB datasets (ref: adsorbdiff/datasets/
lmdb_dataset.py:30-223) and converts them to :class:`System`s / our shard
formats.  Requires the ``lmdb`` package and ``torch`` (+ ``torch_geometric``
for unpickling real OC20 files) — none of which are guaranteed in this image,
hence the hard gate.  Use ``convert_lmdb_to_shards`` offline where the deps
exist; the TPU pipeline then consumes the converted shards.
"""
from __future__ import annotations

import os
import pickle
from typing import Iterator, Optional

import numpy as np

from adsorbdiff_tpu.data.schema import System


def _require_lmdb():
    try:
        import lmdb  # noqa: F401

        return lmdb
    except ImportError as e:  # pragma: no cover - gated dependency
        raise ImportError(
            "LMDB interop requires the 'lmdb' package (and torch/torch_geometric "
            "for unpickling OC20 data). Convert datasets offline with "
            "convert_lmdb_to_shards where those are installed."
        ) from e


def _data_to_system(data) -> System:
    """Pickled PyG ``Data`` -> System (field map per SURVEY.md §2.3)."""

    def get(name, default=None):
        v = getattr(data, name, default)
        if v is None:
            return None
        return v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    pos = get("pos")
    return System(
        pos=pos,
        atomic_numbers=get("atomic_numbers").astype(np.int32),
        tags=get("tags", np.zeros(len(pos))).astype(np.int32),
        fixed=get("fixed", np.zeros(len(pos))).astype(bool),
        cell=get("cell").reshape(3, 3),
        sid=int(np.asarray(getattr(data, "sid", 0)).reshape(-1)[0]),
        fid=int(np.asarray(getattr(data, "fid", 0)).reshape(-1)[0]),
        energy=float(np.asarray(getattr(data, "y", 0.0) or 0.0)),
        y_relaxed=float(np.asarray(getattr(data, "y_relaxed", 0.0) or 0.0)),
        pos_relaxed=get("pos_relaxed"),
        forces=get("force"),
    )


def iter_lmdb_systems(src: str) -> Iterator[System]:
    """Iterate systems from a single .lmdb file or a directory of them."""
    lmdb = _require_lmdb()
    paths = (
        sorted(
            os.path.join(src, f) for f in os.listdir(src) if f.endswith(".lmdb")
        )
        if os.path.isdir(src)
        else [src]
    )
    for path in paths:
        env = lmdb.open(
            path, subdir=False, readonly=True, lock=False, readahead=False, meminit=False
        )
        with env.begin() as txn:
            length = txn.get("length".encode("ascii"))
            n = pickle.loads(length) if length is not None else env.stat()["entries"]
            for i in range(n):
                raw = txn.get(f"{i}".encode("ascii"))
                if raw is None:
                    continue
                yield _data_to_system(pickle.loads(raw))
        env.close()


def convert_lmdb_to_shards(src: str, out_path: str, shard_size: int = 5000) -> int:
    """Offline LMDB -> .adshard.npz conversion (run where lmdb/torch exist)."""
    from adsorbdiff_tpu.data.store import write_shard

    buf, shard_i, total = [], 0, 0
    for system in iter_lmdb_systems(src):
        buf.append(system)
        total += 1
        if len(buf) >= shard_size:
            write_shard(f"{out_path}_{shard_i:05d}", buf)
            buf, shard_i = [], shard_i + 1
    if buf:
        write_shard(f"{out_path}_{shard_i:05d}", buf)
    return total
