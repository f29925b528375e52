"""Generate tests/fixtures/oc20_2sys.lmdb — a 2-system LMDB in the exact
reference dataset shape (ref: adsorbdiff/datasets/lmdb_dataset.py:96-116):
keys b"0", b"1" hold pickled torch_geometric ``Data`` records of torch
tensors; b"length" holds a pickled int.  The pickle stream references the
real ``torch_geometric.data.data.Data`` module path (faked at dump time, so
the fixture bytes match what a PyG-equipped writer would emit for these
attribute dicts); unpickling in-image goes through lmdb_compat's shim.

Run: python tests/fixtures/make_oc20_lmdb_fixture.py
"""
import os
import pickle
import sys
import types

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from adsorbdiff_tpu.data.lmdbio import write_lmdb  # noqa: E402


def install_fake_pyg():
    pkg = types.ModuleType("torch_geometric")
    data_pkg = types.ModuleType("torch_geometric.data")
    data_mod = types.ModuleType("torch_geometric.data.data")

    class Data:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    Data.__module__ = "torch_geometric.data.data"
    Data.__qualname__ = "Data"
    data_mod.Data = Data
    data_pkg.data = data_mod
    data_pkg.Data = Data
    pkg.data = data_pkg
    sys.modules["torch_geometric"] = pkg
    sys.modules["torch_geometric.data"] = data_pkg
    sys.modules["torch_geometric.data.data"] = data_mod
    return Data


def make_systems(Data):
    rng = np.random.default_rng(1234)
    systems = []
    for sid, n in ((41, 100), (42, 12)):  # 100 atoms -> >4 KB pickle -> overflow pages
        pos = rng.random((n, 3)).astype(np.float32) * 8.0
        rec = dict(
            pos=torch.from_numpy(pos),
            atomic_numbers=torch.from_numpy(rng.integers(1, 80, n).astype(np.float32)),
            cell=torch.from_numpy(np.diag([8.0, 8.0, 30.0]).astype(np.float32))[None],
            tags=torch.from_numpy((rng.random(n) < 0.2).astype(np.int64) * 2),
            sid=sid,
            fid=0,
            y_relaxed=float(rng.normal()),
            pos_relaxed=torch.from_numpy(pos + rng.normal(0, 0.1, (n, 3)).astype(np.float32)),
        )
        if sid == 41:  # one record with, one without the optional fields
            rec["fixed"] = torch.from_numpy((rng.random(n) < 0.5).astype(np.float32))
            rec["force"] = torch.from_numpy(rng.normal(0, 1, (n, 3)).astype(np.float32))
            rec["y"] = float(rng.normal())
        systems.append(Data(**rec))
    return systems


def main(out_path):
    Data = install_fake_pyg()
    systems = make_systems(Data)
    items = [(str(i).encode(), pickle.dumps(d, protocol=2)) for i, d in enumerate(systems)]
    items.append((b"length", pickle.dumps(len(systems), protocol=2)))
    write_lmdb(out_path, items)
    print(f"wrote {out_path}: {os.path.getsize(out_path)} bytes, {len(systems)} systems")


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    main(os.path.join(here, "oc20_2sys.lmdb"))
