"""LMDB interop: dependency-free format IO + OC20-schema conversion + training
from a converted dataset (ref: adsorbdiff/datasets/lmdb_dataset.py:30-223)."""
import os
import pickle

import numpy as np
import pytest

from adsorbdiff_tpu.data.lmdb_compat import convert_lmdb_to_shards, iter_lmdb_systems, loads_pyg
from adsorbdiff_tpu.data.lmdbio import LmdbReader, LmdbWriter, write_lmdb
from adsorbdiff_tpu.data.store import ShardDataset

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "oc20_2sys.lmdb")


def test_lmdbio_roundtrip_many(tmp_path):
    """Hundreds of entries across several leaves (branch page), values from
    empty to multi-page BIGDATA overflow chains."""
    rng = np.random.default_rng(0)
    items = {}
    for i in range(300):
        size = int(rng.choice([0, 5, 100, 1500]))
        items[f"{i:04d}".encode()] = bytes(rng.integers(0, 256, size, dtype=np.uint8))
    items[b"big-single"] = bytes(rng.integers(0, 256, 3000, dtype=np.uint8))
    items[b"big-multi"] = bytes(rng.integers(0, 256, 40000, dtype=np.uint8))
    path = str(tmp_path / "round.lmdb")
    write_lmdb(path, sorted(items.items()))

    with LmdbReader(path) as r:
        assert r.entries == len(items)
        got = dict(r.items())
        assert got == items
        assert list(got.keys()) == sorted(items.keys())  # key order preserved
        for k, v in items.items():
            assert r.get(k) == v
        assert r.get(b"missing") is None


def test_lmdbio_empty_and_single(tmp_path):
    path = str(tmp_path / "empty.lmdb")
    write_lmdb(path, [])
    with LmdbReader(path) as r:
        assert r.entries == 0 and list(r.items()) == []
    path2 = str(tmp_path / "one.lmdb")
    write_lmdb(path2, [(b"k", b"v")])
    with LmdbReader(path2) as r:
        assert r.get(b"k") == b"v" and r.entries == 1


def test_lmdbio_page_size_detection(tmp_path):
    path = str(tmp_path / "big.lmdb")
    write_lmdb(path, [(b"a", b"1"), (b"b", b"x" * 9000)], psize=8192)
    with LmdbReader(path) as r:
        assert r.psize == 8192
        assert r.get(b"b") == b"x" * 9000


def test_lmdbio_meta_page_size_field(tmp_path):
    """liblmdb stores the page size in the free-DB md_pad slot of the meta
    page (mdb.c: mm_psize = mm_dbs[FREE_DBI].md_pad) and reads me_psize from
    it on open — the writer must populate it or real liblmdb rejects the file,
    and the reader must prefer it over stride-probing."""
    import struct

    for psize in (4096, 8192):
        path = str(tmp_path / f"meta{psize}.lmdb")
        write_lmdb(path, [(b"k", b"v")], psize=psize)
        with open(path, "rb") as f:
            raw = f.read(2 * psize)
        for page in (0, 1):  # both meta pages
            # offset: 16 B page header + 24 B (magic,version,address,mapsize)
            assert struct.unpack_from("<I", raw, page * psize + 40)[0] == psize
        with LmdbReader(path) as r:
            assert r.psize == psize
    # the committed fixture carries the field too (regenerated post-fix)
    with open(FIXTURE, "rb") as f:
        assert struct.unpack_from("<I", f.read(64), 40)[0] == 4096


def test_export_zero_energy_and_streaming(tmp_path):
    """A legitimate y of exactly 0.0 must survive export (falsy-zero bug),
    and an unset energy must stay unset through the LMDB round trip."""
    from adsorbdiff_tpu.data.lmdb_compat import export_systems_to_lmdb
    from tests.test_data import rand_system

    rng = np.random.default_rng(9)
    s_zero = rand_system(rng, 6, sid=1)
    s_zero.energy = 0.0
    s_unset = rand_system(rng, 7, sid=2)
    s_unset.energy = None
    path = str(tmp_path / "zero.lmdb")
    export_systems_to_lmdb([s_zero, s_unset], path)
    back = list(iter_lmdb_systems(path))
    assert back[0].energy == 0.0
    assert back[1].energy is None


def test_lmdbio_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.lmdb")
    with open(path, "wb") as f:
        f.write(b"\x00" * 8192)
    from adsorbdiff_tpu.data.lmdbio import LmdbFormatError

    with pytest.raises(LmdbFormatError):
        LmdbReader(path)


def test_oc20_fixture_systems():
    """The committed fixture (reference key schema, pickled torch_geometric
    Data with torch tensors) parses without lmdb/torch_geometric installed."""
    systems = list(iter_lmdb_systems(FIXTURE))
    assert len(systems) == 2
    a, b = systems
    assert a.sid == 41 and b.sid == 42
    assert a.pos.shape == (100, 3) and b.pos.shape == (12, 3)
    assert a.cell.shape == (3, 3) and a.cell[2, 2] == 30.0
    assert a.forces is not None and a.forces.shape == (100, 3)
    assert a.fixed.dtype == bool and a.fixed.any()
    assert b.fixed is not None and not b.fixed.any()  # absent field -> default
    assert np.isfinite(a.y_relaxed) and a.y_relaxed != 0.0
    assert a.pos_relaxed.shape == (100, 3)
    assert a.atomic_numbers.dtype == np.int32
    assert (a.atomic_numbers >= 1).all() and (a.atomic_numbers < 80).all()


def test_pyg2_store_pickles():
    """PyG>=2 pickles route attributes through Data._store._mapping."""
    import sys
    import types

    pkg = types.ModuleType("torch_geometric")
    dm = types.ModuleType("torch_geometric.data.data")
    sm = types.ModuleType("torch_geometric.data.storage")

    class Data:
        pass

    class GlobalStorage:
        pass

    for cls, mod in ((Data, dm), (GlobalStorage, sm)):
        cls.__module__ = mod.__name__
        cls.__qualname__ = cls.__name__
        setattr(mod, cls.__name__, cls)
    sys.modules.update({
        "torch_geometric": pkg, "torch_geometric.data": types.ModuleType("torch_geometric.data"),
        "torch_geometric.data.data": dm, "torch_geometric.data.storage": sm,
    })
    try:
        store = GlobalStorage()
        store._mapping = {"pos": np.zeros((3, 3), np.float32), "sid": 7}
        d = Data()
        d._store = store
        raw = pickle.dumps(d, protocol=2)
    finally:
        for name in list(sys.modules):
            if name.startswith("torch_geometric"):
                del sys.modules[name]

    obj = loads_pyg(raw)
    assert np.asarray(obj.pos).shape == (3, 3)
    assert int(np.asarray(obj.sid)) == 7
    with pytest.raises(AttributeError):
        obj.not_there


@pytest.mark.slow
def test_convert_and_train_one_step(tmp_path):
    """VERDICT item 7 end-to-end: OC20 LMDB -> shards -> one training step."""
    out = str(tmp_path / "conv")
    n = convert_lmdb_to_shards(FIXTURE, out)
    assert n == 2
    shard = out + "_00000.adshard.npz"
    assert os.path.exists(shard)
    ds = ShardDataset({"src": shard})
    assert len(ds) == 2
    sys0 = ds[0]
    ref = list(iter_lmdb_systems(FIXTURE))[0]
    np.testing.assert_allclose(sys0.pos, ref.pos, atol=0)
    np.testing.assert_array_equal(sys0.atomic_numbers, ref.atomic_numbers)

    from tests.test_trainer import config_for
    from adsorbdiff_tpu.train.trainer import DenoisingTrainer

    cfg = config_for(shard, run_dir=str(tmp_path), batch_size=2, max_epochs=1)
    cfg["model"].update(hidden_channels=16, num_layers=1, num_rbf=4)
    trainer = DenoisingTrainer(cfg)
    trainer.train()
    assert trainer.step >= 1
    assert all(np.isfinite(np.asarray(x)).all() for x in
               __import__("jax").tree.leaves(trainer.state.params))


def test_export_roundtrip(tmp_path):
    """Reference-format LMDB EXPORT (scripts/create_lmdbs parity): systems ->
    pickled-PyG LMDB -> back through our reader with field equality."""
    from adsorbdiff_tpu.data.lmdb_compat import export_systems_to_lmdb
    from tests.test_data import rand_system

    rng = np.random.default_rng(5)
    systems = [rand_system(rng, 14, sid=100), rand_system(rng, 9, sid=101)]
    systems[1].forces = None  # optional-field path
    path = str(tmp_path / "export.lmdb")
    n = export_systems_to_lmdb(systems, path)
    assert n == 2

    back = list(iter_lmdb_systems(path))
    assert len(back) == 2
    for orig, got in zip(systems, back):
        np.testing.assert_allclose(got.pos, orig.pos, atol=0)
        np.testing.assert_array_equal(got.atomic_numbers, orig.atomic_numbers)
        np.testing.assert_array_equal(got.tags, orig.tags)
        np.testing.assert_array_equal(got.fixed, orig.fixed)
        np.testing.assert_allclose(got.cell, orig.cell, atol=0)
        assert got.sid == orig.sid
    assert back[0].forces is not None and back[1].forces is None
    # the pickle stream must reference the REAL torch_geometric import path
    # (so the reference stack, which has PyG, can load it)
    from adsorbdiff_tpu.data.lmdbio import LmdbReader

    with LmdbReader(path) as r:
        raw = r.get(b"0")
    assert b"torch_geometric" in raw


def test_lmdbio_multilevel_branches(tmp_path):
    """Thousands of entries at a small page size force a multi-level B+tree
    (OC20 shards run to ~10^6 records); order, point lookups, and the meta
    page-count bookkeeping must hold."""
    items = [(f"{i:06d}".encode(), (f"v{i}" * (i % 7 + 1)).encode()) for i in range(5000)]
    path = str(tmp_path / "deep.lmdb")
    write_lmdb(path, items, psize=512)
    with LmdbReader(path) as r:
        assert r.psize == 512
        assert r.entries == 5000
        assert r.meta["main"]["depth"] >= 3  # multi-level
        got = list(r.items())
        assert [k for k, _ in got] == [k for k, _ in items]
        assert got == items
        for i in (0, 1, 499, 2500, 4999):
            k, v = items[i]
            assert r.get(k) == v
        assert r.get(b"999999") is None


def test_native_reader_matches_python_reader(tmp_path):
    """C++ mmap reader (runtime/native/lmdbread.cc) == pure-python LmdbReader
    on the committed OC20 fixture and on a generated multi-level tree with
    overflow values; point lookups and key scans agree."""
    import numpy as np

    import pytest

    from adsorbdiff_tpu.data import lmdb_native
    from adsorbdiff_tpu.data.lmdb_native import NativeLmdbReader
    from adsorbdiff_tpu.data.lmdbio import LmdbReader, write_lmdb

    if lmdb_native._load_lib() is None:
        pytest.skip("no compiler for the native reader in this environment")
    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "oc20_2sys.lmdb")
    r_c = NativeLmdbReader(fixture)  # a parse failure here must FAIL, not skip
    with LmdbReader(fixture) as r_py:
        assert list(r_c.items()) == list(r_py.items())
        assert r_c.psize == r_py.psize
    r_c.close()

    rng = np.random.default_rng(0)
    items = [
        (str(i).encode(), bytes(rng.integers(0, 256, int(rng.integers(5, 40)), dtype=np.uint8)))
        for i in range(2500)
    ] + [
        (f"big{i}".encode(), bytes(rng.integers(0, 256, 8000 + 900 * i, dtype=np.uint8)))
        for i in range(6)
    ]
    path = str(tmp_path / "nat.lmdb")
    write_lmdb(path, items)
    with LmdbReader(path) as r_py, NativeLmdbReader(path, chunk_records=97) as r_c:
        a, b = list(r_py.items()), list(r_c.items())
        assert a == b and len(a) == 2506
        assert list(r_c.keys()) == [k for k, _ in a]
        for k, v in a[::251]:
            assert r_c.get(k) == v
        assert r_c.get(b"missing") is None
