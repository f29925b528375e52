import numpy as np
import pytest

from adsorbdiff_tpu.data.buckets import BucketedBatcher, default_bucket_edges
from adsorbdiff_tpu.data.schema import System, collate, uncollate
from adsorbdiff_tpu.data.store import ShardDataset, write_shard


def rand_system(rng, n, sid=0, fid=0):
    cell = np.diag(rng.uniform(6, 12, 3)).astype(np.float32)
    return System(
        pos=rng.random((n, 3)).astype(np.float32) @ cell,
        atomic_numbers=rng.integers(1, 80, n),
        tags=rng.integers(0, 3, n),
        fixed=rng.integers(0, 2, n).astype(bool),
        cell=cell,
        sid=sid,
        fid=fid,
        energy=float(rng.normal()),
        y_relaxed=float(rng.normal()),
        forces=rng.normal(0, 1, (n, 3)).astype(np.float32),
    )


def test_collate_uncollate_roundtrip(rng):
    systems = [rand_system(rng, n, sid=i) for i, n in enumerate([5, 9, 7])]
    batch = collate(systems, with_forces=True)
    assert batch.pos.shape == (3, 9, 3)
    assert int(batch.natoms[1]) == 9
    back = uncollate(batch)
    for a, b in zip(systems, back):
        np.testing.assert_allclose(a.pos, b.pos, atol=1e-6)
        np.testing.assert_array_equal(a.atomic_numbers, b.atomic_numbers)
        np.testing.assert_array_equal(a.fixed, b.fixed)
        np.testing.assert_allclose(a.forces, b.forces, atol=1e-6)
        assert a.sid == b.sid and abs(a.energy - b.energy) < 1e-6


def test_masks(rng):
    systems = [rand_system(rng, 4), rand_system(rng, 6)]
    batch = collate(systems)
    mask = np.asarray(batch.atom_mask)
    assert mask.sum() == 10
    ads = np.asarray(batch.ads_mask)
    assert (ads <= mask).all()


def test_shard_roundtrip(tmp_path, rng):
    systems = [rand_system(rng, int(n), sid=i, fid=i * 2) for i, n in enumerate(rng.integers(4, 30, 17))]
    write_shard(str(tmp_path / "train_0"), systems[:10])
    write_shard(str(tmp_path / "train_1"), systems[10:])
    ds = ShardDataset({"src": str(tmp_path)})
    assert len(ds) == 17
    np.testing.assert_array_equal(ds.natoms_array(), [s.natoms for s in systems])
    for i in [0, 9, 10, 16]:
        got = ds[i]
        np.testing.assert_allclose(got.pos, systems[i].pos, atol=1e-6)
        np.testing.assert_allclose(got.forces, systems[i].forces, atol=1e-6)
        assert got.sid == systems[i].sid and got.fid == systems[i].fid
    # single-file + manual sharding (ref: lmdb_dataset.py:106-116)
    half = ShardDataset({"src": str(tmp_path / "train_0"), "shard": 1, "total_shards": 2})
    assert len(half) == 5
    np.testing.assert_allclose(half[0].pos, systems[5].pos, atol=1e-6)


def test_shard_get_is_zero_copy(tmp_path, rng):
    """Repeated gets slice ONE decompressed column array per shard —
    NpzFile.__getitem__ would otherwise re-decompress every column on every
    access (measured: made published-size training input-bound)."""
    systems = [rand_system(rng, int(n), sid=i) for i, n in enumerate(rng.integers(4, 30, 6))]
    write_shard(str(tmp_path / "d"), systems)
    ds = ShardDataset({"src": str(tmp_path / "d")})
    a, b = ds[2], ds[2]
    assert a.pos.base is b.pos.base and a.pos.base is not None
    assert ds[0].atomic_numbers.base is ds[5].atomic_numbers.base


def test_bucketed_batcher(tmp_path, rng):
    systems = [rand_system(rng, int(n), sid=i) for i, n in enumerate(rng.integers(4, 60, 40))]
    write_shard(str(tmp_path / "d"), systems)
    ds = ShardDataset({"src": str(tmp_path / "d")})  # suffix auto-appended
    batcher = BucketedBatcher(ds, batch_size=4, seed=0)
    seen = set()
    shapes = set()
    for batch in batcher:
        b, n, _ = batch.pos.shape
        assert b == 4
        assert n in batcher.bucket_edges
        assert int(np.asarray(batch.natoms).max()) <= n
        shapes.add(n)
        seen.update(int(s) for s in np.asarray(batch.sid))
    assert seen == set(range(40))  # every system appears
    assert len(shapes) <= len(batcher.bucket_edges)
    # deterministic given (seed, epoch), different across epochs
    plan0 = [tuple(c.tolist()) for _, c in batcher._plan()]
    batcher.set_epoch(1)
    plan1 = [tuple(c.tolist()) for _, c in batcher._plan()]
    assert plan0 != plan1


def test_bucket_edges_multiple_of_8():
    edges = default_bucket_edges(np.array([3, 10, 50, 200]))
    assert all(e % 8 == 0 for e in edges)
    assert edges[-1] >= 200


def test_bucketed_batcher_neighbor_mode(tmp_path, rng):
    """mode='neighbors' buckets on precomputed edge counts
    (ref: data_parallel.py:72 'neighbors' sizes) and pads atoms per bucket."""
    from adsorbdiff_tpu.data.metadata import neighbor_counts

    systems = [rand_system(rng, int(n), sid=i) for i, n in enumerate(rng.integers(4, 60, 24))]
    write_shard(str(tmp_path / "d"), systems)
    ds = ShardDataset({"src": str(tmp_path / "d")})
    sizes = neighbor_counts(ds, cutoff=6.0, max_neighbors=12, reps=(1, 1, 0))
    assert len(sizes) == 24 and (sizes >= 0).all()

    batcher = BucketedBatcher(ds, batch_size=4, mode="neighbors", sizes=sizes, seed=0)
    seen = set()
    for batch in batcher:
        assert batch.pos.shape[0] == 4
        assert batch.pos.shape[1] % 8 == 0
        assert int(np.asarray(batch.natoms).max()) <= batch.pos.shape[1]
        seen.update(int(s) for s in np.asarray(batch.sid))
    assert seen == set(range(24))

    with pytest.raises(ValueError):
        BucketedBatcher(ds, batch_size=4, mode="neighbors")  # sizes required
    with pytest.raises(ValueError):
        BucketedBatcher(ds, batch_size=4, mode="edges")


def test_bucketed_batcher_atom_budget(tmp_path, rng):
    """atom_budget equalizes padded-atom work per batch: large buckets get
    smaller batch sizes (B ~ budget/pad, capped by batch_size), batches stay
    multiples of the dp mesh size, and every system still appears."""
    systems = [rand_system(rng, int(n), sid=i)
               for i, n in enumerate(np.concatenate([rng.integers(8, 24, 20),
                                                     rng.integers(120, 200, 20)]))]
    write_shard(str(tmp_path / "d"), systems)
    ds = ShardDataset({"src": str(tmp_path / "d")})

    batcher = BucketedBatcher(ds, batch_size=16, seed=0, atom_budget=16 * 24,
                              multiple_of=2)
    seen = set()
    padded_atoms = []
    for batch in batcher:
        b, n, _ = batch.pos.shape
        assert b % 2 == 0  # dp-shardable
        assert b == batcher._bucket_batch_size(n)
        assert b <= 16
        if n > 24:
            assert b < 16  # big buckets got shrunk
        padded_atoms.append(b * n)
        seen.update(int(s) for s in np.asarray(batch.sid))
    assert seen == set(range(40))
    # per-batch padded-atom totals are balanced within ~2x (vs ~8x without)
    assert max(padded_atoms) <= 2.5 * min(padded_atoms)

    # without budget the same data spreads ~8x in per-batch work
    flat = BucketedBatcher(ds, batch_size=16, seed=0)
    work = [batch.pos.shape[0] * batch.pos.shape[1] for batch in flat]
    assert max(work) > 4 * min(work)

    with pytest.raises(ValueError):
        BucketedBatcher(ds, batch_size=5, multiple_of=2)  # cap must divide
