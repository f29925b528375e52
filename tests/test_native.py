"""Native C++ shard reader vs pure-Python path."""
import numpy as np
import pytest

from adsorbdiff_tpu.data.buckets import BucketedBatcher
from adsorbdiff_tpu.data.native import NativeShardDataset, write_shard_bin, _load_lib
from adsorbdiff_tpu.data.schema import collate
from adsorbdiff_tpu.data.store import ShardDataset, write_shard
from tests.test_data import rand_system

pytestmark = pytest.mark.skipif(_load_lib() is None, reason="no C++ toolchain")


@pytest.fixture
def datasets(tmp_path, rng):
    systems = [rand_system(rng, int(n), sid=i, fid=i + 1) for i, n in enumerate(rng.integers(4, 40, 24))]
    write_shard(str(tmp_path / "py"), systems)
    write_shard_bin(str(tmp_path / "nat"), systems)
    return (
        ShardDataset({"src": str(tmp_path / "py")}),
        NativeShardDataset({"src": str(tmp_path / "nat")}),
        systems,
    )


def test_native_matches_python(datasets):
    py, nat, systems = datasets
    assert len(nat) == len(py) == 24
    np.testing.assert_array_equal(nat.natoms_array(), py.natoms_array())
    idx = [0, 5, 7, 23]
    max_atoms = int(max(nat.natoms_array()[idx])) + 3
    b_nat = nat.collate_indices(idx, max_atoms, with_forces=True)
    b_py = collate([py[i] for i in idx], max_atoms=max_atoms, with_forces=True)
    for field in ("pos", "atomic_numbers", "tags", "fixed", "cell", "natoms",
                  "atom_mask", "sid", "fid", "energy", "y_relaxed", "pos_relaxed", "forces"):
        np.testing.assert_allclose(
            np.asarray(getattr(b_nat, field)), np.asarray(getattr(b_py, field)),
            atol=1e-6, err_msg=field,
        )


def test_native_single_item(datasets):
    _, nat, systems = datasets
    s = nat[3]
    np.testing.assert_allclose(s.pos, systems[3].pos, atol=1e-6)
    assert s.sid == 3 and s.fid == 4


def test_native_with_batcher(datasets):
    _, nat, _ = datasets
    batcher = BucketedBatcher(nat, batch_size=4, seed=0, with_forces=True)
    seen = set()
    for batch in batcher:
        assert batch.pos.shape[0] == 4
        assert batch.forces is not None
        seen.update(int(s) for s in np.asarray(batch.sid))
    assert seen == set(range(24))


def test_native_rejects_bad_index(datasets):
    _, nat, _ = datasets
    with pytest.raises(ValueError):
        nat.collate_indices([999], max_atoms=64)
    with pytest.raises(ValueError):
        nat.collate_indices([0], max_atoms=1)  # natoms > max_atoms
