import os
import textwrap

import pytest

from adsorbdiff_tpu.common.config import (
    build_config,
    create_dict_from_args,
    create_grid,
    load_config,
    merge_dicts,
)
from adsorbdiff_tpu.common.registry import Registry, registry


def test_merge_dicts_nested():
    merged, dups = merge_dicts({"a": {"b": 1, "c": 2}}, {"a": {"b": 3}, "d": 4})
    assert merged == {"a": {"b": 3, "c": 2}, "d": 4}
    assert dups == ["a.b"]


def test_load_config_includes(tmp_path):
    (tmp_path / "base.yml").write_text("model:\n  hidden: 64\noptim:\n  lr: 0.1\n")
    (tmp_path / "main.yml").write_text(
        textwrap.dedent(
            """
            includes:
              - base.yml
            optim:
              lr: 0.2
            """
        )
    )
    cfg, warn, err = load_config(str(tmp_path / "main.yml"))
    assert cfg["model"]["hidden"] == 64
    assert cfg["optim"]["lr"] == 0.2
    assert "optim.lr" in err  # main overriding include is tracked


def test_load_config_cycle(tmp_path):
    (tmp_path / "a.yml").write_text("includes: [b.yml]\n")
    (tmp_path / "b.yml").write_text("includes: [a.yml]\n")
    with pytest.raises(ValueError):
        load_config(str(tmp_path / "a.yml"))


def test_dotted_overrides_literal_eval():
    d = create_dict_from_args(["--optim.lr_initial=1e-4", "model.name=painn", "task.relax=True"])
    assert d["optim"]["lr_initial"] == pytest.approx(1e-4)
    assert d["model"]["name"] == "painn"
    assert d["task"]["relax"] is True


def test_build_config_and_grid(tmp_path):
    (tmp_path / "c.yml").write_text("optim:\n  lr: 0.1\n  bs: 4\n")

    class Args:
        config_yml = str(tmp_path / "c.yml")
        mode = "train"
        identifier = "t"
        seed = 0

    cfg = build_config(Args(), ["optim.lr=0.5"])
    assert cfg["optim"]["lr"] == 0.5
    assert "num_devices" not in cfg  # unset flag stays absent

    class ArgsN(Args):
        num_devices = 4

    assert build_config(ArgsN(), [])["num_devices"] == 4
    (tmp_path / "sweep.yml").write_text("optim:\n  lr: [0.1, 0.2]\n  bs: [4, 8]\n")
    grid = create_grid(cfg, str(tmp_path / "sweep.yml"))
    assert len(grid) == 4
    assert sorted({g["optim"]["lr"] for g in grid}) == [0.1, 0.2]


def test_registry_roundtrip_and_path_fallback():
    r = Registry()

    @r.register_model("toy")
    class Toy:
        pass

    assert r.get_model_class("toy") is Toy
    with pytest.raises(KeyError):
        r.get_model_class("nope")
    # fully-qualified path fallback
    cls = r.get_class("model", "adsorbdiff_tpu.common.registry.Registry")
    assert cls is Registry
    # duplicate registration is an error
    with pytest.raises(KeyError):

        @r.register_model("toy")
        class Toy2:
            pass


def test_registry_state():
    registry.register("k", 42)
    assert registry.get("k") == 42
    registry.unregister("k")
    assert registry.get("k") is None


def test_prefetcher_order_transform_and_errors():
    """Background prefetcher yields the source sequence in order with the
    transform applied, and re-raises worker exceptions on the consumer."""
    from adsorbdiff_tpu.data.prefetch import Prefetcher

    items = list(range(20))
    got = list(Prefetcher(items, transform=lambda x: x * 2, depth=3))
    assert got == [x * 2 for x in items]

    def boom():
        yield 1
        raise ValueError("worker failed")

    p = Prefetcher(boom())
    it = iter(p)
    assert next(it) == 1
    import pytest

    with pytest.raises(ValueError, match="worker failed"):
        list(it)


def test_prefetcher_early_exit_releases_worker():
    """Abandoning iteration mid-stream signals the worker (no thread parked
    holding queued batches)."""
    import threading
    import time

    from adsorbdiff_tpu.data.prefetch import Prefetcher

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = iter(Prefetcher(gen(), depth=2))
    assert next(it) == 0
    it.close()  # early exit
    time.sleep(0.6)
    n_after = len(produced)
    time.sleep(0.4)
    assert len(produced) == n_after, "worker kept producing after close"
    assert not any(t.name == "batch-prefetch" and t.is_alive() for t in threading.enumerate())
