"""The driver contract: entry() compiles single-device; dryrun_multichip(8)
runs the full dp-sharded training step on the virtual CPU mesh."""
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as graft  # noqa: E402


@pytest.mark.slow
def test_entry_compiles_and_runs():
    fn, (variables, batch) = graft.entry()
    out = jax.jit(fn)(variables, batch)
    f1, f2 = out
    assert f1.shape == batch.pos.shape and f2.shape == batch.pos.shape
    assert np.isfinite(np.asarray(f1)).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    assert jax.device_count() == 8
    graft.dryrun_multichip(8)
