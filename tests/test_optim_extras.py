"""Optimizer extras: grad accumulation, ReduceLROnPlateau, amp plumbing."""
import jax
import numpy as np
import pytest

from adsorbdiff_tpu.train.trainer import S2EFTrainer, DenoisingTrainer
from tests.test_s2ef_and_tasks import make_s2ef_dataset, s2ef_config
from tests.test_trainer import config_for, make_dataset


def test_grad_accumulation(tmp_path, rng):
    train = make_s2ef_dataset(tmp_path, rng, 8, "train")
    cfg = s2ef_config(train, run_dir=str(tmp_path), grad_accumulation_steps=3)
    tr = S2EFTrainer(cfg, mesh=None)
    first = next(iter(tr.train_batcher))
    tr.init_state(first)
    step_fn = tr._get_step_fn(first)
    p0 = np.asarray(jax.tree.leaves(tr.state.params)[0]).copy()
    # params must NOT move until k steps accumulated
    tr.state, _ = step_fn(tr.state, first, jax.random.PRNGKey(0))
    tr.state, _ = step_fn(tr.state, first, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(p0, np.asarray(jax.tree.leaves(tr.state.params)[0]))
    tr.state, _ = step_fn(tr.state, first, jax.random.PRNGKey(2))
    assert np.abs(p0 - np.asarray(jax.tree.leaves(tr.state.params)[0])).max() > 0


def test_reduce_on_plateau(tmp_path, rng):
    train = make_s2ef_dataset(tmp_path, rng, 8, "train")
    cfg = s2ef_config(train, run_dir=str(tmp_path))
    cfg["optim"]["scheduler"] = "ReduceLROnPlateau"
    cfg["optim"]["factor"] = 0.5
    cfg["optim"]["patience"] = 2
    tr = S2EFTrainer(cfg, mesh=None)
    first = next(iter(tr.train_batcher))
    tr.init_state(first)
    step_fn = tr._get_step_fn(first)
    for i in range(6):
        tr.state, aux = step_fn(tr.state, first, jax.random.PRNGKey(i))
    assert np.isfinite(float(aux["loss"]))


def test_amp_flag_sets_bf16(tmp_path, rng):
    train = make_dataset(tmp_path, rng, 8, "train")
    cfg = config_for(train, run_dir=str(tmp_path))
    cfg["amp"] = True
    tr = DenoisingTrainer(cfg, mesh=None)
    assert tr.model.compute_dtype == "bfloat16"
    assert tr.sampling_model.compute_dtype == "bfloat16"
    first = next(iter(tr.train_batcher))
    tr.init_state(first)
    state, aux = tr._get_step_fn(first)(tr.state, first, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
