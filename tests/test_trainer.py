"""Trainer: overfit smoke, checkpoint roundtrip, 8-device DP mesh training."""
import os

import jax
import numpy as np
import pytest

from adsorbdiff_tpu.data.schema import System
from adsorbdiff_tpu.data.store import write_shard
from adsorbdiff_tpu.parallel import mesh as meshlib
from adsorbdiff_tpu.train.trainer import DenoisingTrainer


def make_dataset(tmp_path, rng, n_sys=16, name="train"):
    systems = []
    for i in range(n_sys):
        n_slab, n_ads = 10, 3
        cell = np.diag([7.0, 7.0, 24.0]).astype(np.float32)
        slab = (rng.random((n_slab, 3)) * [1, 1, 0.3]) @ cell
        ads = rng.random((n_ads, 3)).astype(np.float32) * 1.2 + np.array([3, 3, 8.5], np.float32)
        pos = np.concatenate([slab, ads]).astype(np.float32)
        tags = np.array([0] * n_slab + [2] * n_ads, np.int32)
        z = np.concatenate([rng.integers(20, 60, n_slab), rng.integers(1, 9, n_ads)])
        systems.append(System(pos=pos, atomic_numbers=z, cell=cell, tags=tags, fixed=tags == 0, sid=i, pos_relaxed=pos))
    write_shard(str(tmp_path / name), systems)
    return str(tmp_path / (name + ".adshard.npz"))


def config_for(train_src, val_src=None, run_dir="./", **optim_over):
    optim = dict(
        batch_size=4,
        eval_batch_size=4,
        lr_initial=5e-4,
        optimizer="AdamW",
        optimizer_params={"weight_decay": 0.0},
        scheduler="LambdaLR",
        scheduler_params={"lambda_type": "cosine", "warmup_factor": 0.2, "warmup_epochs": 1, "lr_min_factor": 0.01},
        max_epochs=4,
        clip_grad_norm=100,
        ema_decay=0.999,
        eval_every=1000,
        checkpoint_every=-1,
        use_denoising_pos=True,
        denoising_pos_params=dict(
            num_steps=10, ads_std_low=0.1, ads_std_high=10, rot_std_low=0.01, rot_std_high=1.55
        ),
    )
    optim.update(optim_over)
    ds = [{"src": train_src}]
    if val_src:
        ds.append({"src": val_src})
    return dict(
        dataset=ds,
        model=dict(
            name="painn",
            hidden_channels=32,
            num_layers=2,
            num_rbf=8,
            cutoff=6.0,
            max_neighbors=12,
            so3_denoising=True,
            cell_reps=(1, 1, 0),
        ),
        optim=optim,
        task={"primary_metric": "loss"},
        seed=0,
        run_dir=run_dir,
        identifier="t",
        print_every=1000,
        is_debug=True,
    )


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    train = make_dataset(tmp, rng, 16, "train")
    val = make_dataset(tmp, rng, 8, "val")
    return train, val


def test_overfit_loss_decreases(tiny_data, tmp_path):
    train, val = tiny_data
    # long cosine horizon + fixed noise key -> the model must overfit to ~0
    cfg = config_for(train, val, run_dir=str(tmp_path), max_epochs=200, lr_initial=2e-3)
    trainer = DenoisingTrainer(cfg, mesh=None)
    first = next(iter(trainer.train_batcher))
    trainer.init_state(first)

    losses = []
    step_fn = trainer._get_step_fn(first)
    key = jax.random.PRNGKey(0)
    for i in range(90):
        trainer.state, aux = step_fn(trainer.state, first, key)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.05 * losses[0], losses[::10]


def test_train_loop_and_validate(tiny_data, tmp_path):
    train, val = tiny_data
    cfg = config_for(train, val, run_dir=str(tmp_path), max_epochs=1)
    trainer = DenoisingTrainer(cfg, mesh=None)
    trainer.train()
    assert trainer.step == len(trainer.train_batcher)
    metrics = trainer.validate("val")
    assert "loss" in metrics and np.isfinite(metrics["loss"]["metric"])
    # checkpoint written at end of epoch (checkpoint_every=-1)
    ckpt_path = os.path.join(trainer.ckpt_dir, "checkpoint")
    assert os.path.exists(ckpt_path)


def test_checkpoint_roundtrip(tiny_data, tmp_path):
    train, val = tiny_data
    cfg = config_for(train, run_dir=str(tmp_path))
    t1 = DenoisingTrainer(cfg, mesh=None)
    first = next(iter(t1.train_batcher))
    t1.init_state(first)
    step_fn = t1._get_step_fn(first)
    for i in range(3):
        t1.state, _ = step_fn(t1.state, first, jax.random.PRNGKey(i))
    path = t1.save("ck")

    t2 = DenoisingTrainer(cfg, mesh=None)
    t2.init_state(first)
    t2.load_checkpoint(path)
    assert int(t2.state.step) == 3
    p1 = jax.tree.leaves(t1.state.params)
    p2 = jax.tree.leaves(t2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # predictions identical
    o1, _ = t1.predict_denoising(first)
    o2, _ = t2.predict_denoising(first)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


@pytest.mark.slow
def test_dp_mesh_training_matches_single(tiny_data, tmp_path):
    """8-device DP step must produce (nearly) the same update as single-device."""
    assert jax.device_count() == 8
    train, val = tiny_data
    cfg = config_for(train, run_dir=str(tmp_path), batch_size=8)
    mesh = meshlib.make_mesh()

    t_dp = DenoisingTrainer(cfg, mesh=mesh)
    t_sd = DenoisingTrainer(cfg, mesh=None)
    first = next(iter(t_dp.train_batcher))
    t_dp.init_state(first)
    t_sd.init_state(first)

    sharded = meshlib.shard_batch(first, mesh)
    key = jax.random.PRNGKey(0)
    s_dp, aux_dp = t_dp._get_step_fn(sharded)(t_dp.state, sharded, key)
    s_sd, aux_sd = t_sd._get_step_fn(first)(t_sd.state, first, key)
    np.testing.assert_allclose(float(aux_dp["loss"]), float(aux_sd["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_dp.params), jax.tree.leaves(s_sd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_nan_guard_skips_update(tiny_data, tmp_path):
    import jax.numpy as jnp

    train, _ = tiny_data
    cfg = config_for(train, run_dir=str(tmp_path))
    trainer = DenoisingTrainer(cfg, mesh=None)
    first = next(iter(trainer.train_batcher))
    trainer.init_state(first)
    step_fn = trainer._get_step_fn(first)

    # (a) NaN *data* is quarantined by the masked graph builder: a NaN atom
    # loses all its edges and the step stays finite (stronger than the
    # reference, which would NaN the whole batch)
    bad_data = first.replace(pos=first.pos.at[0, 0, 0].set(jnp.nan))
    state_a, aux = step_fn(trainer.state, bad_data, jax.random.PRNGKey(0))  # donates trainer.state
    assert np.isfinite(float(aux["loss"]))

    # (b) a NaN in the params makes the loss NaN -> the masked update must
    # leave params AND optimizer moments exactly unchanged (ref NaN-skip,
    # sde_denoising_trainer.py:428-434)
    poisoned = state_a.replace(params=jax.tree.map(lambda x: x * jnp.nan, state_a.params))
    before_p = [np.asarray(x).copy() for x in jax.tree.leaves(poisoned.params)]
    before_o = [np.asarray(x).copy() for x in jax.tree.leaves(poisoned.opt_state) if hasattr(x, "shape")]
    state, aux = step_fn(poisoned, first, jax.random.PRNGKey(0))
    assert not np.isfinite(float(aux["loss"]))
    for a, b in zip(before_p, jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    for a, b in zip(before_o, [x for x in jax.tree.leaves(state.opt_state) if hasattr(x, "shape")]):
        np.testing.assert_array_equal(a, np.asarray(b))
