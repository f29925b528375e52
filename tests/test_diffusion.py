"""Schedules, denoising loss, reverse sampler, and a short overfit run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adsorbdiff_tpu.data.schema import System, collate
from adsorbdiff_tpu.diffusion.sampler import init_placement, langevin_dynamics, reverse_diffusion
from adsorbdiff_tpu.diffusion.schedules import ads_center, ads_com_gaussian_schedule, tr_so3_schedule
from adsorbdiff_tpu.ops import igso3
from adsorbdiff_tpu.train.loss import denoising_loss

PARAMS = {
    "num_steps": 20,
    "ads_std_low": 0.1,
    "ads_std_high": 10.0,
    "rot_std_low": 0.01,
    "rot_std_high": 1.55,
}


def make_batch(rng, b=3, n_slab=12, n_ads=4, n_pad=24):
    systems = []
    for i in range(b):
        cell = np.diag([7.0, 7.5, 25.0]).astype(np.float32)
        slab = (rng.random((n_slab, 3)) * [1, 1, 0.25]) @ cell
        ads = rng.random((n_ads, 3)).astype(np.float32) * 1.5 + np.array([3, 3, 9], np.float32)
        pos = np.concatenate([slab, ads]).astype(np.float32)
        tags = np.array([0] * n_slab + [2] * n_ads, np.int32)
        z = np.concatenate([rng.integers(20, 60, n_slab), rng.integers(1, 9, n_ads)])
        systems.append(System(pos=pos, atomic_numbers=z, cell=cell, tags=tags, fixed=tags == 0, sid=i))
    return collate(systems, max_atoms=n_pad)


def test_tr_so3_schedule_targets(rng):
    batch = make_batch(rng)
    noised, t = tr_so3_schedule(jax.random.PRNGKey(0), batch, PARAMS)
    # sigma bounds
    assert ((np.asarray(t.tr_sigma) >= 0.1) & (np.asarray(t.tr_sigma) <= 10.0)).all()
    # slab atoms untouched
    slab = ~np.asarray(batch.ads_mask)
    np.testing.assert_allclose(np.asarray(noised.pos)[slab], np.asarray(batch.pos)[slab])
    # noise z == 0, so score z == 0
    np.testing.assert_allclose(np.asarray(t.noise_vec)[:, 2], 0.0)
    np.testing.assert_allclose(np.asarray(t.tr_score), -np.asarray(t.noise_vec) / np.asarray(t.tr_sigma)[:, None] ** 2, rtol=1e-5)
    # rigid motion: adsorbate internal geometry preserved
    for b in range(batch.batch_size):
        am = np.asarray(batch.ads_mask)[b]
        d_old = np.linalg.norm(np.asarray(batch.pos)[b][am][:, None] - np.asarray(batch.pos)[b][am][None], axis=-1)
        d_new = np.linalg.norm(np.asarray(noised.pos)[b][am][:, None] - np.asarray(noised.pos)[b][am][None], axis=-1)
        np.testing.assert_allclose(d_new, d_old, atol=1e-4)
    # COM displacement = wrapped noise + 1A z-lift
    com_old = np.asarray(ads_center(batch))
    com_new = np.asarray(ads_center(noised))
    np.testing.assert_allclose(com_new[:, 2] - com_old[:, 2], 1.0, atol=1e-4)
    np.testing.assert_allclose(com_new[:, :2] - com_old[:, :2], np.asarray(t.noise_vec)[:, :2], atol=1e-4)


def test_com_gaussian_schedule_collapses(rng):
    batch = make_batch(rng)
    noised, t = ads_com_gaussian_schedule(jax.random.PRNGKey(1), batch, PARAMS)
    pos = np.asarray(noised.pos)
    for b in range(batch.batch_size):
        am = np.asarray(batch.ads_mask)[b]
        assert np.ptp(pos[b][am], axis=0).max() < 1e-5  # all ads atoms at COM point


def test_denoising_loss_optimal_pred_is_minimal(rng):
    """The loss at pred == sigma * score must be lower than random preds."""
    batch = make_batch(rng)
    noised, t = tr_so3_schedule(jax.random.PRNGKey(2), batch, PARAMS)
    n = batch.max_atoms
    # model outputs per-atom; construct the "perfect" per-atom output:
    # out/sigma averaged over ads atoms should equal the score
    perfect1 = jnp.broadcast_to((t.tr_score * t.tr_sigma[:, None])[:, None, :], (batch.batch_size, n, 3))
    perfect2 = jnp.broadcast_to((t.rot_score * t.rot_sigma[:, None])[:, None, :], (batch.batch_size, n, 3))
    l_opt, _ = denoising_loss(perfect1, perfect2, noised, t)
    l_rand, _ = denoising_loss(perfect1 + 1.0, perfect2 + 1.0, noised, t)
    assert float(l_opt) < 1e-8
    assert float(l_rand) > float(l_opt)


def test_init_placement_preserves_geometry_and_z(rng):
    batch = make_batch(rng)
    placed = init_placement(jax.random.PRNGKey(3), batch)
    com_old = np.asarray(ads_center(batch))
    com_new = np.asarray(ads_center(placed))
    np.testing.assert_allclose(com_new[:, 2], com_old[:, 2], atol=1e-5)
    for b in range(batch.batch_size):
        am = np.asarray(batch.ads_mask)[b]
        d_old = np.linalg.norm(np.asarray(batch.pos)[b][am][:, None] - np.asarray(batch.pos)[b][am][None], axis=-1)
        d_new = np.linalg.norm(np.asarray(placed.pos)[b][am][:, None] - np.asarray(placed.pos)[b][am][None], axis=-1)
        np.testing.assert_allclose(d_new, d_old, atol=1e-4)


def test_reverse_diffusion_converges_to_score_target(rng):
    """With a synthetic score pointing at a target xy, the ODE sampler should
    move the adsorbate COM to that target."""
    batch = make_batch(rng)
    target_xy = jnp.asarray([[2.0, 3.0], [4.0, 1.5], [1.0, 5.0]], jnp.float32)

    def score_fn(cur):
        com = ads_center(cur)
        # translation score toward target (wrapped); constant magnitude field
        diff = jnp.zeros_like(com)
        diff = diff.at[:, :2].set(target_xy - com[:, :2])
        score = diff / jnp.maximum(jnp.linalg.norm(diff, axis=-1, keepdims=True), 1e-6)
        score = score * 5.0
        per_atom = jnp.broadcast_to(score[:, None, :], cur.pos.shape)
        return per_atom, jnp.zeros_like(per_atom)

    params = dict(PARAMS, num_steps=100, ode=True)
    res = jax.jit(lambda b, k: reverse_diffusion(score_fn, b, params, k))(batch, jax.random.PRNGKey(4))
    com = np.asarray(ads_center(res.batch))
    err = np.abs(com[:, :2] - np.asarray(target_xy))
    assert err.max() < 0.5, f"COM did not reach target: {err}"
    assert res.traj_pos.shape == (101, 3, 24, 3)
    # z coordinate never moves
    com0 = np.asarray(ads_center(batch))
    np.testing.assert_allclose(com[:, 2], com0[:, 2], atol=1e-4)


def test_reverse_diffusion_rotation_applies_rigidly(rng):
    batch = make_batch(rng)

    def score_fn(cur):
        zero = jnp.zeros_like(cur.pos)
        rot = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), cur.pos.shape)
        return zero, rot

    params = dict(PARAMS, num_steps=10, ode=True)
    res = reverse_diffusion(score_fn, batch, params, jax.random.PRNGKey(5))
    for b in range(batch.batch_size):
        am = np.asarray(batch.ads_mask)[b]
        d_old = np.linalg.norm(np.asarray(batch.pos)[b][am][:, None] - np.asarray(batch.pos)[b][am][None], axis=-1)
        d_new = np.linalg.norm(np.asarray(res.batch.pos)[b][am][:, None] - np.asarray(res.batch.pos)[b][am][None], axis=-1)
        np.testing.assert_allclose(d_new, d_old, atol=1e-3)


def test_langevin_runs(rng):
    batch = make_batch(rng)

    def score_fn(cur):
        return jnp.zeros_like(cur.pos), None

    params = dict(PARAMS, num_steps=5, n_step_each=2, step_lr=1e-4)
    res = langevin_dynamics(score_fn, batch, params, jax.random.PRNGKey(6))
    assert res.traj_pos.shape[0] == 11
    assert np.isfinite(np.asarray(res.batch.pos)).all()
