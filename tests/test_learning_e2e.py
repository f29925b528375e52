"""The scientific smoke test: train a score model on systems whose adsorbate
always relaxes to one known site, then verify the reverse-diffusion sampler
actually moves random placements toward that site.

(The TPU-scale version of this run — H=64, 600 steps — lands 0.67 A from the
true site vs ~2.8 A random expectation; this CPU-sized version uses a smaller
model/budget and a correspondingly generous threshold.)
"""
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adsorbdiff_tpu.data.schema import System, collate
from adsorbdiff_tpu.data.store import write_shard
from adsorbdiff_tpu.diffusion.sampler import reverse_diffusion
from adsorbdiff_tpu.diffusion.schedules import ads_center
from adsorbdiff_tpu.ops.pbc import min_image_diff
from adsorbdiff_tpu.train.trainer import DenoisingTrainer


@pytest.mark.slow
def test_sampler_recovers_learned_site(tmp_path, rng):
    cell = np.diag([8.0, 8.0, 24.0]).astype(np.float32)
    site_xy = np.array([0.25, 0.25]) @ cell[:2, :2]
    slab = (np.random.default_rng(42).random((12, 3)) * [1, 1, 0.3] @ cell).astype(np.float32)
    systems = []
    for i in range(16):
        ads_rel = np.array([[0, 0, 0], [0, 0, 1.1], [0.9, 0, 0.6]], np.float32)
        pos = np.concatenate([slab, ads_rel + [site_xy[0], site_xy[1], 8.0]]).astype(np.float32)
        tags = np.array([0] * 6 + [1] * 6 + [2] * 3, np.int32)
        z = np.array([29] * 12 + [6, 8, 1])
        systems.append(System(pos=pos, atomic_numbers=z, cell=cell, tags=tags, fixed=tags == 0, sid=i, pos_relaxed=pos))
    write_shard(str(tmp_path / "train"), systems)

    denoise = dict(num_steps=60, ads_std_low=0.1, ads_std_high=3.0, rot_std_low=0.02, rot_std_high=1.0)
    cfg = dict(
        dataset=[{"src": str(tmp_path / "train")}],
        model=dict(name="painn", hidden_channels=48, num_layers=2, num_rbf=16, cutoff=7.0,
                   max_neighbors=16, so3_denoising=True, cell_reps=(1, 1, 0)),
        optim=dict(batch_size=8, lr_initial=2e-3, optimizer_params={"weight_decay": 0.0},
                   scheduler="LambdaLR",
                   scheduler_params={"lambda_type": "cosine", "warmup_factor": 0.2, "warmup_epochs": 10, "lr_min_factor": 0.05},
                   max_epochs=125, clip_grad_norm=100, ema_decay=0.98, eval_every=100000,
                   checkpoint_every=-1, use_denoising_pos=True, denoising_pos_params=denoise),
        task={}, seed=0, run_dir=str(tmp_path), identifier="learn", print_every=1000, is_debug=True,
    )
    trainer = DenoisingTrainer(cfg, mesh=None)
    trainer.train()

    batch = collate(systems[:8], max_atoms=16)
    res = jax.jit(lambda b, k: reverse_diffusion(trainer.score_fn, b, dict(denoise, ode=True), k))(
        batch, jax.random.PRNGKey(123)
    )
    com = np.asarray(ads_center(res.batch))
    target = np.asarray(ads_center(batch))
    d = np.asarray(min_image_diff(jnp.asarray(com), jnp.asarray(target), batch.cell))
    err_xy = float(np.linalg.norm(d[:, :2], axis=1).mean())
    # random uniform placement on this cell averages ~2.8 A from the site;
    # a trained model must do much better even at this tiny budget
    assert err_xy < 1.6, f"sampler did not move toward the learned site: {err_xy:.2f} A"

    # north-star metric on the synthetic landscape: score each final pose with
    # a harmonic "DFT" energy about the true site (k = 0.1 eV/A^2, min = 0)
    # and run the reference success criterion (ref: scripts/eval.py:582-586).
    # Sampled poses must beat the analytic random-placement success rate.
    from adsorbdiff_tpu.eval_tools import is_successful

    k_spring = 0.1
    d_xy = np.linalg.norm(d[:, :2], axis=1)
    pred_energies = k_spring * d_xy**2
    success = np.array([is_successful(float(e), 0.0) for e in pred_energies])
    # success iff d < 1 A; uniform placement on the 8x8 cell (min-image) gives
    # P(d<1) = pi/64 ~ 0.049 — demand far above that
    assert success.mean() >= 0.5, (success.mean(), d_xy)


@pytest.mark.slow
def test_conditional_sampling_steers_to_low_energy_site(tmp_path, rng):
    """The paper's few-shot CONDITIONAL mode (energy_encoding=scalar, ref:
    sde_denoising_trainer.py:138-177, equiformer_v2_denoising.py:258-264):
    train on placements at TWO sites with relative energies (low site 0.0,
    high site 2.0), sample conditioned on the minimum (sampling=True zeroes
    the energy input = condition on E-E_min = 0), and assert conditioning
    actually steers placement: the conditional model concentrates on the
    low-energy site while the unconditionally-trained model splits between
    both."""
    cell = np.diag([8.0, 8.0, 24.0]).astype(np.float32)
    site_a = np.array([0.25, 0.25]) @ cell[:2, :2]  # E_rel = 0 (minimum)
    site_b = np.array([0.75, 0.75]) @ cell[:2, :2]  # E_rel = 2.0
    slab = (np.random.default_rng(42).random((12, 3)) * [1, 1, 0.3] @ cell).astype(np.float32)

    def make(site_xy, energy, sid, fid):
        ads_rel = np.array([[0, 0, 0], [0, 0, 1.1], [0.9, 0, 0.6]], np.float32)
        pos = np.concatenate([slab, ads_rel + [site_xy[0], site_xy[1], 8.0]]).astype(np.float32)
        tags = np.array([0] * 6 + [1] * 6 + [2] * 3, np.int32)
        z = np.array([29] * 12 + [6, 8, 1])
        return System(pos=pos, atomic_numbers=z, cell=cell, tags=tags,
                      fixed=tags == 0, sid=sid, fid=fid, energy=energy,
                      pos_relaxed=pos)

    systems = [make(site_a, 0.0, i, -1) for i in range(8)] + [
        make(site_b, 4.0, 8 + i, 0) for i in range(8)
    ]
    write_shard(str(tmp_path / "train"), systems)

    denoise = dict(num_steps=60, ads_std_low=0.1, ads_std_high=3.0, rot_std_low=0.02, rot_std_high=1.0)

    def train(energy_encoding):
        model = dict(name="painn", hidden_channels=48, num_layers=2, num_rbf=16,
                     cutoff=7.0, max_neighbors=16, so3_denoising=True,
                     cell_reps=(1, 1, 0), energy_encoding=energy_encoding)
        cfg = dict(
            dataset=[{"src": str(tmp_path / "train")}],
            model=model,
            optim=dict(batch_size=8, lr_initial=2e-3, optimizer_params={"weight_decay": 0.0},
                       scheduler="LambdaLR",
                       scheduler_params={"lambda_type": "cosine", "warmup_factor": 0.2,
                                         "warmup_epochs": 10, "lr_min_factor": 0.05},
                       max_epochs=250, clip_grad_norm=100, ema_decay=0.98, eval_every=100000,
                       checkpoint_every=-1, use_denoising_pos=True, denoising_pos_params=denoise),
            task={}, seed=0, run_dir=str(tmp_path), identifier=f"cond_{energy_encoding}",
            print_every=1000, is_debug=True,
        )
        trainer = DenoisingTrainer(cfg, mesh=None)
        trainer.train()
        return trainer

    def hit_fraction(trainer):
        batch = collate(systems[:8], max_atoms=16)
        res = jax.jit(lambda b, k: reverse_diffusion(trainer.score_fn, b, dict(denoise, ode=True), k))(
            batch, jax.random.PRNGKey(123)
        )
        com = np.asarray(ads_center(res.batch))[:, :2]
        d_a = np.linalg.norm(np.asarray(min_image_diff(
            jnp.asarray(np.concatenate([com, np.zeros((8, 1))], axis=1)),
            jnp.asarray(np.concatenate([np.tile(site_a, (8, 1)), np.zeros((8, 1))], axis=1)),
            batch.cell))[:, :2], axis=1)
        d_b = np.linalg.norm(np.asarray(min_image_diff(
            jnp.asarray(np.concatenate([com, np.zeros((8, 1))], axis=1)),
            jnp.asarray(np.concatenate([np.tile(site_b, (8, 1)), np.zeros((8, 1))], axis=1)),
            batch.cell))[:, :2], axis=1)
        near_a = float(np.mean(d_a < 1.8))
        near_either = float(np.mean(np.minimum(d_a, d_b) < 1.8))
        return near_a, near_either, d_a, d_b

    cond = train("scalar")
    near_a_c, near_any_c, d_a_c, d_b_c = hit_fraction(cond)
    uncond = train(None)
    near_a_u, near_any_u, d_a_u, d_b_u = hit_fraction(uncond)

    # the conditional model must have learned the site structure
    assert near_any_c >= 0.75, (d_a_c, d_b_c)
    # the unconditional model sees a bimodal target; its score field has a
    # saddle between the modes, so samples legitimately land at A, at B, or
    # between (measured run: 3/8 at A, 1/8 at B, rest between) — only require
    # it moved off random placement (uniform expectation ~2.8 A to nearest)
    assert float(np.minimum(d_a_u, d_b_u).mean()) < 2.2, (d_a_u, d_b_u)
    # conditioning on the minimum must concentrate mass on the low-energy
    # site: dominant on A, and strictly better than the unconditional split
    assert near_a_c >= 0.625, (near_a_c, d_a_c, d_b_c)
    assert near_a_c >= near_a_u + 0.25, (near_a_c, near_a_u)
