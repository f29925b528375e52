"""End-to-end pipeline integration: train tiny models -> sample -> convert ->
relax -> success-rate eval (the reference run.py:34-70 + scripts/eval.py flow)."""
import os

import numpy as np
import pytest

from adsorbdiff_tpu.pipeline import run_pipeline, sampled_trajs_to_dataset
from adsorbdiff_tpu.data.store import ShardDataset
from adsorbdiff_tpu.runtime.trajectory import Trajectory


def test_sampled_trajs_to_dataset_z_clearance(tmp_path, rng):
    # trajectory whose adsorbate ends up BELOW the surface -> must be lifted
    cell = np.diag([8.0, 8.0, 25.0]).astype(np.float32)
    n = 8
    pos = np.zeros((2, n, 3), np.float32)
    pos[:, :6, 2] = 3.0  # surface at z=3
    pos[1, 6:, 2] = 2.5  # adsorbate sunk below surface in final frame
    tags = np.array([1] * 6 + [2] * 2, np.int32)
    Trajectory(
        positions=pos, numbers=np.full(n, 29), cell=cell, tags=tags,
        fixed=np.zeros(n, bool), sid=3,
    ).save(str(tmp_path / "3"))
    count = sampled_trajs_to_dataset(str(tmp_path), str(tmp_path / "out"))
    assert count == 1
    ds = ShardDataset({"src": str(tmp_path / "out")})
    sys0 = ds[0]
    ads_min = sys0.pos[tags == 2][:, 2].min()
    surf_max = sys0.pos[tags == 1][:, 2].max()
    assert ads_min - surf_max == pytest.approx(0.1, abs=1e-5)
    assert sys0.sid == 3


@pytest.mark.slow
def test_full_pipeline(tmp_path, rng):
    """Tiny end-to-end: denoiser + MLFF with synthetic-but-consistent data."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_s2ef_and_tasks import make_s2ef_dataset, s2ef_config
    from test_trainer import config_for, make_dataset

    from adsorbdiff_tpu.train.trainer import DenoisingTrainer, S2EFTrainer

    # denoising trainer (brief training so state exists)
    train = make_dataset(tmp_path, rng, 8, "dtrain")
    dcfg = config_for(train, run_dir=str(tmp_path), max_epochs=1)
    dcfg["optim"]["denoising_pos_params"]["num_steps"] = 8
    dtr = DenoisingTrainer(dcfg, mesh=None)
    dtr.train()

    # s2ef trainer
    strain = make_s2ef_dataset(tmp_path, rng, 8, "strain")
    scfg = s2ef_config(strain, run_dir=str(tmp_path), max_epochs=1)
    stra = S2EFTrainer(scfg, mesh=None)
    stra.train()

    # relax dataset: reuse the denoising systems
    relax_src = make_dataset(tmp_path, rng, 6, "relaxds")
    out_dir = str(tmp_path / "pipeline")
    dft_targets = {str(i): -1.0 for i in range(6)}

    rate = run_pipeline(
        dtr,
        stra,
        {"src": relax_src},
        out_dir,
        nsites=2,
        # continuous: false keeps the barrier stage-3 loop covered in-suite
        # (the success-rate test below exercises the auto->continuous path)
        relax_opt={"maxstep": 0.04, "memory": 10, "continuous": False},
        relaxation_steps=5,
        relaxation_fmax=0.01,
        dft_targets=dft_targets,
        batch_size=4,
        # atom-balanced batching through the production wiring (big buckets
        # get smaller batches; see data/buckets.py)
        atom_budget=4 * 12,
    )
    assert rate is not None and 0.0 <= rate <= 1.0
    # per-seed outputs exist
    for seed in (0, 1):
        assert os.path.isdir(os.path.join(out_dir, str(seed), "sampled"))
        assert os.path.isdir(os.path.join(out_dir, str(seed), "relaxations"))
        assert os.path.exists(os.path.join(out_dir, str(seed), "final_struct.adshard.npz"))


@pytest.mark.slow
def test_pipeline_success_rate_beats_random(tmp_path, rng):
    """VERDICT round-2 item 7 — pipeline-scale success-rate regression: a
    trained score model driven through the FULL pipeline (multi-seed sample ->
    shard conversion -> L-BFGS relax on a multi-well landscape ->
    eval_tools.success_rate) must beat the random-placement baseline with
    margin.

    Landscape: four harmonic xy-wells; only one has the DFT-minimum energy
    (decoys +0.5 eV).  Short relaxations converge into the NEAREST well, so
    success (within 0.1 eV of the target, ref: scripts/eval.py:582-586)
    requires the sampler to land in the true well's basin — random placement
    succeeds ~1/4 of the time; the trained model must clear 0.6."""
    import jax
    import jax.numpy as jnp

    from adsorbdiff_tpu.data.schema import System
    from adsorbdiff_tpu.data.store import write_shard
    from adsorbdiff_tpu.train.trainer import DenoisingTrainer

    cell = np.diag([8.0, 8.0, 24.0]).astype(np.float32)
    wells_frac = np.array([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]])
    wells_xy = (wells_frac @ cell[:2, :2]).astype(np.float32)
    true_well = 0
    offsets = np.array([0.0, 0.5, 0.5, 0.5], np.float32)  # decoys fail the 0.1 eV test
    k_spring = 0.4

    slab = (np.random.default_rng(42).random((12, 3)) * [1, 1, 0.3] @ cell).astype(np.float32)
    tags = np.array([0] * 6 + [1] * 6 + [2] * 3, np.int32)
    z = np.array([29] * 12 + [6, 8, 1])
    ads_rel = np.array([[0, 0, 0], [0, 0, 1.1], [0.9, 0, 0.6]], np.float32)

    def system_at(sid, xy):
        pos = np.concatenate([slab, ads_rel + [xy[0], xy[1], 8.0]]).astype(np.float32)
        return System(pos=pos, atomic_numbers=z, cell=cell, tags=tags,
                      fixed=tags == 0, sid=sid, pos_relaxed=pos)

    # training systems: adsorbate relaxed at the TRUE well
    train_systems = [system_at(i, wells_xy[true_well]) for i in range(16)]
    write_shard(str(tmp_path / "ptrain"), train_systems)

    denoise = dict(num_steps=60, ads_std_low=0.1, ads_std_high=3.0,
                   rot_std_low=0.02, rot_std_high=1.0)
    cfg = dict(
        dataset=[{"src": str(tmp_path / "ptrain")}],
        model=dict(name="painn", hidden_channels=48, num_layers=2, num_rbf=16, cutoff=7.0,
                   max_neighbors=16, so3_denoising=True, cell_reps=(1, 1, 0)),
        optim=dict(batch_size=8, lr_initial=2e-3, optimizer_params={"weight_decay": 0.0},
                   scheduler="LambdaLR",
                   scheduler_params={"lambda_type": "cosine", "warmup_factor": 0.2,
                                     "warmup_epochs": 10, "lr_min_factor": 0.05},
                   max_epochs=125, clip_grad_norm=100, ema_decay=0.98, eval_every=100000,
                   checkpoint_every=-1, use_denoising_pos=True, denoising_pos_params=denoise),
        task={}, seed=0, run_dir=str(tmp_path), identifier="pipe", print_every=1000,
        is_debug=True,
    )
    dtr = DenoisingTrainer(cfg, mesh=None)
    dtr.train()

    wells_j = jnp.asarray(wells_xy)
    offs_j = jnp.asarray(offsets)

    class AnalyticMLFF:
        """Stand-in relax_trainer: multi-well harmonic energy/forces (the
        pipeline consumes only .energy_forces_fn)."""

        @staticmethod
        def energy_forces_fn(batch):
            ads = batch.ads_mask
            n_ads = jnp.maximum(jnp.sum(ads, axis=1), 1)
            com = jnp.sum(jnp.where(ads[..., None], batch.pos, 0.0), axis=1) / n_ads[:, None]
            d2 = jnp.sum((com[:, None, :2] - wells_j[None]) ** 2, axis=-1)  # [B, 4]
            widx = jnp.argmin(d2, axis=1)
            w = wells_j[widx]
            e = k_spring * jnp.take_along_axis(d2, widx[:, None], 1)[:, 0] + offs_j[widx]
            pull = -2.0 * k_spring * (com[:, :2] - w) / n_ads[:, None]
            f = jnp.zeros_like(batch.pos)
            f = f.at[..., :2].set(jnp.where(ads[..., None], pull[:, None, :], 0.0))
            return e, f

    relax_src = str(tmp_path / "prelax")
    write_shard(relax_src, [system_at(i, wells_xy[true_well]) for i in range(8)])
    dft_targets = {str(i): 0.0 for i in range(8)}

    rate = run_pipeline(
        dtr,
        AnalyticMLFF(),
        {"src": relax_src},
        str(tmp_path / "pipeout"),
        nsites=2,
        denoising_pos_params=dict(denoise, ode=True),
        relax_opt={"maxstep": 0.2, "memory": 10},
        relaxation_steps=25,
        relaxation_fmax=0.01,
        dft_targets=dft_targets,
        batch_size=8,
    )
    assert rate is not None
    # random placement lands in the true-well basin ~25% of the time; two
    # seeds of random placement pass ~44% — demand a clear margin above both
    assert rate >= 0.6, f"pipeline success rate {rate:.2f} does not beat random placement"
