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
        relax_opt={"maxstep": 0.04, "memory": 10},
        relaxation_steps=5,
        relaxation_fmax=0.01,
        dft_targets=dft_targets,
        batch_size=4,
    )
    assert rate is not None and 0.0 <= rate <= 1.0
    # per-seed outputs exist
    for seed in (0, 1):
        assert os.path.isdir(os.path.join(out_dir, str(seed), "sampled"))
        assert os.path.isdir(os.path.join(out_dir, str(seed), "relaxations"))
        assert os.path.exists(os.path.join(out_dir, str(seed), "final_struct.adshard.npz"))
