"""Real-data dress rehearsal (VERDICT round-4 missing #1).

Fabricates FULL reference-format artifacts — torch ``.pt`` checkpoints
exactly as the reference trainer saves them (DDP ``module.`` prefixes,
ordered-list ``ema``, ``optimizer``/``scheduler`` blobs, embedded ``config``
with ``model_attributes``; ref: base_trainer.py:625-684) and a
reference-format ``.lmdb`` of placements — then drives the user migration
path END TO END with the real commands:

    scripts/convert_checkpoint.py <ref.pt> <out>   (CLI, subprocess)
    lmdb -> shard conversion (data/lmdb_compat.convert_lmdb_to_shards)
    run_pipeline: sample -> convert -> L-BFGS relax
    scripts/eval.py trajs <relaxations> --targets   (CLI, subprocess)

so the day real Zenodo checkpoints / OC20-Dense LMDBs land, every command is
known-good.  Model math exactness is covered by the oracle parity tests in
tests/test_torch_import.py; this test covers the PLUMBING at full fidelity.
"""
import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from adsorbdiff_tpu.data.schema import System, collate
from adsorbdiff_tpu.data.store import write_shard

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _reference_checkpoint(model, name, model_attributes, path):
    """Write a .pt shaped exactly like base_trainer.save (ref :625-684)."""
    sd = model.state_dict()
    torch.save(
        {
            "epoch": 2,
            "step": 1234,
            "state_dict": {f"module.module.{k}": v for k, v in sd.items()},
            "optimizer": {"state": {}, "param_groups": [{"lr": 1e-4}]},
            "scheduler": {"last_epoch": 2},
            # the reference stores EMA as an ORDERED parameter list (no
            # names); the converter initializes EMA from the raw weights
            # instead (documented divergence) but must tolerate the key
            "ema": [v.clone() for v in sd.values()],
            "normalizers": {},
            "amp": None,
            "val_metrics": {"loss": 0.1},
            "config": {"model": name, "model_attributes": model_attributes},
        },
        path,
    )


def _convert_cli(tmp_path, pt_path, name, overrides):
    cmd = [sys.executable, os.path.join(REPO, "scripts/convert_checkpoint.py"),
           pt_path, str(tmp_path), "--name", name, "--cpu"]
    for kv in overrides:
        cmd += ["--override", kv]
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, "/root/.axon_site", env.get("PYTHONPATH", "")] if p)
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    path = os.path.join(str(tmp_path), name)
    assert os.path.exists(path + ".config.yaml"), out.stdout
    return path


@pytest.mark.slow
def test_dress_rehearsal_reference_artifacts_to_success_rate(tmp_path, rng):
    import yaml

    import jax

    from tests.test_torch_import import GEMNET_ORACLE_KW
    from tests.torch_ref_gemnet import RefGemNetOC
    from tests.torch_ref_painn import RefPaiNN

    # ---- 1. reference-format checkpoints --------------------------------
    torch.manual_seed(0)
    painn = RefPaiNN(h=32, num_layers=2, num_rbf=8, cutoff=6.0)
    painn_pt = str(tmp_path / "PT_zeroshot_painn.pt")
    _reference_checkpoint(
        painn, "experimental.adeesh.denoising.models.painn_denoising.PaiNN",
        dict(hidden_channels=32, num_layers=2, num_rbf=8, max_radius=6.0,
             max_neighbors=24, so3_denoising=True, use_pbc=True, otf_graph=True),
        painn_pt,
    )
    gem = RefGemNetOC(**GEMNET_ORACLE_KW)
    gem_pt = str(tmp_path / "gemnet_oc_mlff.pt")
    ref_gem_attrs = dict(GEMNET_ORACLE_KW)
    _reference_checkpoint(gem, "gemnet_oc", ref_gem_attrs, gem_pt)

    # ---- 2. convert via the user CLI ------------------------------------
    painn_ckpt = _convert_cli(
        tmp_path, painn_pt, "painn_conv", ["cell_reps=(1,1,0)"])
    gem_ckpt = _convert_cli(
        tmp_path, gem_pt, "gem_conv",
        ["cell_reps=(1,1,0)", "max_neighbors=16", "max_neighbors_qint=8",
         "max_neighbors_aeaint=16"],
    )
    painn_model_cfg = yaml.safe_load(open(painn_ckpt + ".config.yaml"))["model"]
    gem_model_cfg = yaml.safe_load(open(gem_ckpt + ".config.yaml"))["model"]
    assert painn_model_cfg["name"] == "painn"
    assert gem_model_cfg["name"] == "gemnet_oc"

    # ---- 3. reference-format LMDB of placements -> shards ----------------
    from adsorbdiff_tpu.data.lmdb_compat import (
        convert_lmdb_to_shards,
        export_systems_to_lmdb,
    )

    systems = []
    for i in range(4):
        n_slab, n_ads = 8, 3
        cell = np.diag([7.0, 7.0, 24.0]).astype(np.float32)
        slab = (rng.random((n_slab, 3)) * [1, 1, 0.3]) @ cell
        ads = rng.random((n_ads, 3)).astype(np.float32) * 1.2 + np.array([3, 3, 8.5], np.float32)
        pos = np.concatenate([slab, ads]).astype(np.float32)
        tags = np.array([0] * n_slab + [2] * n_ads, np.int32)
        z = np.concatenate([rng.integers(20, 60, n_slab), rng.integers(1, 9, n_ads)])
        systems.append(System(pos=pos, atomic_numbers=z, cell=cell, tags=tags,
                              fixed=tags == 0, sid=i, y_relaxed=-1.0))
    lmdb_path = str(tmp_path / "placements.lmdb")
    assert export_systems_to_lmdb(systems, lmdb_path) == 4
    os.makedirs(str(tmp_path / "shards"))
    assert convert_lmdb_to_shards(lmdb_path, str(tmp_path / "shards" / "part")) == 4
    shard_dir = str(tmp_path / "shards")

    # ---- 4. trainers from the converted checkpoints ----------------------
    from adsorbdiff_tpu.train.trainer import DenoisingTrainer, S2EFTrainer

    denoise = dict(num_steps=8, ads_std_low=0.1, ads_std_high=3.0,
                   rot_std_low=0.02, rot_std_high=1.0)
    optim = dict(batch_size=4, lr_initial=1e-4, optimizer_params={},
                 scheduler="LambdaLR",
                 scheduler_params={"lambda_type": "cosine", "warmup_factor": 0.2,
                                   "warmup_epochs": 1, "lr_min_factor": 0.01},
                 max_epochs=1, ema_decay=0.999, eval_every=10**9,
                 checkpoint_every=-1, use_denoising_pos=True,
                 denoising_pos_params=denoise)
    example = collate(systems, max_atoms=16)

    dcfg = dict(dataset=[{"src": shard_dir}], model=painn_model_cfg,
                optim=optim, task={}, seed=0, run_dir=str(tmp_path),
                identifier="dress_d", is_debug=True)
    dtr = DenoisingTrainer(dcfg, mesh=None)
    dtr.init_state(example)
    dtr.load_checkpoint(painn_ckpt)

    scfg = dict(dataset=[{"src": shard_dir}], model=gem_model_cfg,
                optim=dict(optim, use_denoising_pos=False), task={}, seed=0,
                run_dir=str(tmp_path), identifier="dress_s", is_debug=True)
    stra = S2EFTrainer(scfg, mesh=None)
    stra.init_state(example)
    stra.load_checkpoint(gem_ckpt)

    # ---- 5. the 3-stage pipeline -----------------------------------------
    from adsorbdiff_tpu.pipeline import run_pipeline

    out_dir = str(tmp_path / "pipeline")
    dft_targets = {str(i): -1.0 for i in range(4)}
    rate = run_pipeline(
        dtr, stra, {"src": shard_dir}, out_dir, nsites=1,
        relax_opt={"maxstep": 0.04, "memory": 5, "continuous": False},
        relaxation_steps=4, relaxation_fmax=0.01,
        dft_targets=dft_targets, batch_size=4,
    )
    assert rate is not None and 0.0 <= rate <= 1.0
    relax_dir = os.path.join(out_dir, "0", "relaxations")
    assert os.path.isdir(relax_dir)

    # ---- 6. success-rate eval via the user CLI ---------------------------
    targets_json = str(tmp_path / "targets.json")
    with open(targets_json, "w") as f:
        json.dump(dft_targets, f)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, "/root/.axon_site", env.get("PYTHONPATH", "")] if p)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/eval.py"), "trajs",
         relax_dir, "--targets", targets_json],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    m = re.search(r"success rate: ([\d.]+)%\s+\((\d+)/(\d+)\)", out.stdout)
    assert m, out.stdout
    assert int(m.group(3)) == 4  # every lmdb system made it through
