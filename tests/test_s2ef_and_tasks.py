"""S2EF trainer, task dispatch, CLI config plumbing."""
import os

import numpy as np
import jax
import pytest
import yaml

from adsorbdiff_tpu.data.schema import System
from adsorbdiff_tpu.data.store import write_shard
from adsorbdiff_tpu.train.trainer import S2EFTrainer


def make_s2ef_dataset(tmp_path, rng, n_sys=12, name="train"):
    systems = []
    for i in range(n_sys):
        n = 12
        cell = np.diag([7.0, 7.0, 22.0]).astype(np.float32)
        pos = ((rng.random((n, 3)) * [1, 1, 0.4]) @ cell).astype(np.float32)
        tags = np.array([0] * 6 + [1] * 3 + [2] * 3, np.int32)
        # synthetic target: harmonic energy/forces about a shifted point
        target = pos + 0.1
        forces = -(pos - target)
        energy = 0.5 * float(np.sum((pos - target) ** 2))
        systems.append(
            System(pos=pos, atomic_numbers=rng.integers(1, 40, n), cell=cell, tags=tags,
                   fixed=tags == 0, sid=i, energy=energy, y_relaxed=energy, forces=forces,
                   pos_relaxed=target)
        )
    write_shard(str(tmp_path / name), systems)
    return str(tmp_path / (name + ".adshard.npz"))


def s2ef_config(train_src, val_src=None, relax_src=None, run_dir="./", **optim_over):
    optim = dict(
        batch_size=4, eval_batch_size=4, lr_initial=1e-3,
        optimizer_params={"weight_decay": 0.0},
        scheduler="LambdaLR",
        scheduler_params={"lambda_type": "cosine", "warmup_factor": 0.2, "warmup_epochs": 1, "lr_min_factor": 0.01},
        max_epochs=2, clip_grad_norm=100, ema_decay=0.999,
        energy_coefficient=1, force_coefficient=30,
        loss_energy="mae", loss_force="l2mae",
        eval_every=1000, checkpoint_every=-1,
    )
    optim.update(optim_over)
    ds = [{"src": train_src}]
    if val_src:
        ds.append({"src": val_src})
    task = {"train_on_free_atoms": True, "eval_on_free_atoms": True,
            "relaxation_steps": 15, "relaxation_fmax": 0.01,
            "relax_opt": {"maxstep": 0.04, "memory": 20, "damping": 1.0, "alpha": 70.0},
            "write_pos": True}
    if relax_src:
        task["relax_dataset"] = {"src": relax_src}
    return dict(
        dataset=ds,
        model=dict(name="painn", hidden_channels=32, num_layers=2, num_rbf=8, cutoff=6.0,
                   max_neighbors=12, so3_denoising=False, cell_reps=(1, 1, 0)),
        optim=optim, task=task, seed=0, run_dir=run_dir, identifier="s2ef_t",
        print_every=1000, is_debug=True,
    )


def test_s2ef_train_and_validate(tmp_path, rng):
    train = make_s2ef_dataset(tmp_path, rng, 12, "train")
    val = make_s2ef_dataset(tmp_path, rng, 8, "val")
    cfg = s2ef_config(train, val, run_dir=str(tmp_path))
    tr = S2EFTrainer(cfg, mesh=None)
    first = next(iter(tr.train_batcher))
    assert first.forces is not None
    tr.init_state(first)
    step_fn = tr._get_step_fn(first)
    losses = []
    for i in range(30):
        tr.state, aux = step_fn(tr.state, first, jax.random.PRNGKey(0))
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses[::10]
    metrics = tr.validate("val")
    assert "energy_mae" in metrics and "forces_mae" in metrics
    assert np.isfinite(metrics["energy_mae"]["metric"])


def test_s2ef_run_relaxations_writes_results(tmp_path, rng):
    train = make_s2ef_dataset(tmp_path, rng, 8, "train")
    relax = make_s2ef_dataset(tmp_path, rng, 6, "relax")
    cfg = s2ef_config(train, relax_src=relax, run_dir=str(tmp_path))
    cfg["task"]["relax_opt"]["traj_dir"] = str(tmp_path / "trajs")
    # continuous: false keeps the barrier run_relaxations path covered
    # in-suite (auto->continuous is covered by test_task_dispatch_train_and_
    # relax below and tests/test_continuous.py)
    cfg["task"]["relax_opt"]["continuous"] = False
    tr = S2EFTrainer(cfg, mesh=None)
    tr.init_state(next(iter(tr.train_batcher)))
    tr.run_relaxations()
    out = np.load(os.path.join(tr.results_dir, "relaxed_positions.npz"), allow_pickle=True)
    assert len(out["ids"]) == 6
    assert os.path.exists(str(tmp_path / "trajs"))


def test_task_dispatch_train_and_relax(tmp_path, rng):
    from adsorbdiff_tpu.tasks import new_trainer_context

    train = make_s2ef_dataset(tmp_path, rng, 8, "train")
    cfg = s2ef_config(train, run_dir=str(tmp_path), max_epochs=1)
    cfg["trainer"] = "s2ef"
    cfg["mode"] = "train"
    with new_trainer_context(cfg) as ctx:
        ctx.task.run()
        assert ctx.trainer.step == len(ctx.trainer.train_batcher)
        ckpt_path = os.path.join(ctx.trainer.ckpt_dir, "checkpoint")
        assert os.path.exists(ckpt_path)

    # resume into run-relaxations via checkpoint
    relax = make_s2ef_dataset(tmp_path, rng, 4, "relax2")
    cfg2 = s2ef_config(train, relax_src=relax, run_dir=str(tmp_path))
    cfg2["trainer"] = "s2ef"
    cfg2["mode"] = "run-relaxations"
    cfg2["checkpoint"] = ckpt_path
    cfg2["task"]["relax_opt"]["traj_dir"] = str(tmp_path / "trajs2")
    with new_trainer_context(cfg2) as ctx:
        assert int(ctx.trainer.state.step) > 0  # checkpoint loaded
        ctx.task.run()


def test_cli_main_runs_train(tmp_path, rng, monkeypatch):
    train = make_s2ef_dataset(tmp_path, rng, 8, "train")
    cfg = s2ef_config(train, run_dir=str(tmp_path), max_epochs=1)
    cfg["trainer"] = "s2ef"
    cfg_path = tmp_path / "cfg.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    import sys

    from adsorbdiff_tpu.main import main

    monkeypatch.setattr(
        sys, "argv",
        ["main", "--mode", "train", "--config-yml", str(cfg_path), "--identifier", "cli_t",
         "--run-dir", str(tmp_path), "--debug", "--optim.max_epochs=1"],
    )
    main()
    assert os.path.exists(tmp_path / "checkpoints" / "cli_t" / "checkpoint")
