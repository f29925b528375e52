"""End-to-end AdsorbDiff pipeline: sample -> convert -> MLFF relax -> evaluate.

Rebuild of the reference's 3-stage-per-seed pipeline (ref: /root/reference/
run.py:34-70 — diffusion run-relaxations, ``pred_traj_to_lmdb``, MLFF
run-relaxations — then scripts/eval.py).  The reference glues the stages with
``torch.distributed.launch`` shell commands; here the pipeline is a Python
driver: one process drives the mesh, stages hand off through the columnar
shard/trajectory formats, and per-seed outputs land in ``out_dir/<seed>/``.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Sequence

import numpy as np

from adsorbdiff_tpu.data.schema import System
from adsorbdiff_tpu.data.store import write_shard
from adsorbdiff_tpu.runtime.trajectory import Trajectory, list_trajectories


def sampled_trajs_to_dataset(traj_dir: str, out_path: str, z_clearance: float = 0.1) -> int:
    """Final sampled structures -> relaxation-input shard.

    Rebuild of ``pred_traj_to_lmdb`` (ref: scripts/create_lmdbs/
    pred_traj_to_lmdb.py:60-105) including the z-clearance fix: if the
    adsorbate's lowest atom is within ``z_clearance`` of the highest surface
    atom, lift it to exactly ``z_clearance`` above (ref: :84-92).
    """
    systems = []
    for path in list_trajectories(traj_dir):
        traj = Trajectory.load(path)
        pos = traj.positions[-1].copy()
        ads = traj.tags == 2
        surf = traj.tags == 1
        if ads.any() and surf.any():
            diff = pos[ads][:, 2].min() - pos[surf][:, 2].max()
            if diff < z_clearance:
                pos[ads, 2] += abs(diff) + z_clearance
        systems.append(
            System(
                pos=pos,
                atomic_numbers=traj.numbers,
                tags=traj.tags,
                fixed=traj.fixed,
                cell=traj.cell,
                sid=traj.sid,
                fid=traj.fid,
            )
        )
    write_shard(out_path, systems)
    return len(systems)


def run_pipeline(
    diffusion_trainer,
    relax_trainer,
    relax_dataset_cfg: dict,
    out_dir: str,
    nsites: int = 1,
    denoising_pos_params: Optional[dict] = None,
    relax_opt: Optional[dict] = None,
    relaxation_steps: int = 300,
    relaxation_fmax: float = 0.01,
    dft_targets: Optional[Dict[str, float]] = None,
    batch_size: int = 8,
    atom_budget: Optional[int] = None,
) -> Optional[float]:
    """Per-seed: diffusion sampling over the relax dataset -> shard conversion
    -> MLFF L-BFGS -> (optional) anomaly-filtered min-energy success rate.

    ``diffusion_trainer``: a DenoisingTrainer with loaded state.
    ``relax_trainer``: an S2EFTrainer with loaded state.
    Returns the success rate when ``dft_targets`` is given.
    """
    import jax

    from adsorbdiff_tpu.data.buckets import BucketedBatcher
    from adsorbdiff_tpu.data.store import ShardDataset
    from adsorbdiff_tpu.eval_tools import success_rate
    from adsorbdiff_tpu.relaxation.ml_relaxation import DiffusionEngine, RelaxationEngine

    denoise_params = denoising_pos_params or diffusion_trainer.denoising_pos_params
    # one engine pair across all seeds: jit caches are per batch shape and
    # must survive the seed loop.  Each stage dp-shards its batches over its
    # trainer's mesh (systems are independent) — the whole pipeline runs on
    # all chips of a pod slice when the trainers were built with one.
    engine = DiffusionEngine(
        diffusion_trainer.score_fn, denoise_params, static_fn=diffusion_trainer.sampling_static_fn(),
        mesh=getattr(diffusion_trainer, "mesh", None),
    )
    cand_hook = getattr(relax_trainer, "relax_candidate_fn", None)  # duck-typed trainers
    from adsorbdiff_tpu.relaxation.continuous import resolve_continuous

    continuous = resolve_continuous(
        relax_opt, relaxation_fmax, mesh=getattr(relax_trainer, "mesh", None),
        slots=int((relax_opt or {}).get("slots", batch_size)),
    )
    if continuous:
        # slot-refill engine: converged systems retire at chunk boundaries and
        # pending ones take their slots (relaxation/continuous.py) — the
        # throughput choice when convergence times are spread (auto-selected
        # whenever fmax-based stopping makes spread possible; see
        # resolve_continuous)
        from adsorbdiff_tpu.relaxation.continuous import ContinuousRelaxationEngine

        rengine = ContinuousRelaxationEngine(
            relax_trainer.energy_forces_fn, relax_opt, steps=relaxation_steps, fmax=relaxation_fmax,
            candidate_fn=cand_hook(relax_opt) if cand_hook is not None else None,
            slots=int((relax_opt or {}).get("slots", batch_size)),
            mesh=getattr(relax_trainer, "mesh", None),
        )
    else:
        rengine = RelaxationEngine(
            relax_trainer.energy_forces_fn, relax_opt, steps=relaxation_steps, fmax=relaxation_fmax,
            candidate_fn=cand_hook(relax_opt) if cand_hook is not None else None,
            mesh=getattr(relax_trainer, "mesh", None),
        )
    relax_dirs = []
    for seed in range(nsites):
        step_dir = os.path.join(out_dir, str(seed))
        sample_dir = os.path.join(step_dir, "sampled")
        relax_dir = os.path.join(step_dir, "relaxations")

        # stage 1: diffusion sampling (ref: run.py com_sde block)
        dataset = ShardDataset(relax_dataset_cfg)
        # atom_budget: atom-balanced per-bucket batch sizes (heterogeneous
        # natoms; see data/buckets.py) — batch_size becomes the cap
        dmesh = getattr(diffusion_trainer, "mesh", None)
        batcher = BucketedBatcher(
            dataset, batch_size, shuffle=False, seed=seed, atom_budget=atom_budget,
            multiple_of=int(dmesh.devices.size) if dmesh is not None else 1,
        )
        key = jax.random.PRNGKey(seed)
        for i, batch in enumerate(batcher):
            engine.run(batch, jax.random.fold_in(key, i), traj_dir=sample_dir)
        engine.flush()  # stage 2 reads the trajectory dir

        # stage 2: traj -> relaxation-input shard (ref: run.py lmdb block)
        shard_path = os.path.join(step_dir, "final_struct")
        n = sampled_trajs_to_dataset(sample_dir, shard_path)
        logging.info(f"seed {seed}: converted {n} sampled structures")

        # stage 3: MLFF relaxation (ref: run.py com block)
        relax_ds = ShardDataset({"src": shard_path})
        if continuous:
            rengine.run_dataset(relax_ds, traj_dir=relax_dir)
        else:
            rmesh = getattr(relax_trainer, "mesh", None)
            relax_batcher = BucketedBatcher(
                relax_ds, batch_size, shuffle=False, seed=seed, atom_budget=atom_budget,
                multiple_of=int(rmesh.devices.size) if rmesh is not None else 1,
            )
            for batch in relax_batcher:
                rengine.run(batch, traj_dir=relax_dir)
        rengine.flush()  # the eval below reads the trajectory dirs
        relax_dirs.append(relax_dir)

    # stage 4: anomaly-filtered min-energy success rate (ref: scripts/eval.py)
    if dft_targets is not None:
        rate, per_system = success_rate(relax_dirs, dft_targets)
        logging.info(f"Success rate: {rate * 100:.1f}%  ({per_system})")
        return rate
    return None
