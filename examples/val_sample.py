"""End-to-end single-system demo — the reference notebook as a script.

Mirrors ``examples/valID_sample/val_sample.ipynb`` (the reference's de-facto
smoke test, SURVEY.md §4): build an adslab, run reverse diffusion to place the
adsorbate, MLFF-relax the result, and anomaly-check the trajectory — all
through the public one-system API.

The reference notebook loads pretrained checkpoints (PT_zeroshot_painn.pt +
an OCP GemNet-OC MLFF); this demo trains nothing and uses freshly-initialized
small models so it runs anywhere in ~a minute — swap in real checkpoints via
``--diffusion-ckpt`` / ``--mlff-ckpt`` for meaningful physics.

Run: python examples/val_sample.py
"""
import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import optax  # noqa: E402

from adsorbdiff_tpu import AdsorbDiffCalculator  # noqa: E402
from adsorbdiff_tpu.data.schema import collate  # noqa: E402
from adsorbdiff_tpu.placement import Adsorbate, AdsorbateSlabConfig, Bulk, DetectTrajAnomaly, Slab  # noqa: E402
from adsorbdiff_tpu.runtime.atoms import Atoms, atoms_to_system  # noqa: E402
from adsorbdiff_tpu.train import checkpoint as ckpt  # noqa: E402
from adsorbdiff_tpu.train.trainer import TrainState, _model_from_config  # noqa: E402

MODEL_CFG = dict(
    name="painn", hidden_channels=64, num_layers=3, num_rbf=32, cutoff=8.0,
    max_neighbors=24, so3_denoising=True, cell_reps=(1, 1, 0),
)


def make_demo_checkpoint(out_dir, example, model_cfg, mode=None, name="ckpt"):
    model = _model_from_config(model_cfg, mode=mode)
    variables = model.init(jax.random.PRNGKey(0), example)
    tx = optax.adamw(1e-4)
    state = TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=variables["params"],
        scale_factors=variables.get("scale_factors", {}),
        opt_state=tx.init(variables["params"]),
        ema_params=jax.tree.map(jax.numpy.copy, variables["params"]),
    )
    return ckpt.save_checkpoint(out_dir, name, state, config={"model": dict(model_cfg, **({"mode": mode} if mode else {}))})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--diffusion-ckpt", default=None)
    ap.add_argument("--mlff-ckpt", default=None)
    ap.add_argument("--num-steps", type=int, default=50)
    args = ap.parse_args()

    # 1. build a Cu(100) slab and place CO on a random site (placement toolkit)
    a = 3.61
    cell = np.eye(3) * a
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    bulk = Bulk(bulk_atoms=Atoms(positions=frac @ cell, numbers=[29] * 4, cell=cell), src_id="mp-30")
    slab = Slab.from_bulk_get_specific_millers((1, 0, 0), bulk)[0]
    co = Adsorbate(
        adsorbate_atoms=Atoms(positions=[[0, 0, 0], [0, 0, 1.15]], numbers=[6, 8], cell=np.eye(3) * 20, pbc=(False,) * 3),
        binding_indices=[0],
        smiles="*CO",
    )
    config = AdsorbateSlabConfig(slab, co, num_sites=1, mode="random", rng=np.random.default_rng(0))
    adslab = config.atoms_list[0]
    print(f"adslab: {len(adslab)} atoms, {int((np.asarray(adslab.tags) == 2).sum())} adsorbate atoms")

    # 2. checkpoints (demo-initialized unless provided)
    tmp = tempfile.mkdtemp()
    example = collate([atoms_to_system(adslab)], max_atoms=int(-(-len(adslab) // 8) * 8))
    diff_ckpt = args.diffusion_ckpt or make_demo_checkpoint(tmp, example, MODEL_CFG, name="diff")
    mlff_ckpt = args.mlff_ckpt or make_demo_checkpoint(
        tmp, example, dict(MODEL_CFG, so3_denoising=False), mode="s2ef", name="mlff"
    )

    # 3. one-system API: diffusion placement -> energy -> relaxation
    calc = AdsorbDiffCalculator(
        checkpoint_path=diff_ckpt,
        mlff_checkpoint_path=mlff_ckpt,
        denoising_pos_params={"num_steps": args.num_steps},
        max_atoms=example.max_atoms,
    )
    placed = calc.run_diffusion(adslab, traj_dir=os.path.join(tmp, "trajs"))
    print("diffusion done; adsorbate COM:", placed.positions[np.asarray(placed.tags) == 2].mean(0).round(3))

    energy = calc.get_potential_energy(placed)
    print(f"MLFF energy of placed structure: {energy:.4f} eV")

    relaxed = calc.relax(placed, steps=30, fmax=0.05)
    print(f"relaxed energy: {relaxed.energy:.4f} eV")

    # 4. anomaly check (the eval-pipeline filter)
    det = DetectTrajAnomaly(placed, relaxed, placed.tags)
    print(
        "anomalies: dissociated=%s desorbed=%s surface_changed=%s intercalated=%s"
        % (det.is_adsorbate_dissociated(), det.is_adsorbate_desorbed(), det.has_surface_changed(), det.is_adsorbate_intercalated())
    )
    print("demo complete")


if __name__ == "__main__":
    main()
