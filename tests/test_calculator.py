"""AdsorbDiffCalculator end-to-end: checkpoints -> diffusion + energy/forces."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from adsorbdiff_tpu.data.schema import collate
from adsorbdiff_tpu.models.painn import PaiNN
from adsorbdiff_tpu.relaxation.calculator import AdsorbDiffCalculator
from adsorbdiff_tpu.runtime.atoms import Atoms, atoms_to_system
from adsorbdiff_tpu.train import checkpoint as ckpt
from adsorbdiff_tpu.train.trainer import TrainState

MODEL_CFG = dict(
    name="painn", hidden_channels=32, num_layers=2, num_rbf=8, cutoff=6.0,
    max_neighbors=12, so3_denoising=True, cell_reps=(1, 1, 0),
)


def make_atoms(rng):
    cell = np.diag([8.0, 8.0, 24.0])
    slab = (rng.random((10, 3)) * [1, 1, 0.3]) @ cell
    ads = rng.random((3, 3)) * 1.2 + np.array([4, 4, 8.5])
    pos = np.concatenate([slab, ads])
    tags = np.array([0] * 10 + [2] * 3)
    z = np.concatenate([rng.integers(20, 60, 10), rng.integers(1, 9, 3)])
    return Atoms(positions=pos, numbers=z, cell=cell, tags=tags, fixed=tags == 0, sid=7)


def save_ckpt(tmp_path, name, model_cfg, mode=None):
    from adsorbdiff_tpu.train.trainer import _model_from_config

    rng = np.random.default_rng(0)
    atoms = make_atoms(rng)
    example = collate([atoms_to_system(atoms)], max_atoms=16)
    model = _model_from_config(model_cfg, mode=mode)
    variables = model.init(jax.random.PRNGKey(1), example)
    tx = optax.adamw(1e-4)
    state = TrainState(
        step=jnp.asarray(5, jnp.int32),
        params=variables["params"],
        scale_factors=variables.get("scale_factors", {}),
        opt_state=tx.init(variables["params"]),
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
    )
    cfg = {"model": dict(model_cfg, **({"mode": mode} if mode else {}))}
    return ckpt.save_checkpoint(str(tmp_path), name, state, config=cfg)


def test_calculator_diffusion_and_mlff(tmp_path, rng):
    diff_path = save_ckpt(tmp_path, "diff_ckpt", MODEL_CFG)
    mlff_cfg = dict(MODEL_CFG, so3_denoising=False)
    mlff_path = save_ckpt(tmp_path, "mlff_ckpt", mlff_cfg, mode="s2ef")

    calc = AdsorbDiffCalculator(
        checkpoint_path=diff_path,
        mlff_checkpoint_path=mlff_path,
        denoising_pos_params={"num_steps": 10},
        max_atoms=16,
    )
    atoms = make_atoms(rng)

    # diffusion moves the adsorbate in xy, slab untouched
    out = calc.run_diffusion(atoms)
    assert isinstance(out, Atoms) and len(out) == len(atoms)
    np.testing.assert_allclose(out.positions[:10], atoms.positions[:10], atol=1e-5)
    assert np.isfinite(out.positions).all()

    # energy / forces
    res = calc.calculate(atoms)
    assert np.isfinite(res["energy"])
    assert res["forces"].shape == (13, 3)
    # fixed atoms have zero forces (calculator constraint)
    assert np.abs(res["forces"][:10]).max() == 0
    assert calc.get_potential_energy() == pytest.approx(res["energy"])

    # relax runs and returns finite positions
    relaxed = calc.relax(atoms, steps=5, fmax=1e-6)
    assert np.isfinite(relaxed.positions).all()
    assert relaxed.energy is not None
