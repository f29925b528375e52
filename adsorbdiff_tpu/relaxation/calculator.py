"""AdsorbDiffCalculator — the one-system / notebook API.

Rebuild of the reference's single public top-level symbol
(ref: adsorbdiff/relaxation/calculator.py:23-210, exported at
adsorbdiff/__init__.py:8): construct from checkpoints, then

- ``run_diffusion(atoms)`` — jitted reverse diffusion for one system
  (ref: calculator.py:180-210),
- ``calculate(atoms)`` — energy/forces from the MLFF model, usable as an ASE
  calculator when ase is installed (ref: calculator.py:166-178),
- ``relax(atoms)`` — batched L-BFGS convenience wrapper.

The reference rebuilds a full trainer from ``checkpoint["config"]`` with
config surgery (ref: calculator.py:96-112); here checkpoints carry a sidecar
``config.yaml`` and only the model + EMA params are reconstructed.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from adsorbdiff_tpu.data.schema import AtomsBatch, collate
from adsorbdiff_tpu.relaxation.lbfgs import make_mlff_energy_forces
from adsorbdiff_tpu.relaxation.ml_relaxation import DiffusionEngine, RelaxationEngine
from adsorbdiff_tpu.runtime.atoms import Atoms, atoms_to_system, batch_to_atoms

DEFAULT_DENOISING_PARAMS = {
    # published sampling config (ref: configs/denoising/painn_so3.yml:79-83)
    "num_steps": 100,
    "ads_std_low": 0.1,
    "ads_std_high": 10.0,
    "rot_std_low": 0.01,
    "rot_std_high": 1.55,
    "ode": True,
}


def _load_model_state(checkpoint_path: str, example: AtomsBatch, *, sampling: bool, mode: Optional[str] = None):
    """Rebuild (model, params, scale_factors) from a checkpoint + sidecar config."""
    import yaml

    from adsorbdiff_tpu.train import checkpoint as ckpt
    from adsorbdiff_tpu.train.trainer import TrainState, _model_from_config

    with open(checkpoint_path + ".config.yaml") as f:
        config = yaml.safe_load(f)
    model = _model_from_config(config["model"], sampling=sampling, mode=mode)
    import optax

    variables = model.init(jax.random.PRNGKey(0), example)
    tx = optax.adamw(1e-4)  # structure-only: opt_state layout for restore
    target = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        scale_factors=variables.get("scale_factors", {}),
        opt_state=tx.init(variables["params"]),
        ema_params=variables["params"],
    )
    try:
        state, _ = ckpt.load_checkpoint(checkpoint_path, target)
    except Exception:
        # checkpoints saved with a different optimizer chain: retry params-only
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(checkpoint_path))
        state = target.replace(params=restored["params"], ema_params=restored["ema_params"],
                               scale_factors=restored.get("scale_factors", {}))
    return model, state


class AdsorbDiffCalculator:
    """One-system diffusion + MLFF energy/forces API."""

    implemented_properties = ["energy", "forces"]  # ASE calculator protocol

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,  # denoising (score) model ckpt
        mlff_checkpoint_path: Optional[str] = None,  # s2ef model ckpt
        denoising_pos_params: Optional[dict] = None,
        max_atoms: Optional[int] = None,
        seed: int = 0,
    ) -> None:
        from adsorbdiff_tpu.common.compile_cache import setup_compilation_cache

        setup_compilation_cache()  # model-scale jits persist across processes
        self.checkpoint_path = checkpoint_path
        self.mlff_checkpoint_path = mlff_checkpoint_path
        self.denoising_pos_params = {**DEFAULT_DENOISING_PARAMS, **(denoising_pos_params or {})}
        self.max_atoms = max_atoms
        self.seed = seed
        self._diff = None  # (model, state, engine)
        self._mlff = None  # (model, state, fn)
        self.results: dict = {}

    # -- internals -----------------------------------------------------------
    def _batch(self, atoms: Atoms) -> AtomsBatch:
        n = self.max_atoms or int(-(-len(atoms) // 8) * 8)
        return collate([atoms_to_system(atoms)], max_atoms=n)

    def _diffusion_engine(self, example: AtomsBatch) -> DiffusionEngine:
        if self._diff is None:
            assert self.checkpoint_path, "no denoising checkpoint configured"
            model, state = _load_model_state(self.checkpoint_path, example, sampling=True)

            def score_fn(cur, static_graph=None):
                out = model.apply(
                    {"params": state.ema_params, "scale_factors": state.scale_factors}, cur, static_graph
                )
                out1, out2 = out if isinstance(out, tuple) else (out, None)
                if out2 is not None:
                    out2 = jnp.where(cur.fixed[..., None], 0.0, out2)
                return out1, out2

            self._diff = DiffusionEngine(
                score_fn, self.denoising_pos_params,
                static_fn=getattr(model, "prepare_static", None),
            )
        return self._diff

    def _mlff_fn(self, example: AtomsBatch):
        if self._mlff is None:
            assert self.mlff_checkpoint_path, "no MLFF checkpoint configured"
            model, state = _load_model_state(self.mlff_checkpoint_path, example, sampling=False, mode="s2ef")
            fn = make_mlff_energy_forces(model, {"params": state.ema_params, "scale_factors": state.scale_factors})
            self._mlff = (model, state, jax.jit(fn))
        return self._mlff[2]

    # -- public API ----------------------------------------------------------
    def run_diffusion(self, atoms: Atoms, key: Optional[jax.Array] = None, traj_dir: Optional[str] = None) -> Atoms:
        """Reverse diffusion for one system (ref: calculator.py:180-210)."""
        batch = self._batch(atoms)
        engine = self._diffusion_engine(batch)
        key = key if key is not None else jax.random.PRNGKey(self.seed)
        res = engine.run(batch, key, traj_dir=traj_dir, skip_existing=False)
        engine.flush()
        return batch_to_atoms(res.batch)[0]

    def calculate(self, atoms=None, properties=("energy", "forces"), system_changes=None) -> dict:
        """Energy/forces via the MLFF model (ASE Calculator.calculate shape,
        ref: calculator.py:166-178)."""
        if not isinstance(atoms, Atoms):
            atoms = Atoms.from_ase(atoms)
        batch = self._batch(atoms)
        e, f = self._mlff_fn(batch)(batch)
        n = len(atoms)
        self.results = {"energy": float(e[0]), "forces": np.asarray(f[0, :n])}
        return self.results

    def get_potential_energy(self, atoms=None, **kw) -> float:
        if atoms is not None or "energy" not in self.results:
            self.calculate(atoms)
        return self.results["energy"]

    def get_forces(self, atoms=None) -> np.ndarray:
        if atoms is not None or "forces" not in self.results:
            self.calculate(atoms)
        return self.results["forces"]

    def relax(self, atoms: Atoms, steps: int = 300, fmax: float = 0.01, relax_opt: Optional[dict] = None,
              traj_dir: Optional[str] = None) -> Atoms:
        """MLFF L-BFGS relaxation of one system."""
        batch = self._batch(atoms)
        self._mlff_fn(batch)  # ensure model loaded
        model, state, _ = self._mlff
        engine = RelaxationEngine.from_model(
            model, {"params": state.ema_params, "scale_factors": state.scale_factors},
            relax_opt, steps=steps, fmax=fmax,
        )
        res = engine.run(batch, traj_dir=traj_dir, skip_existing=False)
        engine.flush()
        out = batch_to_atoms(res.batch, energy=res.energy, forces=res.forces)[0]
        return out
