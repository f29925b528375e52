"""Adsorbate representation + random rotations.

Rebuild of the reference (ref: adsorbdiff/placement/adsorbate.py:34-168) on
the ASE-lite Atoms type.  Database-pickle constructors (OC20 adsorbate DBs
contain pickled ase.Atoms) are gated on an available ase import.
"""
from __future__ import annotations

import pickle
from typing import Optional, Sequence, Tuple

import numpy as np

from adsorbdiff_tpu.runtime.atoms import Atoms


class Adsorbate:
    """An adsorbate: atoms + binding indices + optional SMILES/db id."""

    def __init__(
        self,
        adsorbate_atoms: Optional[Atoms] = None,
        adsorbate_id_from_db: Optional[int] = None,
        adsorbate_smiles_from_db: Optional[str] = None,
        adsorbate_db_path: Optional[str] = None,
        binding_indices: Optional[Sequence[int]] = None,
        smiles: Optional[str] = None,
        rng: Optional[np.random.Generator] = None,
    ) -> None:
        self.smiles = smiles
        if adsorbate_atoms is not None:
            self.atoms = adsorbate_atoms
            self.binding_indices = list(binding_indices) if binding_indices is not None else [0]
            self.adsorbate_id_from_db = adsorbate_id_from_db
        else:
            assert adsorbate_db_path is not None, "need atoms or a db path"
            db = _load_db(adsorbate_db_path)
            if adsorbate_id_from_db is None and adsorbate_smiles_from_db is not None:
                adsorbate_id_from_db = next(
                    i for i, entry in db.items() if entry[1] == adsorbate_smiles_from_db
                )
            if adsorbate_id_from_db is None:
                rng = rng or np.random.default_rng()
                adsorbate_id_from_db = int(rng.choice(list(db.keys())))
            self._load_entry(db[adsorbate_id_from_db], adsorbate_id_from_db)

    def _load_entry(self, entry: Tuple, idx: int) -> None:
        """OC20 db entry: (ase.Atoms, smiles, binding_indices) (ref: :109-121)."""
        atoms, smiles, binding = entry[0], entry[1], entry[2]
        self.atoms = Atoms.from_ase(atoms) if not isinstance(atoms, Atoms) else atoms
        self.smiles = smiles
        self.binding_indices = list(np.atleast_1d(binding))
        self.adsorbate_id_from_db = idx

    def __len__(self) -> int:
        return len(self.atoms)

    def __repr__(self) -> str:
        return f"Adsorbate: ({self.smiles}, natoms={len(self)})"


def _load_db(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def _rot_about(positions: np.ndarray, rotmat: np.ndarray, center: np.ndarray) -> np.ndarray:
    return (positions - center) @ rotmat.T + center


def randomly_rotate_adsorbate(
    atoms: Atoms,
    mode: str = "random",
    binding_idx: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
):
    """Uniform (or cone-constrained) random rotation (ref: adsorbate.py:122-168).

    "random": uniform z-spin then rotate the north pole to a uniform point on
    the sphere, about the COM.  "heuristic"/"random_site_heuristic_placement":
    same construction about the binding atom, with the pole confined to a
    pi/9 cone so the adsorbate doesn't crash into the surface.
    """
    assert mode in ["random", "heuristic", "random_site_heuristic_placement"]
    rng = rng or np.random.default_rng()
    out = atoms.copy()

    zrot = rng.uniform(0, 2 * np.pi)
    if mode == "random":
        center = out.positions.mean(axis=0)
        z = rng.uniform(-1.0, 1.0)
    else:
        assert binding_idx is not None
        center = out.positions[binding_idx]
        z = rng.uniform(np.cos(np.pi / 9), 1.0)
    phi = rng.uniform(0, 2 * np.pi)

    cz, sz = np.cos(zrot), np.sin(zrot)
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1.0]])
    out.positions = _rot_about(out.positions, rz, center)

    # rotation taking (0,0,1) to rotvec
    rotvec = np.array([np.sqrt(1 - z * z) * np.cos(phi), np.sqrt(1 - z * z) * np.sin(phi), z])
    v = np.cross([0, 0, 1.0], rotvec)
    s = np.linalg.norm(v)
    c = rotvec[2]
    if s < 1e-12:
        r2 = np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
    else:
        vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        r2 = np.eye(3) + vx + vx @ vx * ((1 - c) / s**2)
    out.positions = _rot_about(out.positions, r2, center)
    sampled_angles = np.array([zrot, phi, z])
    return out, sampled_angles
