"""The batch schema: a fixed-shape padded pytree of systems.

This replaces the reference's variable-length PyG ``Batch`` (implicit schema
documented in SURVEY.md §2.3; fields used throughout the reference:
``pos[N,3], atomic_numbers[N], tags[N], fixed[N], cell[1,3,3], natoms, sid,
fid, y/y_relaxed, pos_relaxed, energy, batch``).  On TPU every system owns a
padded row of ``max_atoms`` slots and ``atom_mask`` marks real atoms, so a
batch is a dense ``[B, N, ...]`` pytree and "scatter over batch.batch" becomes
a masked reduction over axis 1 (see :mod:`adsorbdiff_tpu.ops.segment`).

Tags follow OC20: 0 = subsurface slab, 1 = surface slab, 2 = adsorbate.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class AtomsBatch:
    """Fixed-shape batch of (padded) atomic systems. All arrays leading dim B."""

    pos: jnp.ndarray  # [B, N, 3] float32 cartesian
    atomic_numbers: jnp.ndarray  # [B, N] int32 (0 on padding)
    tags: jnp.ndarray  # [B, N] int32
    fixed: jnp.ndarray  # [B, N] bool (FixAtoms constraint)
    cell: jnp.ndarray  # [B, 3, 3] float32, rows = lattice vectors
    natoms: jnp.ndarray  # [B] int32
    atom_mask: jnp.ndarray  # [B, N] bool
    sid: jnp.ndarray  # [B] int32 system id
    fid: jnp.ndarray  # [B] int32 frame/config id
    energy: jnp.ndarray  # [B] float32 (y / conditional energy; 0 if absent)
    y_relaxed: jnp.ndarray  # [B] float32 (DFT relaxed energy target; 0 if absent)
    pos_relaxed: jnp.ndarray  # [B, N, 3] float32 (relaxed positions; = pos if absent)
    forces: Optional[jnp.ndarray] = None  # [B, N, 3] float32 (S2EF target)

    @property
    def batch_size(self) -> int:
        return self.pos.shape[0]

    @property
    def max_atoms(self) -> int:
        return self.pos.shape[1]

    @property
    def ads_mask(self) -> jnp.ndarray:
        """[B, N] bool — real adsorbate atoms (tags == 2)."""
        return (self.tags == 2) & self.atom_mask

    @property
    def free_mask(self) -> jnp.ndarray:
        """[B, N] bool — real unconstrained atoms."""
        return (~self.fixed) & self.atom_mask


class System:
    """Host-side single system (numpy), the unit the data pipeline moves.

    Mirrors the reference's per-item PyG ``Data``
    (ref: adsorbdiff/datasets/lmdb_dataset.py, utils/atoms_to_graphs.py:131-198).
    """

    __slots__ = (
        "pos",
        "atomic_numbers",
        "tags",
        "fixed",
        "cell",
        "sid",
        "fid",
        "energy",
        "y_relaxed",
        "pos_relaxed",
        "forces",
    )

    def __init__(
        self,
        pos: np.ndarray,
        atomic_numbers: np.ndarray,
        cell: np.ndarray,
        tags: Optional[np.ndarray] = None,
        fixed: Optional[np.ndarray] = None,
        sid: int = 0,
        fid: int = 0,
        energy: Optional[float] = None,
        y_relaxed: float = 0.0,
        pos_relaxed: Optional[np.ndarray] = None,
        forces: Optional[np.ndarray] = None,
    ) -> None:
        n = len(pos)
        self.pos = np.asarray(pos, np.float32).reshape(n, 3)
        self.atomic_numbers = np.asarray(atomic_numbers, np.int32).reshape(n)
        self.cell = np.asarray(cell, np.float32).reshape(3, 3)
        self.tags = (
            np.zeros(n, np.int32) if tags is None else np.asarray(tags, np.int32).reshape(n)
        )
        self.fixed = (
            np.zeros(n, bool) if fixed is None else np.asarray(fixed).astype(bool).reshape(n)
        )
        self.sid = int(sid)
        self.fid = int(fid)
        # None = unset; distinguishes "no energy label" from a legitimate 0.0
        # (the LMDB exporter must not drop y=0.0 records).
        self.energy = None if energy is None else float(energy)
        self.y_relaxed = float(y_relaxed)
        self.pos_relaxed = (
            self.pos.copy() if pos_relaxed is None else np.asarray(pos_relaxed, np.float32).reshape(n, 3)
        )
        self.forces = None if forces is None else np.asarray(forces, np.float32).reshape(n, 3)

    @property
    def natoms(self) -> int:
        return len(self.pos)


def collate(systems: Sequence[System], max_atoms: Optional[int] = None, with_forces: bool = False) -> AtomsBatch:
    """Pad + stack host-side systems into a device-ready :class:`AtomsBatch`.

    Replaces ``data_list_collater`` (ref: datasets/lmdb_dataset.py:246-263);
    graphs are built on-device per step (otf), so no edge tensors are stored.
    """
    b = len(systems)
    n = max(int(s.natoms) for s in systems)
    if max_atoms is not None:
        if n > max_atoms:
            raise ValueError(f"system with {n} atoms exceeds max_atoms={max_atoms}")
        n = max_atoms

    def zeros(shape, dtype):
        return np.zeros((b,) + shape, dtype)

    out = dict(
        pos=zeros((n, 3), np.float32),
        atomic_numbers=zeros((n,), np.int32),
        tags=zeros((n,), np.int32),
        fixed=zeros((n,), bool),
        cell=zeros((3, 3), np.float32),
        natoms=np.zeros(b, np.int32),
        atom_mask=zeros((n,), bool),
        sid=np.zeros(b, np.int32),
        fid=np.zeros(b, np.int32),
        energy=np.zeros(b, np.float32),
        y_relaxed=np.zeros(b, np.float32),
        pos_relaxed=zeros((n, 3), np.float32),
    )
    forces = zeros((n, 3), np.float32) if with_forces else None
    for i, s in enumerate(systems):
        k = s.natoms
        out["pos"][i, :k] = s.pos
        out["atomic_numbers"][i, :k] = s.atomic_numbers
        out["tags"][i, :k] = s.tags
        out["fixed"][i, :k] = s.fixed
        out["cell"][i] = s.cell
        out["natoms"][i] = k
        out["atom_mask"][i, :k] = True
        out["sid"][i] = s.sid
        out["fid"][i] = s.fid
        out["energy"][i] = 0.0 if s.energy is None else s.energy
        out["y_relaxed"][i] = s.y_relaxed
        out["pos_relaxed"][i, :k] = s.pos_relaxed
        if with_forces and s.forces is not None:
            forces[i, :k] = s.forces
    return AtomsBatch(forces=forces, **{k: jnp.asarray(v) for k, v in out.items()})


def uncollate(batch: AtomsBatch) -> List[System]:
    """Device batch -> host systems (inverse of :func:`collate`)."""
    out = []
    pos = np.asarray(batch.pos)
    z = np.asarray(batch.atomic_numbers)
    tags = np.asarray(batch.tags)
    fixed = np.asarray(batch.fixed)
    cell = np.asarray(batch.cell)
    natoms = np.asarray(batch.natoms)
    pos_rel = np.asarray(batch.pos_relaxed)
    forces = None if batch.forces is None else np.asarray(batch.forces)
    for i in range(batch.batch_size):
        k = int(natoms[i])
        out.append(
            System(
                pos=pos[i, :k],
                atomic_numbers=z[i, :k],
                tags=tags[i, :k],
                fixed=fixed[i, :k],
                cell=cell[i],
                sid=int(batch.sid[i]),
                fid=int(batch.fid[i]),
                energy=float(batch.energy[i]),
                y_relaxed=float(batch.y_relaxed[i]),
                pos_relaxed=pos_rel[i, :k],
                forces=None if forces is None else forces[i, :k],
            )
        )
    return out
