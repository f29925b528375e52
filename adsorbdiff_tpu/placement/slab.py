"""Slab construction: tiling, surface tagging, constraints, slab cutting with
termination/shift enumeration.

Rebuild of the reference slab toolkit (ref: adsorbdiff/placement/slab.py).
The reference enumerates terminations with pymatgen's SlabGenerator
(slab.py:485-554); pymatgen is not installed here, so:

- :func:`compute_slabs` implements a from-scratch integer-lattice Miller-plane
  cutter (in-plane basis from the nullspace of (h,k,l) over Z, stacking vector
  from a Bezout solution, rotate plane->xy, add vacuum) with pymatgen-free
  **termination enumeration**: candidate cut shifts are the midpoints between
  clustered atomic c-planes of the oriented unit cell (the same rule as
  SlabGenerator._calculate_possible_shifts with tol=0.3 Å), duplicate
  terminations are collapsed by a (Z, depth-from-top) fingerprint, and — as in
  the reference (slab.py:540-551) — slabs whose bottom termination differs
  from the top are additionally emitted flipped with ``top=False``.  The
  fingerprint ignores in-plane arrangement; two terminations with identical
  composition-vs-depth profiles but different lateral patterns would merge
  (not observed for the simple lattices tested).
- tiling (tile_atoms min_ab=8, ref: :324-348), height-based surface tagging
  (within 2 Å of the top, ref: :350-383), and tag-0 FixAtoms constraints
  (ref: :253-281) are ported exactly; the Voronoi-refined tagging path
  (ref: :385-438) requires the bulk reference structure and pymatgen — a
  coordination-count variant using our covalent connectivity is provided.
"""
from __future__ import annotations

import math
from math import gcd
from typing import List, Optional, Tuple

import numpy as np

from adsorbdiff_tpu.placement.flag_anomaly import connectivity_matrix
from adsorbdiff_tpu.runtime.atoms import Atoms


class Slab:
    """A tagged, constrained surface (ref: slab.py:44-224)."""

    def __init__(self, atoms: Atoms, bulk=None, millers: Optional[Tuple[int, int, int]] = None,
                 shift: float = 0.0, top: bool = True) -> None:
        self.atoms = atoms
        self.bulk = bulk
        self.millers = millers
        self.shift = shift
        self.top = top

    @classmethod
    def from_atoms(cls, atoms: Atoms, bulk=None, **kwargs) -> "Slab":
        """Tag+constrain a custom slab (ref: slab.py:188-190)."""
        return cls(set_fixed_atom_constraints(tag_surface_atoms(atoms)), bulk=bulk, **kwargs)

    @classmethod
    def from_bulk_get_specific_millers(cls, specific_millers, bulk, min_ab: float = 8.0) -> List["Slab"]:
        """ref: slab.py:100-134."""
        slabs = []
        for atoms, shift, top in compute_slabs(bulk.atoms, millers=specific_millers):
            tiled = tile_and_tag_atoms(atoms, min_ab=min_ab)
            slabs.append(cls(tiled, bulk=bulk, millers=specific_millers, shift=shift, top=top))
        return slabs

    @classmethod
    def from_bulk_get_random_slab(cls, bulk, max_miller: int = 2, min_ab: float = 8.0,
                                  rng: Optional[np.random.Generator] = None) -> "Slab":
        """ref: slab.py:75-98."""
        rng = rng or np.random.default_rng()
        millers = enumerate_millers(max_miller)
        choice = millers[int(rng.integers(len(millers)))]
        return cls.from_bulk_get_specific_millers(choice, bulk, min_ab)[0]

    def has_surface_tagged(self) -> bool:
        return bool((np.asarray(self.atoms.tags) == 1).any())

    def get_metadata_dict(self) -> dict:
        return {
            "slab_atomsobject": self.atoms,
            "slab_metadata": {
                "bulk_id": getattr(self.bulk, "src_id", None),
                "millers": self.millers,
                "shift": self.shift,
                "top": self.top,
            },
        }

    def __len__(self) -> int:
        return len(self.atoms)

    def __repr__(self) -> str:
        return f"Slab: (natoms={len(self)}, millers={self.millers})"


def enumerate_millers(max_miller: int) -> List[Tuple[int, int, int]]:
    """Symmetrically-distinct-ish Miller indices up to max index (the reference
    defers dedup to pymatgen's get_symmetrically_distinct_miller_indices;
    here: coprime, first nonzero positive)."""
    out = []
    r = range(-max_miller, max_miller + 1)
    for h in r:
        for k in r:
            for l in r:
                if (h, k, l) == (0, 0, 0):
                    continue
                if gcd(gcd(abs(h), abs(k)), abs(l)) != 1:
                    continue
                first = next(x for x in (h, k, l) if x != 0)
                if first < 0:
                    continue
                out.append((h, k, l))
    return sorted(set(out))


def _ext_gcd(a: int, b: int) -> Tuple[int, int, int]:
    if b == 0:
        return a, 1, 0
    g, x, y = _ext_gcd(b, a % b)
    return g, y, x - (a // b) * y


def _plane_basis(millers: Tuple[int, int, int]) -> np.ndarray:
    """Integer basis (v1, v2 in plane, v3 with v3.(hkl)=1) — the standard
    surface-cell construction (same construction ase.build.surface uses)."""
    h, k, l = millers
    if h == 0 and k == 0:  # (0,0,l) -> trivial
        return np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1 if l > 0 else -1]])
    if h == 0 and l == 0:
        return np.array([[0, 0, 1], [1, 0, 0], [0, 1 if k > 0 else -1, 0]])
    if k == 0 and l == 0:
        return np.array([[0, 1, 0], [0, 0, 1], [1 if h > 0 else -1, 0, 0]])
    g_hk, p, q = _ext_gcd(h, k)
    # v1 = (k/g, -h/g, 0) is in-plane
    v1 = np.array([k // g_hk, -h // g_hk, 0])
    # find v2 in plane independent of v1: solve (p*h + q*k) = g_hk; combine with l
    g_all, a, b = _ext_gcd(g_hk, l)
    # (p*a, q*a, b) . (h,k,l) = a*g_hk + b*l = g_all -> stacking direction v3
    v3 = np.array([p * a, q * a, b])
    # v2: in-plane vector independent of v1: (p*l, q*l, -g_hk)/? check dot:
    v2 = np.array([p * l, q * l, -g_hk])
    assert v1 @ np.array(millers) == 0 and v2 @ np.array(millers) == 0
    assert v3 @ np.array(millers) == g_all
    return np.stack([v1, v2, v3])


def _oriented_cell_atoms(bulk_atoms: Atoms, millers: Tuple[int, int, int]):
    """Oriented unit cell for a Miller plane + the bulk atoms inside it
    (fractional coords in that cell)."""
    basis = _plane_basis(millers)
    cell = np.asarray(bulk_atoms.cell, np.float64)
    new_cell = basis.astype(np.float64) @ cell  # rows

    # gather bulk atoms inside the transformed cell (supercell sweep)
    frac_bulk = np.asarray(bulk_atoms.positions) @ np.linalg.inv(cell)
    reach = int(np.ceil(np.abs(basis).sum())) + 1
    shifts = np.stack(
        np.meshgrid(*[np.arange(-reach, reach + 1)] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    all_frac = (frac_bulk[None] + shifts[:, None]).reshape(-1, 3)
    all_numbers = np.tile(np.asarray(bulk_atoms.numbers), len(shifts))
    cart = all_frac @ cell
    new_frac = cart @ np.linalg.inv(new_cell)
    inside = np.all((new_frac > -1e-9) & (new_frac < 1 - 1e-9), axis=1)
    return new_cell, new_frac[inside], all_numbers[inside]


def _possible_shifts(c_frac: np.ndarray, height: float, tol: float = 0.3) -> List[float]:
    """Candidate cut positions: fractional-c midpoints of the gaps between
    clustered atomic c-planes of the oriented cell — the SlabGenerator shift
    rule, pymatgen-free (ref: slab.py:527-537 get_slabs(tol=0.3))."""
    frac_tol = tol / max(height, 1e-9)
    cs = np.sort(np.asarray(c_frac, np.float64) % 1.0)
    clusters: List[List[float]] = [[cs[0]]]
    for c in cs[1:]:
        if c - clusters[-1][-1] < frac_tol:
            clusters[-1].append(c)
        else:
            clusters.append([c])
    # periodic wraparound: merge last into first
    if len(clusters) > 1 and (cs[0] + 1.0 - clusters[-1][-1]) < frac_tol:
        clusters[0] = [c - 1.0 for c in clusters.pop()] + clusters[0]
    means = sorted(float(np.mean(cl)) % 1.0 for cl in clusters)
    if len(means) == 1:
        return [(means[0] + 0.5) % 1.0]
    mids = [(means[i] + means[i + 1]) / 2.0 for i in range(len(means) - 1)]
    mids.append(((means[-1] + means[0] + 1.0) / 2.0) % 1.0)
    return mids


def _build_slab(new_cell: np.ndarray, new_frac: np.ndarray, numbers: np.ndarray,
                shift: float, layers: int, vacuum: float) -> Atoms:
    """Stack ``layers`` periods of the oriented cell cut at fractional-c
    ``shift``, rotate plane->xy, add vacuum."""
    frac = new_frac.copy()
    frac[:, 2] = (frac[:, 2] - shift) % 1.0
    stacked_frac = np.concatenate([frac + [0, 0, i] for i in range(layers)])
    stacked_numbers = np.tile(numbers, layers)
    slab_cell = new_cell.copy()
    slab_cell[2] *= layers
    pos = stacked_frac / [1, 1, layers] @ slab_cell

    # rotate so that (a x b) -> +z and a -> x axis
    a, b = slab_cell[0], slab_cell[1]
    n = np.cross(a, b)
    ez = n / np.linalg.norm(n)
    ex = a / np.linalg.norm(a)
    ey = np.cross(ez, ex)
    rot = np.stack([ex, ey, ez])  # world->slab frame rows
    pos = pos @ rot.T
    slab_cell = slab_cell @ rot.T
    if slab_cell[2, 2] < 0:  # keep +z stacking
        pos[:, 2] *= -1
        slab_cell[2] *= -1
        pos += slab_cell[2]
    pos[:, 2] -= pos[:, 2].min()
    slab_cell[2] = [0, 0, pos[:, 2].max() + vacuum]
    return Atoms(positions=pos, numbers=stacked_numbers, cell=slab_cell, pbc=(True, True, False))


def termination_fingerprint(atoms: Atoms, decimals: int = 1) -> tuple:
    """(species, depth-from-top) multiset — invariant under in-plane
    translation/rotation; used to collapse duplicate terminations."""
    z = np.asarray(atoms.positions)[:, 2]
    rel = np.round(z.max() - z, decimals)
    return tuple(sorted(zip(rel.tolist(), np.asarray(atoms.numbers).tolist())))


def flip_slab(atoms: Atoms) -> Atoms:
    """Proper 180° rotation about the a-axis so the bottom faces up
    (ref: slab.py flip_struct :556-581 — rotation, not a mirror, so chirality
    is preserved)."""
    rot180x = np.diag([1.0, -1.0, -1.0])
    pos = np.asarray(atoms.positions, np.float64) @ rot180x
    cell = np.asarray(atoms.cell, np.float64) @ rot180x
    if cell[2, 2] < 0:
        cell[2] = -cell[2]
    if np.cross(cell[0], cell[1])[2] < 0:
        cell[1] = -cell[1]
    # wrap in-plane into the fixed cell, zero the base height
    frac = pos @ np.linalg.inv(cell)
    frac[:, :2] %= 1.0
    pos = frac @ cell
    pos[:, 2] -= pos[:, 2].min()
    return Atoms(positions=pos, numbers=np.asarray(atoms.numbers).copy(), cell=cell,
                 tags=np.asarray(atoms.tags).copy(), pbc=atoms.pbc)


def compute_slabs(
    bulk_atoms: Atoms,
    millers: Tuple[int, int, int] = (1, 1, 1),
    layers: int = 3,
    vacuum: float = 15.0,
    tol: float = 0.3,
) -> List[Tuple[Atoms, float, bool]]:
    """Enumerate the distinct terminations of a Miller plane
    (ref: slab.py:485-554, pymatgen SlabGenerator.get_slabs(tol=0.3) +
    flipped bottoms when not invertible).  Returns [(atoms, shift, top)]."""
    new_cell, new_frac, numbers = _oriented_cell_atoms(bulk_atoms, millers)
    n_hat = np.cross(new_cell[0], new_cell[1])
    n_hat /= np.linalg.norm(n_hat)
    height = abs(float(new_cell[2] @ n_hat))

    out: List[Tuple[Atoms, float, bool]] = []
    seen = set()
    for shift in _possible_shifts(new_frac[:, 2], height, tol):
        atoms = _build_slab(new_cell, new_frac, numbers, shift, layers, vacuum)
        fp_top = termination_fingerprint(atoms)
        if fp_top in seen:
            continue
        seen.add(fp_top)
        out.append((atoms, float(shift), True))
        # bottom differs from top -> emit it flipped (ref: slab.py:540-551)
        flipped = flip_slab(atoms)
        fp_bot = termination_fingerprint(flipped)
        if fp_bot != fp_top and fp_bot not in seen:
            seen.add(fp_bot)
            out.append((flipped, float(shift), False))
    return out


def tile_and_tag_atoms(slab_atoms: Atoms, min_ab: float = 8.0) -> Atoms:
    """tile -> tag -> constrain (ref: slab.py:226-251)."""
    return set_fixed_atom_constraints(tile_atoms(tag_surface_atoms(slab_atoms), min_ab=min_ab))


def tile_atoms(atoms: Atoms, min_ab: float = 8.0) -> Atoms:
    """Repeat along a/b until both span >= min_ab (ref: slab.py:324-348)."""
    cell = np.asarray(atoms.cell, np.float64)
    na = int(math.ceil(min_ab / np.linalg.norm(cell[0])))
    nb = int(math.ceil(min_ab / np.linalg.norm(cell[1])))
    reps = [(i, j) for i in range(na) for j in range(nb)]
    pos = np.concatenate([atoms.positions + i * cell[0] + j * cell[1] for i, j in reps])
    tile = lambda x: np.tile(np.asarray(x), len(reps))  # noqa: E731
    new_cell = cell.copy()
    new_cell[0] *= na
    new_cell[1] *= nb
    return Atoms(
        positions=pos, numbers=tile(atoms.numbers), cell=new_cell,
        tags=tile(atoms.tags), fixed=tile(atoms.fixed), pbc=atoms.pbc,
    )


def find_surface_atoms_by_height(surface_atoms: Atoms) -> np.ndarray:
    """Surface = within 2 Å (fractionally) of the top atom (ref: slab.py:350-383)."""
    cell = np.asarray(surface_atoms.cell, np.float64)
    unit_cell_height = np.linalg.norm(cell[2])
    scaled = surface_atoms.positions @ np.linalg.inv(cell)
    threshold = scaled[:, 2].max() - 2.0 / unit_cell_height
    return (scaled[:, 2] >= threshold).astype(np.int64)


def find_surface_atoms_by_coordination(slab_atoms: Atoms, bulk_coordination: Optional[dict] = None) -> np.ndarray:
    """Coordination-count refinement of the height heuristic — an ase/pymatgen-
    free stand-in for the Voronoi method (ref: slab.py:385-438): an atom is
    'surface' if its covalent coordination is below the maximum coordination of
    its species within the slab interior."""
    conn = connectivity_matrix(slab_atoms.positions, slab_atoms.numbers, slab_atoms.cell, (True, True, False))
    coord = conn.sum(1)
    numbers = np.asarray(slab_atoms.numbers)
    tags = np.zeros(len(numbers), np.int64)
    for z in np.unique(numbers):
        m = numbers == z
        ref = bulk_coordination.get(int(z)) if bulk_coordination else coord[m].max()
        tags[m] = (coord[m] < ref).astype(np.int64)
    # intersect with height: only top-half atoms can be surface
    cell = np.asarray(slab_atoms.cell, np.float64)
    scaled_z = (slab_atoms.positions @ np.linalg.inv(cell))[:, 2]
    tags[scaled_z < np.median(scaled_z)] = 0
    return tags


def tag_surface_atoms(slab_atoms: Atoms, bulk_atoms: Optional[Atoms] = None) -> Atoms:
    """Tag 1 = surface, 0 = subsurface (ref: slab.py:284-322).

    With ``bulk_atoms``, height tags are refined by the Voronoi weighted-CN
    under-coordination rule (placement/voronoi.py — the reference's pymatgen
    VoronoiNN method rebuilt on scipy.spatial)."""
    from adsorbdiff_tpu.placement.voronoi import find_surface_atoms_with_voronoi_given_height

    out = slab_atoms.copy()
    tags = find_surface_atoms_by_height(out)
    if bulk_atoms is not None:
        tags = find_surface_atoms_with_voronoi_given_height(bulk_atoms, out, tags)
    out.tags = tags
    return out


def set_fixed_atom_constraints(atoms: Atoms) -> Atoms:
    """Fix all tag-0 atoms (ref: slab.py:253-281)."""
    out = atoms.copy()
    out.fixed = (np.asarray(out.tags) == 0)
    return out
