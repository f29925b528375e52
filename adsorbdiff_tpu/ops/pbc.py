"""Fixed-shape periodic-boundary geometry kernels.

TPU-native replacement for the reference's dynamic-shape PBC machinery:

- ``radius_graph_pbc`` (ref: adsorbdiff/utils/utils.py:556-730 +
  ``get_max_neighbors_mask`` :733-853): instead of variable-length edge lists
  built with masked_select + torch_scatter, we emit a *fixed* ``[N, K]``
  neighbor table per system (K = max_neighbors), selecting the K nearest
  in-radius periodic images per target atom with ``lax.top_k``.  Every
  train/sample/relax step therefore compiles once and runs with static shapes.
- ``get_pbc_distances`` (ref: utils.py:513-553) is folded into the neighbor
  table: we return displacement vectors and distances directly.
- the torus wrap "double-mod fractional trick" used by the noise schedule and
  sampler (ref: adsorbdiff/trainers/sde_denoising_trainer.py:45-64,
  relaxation/diffusers/denoising_torch.py:296-310) as ``frac_wrap_center`` /
  ``wrap_positions``.
- ``min_image_diff`` — minimum-image displacement for DwT metrics
  (ref: adsorbdiff/modules/evaluator.py:266-283, scripts/eval.py:765-777).

Design notes / deliberate divergences (documented per SURVEY.md §7):

- Neighbor cap semantics: the reference's NON-default path keeps the K
  nearest neighbors *plus* ties within a 0.01 Å² degeneracy tolerance, which
  yields data-dependent edge counts (ref: utils.py:809-837).  We use the
  strict top-K — which is also what the published reference runs actually
  use: ``enforce_max_neighbors_strictly`` defaults to True (ref:
  models/base.py:56, gemnet_oc.py:221, equiformer_v2_oc20.py:164) and no
  shipped config overrides it, with ties at the K-th distance broken
  arbitrarily on both sides (ref docstring, equiformer_v2_oc20.py:112).  So
  the production paths agree; pass a larger ``max_neighbors`` to recover the
  degenerate tail where the cap binds (quantified on a >50-in-radius FCC
  fixture in tests/test_pbc.py::test_neighbor_cap_binding_dense_crystal).
- Edge symmetrization (ref: models/painn/painn_denoising.py:184-351) is not
  replicated: it exists only because the reference's asymmetric cap loses
  counter-edges.  Our builder caps per *target* atom deterministically; the
  message-passing models consume the ``[N, K]`` table directly.

Cell convention: rows of ``cell`` are the lattice vectors (a1, a2, a3), same
as the reference / ASE (cartesian = fractional @ cell).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class NeighborList(NamedTuple):
    """Fixed-shape PBC neighbor table for one system (or batch-leading).

    For target atom ``i`` and slot ``k``: the source atom is ``src[i, k]``,
    displaced by integer cell offset ``cell_offsets[i, k]``; the displacement
    ``vec[i, k] = pos[src] + offsets @ cell - pos[i]`` points from the target
    to the (periodic image of the) source, matching the reference convention
    (ref: utils.py:513-553, painn_denoising.py:363-368).
    """

    src: jnp.ndarray  # [*, N, K] int32
    cell_offsets: jnp.ndarray  # [*, N, K, 3] int32
    vec: jnp.ndarray  # [*, N, K, 3] float
    dist: jnp.ndarray  # [*, N, K] float
    mask: jnp.ndarray  # [*, N, K] bool


def compute_cell_reps(cell: np.ndarray, radius: float, pbc: Sequence[bool] = (True, True, True)) -> Tuple[int, int, int]:
    """Host-side: per-axis unit-cell replication counts for a radius cutoff.

    Same reciprocal-vector geometry as the reference (ref: utils.py:627-662):
    the plane spacing along a1 is 1/||(a2 x a3)/V||, so ceil(radius / spacing)
    images are needed.  Call with the max cell over a bucket/dataset and treat
    the result as a static compile-time constant.
    """
    cell = np.asarray(cell, dtype=np.float64)
    if cell.ndim == 3:
        return tuple(  # type: ignore[return-value]
            int(max(compute_cell_reps(c, radius, pbc)[i] for c in cell)) for i in range(3)
        )
    cross = [
        np.cross(cell[1], cell[2]),
        np.cross(cell[2], cell[0]),
        np.cross(cell[0], cell[1]),
    ]
    vol = abs(float(np.dot(cell[0], cross[0])))
    reps = []
    for axis in range(3):
        if pbc[axis]:
            inv_min_dist = float(np.linalg.norm(cross[axis] / vol))
            reps.append(int(np.ceil(radius * inv_min_dist)))
        else:
            reps.append(0)
    return tuple(reps)  # type: ignore[return-value]


def auto_cell_reps(
    positions: Sequence[np.ndarray],
    cells: Sequence[np.ndarray],
    radius: float,
) -> Tuple[int, int, int]:
    """Host-side: dataset-resolved replication counts with vacuum pruning.

    Per system, start from the reciprocal-geometry counts
    (:func:`compute_cell_reps`), then drop an axis entirely when the occupied
    fractional band leaves a cross-image gap larger than ``radius`` along that
    axis' plane normal — e.g. an OC20 slab's z-vacuum exceeds any sane cutoff,
    so z-images can never be neighbors (3x fewer graph candidates; the same
    exactness argument the sampling benches document).  The result is the
    elementwise max over systems, safe as a static compile-time constant for
    the whole dataset.  Conservative by construction: wrap-straddling atom
    bands only overestimate the extent, which keeps the images.
    """
    reps = [0, 0, 0]
    for pos, cell in zip(positions, cells):
        cell = np.asarray(cell, np.float64)
        pos = np.asarray(pos, np.float64)
        r = list(compute_cell_reps(cell, radius))
        cross = [
            np.cross(cell[1], cell[2]),
            np.cross(cell[2], cell[0]),
            np.cross(cell[0], cell[1]),
        ]
        vol = abs(float(np.dot(cell[0], cross[0])))
        frac = np.linalg.solve(cell.T, pos.T).T % 1.0
        for ax in range(3):
            if r[ax] == 0 or len(pos) == 0:
                continue
            spacing = vol / float(np.linalg.norm(cross[ax]))  # plane spacing
            extent = float(frac[:, ax].max() - frac[:, ax].min())
            # min separation along the axis normal between home and image atoms
            if spacing * (1.0 - extent) > radius:
                r[ax] = 0
        reps = [max(a, b) for a, b in zip(reps, r)]
    return tuple(reps)  # type: ignore[return-value]


def _two_stage_top_k(x: jnp.ndarray, k: int, chunk: int = 1024) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the last axis via per-chunk top-k + merge.

    Equivalent to ``jax.lax.top_k(x, k)`` (largest first) but much faster when
    the candidate axis is long: each chunk keeps at most k survivors, so the
    final sort runs over ``ceil(L/chunk) * k`` instead of ``L`` elements.
    """
    l = x.shape[-1]
    if l <= max(2 * k, chunk):
        return jax.lax.top_k(x, k)
    g = -(-l // chunk)
    pad = g * chunk - l
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)], constant_values=-jnp.inf)
    xc = x.reshape(x.shape[:-1] + (g, chunk))
    vals, idx = jax.lax.top_k(xc, min(k, chunk))  # [..., G, k]
    base = (jnp.arange(g) * chunk)[:, None]
    idx = idx + base
    vals = vals.reshape(vals.shape[:-2] + (-1,))
    idx = idx.reshape(idx.shape[:-2] + (-1,))
    top_vals, sel = jax.lax.top_k(vals, k)
    return top_vals, jnp.take_along_axis(idx, sel, axis=-1)


def _offset_grid(reps: Tuple[int, int, int]) -> np.ndarray:
    """Integer offset lattice [-r, r]^3 -> [C, 3] (ref: utils.py:664-669)."""
    axes = [np.arange(-r, r + 1, dtype=np.int32) for r in reps]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    # Put the home cell (0,0,0) first so self-image masking is cheap to reason about.
    home = np.all(grid == 0, axis=1)
    return np.concatenate([grid[home], grid[~home]], axis=0)


@functools.partial(jax.jit, static_argnames=("max_neighbors", "reps", "radius"))
def radius_graph_pbc(
    pos: jnp.ndarray,
    cell: jnp.ndarray,
    atom_mask: jnp.ndarray,
    *,
    radius: float,
    max_neighbors: int,
    reps: Tuple[int, int, int],
) -> NeighborList:
    """Fixed-shape PBC radius graph for one padded system.

    Args:
      pos: [N, 3] cartesian positions (padded rows arbitrary).
      cell: [3, 3] lattice vectors as rows.
      atom_mask: [N] bool, True for real atoms.
      radius: cutoff (Å). Static.
      max_neighbors: K, static neighbor cap per target atom.
      reps: static per-axis image counts (from :func:`compute_cell_reps`).

    Returns a :class:`NeighborList`. vmap over the leading batch axis for
    batched graphs.
    """
    n = pos.shape[0]
    k = max_neighbors
    offsets_int = jnp.asarray(_offset_grid(reps))  # [C, 3]
    c = offsets_int.shape[0]
    offsets_cart = offsets_int.astype(pos.dtype) @ cell  # [C, 3]

    # Candidate displacement for (target i, source j, image c):
    #   pos[j] + off[c] - pos[i]
    src_img = pos[None, :, None, :] + offsets_cart[None, None, :, :]  # [1, N, C, 3]
    diff = src_img - pos[:, None, None, :]  # [N, N, C, 3]
    d2 = jnp.sum(diff * diff, axis=-1)  # [N, N, C]

    valid = atom_mask[:, None, None] & atom_mask[None, :, None]
    # Reference removes pairs with d^2 <= 1e-4 (self images and coincident
    # atoms, ref: utils.py:700-702) and pairs beyond the radius.
    valid &= d2 > 1.0e-4
    valid &= d2 <= radius * radius

    big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
    d2_flat = jnp.where(valid, d2, big).reshape(n, n * c)

    # K nearest periodic images per target atom (strict cap; see module doc).
    # XLA's top_k degrades to a full sort over the candidate axis; for the
    # typical n*c of several thousand a two-stage exact top-k (per-chunk
    # top-k, then top-k over the survivors) is several times faster on TPU.
    neg_top, flat_idx = _two_stage_top_k(-d2_flat, k)  # [N, K]
    src = (flat_idx // c).astype(jnp.int32)
    img = flat_idx % c
    mask = (-neg_top) < big  # only in-radius, valid candidates survive

    cell_offsets = offsets_int[img]  # [N, K, 3]
    vec = pos[src] + cell_offsets.astype(pos.dtype) @ cell - pos[:, None, :]
    dist = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
    # Neutralize padded slots (src=0 gathers are harmless but keep vec finite).
    vec = jnp.where(mask[..., None], vec, 0.0)
    dist = jnp.where(mask, dist, 0.0)
    src = jnp.where(mask, src, 0)
    return NeighborList(src=src, cell_offsets=cell_offsets, vec=vec, dist=dist, mask=mask)


class StaticGraphPart(NamedTuple):
    """Precomputed slab-source neighbor candidates for incremental rebuilds.

    During diffusion sampling only the (few) adsorbate atoms move; slab-slab
    geometry — >90% of all edges — is constant across the whole 100-step
    trajectory (ref structure being beaten: denoising_torch.py:198-367 rebuilds
    the entire graph every step).  ``neg_d2``/``flat_idx`` hold each SLAB
    target's K nearest slab-source periodic images in the full builder's
    encoding (flat candidate index = src * n_images + image); adsorbate-target
    rows are all-invalid (they are refreshed every step).
    """

    neg_d2: jnp.ndarray  # [*, N, K] -d^2 of static candidates (-big = invalid)
    flat_idx: jnp.ndarray  # [*, N, K] int32 flat candidate index


@functools.partial(jax.jit, static_argnames=("max_neighbors", "reps", "radius"))
def slab_static_topk(
    pos: jnp.ndarray,
    cell: jnp.ndarray,
    atom_mask: jnp.ndarray,
    ads_mask: jnp.ndarray,
    *,
    radius: float,
    max_neighbors: int,
    reps: Tuple[int, int, int],
) -> StaticGraphPart:
    """Static part of the incremental graph: slab targets x slab sources."""
    n = pos.shape[0]
    k = max_neighbors
    offsets_int = jnp.asarray(_offset_grid(reps))
    c = offsets_int.shape[0]
    offsets_cart = offsets_int.astype(pos.dtype) @ cell

    slab = atom_mask & jnp.logical_not(ads_mask)
    src_img = pos[None, :, None, :] + offsets_cart[None, None, :, :]
    diff = src_img - pos[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)  # [N, N, C]
    valid = slab[:, None, None] & slab[None, :, None]
    valid &= d2 > 1.0e-4
    valid &= d2 <= radius * radius
    big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
    d2_flat = jnp.where(valid, d2, big).reshape(n, n * c)
    neg_top, flat_idx = _two_stage_top_k(-d2_flat, k)
    return StaticGraphPart(neg_d2=neg_top, flat_idx=flat_idx.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("max_neighbors", "reps", "radius", "max_ads"))
def radius_graph_pbc_incremental(
    pos: jnp.ndarray,
    cell: jnp.ndarray,
    atom_mask: jnp.ndarray,
    ads_mask: jnp.ndarray,
    static: StaticGraphPart,
    *,
    radius: float,
    max_neighbors: int,
    reps: Tuple[int, int, int],
    max_ads: int,
) -> NeighborList:
    """Incremental PBC radius graph: merge the static slab-slab candidates
    with fresh adsorbate-source candidates, and fully refresh the (at most
    ``max_ads``) adsorbate-target rows.

    Exactness: top-K of (top-K(slab sources) ∪ all adsorbate-source
    candidates) equals top-K over all candidates, because the static part
    already keeps K survivors of the slab-only pool and the two pools are
    disjoint — verified against :func:`radius_graph_pbc` in
    tests/test_pbc.py.  Requires the true adsorbate count <= ``max_ads``.
    """
    n = pos.shape[0]
    k = max_neighbors
    a = max_ads
    offsets_int = jnp.asarray(_offset_grid(reps))
    c = offsets_int.shape[0]
    offsets_cart = offsets_int.astype(pos.dtype) @ cell
    big = jnp.asarray(jnp.finfo(pos.dtype).max, pos.dtype)
    r2 = radius * radius

    # fixed-size adsorbate index set (top_k picks mask==1 rows, lowest index first)
    ads_val, ads_idx = jax.lax.top_k(ads_mask.astype(jnp.int32), a)
    ads_valid = ads_val > 0  # [A]
    ads_pos = pos[ads_idx]  # [A, 3]

    # 1) full refresh of adsorbate-target rows: all sources, all images
    src_img = pos[None, :, None, :] + offsets_cart[None, None, :, :]  # [1, N, C, 3]
    diff_t = src_img - ads_pos[:, None, None, :]  # [A, N, C, 3]
    d2_t = jnp.sum(diff_t * diff_t, axis=-1)
    valid_t = ads_valid[:, None, None] & atom_mask[None, :, None]
    valid_t &= (d2_t > 1.0e-4) & (d2_t <= r2)
    d2_t_flat = jnp.where(valid_t, d2_t, big).reshape(a, n * c)
    neg_t, fidx_t = _two_stage_top_k(-d2_t_flat, k)  # [A, K]

    # 2) fresh adsorbate-source candidates for every target
    ads_img = ads_pos[None, :, None, :] + offsets_cart[None, None, :, :]  # [1, A, C, 3]
    diff_d = ads_img - pos[:, None, None, :]  # [N, A, C, 3]
    d2_d = jnp.sum(diff_d * diff_d, axis=-1)
    valid_d = atom_mask[:, None, None] & ads_valid[None, :, None]
    valid_d &= (d2_d > 1.0e-4) & (d2_d <= r2)
    neg_d = -jnp.where(valid_d, d2_d, big).reshape(n, a * c)
    fidx_d = (ads_idx[:, None] * c + jnp.arange(c)[None, :]).reshape(a * c)
    fidx_d = jnp.broadcast_to(fidx_d[None, :], (n, a * c))

    # 3) merge static + dynamic pools per target (K + A*C candidates)
    cand_neg = jnp.concatenate([static.neg_d2, neg_d], axis=1)
    cand_idx = jnp.concatenate([static.flat_idx, fidx_d.astype(jnp.int32)], axis=1)
    neg_m, sel = jax.lax.top_k(cand_neg, k)
    fidx_m = jnp.take_along_axis(cand_idx, sel, axis=1)

    # 4) overwrite adsorbate-target rows (guard padded A-slots: their ads_idx
    # points at a real atom whose merged row must survive)
    neg_rows = jnp.where(ads_valid[:, None], neg_t, neg_m[ads_idx])
    idx_rows = jnp.where(ads_valid[:, None], fidx_t.astype(jnp.int32), fidx_m[ads_idx])
    neg = neg_m.at[ads_idx].set(neg_rows)
    fidx = fidx_m.at[ads_idx].set(idx_rows)

    # 5) decode to the NeighborList layout (same as radius_graph_pbc)
    src = (fidx // c).astype(jnp.int32)
    img = fidx % c
    mask = (-neg) < big
    cell_offsets = offsets_int[img]
    vec = pos[src] + cell_offsets.astype(pos.dtype) @ cell - pos[:, None, :]
    dist = jnp.sqrt(jnp.maximum(-neg, 0.0))
    vec = jnp.where(mask[..., None], vec, 0.0)
    dist = jnp.where(mask, dist, 0.0)
    src = jnp.where(mask, src, 0)
    return NeighborList(src=src, cell_offsets=cell_offsets, vec=vec, dist=dist, mask=mask)


def slab_static_topk_batched(
    pos: jnp.ndarray,
    cell: jnp.ndarray,
    atom_mask: jnp.ndarray,
    ads_mask: jnp.ndarray,
    *,
    radius: float,
    max_neighbors: int,
    reps: Tuple[int, int, int],
) -> StaticGraphPart:
    """vmapped :func:`slab_static_topk` over a leading system axis."""
    fn = functools.partial(slab_static_topk, radius=radius, max_neighbors=max_neighbors, reps=reps)
    return jax.vmap(fn)(pos, cell, atom_mask, ads_mask)


def radius_graph_pbc_incremental_batched(
    pos: jnp.ndarray,
    cell: jnp.ndarray,
    atom_mask: jnp.ndarray,
    ads_mask: jnp.ndarray,
    static: StaticGraphPart,
    *,
    radius: float,
    max_neighbors: int,
    reps: Tuple[int, int, int],
    max_ads: int,
) -> NeighborList:
    """vmapped :func:`radius_graph_pbc_incremental` over a leading system axis."""
    fn = functools.partial(
        radius_graph_pbc_incremental, radius=radius, max_neighbors=max_neighbors, reps=reps, max_ads=max_ads
    )
    return jax.vmap(fn)(pos, cell, atom_mask, ads_mask, static)


class CandidateTable(NamedTuple):
    """Verlet-style neighbor candidate list for relaxation loops.

    L-BFGS moves atoms by at most ``maxstep`` (0.04 Å) per step, so the
    expensive full builder (top-k over N*images ≈ thousands of candidates,
    ref: utils.py:556-730 rebuilt every reference relax step) can be replaced
    by a cheap refresh over the ``Kc`` nearest *candidates* cached at build
    time.  Exactness: let δ = max single-atom displacement since build.  Any
    candidate NOT in the table was beyond ``d_Kc`` at build and is now beyond
    ``d_Kc - 2δ``; the current K-th nearest is within ``d_K + 2δ``.  So while
    ``4δ < margin = min_rows(d_Kc - d_K)`` the K-nearest-within-radius
    selection over the table equals the full build (same distances, same
    formula — bit-exact away from fp ties).  The relax loop rebuilds via
    ``lax.cond`` when the margin is spent (every ~10+ steps at L-BFGS rates).
    """

    src: jnp.ndarray  # [*, N, Kc] int32 source atom per candidate
    cell_offsets: jnp.ndarray  # [*, N, Kc, 3] int32
    valid: jnp.ndarray  # [*, N, Kc] bool (build-time pair validity)
    pos0: jnp.ndarray  # [*, N, 3] positions at build time
    margin: jnp.ndarray  # [*] min over rows of d_Kc - d_K (inf if table holds all)


@functools.partial(jax.jit, static_argnames=("k_cand", "max_neighbors", "reps"))
def candidate_topk(
    pos: jnp.ndarray,
    cell: jnp.ndarray,
    atom_mask: jnp.ndarray,
    *,
    k_cand: int,
    max_neighbors: int,
    reps: Tuple[int, int, int],
) -> CandidateTable:
    """Build the ``k_cand`` nearest periodic-image candidates per target atom.

    No radius cap — the cutoff is applied at refresh time so the margin
    invariant (see :class:`CandidateTable`) carries the exactness proof.
    """
    n = pos.shape[0]
    offsets_int = jnp.asarray(_offset_grid(reps))
    c = offsets_int.shape[0]
    offsets_cart = offsets_int.astype(pos.dtype) @ cell
    # tiny systems: cap at the candidate count (the table holds everything);
    # refresh still needs >= max_neighbors slots to select from
    k_cand = max(min(k_cand, n * c), max_neighbors)

    src_img = pos[None, :, None, :] + offsets_cart[None, None, :, :]
    diff = src_img - pos[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)  # [N, N, C]
    valid = atom_mask[:, None, None] & atom_mask[None, :, None]
    valid &= d2 > 1.0e-4
    big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
    d2_flat = jnp.where(valid, d2, big).reshape(n, n * c)
    neg_top, flat_idx = _two_stage_top_k(-d2_flat, k_cand)  # [N, Kc]

    vmask = (-neg_top) < big
    d = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
    # margin rows: only rows whose table is FULL can exclude candidates;
    # padded targets and under-full rows contribute +inf
    if k_cand < n * c:
        full = vmask[:, -1] & atom_mask
        row_margin = jnp.where(full, d[:, -1] - d[:, max_neighbors - 1], jnp.inf)
    else:  # the table holds every candidate — nothing can ever be excluded
        row_margin = jnp.full((n,), jnp.inf, d.dtype)
    return CandidateTable(
        src=jnp.where(vmask, (flat_idx // c).astype(jnp.int32), 0),
        cell_offsets=offsets_int[flat_idx % c],
        valid=vmask,
        pos0=pos,
        margin=jnp.min(row_margin),
    )


@functools.partial(jax.jit, static_argnames=("max_neighbors", "radius"))
def refresh_from_candidates(
    pos: jnp.ndarray,
    cell: jnp.ndarray,
    cand: CandidateTable,
    *,
    radius: float,
    max_neighbors: int,
) -> NeighborList:
    """Exact neighbor table from cached candidates at the CURRENT positions.

    Same displacement formula and top-k selection as :func:`radius_graph_pbc`
    restricted to the candidate set, so results are bit-exact while the
    margin invariant holds (fp-tied distances may order differently; the
    choice is equally valid, as in the reference's nondeterministic ties,
    ref: utils.py:809-837).  Cost: O(N*Kc) instead of O(N*N*images).
    """
    k = max_neighbors
    off_cart = cand.cell_offsets.astype(pos.dtype) @ cell  # [N, Kc, 3]
    vec = pos[cand.src] + off_cart - pos[:, None, :]
    d2 = jnp.sum(vec * vec, axis=-1)
    big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
    ok = cand.valid & (d2 > 1.0e-4) & (d2 <= radius * radius)
    neg_top, sel = jax.lax.top_k(-jnp.where(ok, d2, big), k)  # [N, K]
    mask = (-neg_top) < big
    src = jnp.take_along_axis(cand.src, sel, axis=1)
    cell_offsets = jnp.take_along_axis(cand.cell_offsets, sel[..., None], axis=1)
    v = jnp.take_along_axis(vec, sel[..., None], axis=1)
    dist = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
    return NeighborList(
        src=jnp.where(mask, src, 0),
        cell_offsets=cell_offsets,
        vec=jnp.where(mask[..., None], v, 0.0),
        dist=jnp.where(mask, dist, 0.0),
        mask=mask,
    )


def candidate_topk_batched(
    pos: jnp.ndarray,
    cell: jnp.ndarray,
    atom_mask: jnp.ndarray,
    *,
    k_cand: int,
    max_neighbors: int,
    reps: Tuple[int, int, int],
) -> CandidateTable:
    """vmapped :func:`candidate_topk` over a leading system axis."""
    fn = functools.partial(candidate_topk, k_cand=k_cand, max_neighbors=max_neighbors, reps=reps)
    return jax.vmap(fn)(pos, cell, atom_mask)


def refresh_from_candidates_batched(
    pos: jnp.ndarray,
    cell: jnp.ndarray,
    cand: CandidateTable,
    *,
    radius: float,
    max_neighbors: int,
) -> NeighborList:
    """vmapped :func:`refresh_from_candidates` over a leading system axis."""
    fn = functools.partial(refresh_from_candidates, radius=radius, max_neighbors=max_neighbors)
    return jax.vmap(fn)(pos, cell, cand)


def radius_graph_pbc_batched(
    pos: jnp.ndarray,
    cell: jnp.ndarray,
    atom_mask: jnp.ndarray,
    *,
    radius: float,
    max_neighbors: int,
    reps: Tuple[int, int, int],
) -> NeighborList:
    """vmapped :func:`radius_graph_pbc` over a leading system axis."""
    fn = functools.partial(radius_graph_pbc, radius=radius, max_neighbors=max_neighbors, reps=reps)
    return jax.vmap(fn)(pos, cell, atom_mask)


def frac_wrap_center(vec: jnp.ndarray, cell: jnp.ndarray) -> jnp.ndarray:
    """Wrap displacement vectors into the centered unit cell (frac in (-0.5, 0.5]).

    The reference's ``pbc_correction`` double-mod trick
    (ref: sde_denoising_trainer.py:45-64): solve to fractional coords, mod into
    [0, 1), shift >0.5 down by 1, return to cartesian.

    vec: [..., 3]; cell: [..., 3, 3] broadcastable (rows = lattice vectors).
    """
    # fractional f solves f @ cell = vec  <=>  cell^T f^T = vec^T
    frac = jnp.linalg.solve(jnp.swapaxes(cell, -1, -2), vec[..., None])[..., 0]
    frac = jnp.mod(jnp.mod(frac, 1.0), 1.0)
    frac = jnp.where(frac > 0.5, frac - 1.0, frac)
    return jnp.einsum("...i,...ij->...j", frac, cell)


def wrap_positions(pos: jnp.ndarray, cell: jnp.ndarray) -> jnp.ndarray:
    """Wrap absolute positions into the home cell (frac in [0, 1)).

    Used for the sampler's per-step COM wrap (ref: denoising_torch.py:296-310).
    Note a reference inconsistency we deliberately do NOT replicate: the
    trainer's ``pbc_correction`` wraps in the ROW lattice
    (``solve(cell.t(), v.t())``, ref: sde_denoising_trainer.py:54-58) while the
    sampler wraps in the COLUMN lattice (``solve(cell, p)`` then
    ``f @ cell.T``, ref: denoising_torch.py:298-307).  The slab's physical
    periodicity is the row lattice (ASE convention, matching
    ``radius_graph_pbc``'s offsets), so we use rows everywhere:
    solve ``frac @ cell = pos``, wrap frac into [0, 1), return to cartesian.
    """
    frac = jnp.linalg.solve(jnp.swapaxes(cell, -1, -2), pos[..., None])[..., 0]
    frac = jnp.mod(jnp.mod(frac, 1.0), 1.0)
    return jnp.einsum("...i,...ij->...j", frac, cell)


def min_image_diff(pos_pred: jnp.ndarray, pos_target: jnp.ndarray, cell: jnp.ndarray) -> jnp.ndarray:
    """Minimum-image displacement between predicted and target positions.

    Reference ``min_diff`` (ref: modules/evaluator.py:266-283): fractional
    difference wrapped to (-0.5, 0.5] per axis, then back to cartesian.
    """
    return frac_wrap_center(pos_pred - pos_target, cell)
