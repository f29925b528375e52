"""PaiNN: shapes, SO(3) equivariance, padding invariance (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from adsorbdiff_tpu.data.schema import System, collate
from adsorbdiff_tpu.models.painn import PaiNN


def make_batch(rng, n_atoms=20, n_pad=24, b=2, seed_shift=0.0):
    systems = []
    for i in range(b):
        cell = np.diag([8.0, 8.5, 26.0]).astype(np.float32)
        frac = rng.random((n_atoms, 3)) * [1, 1, 0.3]
        pos = (frac @ cell + seed_shift).astype(np.float32)
        z = rng.integers(1, 60, n_atoms)
        tags = np.zeros(n_atoms, np.int32)
        tags[-4:] = 2  # last 4 atoms are the adsorbate
        tags[8:16] = 1
        fixed = tags == 0
        systems.append(System(pos=pos, atomic_numbers=z, cell=cell, tags=tags, fixed=fixed, sid=i, energy=0.5 * i))
    return collate(systems, max_atoms=n_pad)


MODEL_KW = dict(hidden_channels=64, num_layers=2, num_rbf=16, cutoff=6.0, max_neighbors=20, cell_reps=(1, 1, 0))


@pytest.fixture(scope="module")
def model_and_params():
    model = PaiNN(**MODEL_KW, so3_denoising=True)
    rng = np.random.default_rng(3)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch)
    return model, variables


def test_forward_shapes(model_and_params, rng):
    model, variables = model_and_params
    batch = make_batch(rng)
    f1, f2 = model.apply(variables, batch)
    assert f1.shape == (2, 24, 3) and f2.shape == (2, 24, 3)
    # padded rows are exactly zero
    assert np.abs(np.asarray(f1)[:, 20:]).max() == 0
    assert np.isfinite(np.asarray(f1)).all()


def test_rotation_equivariance(model_and_params, rng):
    model, variables = model_and_params
    batch = make_batch(rng)
    r = Rotation.random(random_state=7).as_matrix().astype(np.float32)

    f1, f2 = model.apply(variables, batch)
    rot_batch = batch.replace(
        pos=jnp.einsum("bnd,ed->bne", batch.pos, jnp.asarray(r)),
        pos_relaxed=jnp.einsum("bnd,ed->bne", batch.pos_relaxed, jnp.asarray(r)),
        cell=jnp.einsum("bnd,ed->bne", batch.cell, jnp.asarray(r)),
    )
    g1, g2 = model.apply(variables, rot_batch)
    want1 = np.einsum("bnd,ed->bne", np.asarray(f1), r)
    want2 = np.einsum("bnd,ed->bne", np.asarray(f2), r)
    np.testing.assert_allclose(np.asarray(g1), want1, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g2), want2, atol=2e-4)


def test_translation_and_pbc_invariance(model_and_params, rng):
    model, variables = model_and_params
    batch = make_batch(rng)
    f1, _ = model.apply(variables, batch)
    # rigid translation
    shifted = batch.replace(pos=batch.pos + jnp.asarray([1.3, -0.7, 2.1]))
    g1, _ = model.apply(variables, shifted)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(f1), atol=2e-4)
    # lattice translation of a single atom (periodic image); one cell keeps
    # all its neighbors within the rep range, same assumption as the reference
    pos = np.asarray(batch.pos).copy()
    pos[0, 5] += np.asarray(batch.cell)[0, 0]
    h1, _ = model.apply(variables, batch.replace(pos=jnp.asarray(pos)))
    np.testing.assert_allclose(np.asarray(h1), np.asarray(f1), atol=2e-4)


def test_padding_invariance(rng):
    model = PaiNN(**MODEL_KW, so3_denoising=False)
    b24 = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), b24)
    rng2 = np.random.default_rng(11)
    b24 = make_batch(rng2)
    rng2 = np.random.default_rng(11)
    b40 = make_batch(rng2, n_pad=40)
    f24 = model.apply(variables, b24)
    f40 = model.apply(variables, b40)
    np.testing.assert_allclose(np.asarray(f40)[:, :24], np.asarray(f24), atol=1e-5)


def test_s2ef_mode_energy_invariant(rng):
    model = PaiNN(**MODEL_KW, mode="s2ef", so3_denoising=False)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(1), batch)
    out = model.apply(variables, batch)
    assert out["energy"].shape == (2,) and out["forces"].shape == (2, 24, 3)
    r = jnp.asarray(Rotation.random(random_state=5).as_matrix().astype(np.float32))
    rot = batch.replace(
        pos=jnp.einsum("bnd,ed->bne", batch.pos, r),
        cell=jnp.einsum("bnd,ed->bne", batch.cell, r),
    )
    out_r = model.apply(variables, rot)
    np.testing.assert_allclose(np.asarray(out_r["energy"]), np.asarray(out["energy"]), atol=2e-4)


def test_energy_conditioning_changes_output(rng):
    model = PaiNN(**MODEL_KW, so3_denoising=False, energy_encoding="scalar")
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(2), batch)
    f_a = model.apply(variables, batch)
    f_b = model.apply(variables, batch.replace(energy=batch.energy + 3.0))
    assert np.abs(np.asarray(f_a) - np.asarray(f_b)).max() > 1e-6
    # sampling=True zeroes the conditioning (ref: eqv2_denoising.py:261-263)
    model_s = PaiNN(**MODEL_KW, so3_denoising=False, energy_encoding="scalar", sampling=True)
    f_c = model_s.apply(variables, batch)
    f_d = model_s.apply(variables, batch.replace(energy=batch.energy + 3.0))
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_d), atol=0)
