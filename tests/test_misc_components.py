"""Small inventory components: irreps, transforms, metadata guesser, scaling
fit, torch checkpoint import, LMDB gate."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adsorbdiff_tpu.common.irreps import cg_change_mat, irreps_sum
from adsorbdiff_tpu.data.metadata import guess_target_metadata, uses_extensive
from adsorbdiff_tpu.data.store import ShardDataset, write_shard
from adsorbdiff_tpu.train.scaling import ensure_fitted, fit_scale_factors, load_scales_compat
from adsorbdiff_tpu.train.torch_import import painn_state_dict_to_params
from tests.test_data import rand_system


def test_irreps_sum():
    assert irreps_sum(0) == 1 and irreps_sum(1) == 4 and irreps_sum(2) == 9


def test_cg_change_mat_orthogonal_and_invariant():
    m = cg_change_mat(2)
    np.testing.assert_allclose(m.T @ m, np.eye(9), atol=1e-12)
    # symmetric traceless tensor has no 0e/1e components
    t = np.array([[1.0, 2, 3], [2, -4, 5], [3, 5, 3]])
    dec = t.reshape(9) @ m
    assert abs(dec[0]) < 1e-12  # traceless
    np.testing.assert_allclose(dec[1:4], 0, atol=1e-12)  # symmetric


def test_metadata_guesser(tmp_path, rng):
    systems = []
    for i, n in enumerate(rng.integers(5, 50, 30)):
        s = rand_system(rng, int(n), sid=i)
        s.energy = -2.0 * s.natoms + rng.normal(0, 0.1)  # extensive target
        systems.append(s)
    write_shard(str(tmp_path / "d"), systems)
    ds = ShardDataset({"src": str(tmp_path / "d")})
    meta = guess_target_metadata(ds)
    assert meta["energy"]["extensive"] is True
    assert meta["forces"]["level"] == "atom"
    assert not uses_extensive(rng.normal(5, 0.1, 30), rng.integers(5, 50, 30))


def test_scale_factor_fitting(rng):
    from adsorbdiff_tpu.models.painn import PaiNN
    from tests.test_painn import MODEL_KW, make_batch

    model = PaiNN(**MODEL_KW, so3_denoising=False)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch)
    # all at init: warns (and returns False); without warn it raises like the
    # reference scaling/util.py
    assert not ensure_fitted(variables["scale_factors"], warn=True)
    with pytest.raises(ValueError):
        ensure_fitted(variables["scale_factors"])
    # blow up the scales, fitting should bring activations back toward unit RMS
    bad = jax.tree.map(lambda x: x * 4.0, variables["scale_factors"])
    fitted = fit_scale_factors(model, {"params": variables["params"], "scale_factors": bad}, [batch])
    out_bad = model.apply({"params": variables["params"], "scale_factors": bad}, batch)
    out_fit = model.apply({"params": variables["params"], "scale_factors": fitted}, batch)
    rms = lambda x: float(jnp.sqrt(jnp.mean(x**2)))  # noqa: E731
    assert abs(np.log(rms(out_fit))) < abs(np.log(rms(out_bad)))
    assert ensure_fitted(fitted)


def test_load_scales_compat(tmp_path, rng):
    from adsorbdiff_tpu.models.painn import PaiNN
    from tests.test_painn import MODEL_KW, make_batch

    model = PaiNN(**MODEL_KW, so3_denoising=False)
    variables = model.init(jax.random.PRNGKey(0), make_batch(rng))
    path = str(tmp_path / "scales.npz")
    np.savez(path, **{"upd_out_scalar_scale_0/scale": 2.5})
    loaded = load_scales_compat(variables["scale_factors"], path)
    assert float(loaded["upd_out_scalar_scale_0"]["scale"]) == pytest.approx(2.5)
    assert float(loaded["upd_out_scalar_scale_1"]["scale"]) == pytest.approx(1.0)


def test_torch_import_roundtrip(rng):
    """Build a torch-style state dict FROM our params, import it, and check
    the model reproduces identical outputs — validates the full name map."""
    from adsorbdiff_tpu.models.painn import PaiNN
    from tests.test_painn import MODEL_KW, make_batch

    model = PaiNN(**MODEL_KW, so3_denoising=True)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch)
    p = variables["params"]

    sd = {"atom_emb.embeddings.weight": np.asarray(p["AtomEmbedding_0"]["embeddings"])}
    for i in range(MODEL_KW["num_layers"]):
        m = p[f"message_{i}"]
        sd[f"module.message_layers.{i}.x_layernorm.weight"] = np.asarray(m["LayerNorm_0"]["scale"])
        sd[f"module.message_layers.{i}.x_layernorm.bias"] = np.asarray(m["LayerNorm_0"]["bias"])
        for src, dst in (("x_proj.0", "Dense_0"), ("x_proj.2", "Dense_1"), ("rbf_proj", "Dense_2")):
            sd[f"module.message_layers.{i}.{src}.weight"] = np.asarray(m[dst]["kernel"]).T
            sd[f"module.message_layers.{i}.{src}.bias"] = np.asarray(m[dst]["bias"])
        u = p[f"update_{i}"]
        sd[f"update_layers.{i}.vec_proj.weight"] = np.asarray(u["Dense_0"]["kernel"]).T
        for src, dst in (("xvec_proj.0", "Dense_1"), ("xvec_proj.2", "Dense_2")):
            sd[f"update_layers.{i}.{src}.weight"] = np.asarray(u[dst]["kernel"]).T
            sd[f"update_layers.{i}.{src}.bias"] = np.asarray(u[dst]["bias"])
        sd[f"upd_out_scalar_scale_{i}.scale_factor"] = np.asarray(
            variables["scale_factors"][f"upd_out_scalar_scale_{i}"]["scale"]
        )
    for head in ("out_forces", "out_forces2"):
        for j in range(2):
            blk = p[head][f"GatedEquivariantBlock_{j}"]
            pre = f"{head}.output_network.{j}"
            sd[f"{pre}.vec1_proj.weight"] = np.asarray(blk["Dense_0"]["kernel"]).T
            sd[f"{pre}.vec2_proj.weight"] = np.asarray(blk["Dense_1"]["kernel"]).T
            for src, dst in (("update_net.0", "Dense_2"), ("update_net.2", "Dense_3")):
                sd[f"{pre}.{src}.weight"] = np.asarray(blk[dst]["kernel"]).T
                sd[f"{pre}.{src}.bias"] = np.asarray(blk[dst]["bias"])

    imported = painn_state_dict_to_params(sd, num_layers=MODEL_KW["num_layers"])
    f_ref = model.apply(variables, batch)
    f_imp = model.apply(imported, batch)
    np.testing.assert_allclose(np.asarray(f_imp[0]), np.asarray(f_ref[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_imp[1]), np.asarray(f_ref[1]), atol=1e-6)


def test_lmdb_builtin_backend_used():
    """Without the lmdb package, _iter_lmdb_raw must route through the
    dependency-free lmdbio reader (full coverage in test_lmdb_interop.py)."""
    try:
        import lmdb  # noqa: F401

        pytest.skip("lmdb installed; builtin backend not exercised")
    except ImportError:
        pass
    import os

    from adsorbdiff_tpu.data.lmdb_compat import _iter_lmdb_raw

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "oc20_2sys.lmdb")
    keys = [k for k, _ in _iter_lmdb_raw(fixture)]
    assert b"length" in keys and b"0" in keys


def test_transforms_decompose_tensor(rng):
    from adsorbdiff_tpu.data.transforms import DataTransforms

    stress = rng.normal(0, 1, (3, 3))
    t = DataTransforms(
        {
            "decompose_tensor": {
                "tensor": "stress",
                "rank": 2,
                "decomposition": {
                    "iso": {"irrep_dim": 0},
                    "aniso": {"irrep_dim": 2},
                },
            }
        }
    )
    # System has __slots__; transforms operate on attribute-bearing objects
    class Obj:
        pass

    o = Obj()
    o.stress = stress
    out = t(o)
    assert out.iso.shape == (1,) and out.aniso.shape == (5,)
    np.testing.assert_allclose(out.iso[0], np.trace(stress) / np.sqrt(3), atol=1e-9)


def test_radial_basis_variants(rng):
    """All reference RBF x envelope combinations produce finite, normalized,
    cutoff-respecting bases (ref: gemnet_oc/layers/radial_basis.py:18-245)."""
    import jax
    import jax.numpy as jnp

    from adsorbdiff_tpu.models.layers import RadialBasis

    d = jnp.asarray(np.linspace(0.05, 7.0, 64).astype(np.float32))
    for rbf in ({"name": "gaussian"}, {"name": "spherical_bessel"}, {"name": "bernstein"}):
        for env in ({"name": "polynomial", "exponent": 5}, {"name": "exponential"}):
            m = RadialBasis(num_radial=8, cutoff=6.0, rbf=rbf, envelope=env)
            v = m.init(jax.random.PRNGKey(0), d)
            out = np.asarray(m.apply(v, d))
            assert out.shape == (64, 8), (rbf, env)
            assert np.isfinite(out).all(), (rbf, env)
            # beyond the cutoff the envelope kills everything
            assert np.abs(out[d > 6.0]).max() == 0.0, (rbf, env)
            assert np.abs(out[d < 6.0]).max() > 0.0, (rbf, env)
    # bernstein has a single trainable scalar (pregamma)
    m = RadialBasis(num_radial=8, cutoff=6.0, rbf={"name": "bernstein"}, envelope={"name": "polynomial"})
    v = m.init(jax.random.PRNGKey(0), d)
    leaves = jax.tree.leaves(v["params"])
    assert len(leaves) == 1 and leaves[0].shape == ()


def test_element_embedding_tables():
    """The packaged khot/qmof/continuous tables (assets/element_embeddings.npz)
    expose the reference dict API (ref: models/embeddings/__init__.py) with
    physically-correct entries."""
    from adsorbdiff_tpu.models import embeddings as emb

    khot = emb.KHOT_EMBEDDINGS
    qmof = emb.QMOF_KHOT_EMBEDDINGS
    cont = emb.CONTINUOUS_EMBEDDINGS

    assert set(khot) == set(range(1, 101))
    assert all(len(v) == 92 for v in khot.values())
    assert set(qmof) == set(range(1, 104))
    assert all(len(v) == 72 for v in qmof.values())
    assert max(cont) == 100 and all(len(v) == 9 for v in cont.values())

    # k-hot rows are {0,1}-valued
    assert set(np.unique(np.asarray(list(khot.values())))) == {0.0, 1.0}
    assert set(np.unique(np.asarray(list(qmof.values())))) == {0.0, 1.0}

    # hydrogen continuous row: group, period, electronegativity, covalent
    # radius (pm), valence electrons, first IE (eV), EA (eV), block, volume
    h = cont[1]
    assert h[0] == 1 and h[1] == 1
    assert abs(h[2] - 2.19) < 0.02           # Pauling electronegativity
    assert abs(h[5] - 13.598) < 0.01         # first ionization energy
    assert abs(h[6] - 0.754) < 0.01          # electron affinity
    # gold: group 11, period 6
    assert cont[79][0] == 11 and cont[79][1] == 6

    # ATOMIC_RADII is consumed by the denoising models; reference dict API,
    # picometers (ref: models/embeddings/atomic_radii.py: 6 -> 70.0)
    assert emb.ATOMIC_RADII[6] == 70.0 and emb.ATOMIC_RADII[1] == 25.0


def test_persistent_compilation_cache(tmp_path, monkeypatch):
    """setup_compilation_cache points jax at a disk cache and model-scale
    compiles persist (cache entries appear; min-compile-time gate active)."""
    import adsorbdiff_tpu.common.compile_cache as cc

    monkeypatch.setattr(cc, "_DONE", False)
    cache_dir = str(tmp_path / "xla")
    assert cc.setup_compilation_cache(cache_dir) == cache_dir
    assert cc.setup_compilation_cache("") is None  # disable sentinel
    import jax

    assert jax.config.jax_compilation_cache_dir == cache_dir
    # second call is a no-op that keeps the configured dir
    assert cc.setup_compilation_cache("/elsewhere") == "/elsewhere"
    assert jax.config.jax_compilation_cache_dir == cache_dir
