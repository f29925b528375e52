"""Pinned golden-output regression for the model families.

Equivariance/padding tests cannot distinguish today's semantics from a
different-but-still-equivariant rewiring; perf rounds that restructure the
compute (basis factorization, layout changes, fused kernels) must reproduce
these outputs.  Regenerate deliberately with
tests/fixtures/make_model_goldens.py if the MATH (not the implementation)
changes, and say why in the commit.
"""
import os

import jax
import numpy as np

from tests.test_painn import make_batch

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "model_goldens.npz")


def test_eqv2_matches_golden():
    from tests.test_equiformer_v2 import TINY
    from adsorbdiff_tpu.models.equiformer_v2 import EquiformerV2

    z = np.load(GOLDEN)
    batch = make_batch(np.random.default_rng(77))
    model = EquiformerV2(**TINY, so3_denoising=True, for_denoising=True)
    v = model.init(jax.random.PRNGKey(7), batch)
    f1, f2 = model.apply(v, batch)
    np.testing.assert_allclose(np.asarray(f1), z["eqv2_f1"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(f2), z["eqv2_f2"], atol=2e-5)


def test_gemnet_matches_golden():
    from tests.test_gemnet_oc import TINY
    from adsorbdiff_tpu.models.gemnet_oc import GemNetOC

    z = np.load(GOLDEN)
    batch = make_batch(np.random.default_rng(77))
    model = GemNetOC(**TINY)
    v = model.init(jax.random.PRNGKey(7), batch)
    out = model.apply(v, batch)
    np.testing.assert_allclose(np.asarray(out["energy"]), z["gem_energy"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["forces"]), z["gem_forces"], atol=2e-5)
