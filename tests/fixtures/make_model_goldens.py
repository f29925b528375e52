"""Generate pinned golden outputs for the EqV2 and GemNet-OC tiny configs.

Future perf rounds (e.g. the round-3 fused-attention kernel) must reproduce
these outputs bit-for-tolerance; equivariance tests alone cannot catch a
semantically different but still-equivariant rewiring.

Run on CPU: python tests/fixtures/make_model_goldens.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")


def main(out_path):
    from tests.test_painn import make_batch
    from tests.test_equiformer_v2 import TINY as EQV2_TINY
    from tests.test_gemnet_oc import TINY as GEM_TINY
    from adsorbdiff_tpu.models.equiformer_v2 import EquiformerV2
    from adsorbdiff_tpu.models.gemnet_oc import GemNetOC

    batch = make_batch(np.random.default_rng(77))

    eqv2 = EquiformerV2(**EQV2_TINY, so3_denoising=True, for_denoising=True)
    v_e = eqv2.init(jax.random.PRNGKey(7), batch)
    f1, f2 = eqv2.apply(v_e, batch)

    gem = GemNetOC(**GEM_TINY)
    v_g = gem.init(jax.random.PRNGKey(7), batch)
    out = gem.apply(v_g, batch)

    np.savez_compressed(
        out_path,
        eqv2_f1=np.asarray(f1),
        eqv2_f2=np.asarray(f2),
        gem_energy=np.asarray(out["energy"]),
        gem_forces=np.asarray(out["forces"]),
    )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    main(os.path.join(here, "model_goldens.npz"))
