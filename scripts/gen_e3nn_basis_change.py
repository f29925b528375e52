"""Generate adsorbdiff_tpu/assets/e3nn_basis_change.npz — the fixed
orthogonal block-diagonal matrix P with Y_e3nn(v) = P Y_ours(v).

The reference EquiformerV2 works in e3nn's real-SH basis (shipped Jd.pt,
ref: adsorbdiff/models/equiformer_v2/wigner.py:8-43); our SO(3) core
(models/so3.py) uses z-up scipy real SH.  P reconciles the conventions:
D_ref(R) = P D_ours(R) P^T for every rotation, so torch checkpoints import
by conjugating the SO(2)/edge-frame weights with M0 = P D_ours(Q_zy)
(train/torch_import.py).

Derivation (no e3nn needed): e3nn's Y values are produced from the shipped
Wigner matrices via Y(R yhat) = D(R) Y(yhat), with Y(yhat) supported on m=0
at value sqrt((2l+1)/4pi) ('integral' normalization) — see
tests/torch_ref_eqv2.py::ref_sph_harm.  P then solves the change of basis by
least squares over random directions, sign-complete.

Usage: python scripts/gen_e3nn_basis_change.py  (needs the reference
checkout for Jd.pt; the committed npz makes runtime imports standalone).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

LMAX = 8
OUT = os.path.join(
    os.path.dirname(__file__), "..", "adsorbdiff_tpu", "assets", "e3nn_basis_change.npz"
)


def main() -> None:
    import torch

    from adsorbdiff_tpu.models.so3 import real_sph_harm, wigner_D_from_rot
    from tests.torch_ref_eqv2 import ref_sph_harm, rotation_to_wigner

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(4 * (LMAX + 1) ** 2 + 64, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)

    y_ours = real_sph_harm(LMAX, pts)  # [(L)^2, P]
    y_ref = ref_sph_harm(LMAX, pts).numpy().T  # [(L)^2, P]

    dim = (LMAX + 1) ** 2
    P = np.zeros((dim, dim))
    for l in range(LMAX + 1):
        sl = slice(l * l, (l + 1) * (l + 1))
        # Y_ref = P_l Y_ours  ->  P_l = Y_ref @ pinv(Y_ours)
        P_l = np.linalg.lstsq(y_ours[sl].T, y_ref[sl].T, rcond=None)[0].T
        # orthogonality is exact math; enforce numerically via polar projection
        u, _, vt = np.linalg.svd(P_l)
        P[sl, sl] = u @ vt

    # verify the conjugation property on fresh rotations
    from scipy.spatial.transform import Rotation

    R = Rotation.random(6, random_state=7).as_matrix()
    import jax.numpy as jnp

    d_ours = np.asarray(
        jax.vmap(lambda r: wigner_D_from_rot(LMAX, r))(jnp.asarray(R, jnp.float32))
    ).astype(np.float64)
    d_ref = rotation_to_wigner(torch.as_tensor(R), LMAX).numpy()
    err = max(np.abs(d_ref[k] - P @ d_ours[k] @ P.T).max() for k in range(len(R)))
    assert err < 5e-6, err  # f32 noise floor of our D
    # e3nn l=1 basis is (x, y, z); ours is (y, z, x) -> fixed permutation
    np.testing.assert_allclose(
        P[1:4, 1:4], np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), atol=1e-10
    )

    np.savez_compressed(OUT, P=P.astype(np.float64), lmax=np.int64(LMAX))
    print(f"wrote {OUT}: lmax={LMAX}, conjugation err {err:.2e}")


if __name__ == "__main__":
    main()
