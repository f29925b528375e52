"""SO(3) helpers: axis-angle / quaternion conversions and Kabsch alignment.

JAX rebuild of the pytorch3d-derived converters in the reference
(ref: adsorbdiff/utils/rot_utils.py:18-98) and the Kabsch alignment
(ref: rot_utils.py:101-137).  All functions are pure, batched over leading
axes, and jit/vmap/grad-safe (the small-angle branch uses ``jnp.where`` with a
safe denominator instead of boolean indexing).
"""
from __future__ import annotations

import jax.numpy as jnp


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] axis-angle -> [..., 4] quaternion (real part first).

    ref: rot_utils.py:50-81, including the sin(x/2)/x ~ 1/2 - x^2/48 small-angle
    expansion below 1e-6.
    """
    n2 = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    small = n2 < 1e-12  # |angle| < 1e-6, reference threshold
    angles = jnp.sqrt(jnp.where(small, 1.0, n2))  # grad-safe at 0
    ratio = jnp.where(small, 0.5 - n2 / 48.0, jnp.sin(0.5 * angles) / angles)
    cos_half = jnp.where(small, 1.0 - n2 / 8.0, jnp.cos(0.5 * angles))
    return jnp.concatenate([cos_half, axis_angle * ratio], axis=-1)


def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] quaternion (real first) -> [..., 3, 3] rotation matrix.

    ref: rot_utils.py:18-47.
    """
    r, i, j, k = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] axis-angle -> [..., 3, 3] rotation matrix (ref: rot_utils.py:84-98)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def kabsch(a: jnp.ndarray, b: jnp.ndarray):
    """Rigid alignment R, t with R @ a + t ~= b for [3, N] point sets.

    ref: rot_utils.py:101-137 (``rigid_transform_Kabsch_3D_torch``); the
    reflection fix is applied branchlessly via the sign of det(R).
    """
    centroid_a = jnp.mean(a, axis=1, keepdims=True)
    centroid_b = jnp.mean(b, axis=1, keepdims=True)
    am = a - centroid_a
    bm = b - centroid_b
    h = am @ bm.T
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    ss = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
    ss = ss.at[2, 2].set(d)
    r = (vt.T @ ss) @ u.T
    t = -r @ centroid_a + centroid_b
    return r, t


def random_unit_vector(key, shape=()) -> jnp.ndarray:
    """Uniform points on S^2, shape [..., 3] (ref: rot_utils.py:238-241)."""
    import jax

    x = jax.random.normal(key, shape + (3,))
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)
