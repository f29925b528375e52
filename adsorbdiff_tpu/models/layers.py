"""Shared model layers: activations, atom embeddings, radial bases, scale factors.

JAX/flax rebuilds of the reference layer zoo used by PaiNN (and later
GemNet-OC): ``ScaledSiLU`` (ref: adsorbdiff/models/gemnet_oc/layers/
base_layers.py), ``AtomEmbedding`` (ref: layers/embedding_block.py:15-43),
``RadialBasis`` + envelopes (ref: layers/radial_basis.py:18-245), and the
``ScaleFactor`` system (ref: adsorbdiff/modules/scaling/scale_factor.py).
"""
from __future__ import annotations

import math
from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def scaled_silu(x: jnp.ndarray) -> jnp.ndarray:
    """SiLU * 1/0.6 (ref: gemnet_oc/layers/base_layers.py ScaledSiLU)."""
    return jax.nn.silu(x) * (1.0 / 0.6)


# --------------------------------------------------------------------------
# compute-dtype context: replaces torch.cuda.amp autocast (--amp). Models with
# many feature-path Dense sites (GemNet-OC, EqV2) set this for the extent of
# their __call__; the layer primitives read it at TRACE time, so geometry math
# outside the layers stays f32 while feature matmuls run bf16 with f32 params.
# --------------------------------------------------------------------------
import contextlib
from contextvars import ContextVar

_COMPUTE_DTYPE: ContextVar = ContextVar("adsorbdiff_compute_dtype", default=None)


def compute_dtype():
    """The active feature-path compute dtype (None => full precision)."""
    return _COMPUTE_DTYPE.get()


@contextlib.contextmanager
def compute_dtype_scope(dtype_name):
    """Set the feature compute dtype ('bfloat16' or None) for a model body."""
    dt = jnp.bfloat16 if dtype_name == "bfloat16" else None
    token = _COMPUTE_DTYPE.set(dt)
    try:
        yield dt
    finally:
        _COMPUTE_DTYPE.reset(token)


class AtomEmbedding(nn.Module):
    """Element embedding, looked up at Z-1 (Z>=1), uniform(-sqrt3, sqrt3) init.

    ref: gemnet_oc/layers/embedding_block.py:15-43.  Padded slots (Z=0) clamp
    to index 0; their features are junk by design and masked at every use.
    """

    emb_size: int
    num_elements: int = 83

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embeddings",
            lambda key, shape: jax.random.uniform(key, shape, minval=-math.sqrt(3), maxval=math.sqrt(3)),
            (self.num_elements, self.emb_size),
        )
        idx = jnp.clip(z - 1, 0, self.num_elements - 1)
        return jnp.take(table, idx, axis=0)


def polynomial_envelope(d_scaled: jnp.ndarray, exponent: int = 5) -> jnp.ndarray:
    """Smooth-cutoff polynomial envelope (ref: layers/radial_basis.py:18-43)."""
    p = float(exponent)
    a = -(p + 1) * (p + 2) / 2
    b = p * (p + 2)
    c = -p * (p + 1) / 2
    env = 1 + a * d_scaled**p + b * d_scaled ** (p + 1) + c * d_scaled ** (p + 2)
    return jnp.where(d_scaled < 1, env, 0.0)


def exponential_envelope(d_scaled: jnp.ndarray) -> jnp.ndarray:
    """SpookyNet exponential envelope (ref: layers/radial_basis.py:46-61)."""
    safe = jnp.where(jnp.abs(d_scaled) < 1, d_scaled, 0.0)
    env = jnp.exp(-(safe**2) / ((1 - safe) * (1 + safe)))
    return jnp.where(jnp.abs(d_scaled) < 1, env, 0.0)


def gaussian_basis(d: jnp.ndarray, start: float, stop: float, num: int) -> jnp.ndarray:
    """Gaussian RBF grid (ref: layers/radial_basis.py:64-82)."""
    offset = jnp.linspace(start, stop, num)
    coeff = -0.5 / ((stop - start) / (num - 1)) ** 2
    diff = d[..., None] - offset
    return jnp.exp(coeff * diff * diff)


class RadialBasis(nn.Module):
    """Envelope(d/cutoff) * RBF(d/cutoff) (ref: layers/radial_basis.py:171-245).

    Supports the bases the reference configs use: gaussian (PaiNN default) and
    spherical_bessel (GemNet-OC); envelopes: polynomial / exponential.
    """

    num_radial: int
    cutoff: float
    rbf: Dict[str, Union[str, int]] = None  # type: ignore[assignment]
    envelope: Dict[str, Union[str, int]] = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, d: jnp.ndarray) -> jnp.ndarray:
        rbf = dict(self.rbf or {"name": "gaussian"})
        envelope = dict(self.envelope or {"name": "polynomial", "exponent": 5})
        d_scaled = d * (1.0 / self.cutoff)

        env_name = str(envelope.pop("name")).lower()
        if env_name == "polynomial":
            env = polynomial_envelope(d_scaled, int(envelope.get("exponent", 5)))
        elif env_name == "exponential":
            env = exponential_envelope(d_scaled)
        else:
            raise ValueError(f"Unknown envelope function '{env_name}'.")

        rbf_name = str(rbf.pop("name")).lower()
        if rbf_name == "gaussian":
            res = gaussian_basis(d_scaled, 0.0, 1.0, self.num_radial)
        elif rbf_name == "spherical_bessel":
            # trainable frequencies at canonical positions (ref: :85-119)
            norm_const = math.sqrt(2.0 / self.cutoff**3)
            freqs = self.param(
                "frequencies",
                lambda key, shape: jnp.asarray(np.pi * np.arange(1, self.num_radial + 1, dtype=np.float32)),
                (self.num_radial,),
            )
            safe = jnp.maximum(d_scaled, 1e-9)
            res = norm_const / safe[..., None] * jnp.sin(freqs * safe[..., None])
        elif rbf_name == "bernstein":
            # SpookyNet Bernstein basis with trainable softplus-gamma
            # (ref: radial_basis.py:122-168)
            from scipy.special import binom

            n = self.num_radial
            prefactor = jnp.asarray(binom(n - 1, np.arange(n)), jnp.float32)
            exp1 = jnp.arange(n, dtype=jnp.float32)
            exp2 = (n - 1) - exp1
            pregamma = self.param(
                "pregamma",
                lambda key, shape: jnp.asarray(float(rbf.get("pregamma_initial", 0.45264))),
                (),
            )
            gamma = jax.nn.softplus(pregamma)
            exp_d = jnp.exp(-gamma * d_scaled)[..., None]
            res = prefactor * exp_d**exp1 * (1 - exp_d) ** exp2
        else:
            raise ValueError(f"Unknown radial basis function '{rbf_name}'.")
        return env[..., None] * res


class ScaleFactor(nn.Module):
    """Non-trainable scalar that equalizes activation variance.

    ref: adsorbdiff/modules/scaling/scale_factor.py — a fitted buffer, stored
    in checkpoints and enforced on load.  Lives in the ``scale_factors``
    variable collection (not ``params``) so optimizers never touch it; fitting
    (:mod:`adsorbdiff_tpu.train.scaling`) writes this collection.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.variable("scale_factors", "scale", lambda: jnp.ones(()))
        return x * scale.value
