"""Test harness: force an 8-device virtual CPU mesh BEFORE jax initializes.

The reference had no tests at all (SURVEY.md §4); we build the pyramid the
TPU way — multi-device behavior is tested on a virtual CPU mesh via
``--xla_force_host_platform_device_count=8``, which torch/NCCL could never do
without a cluster.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("ADSORBDIFF_TPU_CACHE", os.path.join(os.path.dirname(__file__), "..", ".cache"))

import jax  # noqa: E402

# The image's axon sitecustomize forces jax_platforms="axon,cpu"; tests must
# run on the virtual 8-device CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
