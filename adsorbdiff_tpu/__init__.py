"""adsorbdiff_tpu — a TPU-native (JAX/XLA/Pallas) conditional-diffusion framework
for adsorbate placement on catalyst slabs.

Re-designed from scratch with the capabilities of AdeeshKolluru/AdsorbDiff
(reference mounted at /root/reference; cited per-module as `ref: file:line`),
but built TPU-first:

- fixed-shape padded batches (atoms padded per bucket, neighbor lists
  ``[N, max_neighbors]``) so every train / sample / relax step is one jitted
  function,
- reverse diffusion and L-BFGS as ``lax.scan`` loops with convergence masks,
- systems sharded over a ``jax.sharding.Mesh`` (GSPMD data parallel replacing
  the reference's torch DDP/NCCL stack, ref: adsorbdiff/utils/distutils.py),
- IGSO(3) diffusion tables precomputed once and queried via pure ``jnp``
  interpolation inside jit (ref: adsorbdiff/utils/rot_utils.py).

Top-level convenience export mirrors the reference's single public symbol
(`AdsorbDiffCalculator`, ref: adsorbdiff/__init__.py:8).
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: avoids importing jax-heavy modules at package import
    if name == "AdsorbDiffCalculator":
        from adsorbdiff_tpu.relaxation.calculator import AdsorbDiffCalculator

        return AdsorbDiffCalculator
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
