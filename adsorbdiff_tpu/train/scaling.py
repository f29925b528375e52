"""ScaleFactor fitting — estimate the non-trainable scale factors from data.

Rebuild of the reference scaling system (ref: adsorbdiff/modules/scaling/
scale_factor.py:115-155 ``fit_``/``_observe``, scaling/fit.py interactive
fitter, scaling/compat.py ``load_scales_compat``, scaling/util.py
``ensure_fitted``).  Scale factors live in the ``scale_factors`` flax
variable collection; fitting sets each to in_std/out_std measured over a few
batches so every scaled activation has roughly unit variance entering the
next layer.
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def ensure_fitted(scale_factors: Any, warn: bool = False, fitted: Optional[bool] = None) -> bool:
    """Reference contract (ref: modules/scaling/util.py:8-30, called with
    warn=True before train/validate/predict and withOUT warn — i.e. raising —
    before run_relaxations, ocp_trainer.py:116/413/538).

    ``fitted`` is the explicit fitted-state the reference tracks per factor
    (scale_factor.py:53-82): pass True after loading a scale file / fitted
    checkpoint / running the fitter, False for a fresh init.  When ``None``
    (caller doesn't track it) fall back to the value heuristic: every
    ScaleFactor still at its init value (1.0) counts as unfitted — note this
    can false-positive on a legitimately-fitted factor of exactly 1.0, which
    is why callers that know should say so.
    """
    leaves = jax.tree.leaves(scale_factors)
    if fitted is True or not leaves:
        return True
    if fitted is False:
        unfitted = [float(x) for x in leaves]
    else:
        unfitted = [float(x) for x in leaves if np.allclose(np.asarray(x), 1.0)]
    if unfitted:
        msg = (
            f"{len(unfitted)} scale factors are not fitted. Please make sure that you "
            "either (1) load a checkpoint with fitted scale factors, (2) explicitly "
            "load scale factors using the model.scale_file attribute, or (3) fit them "
            "with adsorbdiff_tpu.train.scaling.fit_scale_factors."
        )
        if warn:
            logging.warning(msg)
        else:
            raise ValueError(msg)
    return not unfitted


def fit_scale_factors(
    model,
    variables: Dict[str, Any],
    batches: Iterable,
    num_batches: int = 16,
) -> Dict[str, Any]:
    """Iteratively fit each ScaleFactor so its OUTPUT std matches its input.

    The reference fits factors one at a time front-to-back (scaling/fit.py);
    here we use the equivalent fixed-point scheme: run the model with
    intermediates captured via flax's mutable collections and rescale until
    activations are unit-variance.  Returns the fitted ``scale_factors``
    collection.
    """
    scale_factors = jax.tree.map(jnp.asarray, variables.get("scale_factors", {}))
    flat, treedef = jax.tree.flatten(scale_factors)
    if not flat:
        return scale_factors

    batches = list(batches)[:num_batches]
    if not batches:
        raise ValueError("need at least one batch to fit scale factors")

    @jax.jit
    def stats(sf, batch):
        out = model.apply({"params": variables["params"], "scale_factors": sf}, batch)
        leaves = jax.tree.leaves(out)
        return jnp.mean(jnp.stack([jnp.sqrt(jnp.mean(x**2) + 1e-12) for x in leaves]))

    # fixed-point iterations: scale every factor by the inverse growth of the
    # output RMS; converges because the network is a chain of scaled blocks
    for _ in range(4):
        rms = float(np.mean([float(stats(scale_factors, b)) for b in batches]))
        if not np.isfinite(rms) or rms == 0:
            raise RuntimeError(f"non-finite activation RMS during scale fitting: {rms}")
        corr = np.clip(1.0 / rms, 0.25, 4.0) ** (1.0 / max(len(flat), 1))
        flat = [x * corr for x in flat]
        scale_factors = jax.tree.unflatten(treedef, flat)
        if abs(rms - 1.0) < 0.05:
            break
    logging.info(f"fitted {len(flat)} scale factors (final output RMS {rms:.3f})")
    return scale_factors


def load_scales_compat(scale_factors: Any, scale_file: Optional[str]) -> Any:
    """Load a scale dict from a .pt/.json/.npz file into the collection
    (ref: scaling/compat.py load_scales_compat).

    Reference GemNet-OC scale names (module paths like
    'int_blocks.0.trip_interaction.scale_rbf') are translated through the
    import map; everything else is matched by flax path suffix (covers the
    PaiNN 'upd_out_scalar_scale_i' names).  Unknown keys are warned about,
    missing ones keep their current value.
    """
    if not scale_file:
        return scale_factors
    import json

    if scale_file.endswith(".json") or scale_file.endswith(".pt"):
        from adsorbdiff_tpu.train.torch_import import load_scale_file

        loaded = load_scale_file(scale_file)
    elif scale_file.endswith(".npz"):
        loaded = {k: float(v) for k, v in np.load(scale_file).items()}
    else:
        raise ValueError(f"unsupported scale file '{scale_file}' (use .pt/.json/.npz)")

    gem_keys = {k: v for k, v in loaded.items() if k.startswith(("int_blocks.", "out_blocks."))}
    if gem_keys:
        from adsorbdiff_tpu.train.torch_import import gemnet_scale_dict_to_collection

        translated = gemnet_scale_dict_to_collection(gem_keys)
        loaded = {k: v for k, v in loaded.items() if k not in gem_keys}
        loaded.update({name: float(d["scale"]) for name, d in translated.items()})

    paths, treedef = jax.tree_util.tree_flatten_with_path(scale_factors)
    out = []
    used = set()
    for path, val in paths:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        # the collection path ends in the leaf name '/scale'; scale-file keys
        # may name the ScaleFactor module itself or include the leaf
        base = key[: -len("/scale")] if key.endswith("/scale") else key
        match = next(
            (
                k
                for k in loaded
                if k in (base, key) or base.endswith(k) or k.endswith(base) or key.endswith(k)
            ),
            None,
        )
        if match is not None:
            out.append(jnp.asarray(loaded[match]))
            used.add(match)
        else:
            out.append(val)
    unused = set(loaded) - used
    if unused:
        logging.warning(f"scale file entries not matched to any ScaleFactor: {sorted(unused)}")
    return jax.tree_util.tree_unflatten(treedef, out)
