"""Import reference torch checkpoints into our parameter pytrees.

The reference ships torch ``state_dict`` checkpoints (PT_zeroshot_painn.pt
etc., ref: README.md:55-63; saved as {state_dict, ema, config, ...} by
base_trainer.py:625-684 with DDP ``module.``-prefix quirks :476-495).  This
module maps a PaiNN state_dict's tensors onto our flax parameter tree.

Exactness: the PaiNN map is verified against a reference-math torch oracle
(tests/test_torch_import.py + committed golden fixture): given the same edge
list, the mapped flax forward agrees with the reference forward to f32
tolerance for both heads, including ScaleFactor buffers.  The only remaining
divergence is graph construction when the neighbor cap binds (strict top-K
vs the reference's degeneracy-tolerant cap + symmetrization — see
ops/pbc.py module docstring); with max_neighbors at the published 50 this
affects only systems with >50 in-radius neighbors per atom.
Works from a raw dict of numpy arrays too, so it's testable without torch.
"""
from __future__ import annotations

import logging
from typing import Any, Dict

import numpy as np


def _strip_prefixes(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Drop DDP 'module.' prefixes (ref: base_trainer.py:476-495) and convert
    tensors to numpy."""
    out = {}
    for k, v in sd.items():
        while k.startswith("module."):
            k = k[len("module.") :]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint file -> flat numpy state_dict (requires torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return _strip_prefixes(sd)


def painn_state_dict_to_params(sd: Dict[str, np.ndarray], num_layers: int = 6) -> Dict[str, Any]:
    """Map a reference PaiNN(-denoising) state_dict onto our flax param tree.

    Name map (ref: models/painn/painn_denoising.py):
      atom_emb.embeddings.weight            -> AtomEmbedding_0/embeddings
      message_layers.i.{x_proj.0,x_proj.2,rbf_proj,x_layernorm}
                                            -> message_i/{Dense_0,Dense_1,Dense_2,LayerNorm_0}
      update_layers.i.{vec_proj,xvec_proj.0,xvec_proj.2}
                                            -> update_i/{Dense_0,Dense_1,Dense_2}
      out_forces(.2)?.output_network.j.*    -> out_forces(2)/GatedEquivariantBlock_j/*
    torch Linear stores [out, in]; flax Dense kernels are [in, out].
    """
    sd = _strip_prefixes(sd)

    def lin(name, dest, params, bias=True):
        params[dest] = {"kernel": sd[name + ".weight"].T}
        if bias and name + ".bias" in sd:
            params[dest]["bias"] = sd[name + ".bias"]

    params: Dict[str, Any] = {"AtomEmbedding_0": {"embeddings": sd["atom_emb.embeddings.weight"]}}

    for i in range(num_layers):
        msg: Dict[str, Any] = {}
        msg["LayerNorm_0"] = {
            "scale": sd[f"message_layers.{i}.x_layernorm.weight"],
            "bias": sd[f"message_layers.{i}.x_layernorm.bias"],
        }
        lin(f"message_layers.{i}.x_proj.0", "Dense_0", msg)
        lin(f"message_layers.{i}.x_proj.2", "Dense_1", msg)
        lin(f"message_layers.{i}.rbf_proj", "Dense_2", msg)
        params[f"message_{i}"] = msg

        upd: Dict[str, Any] = {}
        lin(f"update_layers.{i}.vec_proj", "Dense_0", upd, bias=False)
        lin(f"update_layers.{i}.xvec_proj.0", "Dense_1", upd)
        lin(f"update_layers.{i}.xvec_proj.2", "Dense_2", upd)
        params[f"update_{i}"] = upd

    def gated_block(src_prefix: str) -> Dict[str, Any]:
        blk: Dict[str, Any] = {}
        lin(src_prefix + ".vec1_proj", "Dense_0", blk, bias=False)
        lin(src_prefix + ".vec2_proj", "Dense_1", blk, bias=False)
        lin(src_prefix + ".update_net.0", "Dense_2", blk)
        lin(src_prefix + ".update_net.2", "Dense_3", blk)
        return blk

    for head_src, head_dst in (("out_forces", "out_forces"), ("out_forces2", "out_forces2")):
        if f"{head_src}.output_network.0.vec1_proj.weight" in sd:
            params[head_dst] = {
                f"GatedEquivariantBlock_{j}": gated_block(f"{head_src}.output_network.{j}") for j in range(2)
            }

    if "energy_embedding.weight" in sd:
        params["energy_embedding"] = {
            "kernel": sd["energy_embedding.weight"].T,
            "bias": sd["energy_embedding.bias"],
        }

    scale_factors = {}
    for i in range(num_layers):
        key = f"upd_out_scalar_scale_{i}.scale_factor"
        if key in sd:
            scale_factors[f"upd_out_scalar_scale_{i}"] = {"scale": sd[key].reshape(())}

    imported = sum(1 for _ in _iter_leaves(params))
    logging.info(f"imported {imported} PaiNN tensors from torch state_dict")
    return {"params": params, "scale_factors": scale_factors}


def _iter_leaves(d):
    for v in d.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v


# ---------------------------------------------------------------------------
# GemNet-OC
# ---------------------------------------------------------------------------
def _gemnet_name_map(
    num_blocks: int = 4,
    *,
    num_atom: int = 3,
    num_output_afteratom: int = 3,
    num_before_skip: int = 2,
    num_after_skip: int = 2,
    num_concat: int = 1,
    num_atom_emb_layers: int = 2,
    num_global_out_layers: int = 2,
    quad_interaction: bool = True,
    atom_edge_interaction: bool = True,
    edge_atom_interaction: bool = True,
    atom_interaction: bool = True,
    symmetric_mp: bool = True,
):
    """Yield (ref_key, our_flat_path, kind) for every GemNet-OC tensor.

    Kinds: ``linear_T`` (torch Linear [out,in] -> flax kernel [in,out]),
    ``raw`` (copy), ``basis_T`` (BasisEmbedding without spherical: [F,R] ->
    [R,F]), ``basis_sph`` (BasisEmbedding with spherical — needs the (F,S)
    reinterpretation transform, see :func:`_basis_sph_to_ours`), ``scale``
    (ScaleFactor buffer -> the scale_factors collection).

    Reference names: gemnet_oc.py:292-616 + layers/interaction_block.py +
    layers/atom_update_block.py; ours: models/gemnet_oc.py.
    """
    P = "params"
    S = "scale_factors"

    def lin(ref, *ours):
        return (ref + ".linear.weight", (P,) + ours + ("kernel",), "linear_T")

    def scale(ref, ours):
        return (ref + ".scale_factor", (S, ours, "scale"), "scale")

    def residual(ref, *ours):
        for j in range(2):
            yield lin(f"{ref}.dense_mlp.{j}", *ours, f"DenseLayer_{j}", "Dense_0")

    def mlp(ref, ours, n_hidden, dense_in):
        """reference get_mlp (atom_update_block.py:55-66) vs our MLPStack."""
        i0 = 0
        if dense_in:
            yield lin(f"{ref}.0", ours, "DenseLayer_0", "Dense_0")
            i0 = 1
        for r in range(n_hidden):
            yield from residual(f"{ref}.{i0 + r}", ours, f"ResidualLayer_{r}")

    # --- top-level ---------------------------------------------------------
    yield ("atom_emb.embeddings.weight", (P, "atom_emb", "embeddings"), "raw")
    yield lin("edge_emb.dense", "edge_emb", "Dense_0")
    for nm in ("mlp_rbf_h", "mlp_rbf_out", "mlp_rbf_tint"):
        yield (nm + ".linear.weight", (P, nm, "weight"), "basis_T")
    yield ("mlp_cbf_tint.weight", (P, "mlp_cbf_tint", "weight"), "basis_sph")
    if quad_interaction:
        yield ("mlp_rbf_qint.linear.weight", (P, "mlp_rbf_qint", "weight"), "basis_T")
        yield ("mlp_cbf_qint.weight", (P, "mlp_cbf_qint", "weight"), "basis_sph")
        yield ("mlp_sbf_qint.weight", (P, "mlp_sbf_qint", "weight"), "basis_sph")
    if atom_edge_interaction:
        yield ("mlp_rbf_aeint.linear.weight", (P, "mlp_rbf_aeint", "weight"), "basis_T")
        yield ("mlp_cbf_aeint.weight", (P, "mlp_cbf_aeint", "weight"), "basis_sph")
    if edge_atom_interaction:
        yield ("mlp_rbf_eaint.linear.weight", (P, "mlp_rbf_eaint", "weight"), "basis_T")
        yield ("mlp_cbf_eaint.weight", (P, "mlp_cbf_eaint", "weight"), "basis_sph")
    if atom_interaction:
        yield ("mlp_rbf_aint.weight", (P, "mlp_rbf_aint", "weight"), "basis_T")

    # --- interaction blocks -------------------------------------------------
    for b in range(num_blocks):
        rb = f"int_blocks.{b}"
        ob = f"int_block_{b}"
        yield lin(f"{rb}.dense_ca", f"{ob}_dense_ca", "Dense_0")

        # TripletInteraction (e2e)
        ti = f"{rb}.trip_interaction"
        yield lin(f"{ti}.dense_ba", f"{ob}_tint_dense", "Dense_0")
        yield lin(f"{ti}.mlp_rbf", f"{ob}_tint_rbf", "Dense_0")
        yield scale(f"{ti}.scale_rbf", f"{ob}_tint_scale_rbf")
        yield lin(f"{ti}.down_projection", f"{ob}_tint_down", "Dense_0")
        yield (f"{ti}.mlp_cbf.bilinear.linear.weight", (P, f"{ob}_tint_bilinear", "weight"), "linear_T")
        yield scale(f"{ti}.scale_cbf_sum", f"{ob}_tint_scale_sum")
        yield lin(f"{ti}.up_projection_ca", f"{ob}_tint_up", "Dense_0")
        if symmetric_mp:
            yield lin(f"{ti}.up_projection_ac", f"{ob}_tint_up_ac", "Dense_0")

        if quad_interaction:
            qi = f"{rb}.quad_interaction"
            yield lin(f"{qi}.dense_db", f"{ob}_qint_dense", "Dense_0")
            yield lin(f"{qi}.mlp_rbf", f"{ob}_qint_rbf", "Dense_0")
            yield scale(f"{qi}.scale_rbf", f"{ob}_qint_scale_rbf")
            yield lin(f"{qi}.mlp_cbf", f"{ob}_qint_cbf_gate", "Dense_0")
            yield scale(f"{qi}.scale_cbf", f"{ob}_qint_scale_cbf")
            yield (f"{qi}.mlp_sbf.bilinear.linear.weight", (P, f"{ob}_qint_bilinear", "weight"), "linear_T")
            yield scale(f"{qi}.scale_sbf_sum", f"{ob}_qint_scale_sbf")
            yield lin(f"{qi}.down_projection", f"{ob}_qint_down", "Dense_0")
            yield lin(f"{qi}.up_projection_ca", f"{ob}_qint_up", "Dense_0")
            if symmetric_mp:
                yield lin(f"{qi}.up_projection_ac", f"{ob}_qint_up_ac", "Dense_0")

        if atom_edge_interaction:
            ai = f"{rb}.atom_edge_interaction"
            yield lin(f"{ai}.dense_ba", f"{ob}_aeint_dense", "Dense_0")
            yield lin(f"{ai}.mlp_rbf", f"{ob}_aeint_rbf", "Dense_0")
            yield scale(f"{ai}.scale_rbf", f"{ob}_aeint_scale_rbf")
            yield lin(f"{ai}.down_projection", f"{ob}_aeint_down", "Dense_0")
            yield (f"{ai}.mlp_cbf.bilinear.linear.weight", (P, f"{ob}_aeint_bilinear", "weight"), "linear_T")
            yield scale(f"{ai}.scale_cbf_sum", f"{ob}_aeint_scale_sum")
            yield lin(f"{ai}.up_projection_ca", f"{ob}_aeint_up", "Dense_0")
            if symmetric_mp:
                yield lin(f"{ai}.up_projection_ac", f"{ob}_aeint_up_ac", "Dense_0")

        if edge_atom_interaction:
            ei = f"{rb}.edge_atom_interaction"
            yield lin(f"{ei}.dense_ba", f"{ob}_eaint_dense", "Dense_0")
            yield lin(f"{ei}.mlp_rbf", f"{ob}_eaint_rbf", "Dense_0")
            yield scale(f"{ei}.scale_rbf", f"{ob}_eaint_scale_rbf")
            yield lin(f"{ei}.down_projection", f"{ob}_eaint_down", "Dense_0")
            yield (f"{ei}.mlp_cbf.bilinear.linear.weight", (P, f"{ob}_eaint_bilinear", "weight"), "linear_T")
            yield scale(f"{ei}.scale_cbf_sum", f"{ob}_eaint_scale_sum")
            yield lin(f"{ei}.up_projection_ca", f"{ob}_eaint_up", "Dense_0")

        if atom_interaction:
            pi = f"{rb}.atom_interaction"
            yield (f"{pi}.bilinear.linear.weight", (P, f"aint_bilinear_{b}"), "linear_T")
            yield scale(f"{pi}.scale_rbf_sum", f"{ob}_aint_scale")
            yield lin(f"{pi}.down_projection", f"{ob}_aint_down", "Dense_0")
            yield lin(f"{pi}.up_projection", f"{ob}_aint_up", "Dense_0")

        for r in range(num_before_skip):
            yield from residual(f"{rb}.layers_before_skip.{r}", f"{ob}_before_skip_{r}")
        for r in range(num_after_skip):
            yield from residual(f"{rb}.layers_after_skip.{r}", f"{ob}_after_skip_{r}")
        for r in range(num_atom_emb_layers):
            yield from residual(f"{rb}.atom_emb_layers.{r}", f"{ob}_atom_emb_{r}")

        au = f"{rb}.atom_update"
        yield lin(f"{au}.dense_rbf", f"{ob}_au_rbf", "Dense_0")
        yield scale(f"{au}.scale_sum", f"{ob}_au_scale")
        yield from mlp(f"{au}.layers", f"{ob}_au_mlp", num_atom, dense_in=True)

        yield lin(f"{rb}.concat_layer.dense", f"{ob}_concat", "Dense_0")
        for r in range(num_concat):
            yield from residual(f"{rb}.residual_m.{r}", f"{ob}_concat_res_{r}")

    # --- output blocks ------------------------------------------------------
    for i in range(num_blocks + 1):
        rb = f"out_blocks.{i}"
        ob = f"out_block_{i}"
        yield lin(f"{rb}.dense_rbf", f"{ob}_rbf_E", "Dense_0")
        yield scale(f"{rb}.scale_sum", f"{ob}_scale_sum")
        yield from mlp(f"{rb}.layers", f"{ob}_seq_E", num_atom, dense_in=True)
        yield from mlp(f"{rb}.seq_energy2", f"{ob}_seq_E2", num_output_afteratom, dense_in=False)
        yield from mlp(f"{rb}.seq_forces", f"{ob}_seq_F", num_atom, dense_in=False)
        yield lin(f"{rb}.dense_rbf_F", f"{ob}_rbf_F", "Dense_0")
        yield scale(f"{rb}.scale_rbf_F", f"{ob}_scale_rbf_F")

    # --- global heads -------------------------------------------------------
    yield lin("out_mlp_E.0", "out_mlp_E_in", "DenseLayer_0", "Dense_0")
    for r in range(num_global_out_layers):
        yield from residual(f"out_mlp_E.{1 + r}", f"out_mlp_E_{r}")
    yield ("out_energy.linear.weight", (P, "out_energy", "kernel"), "linear_T")
    yield lin("out_mlp_F.0", "out_mlp_F_in", "DenseLayer_0", "Dense_0")
    for r in range(num_global_out_layers):
        yield from residual(f"out_mlp_F.{1 + r}", f"out_mlp_F_{r}")
    yield ("out_forces.linear.weight", (P, "out_forces", "kernel"), "linear_T")


def _basis_sph_to_ours(w: np.ndarray) -> np.ndarray:
    """Reference spherical BasisEmbedding weight [R, S, F] -> our flat [R, S*F].

    The reference's forward flattens the weight s-major (``weight.reshape(R,
    -1)``) but then reinterprets the product as [F, S] (``rad_W1.reshape(E,
    -1, S)``, ref: layers/efficient.py:100-104).  The EFFECTIVE coefficient
    multiplying rad[r]*sph[s] into channel f is therefore
    ``w.reshape(R, -1)[r, f*S + s]``; our einsum convention is
    ``w_ours[r, s, f]``.
    """
    r, s, f = w.shape
    flat = w.reshape(r, s * f)  # s-major, as the reference flattens it
    ours = flat.reshape(r, f, s).swapaxes(1, 2)  # [R, S, F] effective layout
    return ours.reshape(r, s * f)


def gemnet_state_dict_to_params(sd: Dict[str, np.ndarray], **map_kwargs) -> Dict[str, Any]:
    """Map a reference GemNet-OC state_dict onto our flax variables.

    Returns {"params": ..., "scale_factors": ...}.  Raises KeyError listing
    missing reference tensors; unconsumed keys are logged (the reference
    state_dict may carry optimizer-adjacent buffers).
    """
    sd = _strip_prefixes(sd)
    flat: Dict[tuple, np.ndarray] = {}
    consumed = set()
    missing = []
    for ref_key, path, kind in _gemnet_name_map(**map_kwargs):
        if ref_key not in sd:
            if kind == "scale":
                # scale buffers may live in a separate scale file instead
                # (ref: gemnet_relax.yml:87 scale_file) — not fatal
                continue
            missing.append(ref_key)
            continue
        v = np.asarray(sd[ref_key])
        if kind == "linear_T":
            v = v.T
        elif kind == "basis_T":
            v = v.T
        elif kind == "basis_sph":
            v = _basis_sph_to_ours(v)
        elif kind == "scale":
            v = v.reshape(())
        flat[path] = v
        consumed.add(ref_key)
    if missing:
        raise KeyError(f"reference GemNet-OC tensors missing from state_dict: {missing[:10]}"
                       f"{' ...' if len(missing) > 10 else ''}")
    leftover = [k for k in sd if k not in consumed]
    if leftover:
        logging.info(f"gemnet import: {len(leftover)} unmapped state_dict keys (e.g. {leftover[:5]})")

    out: Dict[str, Any] = {}
    for path, v in flat.items():
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    logging.info(f"imported {len(flat)} GemNet-OC tensors from torch state_dict")
    return out


def load_scale_file(path: str) -> Dict[str, float]:
    """Read a reference scale file (.pt via torch, or .json) into a flat
    {name: float} dict (ref: modules/scaling/compat.py load_scales_compat)."""
    import json
    import os

    ext = os.path.splitext(path)[1]
    if ext == ".pt":
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
    elif ext == ".json":
        with open(path) as f:
            raw = json.load(f)
        raw.pop("comment", None)
    else:
        raise ValueError(f"Unsupported scale file extension: {ext}")
    out = {}
    for k, v in raw.items():
        out[k] = float(v.item() if hasattr(v, "item") else v)
    return out


_GEMNET_SCALE_SUFFIXES = {
    # reference module path tail -> our ScaleFactor module-name tail
    "trip_interaction.scale_rbf": "tint_scale_rbf",
    "trip_interaction.scale_cbf_sum": "tint_scale_sum",
    "quad_interaction.scale_rbf": "qint_scale_rbf",
    "quad_interaction.scale_cbf": "qint_scale_cbf",
    "quad_interaction.scale_sbf_sum": "qint_scale_sbf",
    "atom_edge_interaction.scale_rbf": "aeint_scale_rbf",
    "atom_edge_interaction.scale_cbf_sum": "aeint_scale_sum",
    "edge_atom_interaction.scale_rbf": "eaint_scale_rbf",
    "edge_atom_interaction.scale_cbf_sum": "eaint_scale_sum",
    "atom_interaction.scale_rbf_sum": "aint_scale",
    "atom_update.scale_sum": "au_scale",
}


def gemnet_scale_dict_to_collection(scale_dict: Dict[str, float]) -> Dict[str, Any]:
    """Map reference scale-factor names (module paths like
    'int_blocks.0.trip_interaction.scale_rbf', with or without a
    '.scale_factor' suffix) onto our scale_factors collection.  Purely
    lexical, so it works for any block count."""
    import re

    out: Dict[str, Any] = {}
    unknown = []
    for name, value in scale_dict.items():
        key = name[: -len(".scale_factor")] if name.endswith(".scale_factor") else name
        ours = None
        m = re.fullmatch(r"int_blocks\.(\d+)\.(.+)", key)
        if m and m.group(2) in _GEMNET_SCALE_SUFFIXES:
            ours = f"int_block_{m.group(1)}_{_GEMNET_SCALE_SUFFIXES[m.group(2)]}"
        m = re.fullmatch(r"out_blocks\.(\d+)\.(scale_sum|scale_rbf_F)", key)
        if m:
            ours = f"out_block_{m.group(1)}_{m.group(2)}"
        if ours is None:
            unknown.append(name)
            continue
        out[ours] = {"scale": np.float32(value)}
    if unknown:
        logging.warning(f"scale file: {len(unknown)} unmapped scale names (e.g. {unknown[:5]})")
    return out
