"""EquiformerV2 — SO(2)-convolution graph-attention transformer on spherical
harmonics, TPU-native.

Rebuild of the reference EquiformerV2 (ref: adsorbdiff/models/equiformer_v2/
equiformer_v2_oc20.py:65-621, so2_ops.py:13-384, transformer_block.py:22-728,
equiformer_v2_denoising.py:55-318) on the dense padded ``[B, N, K]`` layout:

- node features are real-SH coefficient tensors ``[B, N, (lmax+1)^2, C]``;
- per-edge Wigner-D matrices come from the e3nn-free composition in
  :mod:`adsorbdiff_tpu.models.so3` (ref replaced: wigner.py Jd.pt asset);
- SO(2) convolutions act on m-indexed slices via static gather tables with
  the reference's complex weight structure (ref: so2_ops.py:13-238);
- attention softmax runs over the fixed K neighbor axis with masks (the
  reference's variable-edge segment softmax, same math);
- FFNs use the S^2 grid MLP path (``use_grid_mlp`` in the published config,
  ref: configs/denoising/eqv2_so3.yml) with exact Gauss-Legendre grids;
- the denoising variant's atomic-radius edge-distance offset
  (ref: equiformer_v2_denoising.py:208-213), conditional energy embedding
  added to the l=0 channel (:258-264, zeroed when sampling), and the second
  rotation-score head (``FOR_denoising``, :310-318) are all included.

Training regularization matches the reference drop module
(ref: equiformer_v2/drop.py:13-151, transformer_block.py:342-343, :686-706):
``alpha_drop`` is standard dropout on the post-softmax attention weights,
``drop_path_rate`` is per-graph stochastic depth on both residual branches
(GraphDropPath — graph == batch row in the dense layout), and ``proj_drop``
masks whole channels per node, shared across the SH-coefficient axis so it
stays equivariant (EquivariantDropoutArraySphericalHarmonics,
drop_graph=False).  All three are active only when ``training=True`` and are
keyed off the flax ``"dropout"`` RNG collection; the force/energy heads get
no dropout (ref: equiformer_v2_oc20.py:402 passes alpha_drop=0.0).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from adsorbdiff_tpu.common.registry import registry
from adsorbdiff_tpu.data.schema import AtomsBatch
from adsorbdiff_tpu.models.base import generate_graph
from adsorbdiff_tpu.models.layers import compute_dtype, compute_dtype_scope, gaussian_basis
from adsorbdiff_tpu.models.so3 import (
    coeff_select_matrix,
    edge_frame_rotation,
    l1_coeffs_to_vector,
    l_expand_matrix,
    m_index_tables,
    s2_grid_matrices,
    wigner_D_from_rot,
)

# Pauling-style atomic radii in pm / 100 (ref: models/embeddings ATOMIC_RADII,
# used by the denoising models to offset edge distances,
# ref: equiformer_v2_denoising.py:208-213). Values for Z=0..100, zeros where
# the reference table has missing entries.
ATOMIC_RADII_A = np.array([
    0.0, 0.25, 1.2, 1.45, 1.05, 0.85, 0.7, 0.65, 0.6, 0.5, 1.6,
    1.8, 1.5, 1.25, 1.1, 1.0, 1.0, 1.0, 0.71, 2.2, 1.8,
    1.6, 1.4, 1.35, 1.4, 1.4, 1.4, 1.35, 1.35, 1.35, 1.35,
    1.3, 1.25, 1.15, 1.15, 1.15, 0.0, 2.35, 2.0, 1.8, 1.55,
    1.45, 1.45, 1.35, 1.3, 1.35, 1.4, 1.6, 1.55, 1.55, 1.45,
    1.45, 1.4, 1.4, 0.0, 2.6, 2.15, 1.95, 1.85, 1.85, 1.85,
    1.85, 1.85, 1.85, 1.8, 1.75, 1.75, 1.75, 1.75, 1.75, 1.75,
    1.75, 1.55, 1.45, 1.35, 1.35, 1.3, 1.35, 1.35, 1.35, 1.5,
    1.9, 1.8, 1.6, 1.9, 0.0, 0.0, 0.0, 2.15, 1.95, 1.8,
    1.8, 1.75, 1.75, 1.75, 1.75, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
])


class EquivariantLayerNorm(nn.Module):
    """'layer_norm_sh': standard LN on l=0; per-l RMS norm with learned
    channel scales on l>0 (ref: equiformer_v2/layer_norm.py:44-472)."""

    lmax: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [..., (L)^2, C]
        c = x.shape[-1]
        out = [nn.LayerNorm()(x[..., 0, :])[..., None, :]]
        for l in range(1, self.lmax + 1):
            sl = x[..., l * l : (l + 1) * (l + 1), :]
            rms = jnp.sqrt(jnp.mean(jnp.sum(sl**2, axis=-2), axis=-1, keepdims=True) + 1e-8)
            w = self.param(f"w_l{l}", nn.initializers.ones, (c,))
            out.append(sl / rms[..., None, :] * w)
        return jnp.concatenate(out, axis=-2)


class _GroupLin(nn.Module):
    """Linear map over flattened (n, c) coefficient groups, applied WITHOUT
    flattening the activation: the 2-D kernel (same shape nn.Dense would
    store, so checkpoints are unchanged) is viewed 4-D and contracted with a
    single multi-dim dot.  Flattening [E, n, C] activations to [E, n*C] and
    back forces TPU relayout copies on every SO(2)-conv step — the dominant
    cost of the EqV2 attention before this rewrite (docs/PERF.md)."""

    n_in: int
    c_in: int
    n_out: int
    c_out: int
    extra: int = 0  # invariant features appended to the flattened input
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, extra_x: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cdt = compute_dtype()
        nc_in = self.n_in * self.c_in
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (nc_in + self.extra, self.n_out * self.c_out)
        )
        kx = k[:nc_in].reshape(self.n_in, self.c_in, self.n_out, self.c_out)
        if cdt is not None:
            x, kx = x.astype(cdt), kx.astype(cdt)
        y = jnp.einsum("...nc,ncmd->...md", x, kx)
        if extra_x is not None:
            ke = k[nc_in:].reshape(self.extra, self.n_out, self.c_out)
            if cdt is not None:
                extra_x, ke = extra_x.astype(cdt), ke.astype(cdt)
            y = y + jnp.einsum("...x,xmd->...md", extra_x, ke)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.n_out * self.c_out,))
            y = y + b.reshape(self.n_out, self.c_out).astype(y.dtype)
        return y


class _GateLin(nn.Module):
    """rad [..., R] -> per-(coefficient, channel) gate [..., n, c], without the
    [..., n*c] flatten (kernel/bias shapes match the nn.Dense it replaces)."""

    n: int
    c: int

    @nn.compact
    def __call__(self, rad: jnp.ndarray) -> jnp.ndarray:
        cdt = compute_dtype()
        k = self.param("kernel", nn.initializers.lecun_normal(), (rad.shape[-1], self.n * self.c))
        b = self.param("bias", nn.initializers.zeros, (self.n * self.c,))
        kr = k.reshape(rad.shape[-1], self.n, self.c)
        if cdt is not None:
            rad, kr = rad.astype(cdt), kr.astype(cdt)
        return jnp.einsum("...r,rnc->...nc", rad, kr) + b.reshape(self.n, self.c).astype(
            cdt or jnp.float32
        )


class SO2Conv(nn.Module):
    """SO(2) convolution in the edge frame with complex weight structure and
    radial gating (ref: so2_ops.py SO2_Convolution :78-238).

    input [..., (L)^2, C_in] (edge frame, m-truncated), rad [..., R_e].
    All per-m maps run layout-preserving (see :class:`_GroupLin`).
    """

    lmax: int
    mmax: int
    c_in: int
    c_out: int
    extra_m0_in: int = 0  # invariant features appended to the m=0 block

    @nn.compact
    def __call__(self, x: jnp.ndarray, rad: jnp.ndarray, extra_m0: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        idx0, idx_pos, idx_neg, _ = m_index_tables(self.lmax, self.mmax)
        dim = (self.lmax + 1) ** 2

        def sel(idx):  # gather coefficient rows as a constant one-hot matmul
            s = jnp.asarray(coeff_select_matrix(dim, tuple(int(i) for i in idx)), x.dtype)
            return jnp.einsum("ni,...ic->...nc", s, x)

        def put(idx, y):  # scatter back: S^T @ y
            s = jnp.asarray(coeff_select_matrix(dim, tuple(int(i) for i in idx)), y.dtype)
            return jnp.einsum("ni,...nc->...ic", s, y)

        # m = 0: group-linear over (n_l0, C) + invariant extras
        n0 = len(idx0)
        x0 = sel(idx0) * _GateLin(n0, self.c_in, name="rad_m0")(rad)
        extra = 0 if extra_m0 is None else extra_m0.shape[-1]
        out = put(idx0, _GroupLin(n0, self.c_in, n0, self.c_out, extra=extra, name="fc_m0")(x0, extra_m0))

        # m > 0: complex-structured pair weights
        for mi, (ip, iq) in enumerate(zip(idx_pos, idx_neg)):
            nl = len(ip)
            gate = _GateLin(nl, self.c_in, name=f"rad_m{mi + 1}")(rad)
            xp = sel(ip) * gate
            xn = sel(iq) * gate
            wr = _GroupLin(nl, self.c_in, nl, self.c_out, use_bias=False, name=f"fc_m{mi + 1}_r")
            wi = _GroupLin(nl, self.c_in, nl, self.c_out, use_bias=False, name=f"fc_m{mi + 1}_i")
            out = out + put(ip, wr(xp) - wi(xn))
            out = out + put(iq, wi(xp) + wr(xn))
        return out


class GridFFN(nn.Module):
    """S^2-grid MLP feed-forward (``use_grid_mlp``, ref: transformer_block.py
    FeedForwardNetwork :373-532)."""

    lmax: int
    hidden: int
    c_out: int
    grid_res: int = 18

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cdt = compute_dtype()
        to_grid, from_grid = s2_grid_matrices(self.lmax, self.grid_res, self.grid_res)
        g = jnp.einsum("gc,...cf->...gf", jnp.asarray(to_grid), x)  # c = coeff axis
        g = nn.Dense(self.hidden, dtype=cdt)(g)
        g = jax.nn.silu(g)
        g = nn.Dense(self.hidden, dtype=cdt)(g)
        g = jax.nn.silu(g)
        g = nn.Dense(self.c_out, dtype=cdt)(g)
        g = g.astype(x.dtype)
        return jnp.einsum("cg,...gf->...cf", jnp.asarray(from_grid), g)


def _gather_nodes(a: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """Row gather along the node axis without flattening trailing dims (a
    minor-dim merge would force a TPU relayout copy of the whole tensor)."""
    b, n, k = src.shape
    idx = src.reshape((b, n * k) + (1,) * (a.ndim - 2))
    out = jnp.take_along_axis(a, idx, axis=1)
    return out.reshape((b, n, k) + a.shape[2:])


def _gather_nodes_mm(a: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """One-hot MXU gather of float node features (the explicit gather HLO
    lowers to a while-loop on TPU — profiled at multiple ms per call on the
    [B,N,(L)^2,C] tensors; the batched one-hot matmul costs ~0.2 ms)."""
    b, n, k = src.shape
    onehot = (src.reshape(b, n * k, 1) == jnp.arange(n)[None, None, :]).astype(a.dtype)
    out = jnp.einsum("bem,bm...->be...", onehot, a)
    return out.reshape((b, n, k) + a.shape[2:])


class SO2Attention(nn.Module):
    """SO2EquivariantGraphAttention (ref: transformer_block.py:22-372).

    Returns per-node aggregated irreps [B, N, (L)^2, c_out].
    """

    lmax: int
    mmax: int
    channels: int
    attn_hidden: int
    num_heads: int
    attn_alpha: int
    attn_value: int
    c_out: int
    alpha_drop: float = 0.0
    training: bool = False

    @nn.compact
    def __call__(self, x, nl, d_mats, d_mats_inv, rad, edge_inv):
        _, _, _, mmask = m_index_tables(self.lmax, self.mmax)
        mmask = jnp.asarray(mmask)

        x_src = _gather_nodes_mm(x, nl.src)  # [B,N,K,(L)^2,C]
        x_tgt = jnp.broadcast_to(x[:, :, None], x_src.shape)
        msg = x_src + x_tgt
        # rotate into edge frame + m-truncate
        msg = jnp.einsum("bnkij,bnkjc->bnkic", d_mats, msg)
        msg = jnp.where(mmask[:, None], msg, 0.0)

        h = SO2Conv(self.lmax, self.mmax, self.channels, self.attn_hidden, name="so2_conv_1")(
            msg, rad, extra_m0=edge_inv
        )
        # separable attention: invariant l=0 part -> alpha logits per head
        inv = h[..., 0, :]
        alpha = nn.Dense(self.num_heads * self.attn_alpha, name="alpha_dense")(inv)
        alpha = jax.nn.leaky_relu(alpha, 0.2)
        alpha = alpha.reshape(alpha.shape[:-1] + (self.num_heads, self.attn_alpha))
        w = self.param("alpha_dot", nn.initializers.normal(1.0), (self.num_heads, self.attn_alpha))
        logits = jnp.sum(alpha * w, axis=-1)  # [B,N,K,H]
        logits = jnp.where(nl.mask[..., None], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=2)
        attn = jnp.where(nl.mask[..., None], attn, 0.0)
        if self.training and self.alpha_drop > 0.0:
            # post-softmax attention dropout (ref: transformer_block.py:342-343)
            keep = 1.0 - self.alpha_drop
            dm = jax.random.bernoulli(self.make_rng("dropout"), keep, attn.shape)
            attn = attn * dm.astype(attn.dtype) / keep

        # value path: gate-style activation then second SO(2) conv; the per-l
        # gate expands to the coefficient axis with one constant matmul
        # (repeat+concatenate chains lower to dynamic-update-slices on TPU)
        gate = jax.nn.silu(nn.Dense((self.lmax + 1) * self.attn_hidden, name="gate_dense")(inv))
        gate = gate.reshape(gate.shape[:-1] + (self.lmax + 1, self.attn_hidden))
        expand = jnp.asarray(l_expand_matrix(self.lmax), gate.dtype)
        h = h * jnp.einsum("cl,...lh->...ch", expand, gate)
        v = SO2Conv(self.lmax, self.mmax, self.attn_hidden, self.num_heads * self.attn_value,
                    name="so2_conv_2")(h, rad)
        # rotate each edge's value back to the global frame, then do the
        # attention-weighted sum over the K neighbors.  The per-head weights
        # are expanded along the channel axis (value channels contiguous per
        # head) so no [.., H, V] split of the minor dim is needed.
        v_rot = jnp.einsum("bnkij,bnkjc->bnkic", d_mats_inv, v)
        attn_c = jnp.repeat(attn, self.attn_value, axis=-1)  # [B,N,K,H*V]
        # broadcast-multiply + reduce over K: an einsum here would make the
        # minor channel dim a dot batch dim and relayout the whole tensor
        out = jnp.sum(v_rot * attn_c[..., None, :], axis=2)
        return nn.Dense(self.c_out, use_bias=False, name="proj")(out)


@registry.register_model("equiformer_v2")
@registry.register_model("equiformer_v2_denoising")
class EquiformerV2(nn.Module):
    """Hyperparameters follow the published config
    (ref: configs/denoising/eqv2_so3.yml:42-82)."""

    num_layers: int = 8
    sphere_channels: int = 128
    attn_hidden_channels: int = 64
    num_heads: int = 8
    attn_alpha_channels: int = 64
    attn_value_channels: int = 16
    ffn_hidden_channels: int = 128
    lmax: int = 4
    mmax: int = 2
    grid_resolution: int = 18
    edge_channels: int = 128
    num_distance_basis: int = 128
    cutoff: float = 12.0
    max_neighbors: int = 20
    max_num_elements: int = 90
    use_atom_edge_embedding: bool = True
    mode: str = "denoising"  # "denoising" | "s2ef"
    so3_denoising: bool = True
    for_denoising: bool = True  # second rotation head (ref FOR_denoising)
    energy_encoding: Optional[str] = None
    sampling: bool = False
    subtract_atomic_radii: bool = True  # denoising variant edge-distance offset
    cell_reps: Tuple[int, int, int] = (2, 2, 1)
    avg_degree: float = 20.0
    alpha_drop: float = 0.0
    drop_path_rate: float = 0.0
    proj_drop: float = 0.0
    training: bool = False
    compute_dtype: Optional[str] = None  # "bfloat16": SO(2)-conv + grid-FFN
    # matmuls in bf16 (params, geometry/Wigner math and norms stay f32)

    def _branch_drop(self, y: jnp.ndarray) -> jnp.ndarray:
        """Residual-branch regularization: per-graph stochastic depth then the
        equivariant per-node channel dropout, in the reference's order
        (ref: transformer_block.py:686-706)."""
        if not self.training:
            return y
        if self.drop_path_rate > 0.0:
            keep = 1.0 - self.drop_path_rate
            m = jax.random.bernoulli(self.make_rng("dropout"), keep, (y.shape[0], 1, 1, 1))
            y = y * m.astype(y.dtype) / keep
        if self.proj_drop > 0.0:
            # one mask per (node, channel), broadcast over the coefficient
            # axis — dropping whole channels keeps the output equivariant
            # (ref: drop.py EquivariantDropoutArraySphericalHarmonics :118-151)
            keep = 1.0 - self.proj_drop
            shape = (y.shape[0], y.shape[1], 1, y.shape[-1])
            m = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
            y = y * m.astype(y.dtype) / keep
        return y

    @nn.compact
    def __call__(self, batch: AtomsBatch):
        with compute_dtype_scope(self.compute_dtype):
            out = self._forward(batch)
        return jax.tree.map(lambda x: x.astype(jnp.float32), out)

    def _forward(self, batch: AtomsBatch):
        dim = (self.lmax + 1) ** 2
        nl, dist, unit = generate_graph(
            batch, cutoff=self.cutoff, max_neighbors=self.max_neighbors, cell_reps=self.cell_reps
        )
        z = jnp.clip(batch.atomic_numbers, 0, self.max_num_elements - 1)

        if self.mode == "denoising" and self.subtract_atomic_radii:
            # ref: equiformer_v2_denoising.py:208-213
            radii = jnp.asarray(ATOMIC_RADII_A, jnp.float32)[z]
            r_sum = radii[:, :, None] + _gather_nodes(radii, nl.src)
            dist = jnp.maximum(dist - r_sum, 1e-3)

        # edge frame rotations and Wigner-D blocks
        rot = edge_frame_rotation(unit)  # [B,N,K,3,3]
        d_mats = wigner_D_from_rot(self.lmax, rot)
        d_inv = jnp.swapaxes(d_mats, -1, -2)

        # distance basis + atom-pair edge embedding (ref: eqv2_oc20.py:258-264)
        rad_raw = gaussian_basis(dist, 0.0, self.cutoff, self.num_distance_basis)
        emb_s = nn.Embed(self.max_num_elements, self.edge_channels, name="src_embed")(
            _gather_nodes(z, nl.src)
        )
        emb_t = nn.Embed(self.max_num_elements, self.edge_channels, name="tgt_embed")(z)[:, :, None, :]
        rad = nn.Dense(self.edge_channels, name="rad_proj")(rad_raw)
        if self.use_atom_edge_embedding:
            rad = rad + emb_s + jnp.broadcast_to(emb_t, emb_s.shape)
        rad = jax.nn.silu(nn.Dense(self.edge_channels, name="rad_mlp")(rad))
        rad = jnp.where(nl.mask[..., None], rad, 0.0)
        edge_inv = rad  # invariant edge features fed to the m=0 block

        # initial node irreps: atom embedding on l=0 + edge-degree embedding
        # (ref: input_block.py EdgeDegreeEmbedding :11-137)
        x = jnp.zeros(batch.pos.shape[:2] + (dim, self.sphere_channels))
        x = x.at[..., 0, :].set(nn.Embed(self.max_num_elements, self.sphere_channels, name="sphere_embed")(z))
        if self.energy_encoding == "scalar":
            e_cond = jnp.zeros_like(batch.energy) if self.sampling else batch.energy
            e_emb = nn.Dense(self.sphere_channels, name="energy_embedding")(e_cond[:, None])
            x = x.at[..., 0, :].add(e_emb[:, None, :])  # l=0 channel (ref: :258-264)

        idx0, _, _, _ = m_index_tables(self.lmax, self.mmax)
        deg = nn.Dense(len(idx0) * self.sphere_channels, name="edge_degree_dense")(rad)
        deg = deg.reshape(deg.shape[:-1] + (len(idx0), self.sphere_channels))
        s0 = jnp.asarray(coeff_select_matrix(dim, tuple(int(i) for i in idx0)), deg.dtype)
        deg_full = jnp.einsum("ni,...nc->...ic", s0, deg)
        deg_full = jnp.einsum("bnkij,bnkjc->bnkic", d_inv, deg_full)
        deg_full = jnp.where(nl.mask[..., None, None], deg_full, 0.0)
        x = x + jnp.sum(deg_full, axis=2) / self.avg_degree

        # transformer blocks (ref: TransBlockV2 :533-728)
        for i in range(self.num_layers):
            y = EquivariantLayerNorm(self.lmax, name=f"norm_attn_{i}")(x)
            y = SO2Attention(
                self.lmax, self.mmax, self.sphere_channels, self.attn_hidden_channels,
                self.num_heads, self.attn_alpha_channels, self.attn_value_channels,
                self.sphere_channels, alpha_drop=self.alpha_drop,
                training=self.training, name=f"attn_{i}",
            )(y, nl, d_mats, d_inv, rad, edge_inv)
            x = x + self._branch_drop(y)
            y = EquivariantLayerNorm(self.lmax, name=f"norm_ffn_{i}")(x)
            y = GridFFN(self.lmax, self.ffn_hidden_channels, self.sphere_channels,
                        self.grid_resolution, name=f"ffn_{i}")(y)
            x = x + self._branch_drop(y)
            x = jnp.where(batch.atom_mask[..., None, None], x, 0.0)

        x = EquivariantLayerNorm(self.lmax, name="norm_final")(x)

        def force_head(tag: str) -> jnp.ndarray:
            f = SO2Attention(
                self.lmax, self.mmax, self.sphere_channels, self.attn_hidden_channels,
                self.num_heads, self.attn_alpha_channels, self.attn_value_channels,
                1, name=f"force_block{tag}",
            )(x, nl, d_mats, d_inv, rad, edge_inv)
            vec = l1_coeffs_to_vector(f[..., 1:4, 0])
            return jnp.where(batch.atom_mask[..., None], vec, 0.0)

        if self.mode == "s2ef":
            e = GridFFN(self.lmax, self.ffn_hidden_channels, 1, self.grid_resolution, name="energy_ffn")(x)
            e_atom = e[..., 0, 0]
            energy = jnp.sum(jnp.where(batch.atom_mask, e_atom, 0.0), axis=1)
            return {"energy": energy, "forces": force_head("")}

        forces = force_head("")
        if self.so3_denoising and self.for_denoising:
            return forces, force_head("2")
        return forces
