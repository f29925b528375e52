"""GemNet-OC — quadruplet/triplet/pair hierarchy GNN, TPU-native.

Rebuild of the reference GemNet-OC (ref: adsorbdiff/models/gemnet_oc/
gemnet_oc.py:47-1367, layers/*.py ~4,400 LoC) — the MLFF used for the
relaxation stage (ref: configs/relaxation/gemnet_oc/gemnet_relax.yml) and the
"gemnet_oc" denoising score model (ref: gemnet_oc_denoising.py:55-1410).

TPU-first redesign (same architecture, same hyperparameter names, different
data layout):

- the reference builds 4 variable-length sparse graphs with torch_scatter
  index plumbing (``get_graphs_and_indices``, ref: gemnet_oc.py:989-1123);
  here each graph is a fixed-shape ``[N, K]`` neighbor table and triplets /
  quadruplets are dense masked tensors ``[N, K_out, K_in]`` /
  ``[N, K1, Kq, K2]`` — every aggregation is an einsum over static axes
  (MXU-shaped batched matmuls), no scatter at all;
- ``EfficientInteractionBilinear`` (ref: layers/efficient.py:15-270) becomes a
  pair of einsums over (basis-emb, neighbor) axes;
- directed-edge bookkeeping (``id_swap``, edge symmetrization,
  ``repeat_blocks``) disappears: triplets/quads are enumerated *per output
  edge* with the reference's exact motifs (ref: interaction_indices.py) —
  e2e/a2e/e2a triplets SHARE THE TARGET atom (in-edge b->a, out-edge c->a,
  angle at a), so the in-edge axis is simply the other slots of the same
  dense row (no gather at all); quadruplets chain through the qint source
  (d->b main in-edge of b, qint edge b->a, main out-edge c->a) with the
  reference's angle conventions (cos_abd = <V_ba, V_db>, dihedral between
  V_ca x V_ba and V_db x V_ba, all V source->target) and all three identity
  masks (d != a, b != c, c != d as periodic atoms);
- the reference's ``symmetric_mp`` (ref: interaction_block.py:445-512,
  :595-668 — each directed edge also receives its REVERSE edge's aggregated
  message through a second up-projection, summed /sqrt(2)) is implemented
  densely: the reverse of table entry (i, k) is located by matching
  (source, -offset) in the source atom's row, gathered with a flat
  take_along_axis.  ``symmetric_mp=True`` is the default (matches the
  reference's hardcoded behavior and its checkpoint layout; reverse edges
  missing from the table — possible only when the strict top-K cap binds
  asymmetrically — contribute zero);
- bases: gaussian RBF x polynomial envelope, circular basis = Y_l0 Legendre
  (``spherical_harmonics``), spherical basis = Legendre outer product
  (``legendre_outer``) — ref: layers/spherical_basis.py:15-143.

Cited hot-spot parity: interaction block wiring ref: layers/
interaction_block.py:237-355, atom-update / output blocks ref: layers/
atom_update_block.py:18-195, force head = per-edge scalars projected on unit
edge vectors and summed per atom, ref: gemnet_oc.py:1330-1357.
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
from adsorbdiff_tpu.models.base import derive_subgraph, generate_graph
from adsorbdiff_tpu.models.layers import (
    AtomEmbedding,
    RadialBasis,
    ScaleFactor,
    compute_dtype,
    compute_dtype_scope,
    scaled_silu,
)


# --------------------------------------------------------------------------
# small layers
# --------------------------------------------------------------------------
class DenseLayer(nn.Module):
    """gemnet Dense: linear (He-orthogonal-ish init, no bias) + ScaledSiLU
    (ref: layers/base_layers.py Dense)."""

    units: int
    activation: bool = True
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(
            self.units, use_bias=self.bias, dtype=compute_dtype(),
            kernel_init=nn.initializers.orthogonal(),
        )(x)
        return scaled_silu(x) if self.activation else x


class ResidualLayer(nn.Module):
    """(x + MLP2(x)) / sqrt(2) (ref: layers/base_layers.py ResidualLayer)."""

    units: int

    @nn.compact
    def __call__(self, x):
        y = DenseLayer(self.units)(x)
        y = DenseLayer(self.units)(y)
        return (x + y) * (1 / math.sqrt(2.0))


class MLPStack(nn.Module):
    """Dense-in (if size changes) + nHidden residual blocks (ref: atom_update_block.get_mlp)."""

    units: int
    n_hidden: int
    dense_in: bool = True

    @nn.compact
    def __call__(self, x):
        if self.dense_in and x.shape[-1] != self.units:
            x = DenseLayer(self.units)(x)
        for _ in range(self.n_hidden):
            x = ResidualLayer(self.units)(x)
        return x


def legendre_y_l0(cos_theta: jnp.ndarray, num: int) -> jnp.ndarray:
    """Real spherical harmonics Y_l^0 ~ sqrt((2l+1)/4pi) P_l(cos),
    l = 0..num-1 (ref: layers/basis_utils.py via get_sph_harm_basis zero_m_only)."""
    ps = [jnp.ones_like(cos_theta), cos_theta]
    for l in range(2, num):
        ps.append(((2 * l - 1) * cos_theta * ps[l - 1] - (l - 1) * ps[l - 2]) / l)
    out = [math.sqrt((2 * l + 1) / (4 * math.pi)) * ps[l] for l in range(num)]
    return jnp.stack(out, axis=-1)


class BasisEmbedding(nn.Module):
    """rad (x sph) basis -> embedding via a learned tensor
    (ref: layers/efficient.py BasisEmbedding)."""

    num_radial: int
    emb_size: int
    num_spherical: Optional[int] = None

    @nn.compact
    def __call__(self, rad: jnp.ndarray, sph: Optional[jnp.ndarray] = None,
                 radw_only: bool = False) -> jnp.ndarray:
        cdt = compute_dtype()
        if radw_only:
            # partial application: contract only the radial axis, return
            # [..., S, F] for callers that contract the spherical axis in a
            # factorized order (see the quad interaction)
            assert self.num_spherical is not None
            w = self.param(
                "weight", nn.initializers.orthogonal(), (self.num_radial, self.num_spherical * self.emb_size)
            ).reshape(self.num_radial, self.num_spherical, self.emb_size)
            if cdt is not None:
                rad, w = rad.astype(cdt), w.astype(cdt)
            return jnp.einsum("...r,rsf->...sf", rad, w)
        if self.num_spherical is None:
            w = self.param("weight", nn.initializers.orthogonal(), (self.num_radial, self.emb_size))
            if cdt is not None:
                rad, w = rad.astype(cdt), w.astype(cdt)
            return rad @ w
        w = self.param(
            "weight", nn.initializers.orthogonal(), (self.num_radial, self.num_spherical * self.emb_size)
        )
        w = w.reshape(self.num_radial, self.num_spherical, self.emb_size)
        if cdt is not None:
            rad, sph, w = rad.astype(cdt), sph.astype(cdt), w.astype(cdt)
        return jnp.einsum("...r,...s,rsf->...f", rad, sph, w)


class EfficientBilinear(nn.Module):
    """sum over in-neighbors of basis-emb x message, bilinear to out size
    (ref: layers/efficient.py EfficientInteractionBilinear:15-270).

    basis: [..., K_in, F], x: [..., K_in, E_in], mask: [..., K_in]
    out:   [..., E_out] = reshape(sum_k basis_k (x) x_k) @ W
    """

    emb_size_in: int
    emb_size_basis: int
    emb_size_out: int

    @nn.compact
    def __call__(self, basis=None, x=None, mask=None, *, outer=None, contract_axes: int = 1):
        w = self.param(
            "weight",
            nn.initializers.orthogonal(),
            (self.emb_size_basis * self.emb_size_in, self.emb_size_out),
        )
        cdt = compute_dtype()
        if outer is None:
            if cdt is not None:
                basis, x = basis.astype(cdt), x.astype(cdt)
            basis = jnp.where(mask[..., None], basis, 0.0)
            if contract_axes == 2:
                # contract two neighbor axes directly — flattening them first
                # costs a relayout copy of the whole tensor on TPU
                outer = jnp.einsum("...abf,...abe->...fe", basis, x)
            else:
                outer = jnp.einsum("...kf,...ke->...fe", basis, x)
        if cdt is not None:
            outer, w = outer.astype(cdt), w.astype(cdt)
        flat = outer.reshape(outer.shape[:-2] + (self.emb_size_basis * self.emb_size_in,))
        return flat @ w


# --------------------------------------------------------------------------
# geometry helpers (dense)
# --------------------------------------------------------------------------
def _gather_rows(a: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """a: [B, N, ...], src: [B, N, K] -> a[b, src[b,i,k]] as [B, N, K, ...]."""
    b, n, k = src.shape
    flat = jnp.take_along_axis(
        a.reshape(b, a.shape[1], -1), src.reshape(b, n * k)[..., None], axis=1
    )
    return flat.reshape((b, n, k) + a.shape[2:])


def _cos_clamped(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    num = jnp.sum(u * v, axis=-1)
    den = jnp.linalg.norm(u, axis=-1) * jnp.linalg.norm(v, axis=-1)
    return jnp.clip(num / jnp.maximum(den, 1e-9), -1.0, 1.0)


def _img_key(src, off) -> jnp.ndarray:
    """Fold a (periodic source atom, summed offset) tuple into ONE int32 key
    so fused kernels evaluate edge-identity exclusions as a broadcast
    compare.  Offsets are bounded by cell_reps (<= 7 in magnitude), so
    base-16 digits encode exactly.  Two edges share a key iff they are the
    same geometric pair — the condition `_same_edge` tests field-wise."""
    k = src
    for ci in range(3):
        k = k * 16 + (off[..., ci] + 8)
    return k.astype(jnp.int32)


def _same_edge(src_a, off_a, src_b, off_b) -> jnp.ndarray:
    """True where (src, offset) pairs denote the same periodic neighbor."""
    return (src_a == src_b) & jnp.all(off_a == off_b, axis=-1)


def _reverse_edge_table(nl) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Locate each edge's reverse in the dense neighbor table.

    The reverse of entry (i, k) — edge src[i,k] -> i with offset
    -cell_offsets[i,k] — lives in row src[i,k] at the slot whose (source,
    offset) matches (i, -off).  Returns (rev_flat [B,N,K] int32 flat index
    src*K + rev_k, rev_valid [B,N,K] bool).  This is the dense analogue of
    the reference's ``id_swap`` (ref: gemnet_oc.py:700-819, built there via
    edge symmetrization + ``get_edge_id``).
    """
    b, n, k = nl.src.shape
    src_rows = _gather_rows(nl.src, nl.src)  # [B,N,K,K']
    off_rows = _gather_rows(nl.cell_offsets, nl.src)  # [B,N,K,K',3]
    mask_rows = _gather_rows(nl.mask, nl.src)
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)[:, :, None, None]
    match = (
        (src_rows == i_idx)
        & jnp.all(off_rows == -nl.cell_offsets[:, :, :, None, :], axis=-1)
        & mask_rows
        & nl.mask[..., None]
    )
    rev_k = jnp.argmax(match, axis=-1).astype(jnp.int32)
    rev_valid = jnp.any(match, axis=-1)
    rev_flat = nl.src * k + rev_k
    return rev_flat, rev_valid


# --------------------------------------------------------------------------
# the model
# --------------------------------------------------------------------------
@registry.register_model("gemnet_oc")
@registry.register_model("gemnet_oc_denoising")
class GemNetOC(nn.Module):
    """Hyperparameter names/defaults follow the published relaxation config
    (ref: configs/relaxation/gemnet_oc/gemnet_relax.yml:40-87)."""

    num_spherical: int = 7
    num_radial: int = 128
    num_blocks: int = 4
    emb_size_atom: int = 256
    emb_size_edge: int = 512
    emb_size_trip_in: int = 64
    emb_size_trip_out: int = 64
    emb_size_quad_in: int = 32
    emb_size_quad_out: int = 32
    emb_size_aint_in: int = 64
    emb_size_aint_out: int = 64
    emb_size_rbf: int = 16
    emb_size_cbf: int = 16
    emb_size_sbf: int = 32
    num_before_skip: int = 2
    num_after_skip: int = 2
    num_concat: int = 1
    num_atom: int = 3
    num_output_afteratom: int = 3
    num_atom_emb_layers: int = 2
    num_global_out_layers: int = 2
    cutoff: float = 12.0
    cutoff_qint: float = 12.0
    cutoff_aeaint: float = 12.0
    cutoff_aint: float = 12.0
    max_neighbors: int = 30
    max_neighbors_qint: int = 8
    max_neighbors_aeaint: int = 20
    rbf: Optional[dict] = None
    envelope: Optional[dict] = None
    extensive: bool = True
    quad_interaction: bool = True
    atom_edge_interaction: bool = True
    edge_atom_interaction: bool = True
    atom_interaction: bool = True
    qint_tags: Tuple[int, ...] = (1, 2)
    symmetric_mp: bool = True  # reference hardcodes True (interaction_block.py:116-145)
    num_elements: int = 83
    cell_reps: Tuple[int, int, int] = (2, 2, 1)
    max_ads: int = 16  # static bound on adsorbate atoms (incremental graphs)
    mode: str = "s2ef"  # "s2ef" | "denoising"
    so3_denoising: bool = True
    energy_encoding: Optional[str] = None
    sampling: bool = False
    use_pallas: bool = False  # fused quad dihedral-basis kernel (forward-only
    # paths: relaxation + sampling; training keeps the XLA formulation)
    fused_quad: bool = False  # whole quadruplet-chain pallas kernel (dihedral
    # basis + c==d mask + d2 + outer in one VMEM pass,
    # ops/pallas_kernels.py::gemnet_quad_chain); custom VJP recomputes in XLA
    fused_trip: bool = False  # e2e/a2e/e2a triplet-chain consumers through the
    # same kernel at q=1 (Legendre(cos) basis + exclusion mask from edge keys
    # + k-contraction + radW outer, nothing in HBM between); same VJP contract
    derive_subgraphs: bool = True  # aeaint/qint as K-prefix views of the main
    # table when cutoffs allow (base.py::derive_subgraph); False = 3 builds (A/B)
    compute_dtype: Optional[str] = None  # "bfloat16": feature-path Dense /
    # bilinear / basis-embedding matmuls in bf16 (params + geometry stay f32)

    @property
    def _derive_ae(self) -> bool:
        return (self.derive_subgraphs and self.cutoff_aeaint <= self.cutoff
                and self.max_neighbors_aeaint <= self.max_neighbors)

    @property
    def _derive_q(self) -> bool:
        return (self.derive_subgraphs and self.cutoff_qint <= self.cutoff
                and self.max_neighbors_qint <= self.max_neighbors)

    def _rbf(self, name: str, cutoff: Optional[float] = None):
        return RadialBasis(
            num_radial=self.num_radial,
            cutoff=self.cutoff if cutoff is None else cutoff,
            rbf=self.rbf or {"name": "gaussian"},
            envelope=self.envelope or {"name": "polynomial", "exponent": 5},
            name=name,
        )

    def prepare_static(self, batch: AtomsBatch):
        """Hoist slab-slab neighbor candidates for all three sparse graphs
        (main/aeaint/qint) out of a sampling loop; the dense a2a interaction
        is position-direct and needs no caching.  See
        :func:`adsorbdiff_tpu.models.base.prepare_static_graph`."""
        from adsorbdiff_tpu.models.base import prepare_static_graph

        out = {
            "main": prepare_static_graph(
                batch, cutoff=self.cutoff, max_neighbors=self.max_neighbors, cell_reps=self.cell_reps
            )
        }
        # graphs that _forward derives as K-prefix views of the main table
        # need no static part of their own
        if not self._derive_ae:
            out["aeaint"] = prepare_static_graph(
                batch, cutoff=self.cutoff_aeaint, max_neighbors=self.max_neighbors_aeaint,
                cell_reps=self.cell_reps,
            )
        if not self._derive_q:
            out["qint"] = prepare_static_graph(
                batch, cutoff=self.cutoff_qint, max_neighbors=self.max_neighbors_qint,
                cell_reps=self.cell_reps,
            )
        return out

    def prepare_candidates(self, batch: AtomsBatch, k_cand: int = 64):
        """Verlet candidate tables for relaxation loops (see
        :class:`adsorbdiff_tpu.ops.pbc.CandidateTable`).  Derived subgraphs
        (aeaint/qint at the published equal cutoffs) need no table of their
        own — they are K-prefix views of the refreshed main table."""
        from adsorbdiff_tpu.models.base import prepare_candidate_graph

        out = {
            "main": prepare_candidate_graph(
                batch, max_neighbors=self.max_neighbors, cell_reps=self.cell_reps, k_cand=k_cand
            )
        }
        if not self._derive_ae:
            out["aeaint"] = prepare_candidate_graph(
                batch, max_neighbors=self.max_neighbors_aeaint, cell_reps=self.cell_reps, k_cand=k_cand
            )
        if not self._derive_q:
            out["qint"] = prepare_candidate_graph(
                batch, max_neighbors=self.max_neighbors_qint, cell_reps=self.cell_reps, k_cand=k_cand
            )
        return out

    @nn.compact
    def __call__(self, batch: AtomsBatch, static_graph=None):
        with compute_dtype_scope(self.compute_dtype):
            out = self._forward(batch, static_graph)
        # feature paths may run bf16; the contract is f32 outputs
        return jax.tree.map(lambda x: x.astype(jnp.float32), out)

    def _forward(self, batch: AtomsBatch, static_graph=None):
        sg = static_graph or {}
        eps = 1e-9
        # geometry bases feeding the factorized bilinears are O(1)-ranged;
        # casting them keeps the big contractions in the compute dtype instead
        # of silently promoting back to f32
        cdt_cast = (lambda x: x.astype(compute_dtype())) if compute_dtype() else (lambda x: x)
        # ---------------- graphs (ref: get_graphs_and_indices :989-1123) ----
        nl, dist, unit = generate_graph(
            batch, cutoff=self.cutoff, max_neighbors=self.max_neighbors, cell_reps=self.cell_reps,
            static_graph=sg.get("main"), max_ads=self.max_ads,
        )
        emask = nl.mask  # [B, N, K1]
        # a2ee2a graph (atom-atom pairs for a2e / e2a triplets) and the qint
        # graph: when their cutoffs don't exceed the main cutoff (the
        # published configs use 12 A for all three) they are exact K-prefix
        # views of the main table — one build instead of three
        # (models/base.py::derive_subgraph)
        if self._derive_ae:
            nl_ae, dist_ae, unit_ae = derive_subgraph(
                nl, max_neighbors=self.max_neighbors_aeaint, cutoff=self.cutoff_aeaint
            )
        else:
            nl_ae, dist_ae, unit_ae = generate_graph(
                batch, cutoff=self.cutoff_aeaint, max_neighbors=self.max_neighbors_aeaint,
                cell_reps=self.cell_reps, static_graph=sg.get("aeaint"), max_ads=self.max_ads,
            )
        # qint graph restricted to qint_tags atoms (ref: gemnet_oc.py qint_tags)
        if self._derive_q:
            nl_q, dist_q, unit_q = derive_subgraph(
                nl, max_neighbors=self.max_neighbors_qint, cutoff=self.cutoff_qint
            )
        else:
            nl_q, dist_q, unit_q = generate_graph(
                batch, cutoff=self.cutoff_qint, max_neighbors=self.max_neighbors_qint,
                cell_reps=self.cell_reps, static_graph=sg.get("qint"), max_ads=self.max_ads,
            )
        tagged = jnp.zeros_like(batch.tags, dtype=bool)
        for t in self.qint_tags:
            tagged |= batch.tags == t
        # keep a qint edge if EITHER endpoint carries a qint tag
        # (ref: gemnet_oc.py:1022-1035, qint_tag_mask_s | qint_tag_mask_t)
        qmask = nl_q.mask & (tagged[:, :, None] | _gather_rows(tagged, nl_q.src))

        # Reference edge-vector convention: graph["vector"] points SOURCE ->
        # TARGET (c -> a, ref: gemnet_oc.py:915-919); our `unit` points target
        # -> source, so v = -unit below.  All angle formulas are written in
        # the reference's V terms and simplified (<-u, -w> = <u, w>).

        # ---------------- bases ---------------------------------------------
        rad_main = self._rbf("radial_basis")(dist)  # [B,N,K1,R]
        rad_ae = self._rbf("radial_basis_aeaint", self.cutoff_aeaint)(dist_ae)

        basis_atom_update = BasisEmbedding(self.num_radial, self.emb_size_rbf, name="mlp_rbf_h")(rad_main)
        basis_output = BasisEmbedding(self.num_radial, self.emb_size_rbf, name="mlp_rbf_out")(rad_main)

        # e2e triplets (ref: interaction_indices.get_triplets): in-edge b->a
        # and out-edge c->a SHARE THE TARGET a — in dense-row terms both are
        # slots of row a, so the triplet axes are (k1=out, k2=in) of the SAME
        # row and no gather is needed.  Only the identical edge is excluded
        # (k2 == k1); b == c in a different periodic image is a valid triplet.
        k1 = nl.src.shape[2]
        not_self = ~jnp.eye(k1, dtype=bool)[None, None]
        trip_mask_e2e = emask[:, :, :, None] & emask[:, :, None, :] & not_self
        # factorized triplet basis (same reordering as the quad interaction:
        # the bilinear's k-contraction runs against the S-component cbf
        # instead of a materialized [B,N,K1,K2,F] cir tensor)
        key_main = _img_key(nl.src, nl.cell_offsets) if (
            self.fused_trip or self.quad_interaction and self.fused_quad
        ) else None
        if self.fused_trip:
            # whole-chain kernel consumes the raw units + exclusion keys per
            # block; no basis tensor is materialized.  The identical-edge
            # exclusion (k2 == k1 slot) IS key equality: neighbor-table rows
            # are distinct (atom, image) candidates, so same key <=> same slot.
            cbf_e2e = e2e_eq = None
            tkey_out_e2e = jnp.where(emask, key_main, -1)  # [B,N,K1]
            tkey_in_e2e = jnp.where(emask, key_main, -2)[:, :, None, :]  # [B,N,1,K1]
        elif self.use_pallas:
            from adsorbdiff_tpu.ops.pallas_kernels import gemnet_cbf_basis

            cbf_e2e = gemnet_cbf_basis(
                unit, unit, trip_mask_e2e, self.num_spherical,
                out_dtype=compute_dtype() or jnp.float32,
            )  # [B,N,S,K1,K2]
            e2e_eq = "bnsuk,bnke->bnuse"
        else:
            cos_cab = _cos_clamped(unit[:, :, :, None, :], unit[:, :, None, :, :])  # <V_ca, V_ba>
            cbf_e2e = cdt_cast(jnp.where(
                trip_mask_e2e[..., None], legendre_y_l0(cos_cab, self.num_spherical), 0.0
            ))  # [B,N,K1,K2,S], mask folded
            e2e_eq = "bnuks,bnke->bnuse"
        radw_tint = BasisEmbedding(
            self.num_radial, self.emb_size_cbf, self.num_spherical, name="mlp_cbf_tint"
        )(rad_main, radw_only=True)  # [B,N,K1,S,F] — radial part of the OUT edge d_ca
        rad_e2e = BasisEmbedding(self.num_radial, self.emb_size_rbf, name="mlp_rbf_tint")(rad_main)

        # quadruplets (ref: interaction_indices.get_quadruplets): out edge ca
        # (a,k1), qint edge ba (a,kq, src b), main in-edge db of b (b,k2)
        if self.quad_interaction:
            q_in_unit = _gather_rows(unit, nl_q.src)  # [B,N,Kq,K2,3]: b's in-edges d->b
            q_in_mask = _gather_rows(emask, nl_q.src)
            # cos(abd) = <V_ba, V_db> (ref: calculate_quad_angles :668-676);
            # V_ba = -unit_q, V_db = -q_in_unit, signs cancel
            cos_abd = _cos_clamped(unit_q[:, :, :, None, :], q_in_unit)  # [B,N,Kq,K2]
            cbf_q = legendre_y_l0(cos_abd, self.num_spherical)
            rad_q = self._rbf("radial_basis_qint", self.cutoff_qint)(dist_q)
            cir_q = BasisEmbedding(self.num_radial, self.emb_size_cbf, self.num_spherical, name="mlp_cbf_qint")(
                rad_q[:, :, :, None, :], cbf_q
            )
            # cos(cab) = <V_ca, V_ba> = <unit, unit_q>: [B,N,K1,Kq]
            cos_cab_q = _cos_clamped(unit[:, :, :, None, :], unit_q[:, :, None, :, :])
            # dihedral cabd = angle between V_ca x V_ba and V_db x V_ba
            # (ref: :678-698); in our -V terms: n1 = unit x unit_q,
            # n2 = q_in_unit x unit_q
            n1 = jnp.cross(unit[:, :, :, None, :], unit_q[:, :, None, :, :])  # [B,N,K1,Kq,3]
            n2 = jnp.cross(q_in_unit, unit_q[:, :, :, None, :])  # [B,N,Kq,K2,3]
            # The quad spherical basis factorizes: sbf[(i,j)] = Ya_i(cab) *
            # Yd_j(dihedral), and the quad mask factorizes as m1(k1,kq) *
            # m2(kq,k2) — so the (basis-embed x message) contraction reorders
            # into small per-factor einsums.  A direct dense build
            # ([B,N,K1,Kq,K2,S^2] basis + its R-contraction) costs ~9 TFLOP
            # and ~9 GB at published size; this order costs ~0.1 TFLOP and
            # peaks at the [B,N,K1,Kq,K2,S] Legendre transient.  Same math as
            # ref layers/efficient.py EfficientInteractionBilinear, dense form.
            sph_w = BasisEmbedding(
                self.num_radial, self.emb_size_sbf, self.num_spherical**2, name="mlp_sbf_qint"
            )
            # radW: [B,N,K1,(i,j),F] -> reshape (i, j) apart
            radw = sph_w(rad_main, radw_only=True).reshape(
                rad_main.shape[:3] + (self.num_spherical, self.num_spherical, self.emb_size_sbf)
            )
            y_cab = legendre_y_l0(cos_cab_q, self.num_spherical)  # [B,N,K1,Kq,S]
            rad_qint_edges = BasisEmbedding(self.num_radial, self.emb_size_rbf, name="mlp_rbf_qint")(rad_main)
            # quad validity: b != c, d != a, c != d (as periodic atoms,
            # ref: get_quadruplets masks)
            b_is_c = _same_edge(
                nl_q.src[:, :, None, :], nl_q.cell_offsets[:, :, None, :, :],
                nl.src[:, :, :, None], nl.cell_offsets[:, :, :, None, :],
            )  # [B,N,K1,Kq]
            a_idx = jax.lax.broadcasted_iota(jnp.int32, nl_q.src.shape[:2], 1)
            d_is_a = _same_edge(
                _gather_rows(nl.src, nl_q.src),
                _gather_rows(nl.cell_offsets, nl_q.src),
                a_idx[:, :, None, None],
                -nl_q.cell_offsets[:, :, :, None, :],
            )  # [B,N,Kq,K2]
            # quad mask, factorized: m1 over (k1,kq), m2 over (kq,k2)
            quad_m1 = emask[:, :, :, None] & qmask[:, :, None, :] & ~b_is_c  # [B,N,K1,Kq]
            quad_m2 = q_in_mask & ~d_is_a  # [B,N,Kq,K2]
            # c == d exclusion does NOT factorize over (k1,kq)x(kq,k2) — but
            # the dihedral Legendre tensor already carries all three axes, so
            # the exclusion folds into it as a mask for free (profiled: the
            # earlier argmax-gather-subtract formulation cost ~27% of the
            # whole relaxation step in take_along_axis gathers + relayouts).
            # Condition: src[b,k2] == src[a,k1] and off_main[b,k2] + off_q[a,kq]
            # == off_main[a,k1] (all chains measured to the same target image).
            q_src_rows = _gather_rows(nl.src, nl_q.src)  # [B,N,Kq,K2]
            q_off_rows = _gather_rows(nl.cell_offsets, nl_q.src)  # [B,N,Kq,K2,3]
            quad_keys = None
            if self.fused_quad:
                quad_keys = (
                    _img_key(nl.src, nl.cell_offsets),  # [B,N,K1]
                    _img_key(
                        q_src_rows,
                        q_off_rows + nl_q.cell_offsets[:, :, :, None, :],
                    ),  # [B,N,Kq,K2]
                )
            cd_match = None
            if not self.fused_quad:
                cd_match = (
                    (q_src_rows[:, :, None, :, :] == nl.src[:, :, :, None, None])
                    & jnp.all(
                        q_off_rows[:, :, None, :, :, :] + nl_q.cell_offsets[:, :, None, :, None, :]
                        - nl.cell_offsets[:, :, :, None, None, :]
                        == 0,
                        axis=-1,
                    )
                )  # [B,N,K1,Kq,K2] bool
            if self.fused_quad:
                y_dih_pl = y_dih_full = None
            elif self.use_pallas:
                # fused VMEM kernel: cross-normalize -> cos -> Legendre ->
                # c==d mask; the [B,N,K1,Kq,K2,{3,1,S}] broadcast transients
                # never reach HBM (forward-only paths)
                from adsorbdiff_tpu.ops.pallas_kernels import gemnet_quad_basis

                y_dih_pl = gemnet_quad_basis(
                    n1, n2, ~cd_match, self.num_spherical,
                    out_dtype=compute_dtype() or jnp.float32,
                )  # [B,N,S,Kq,K1,K2]
                y_dih_full = None
            else:
                n1e = n1[:, :, :, :, None, :]  # [B,N,K1,Kq,1,3]
                n2e = n2[:, :, None, :, :, :]  # [B,N,1,Kq,K2,3]
                cos_dih = jnp.sum(n1e * n2e, axis=-1) / jnp.maximum(
                    jnp.linalg.norm(n1e, axis=-1) * jnp.linalg.norm(n2e, axis=-1), eps
                )
                cos_dih = jnp.clip(cos_dih, -1.0, 1.0)  # [B,N,K1,Kq,K2]
                y_dih_full = jnp.where(
                    cd_match[..., None], 0.0, legendre_y_l0(cos_dih, self.num_spherical)
                )  # [B,N,K1,Kq,K2,S], c == d quads excluded at the basis
            # fold m1 into the (cab x radW) factor, computed once for all blocks
            ya_m1 = jnp.where(quad_m1[..., None], y_cab, 0.0)
            if self.fused_quad:
                # pad the small einsum OPERANDS to the kernel's u granularity
                # so quad_p comes out pre-padded (profiled: a post-hoc jnp.pad
                # of the 70 MB tensor cost 1.3 ms/step as a pad_convert copy)
                u_pad = (-ya_m1.shape[2]) % 32
                ya_p = jnp.pad(ya_m1, ((0, 0), (0, 0), (0, u_pad), (0, 0), (0, 0)))
                radw_p = jnp.pad(radw, ((0, 0), (0, 0), (0, u_pad)) + ((0, 0),) * 3)
                quad_p = jnp.einsum(
                    "bnuqi,bnuijf->bnujqf", cdt_cast(ya_p), cdt_cast(radw_p)
                )  # [B,N,u32,S,Kq,F] — gemnet_quad_chain's (u, level, slot) order
            else:
                quad_p = jnp.einsum("bnuqi,bnuijf->bnuqjf", cdt_cast(ya_m1), radw)  # [B,N,K1,Kq,S,F]

        # a2e triplets (ref: get_mixed_triplets(a2ee2a, main)): in-edge b->a
        # (a2ee2a) and out-edge c->a (main) SHARE THE TARGET a — both are
        # slots of row a, no gather.  Message = dense(h)[b] expanded over
        # a2ee2a edges; excluded self-loops are b == c in the same image.
        same_ae = _same_edge(
            nl_ae.src[:, :, None, :], nl_ae.cell_offsets[:, :, None, :, :],
            nl.src[:, :, :, None], nl.cell_offsets[:, :, :, None, :],
        )  # [B,N,K1,Kae]: same periodic source atom across the two tables
        key_ae = _img_key(nl_ae.src, nl_ae.cell_offsets) if self.fused_trip else None
        if self.atom_edge_interaction:
            trip_mask_a2e = emask[:, :, :, None] & nl_ae.mask[:, :, None, :] & ~same_ae
            if self.fused_trip:
                # b == c exclusion across tables = same (src, offset) = same key
                cbf_a2e = a2e_eq = None
                tkey_out_a2e = jnp.where(emask, key_main, -1)
                tkey_in_a2e = jnp.where(nl_ae.mask, key_ae, -2)[:, :, None, :]
            elif self.use_pallas:
                from adsorbdiff_tpu.ops.pallas_kernels import gemnet_cbf_basis

                cbf_a2e = gemnet_cbf_basis(
                    unit, unit_ae, trip_mask_a2e, self.num_spherical,
                    out_dtype=compute_dtype() or jnp.float32,
                )  # [B,N,S,K1,Kae]
                a2e_eq = "bnsuk,bnke->bnuse"
            else:
                cos_a2e = _cos_clamped(unit[:, :, :, None, :], unit_ae[:, :, None, :, :])  # <V_ca, V_ba>
                cbf_a2e = cdt_cast(jnp.where(
                    trip_mask_a2e[..., None], legendre_y_l0(cos_a2e, self.num_spherical), 0.0
                ))  # [B,N,K1,Kae,S], mask folded (factorized, see e2e)
                a2e_eq = "bnuks,bnke->bnuse"
            radw_aeint = BasisEmbedding(
                self.num_radial, self.emb_size_cbf, self.num_spherical, name="mlp_cbf_aeint"
            )(rad_main, radw_only=True)  # [B,N,K1,S,F] — radial of the main OUT edge
            rad_a2e = BasisEmbedding(self.num_radial, self.emb_size_rbf, name="mlp_rbf_aeint")(rad_ae)

        # e2a triplets (ref: get_mixed_triplets(main, a2ee2a) + idx_agg2):
        # in-edge b->a (main) and out-edge c->a (a2ee2a) share the target a;
        # the bilinear output aggregates into atom a (the a2ee2a target).
        if self.edge_atom_interaction:
            if self.fused_trip:
                cbf_e2a = None
                tkey_out_e2a = jnp.where(nl_ae.mask, key_ae, -1)
                tkey_in_e2a = jnp.where(emask, key_main, -2)[:, :, None, :]
            else:
                cos_e2a = _cos_clamped(unit_ae[:, :, :, None, :], unit[:, :, None, :, :])  # <V_ca(ae), V_ba(main)>
                trip_mask_e2a = (
                    nl_ae.mask[:, :, :, None]
                    & emask[:, :, None, :]
                    & ~jnp.swapaxes(same_ae, 2, 3)
                )  # [B,N,Kae,K1]
                cbf_e2a = cdt_cast(jnp.where(
                    trip_mask_e2a[..., None], legendre_y_l0(cos_e2a, self.num_spherical), 0.0
                ))  # [B,N,Kae,K1,S], mask folded
            radw_eaint = BasisEmbedding(
                self.num_radial, self.emb_size_cbf, self.num_spherical, name="mlp_cbf_eaint"
            )(rad_ae, radw_only=True)  # [B,N,Kae,S,F] — radial of the a2ee2a OUT edge
            rad_e2a = BasisEmbedding(self.num_radial, self.emb_size_rbf, name="mlp_rbf_eaint")(rad_main)

        # a2a: all pairs within cutoff_aint including in-plane periodic images
        # (dense, cap-free like the config's max_neighbors_aint: 1000 under
        # full PBC).  The PairInteraction message is linear in the embedded
        # radial basis, so images fold into a masked per-image accumulation of
        # the basis — downstream consumers see the same [B,N,N,emb] tensor.
        # z-images are skipped: the slab vacuum exceeds cutoff_aint.
        if self.atom_interaction:
            rbf_aint = self._rbf("radial_basis_aint", self.cutoff_aint)
            emb_aint = BasisEmbedding(self.num_radial, self.emb_size_rbf, name="mlp_rbf_aint")
            pair_mask = batch.atom_mask[:, :, None] & batch.atom_mask[:, None, :]
            rx, ry = int(self.cell_reps[0]), int(self.cell_reps[1])
            basis_a2a = 0.0
            for oi in range(-rx, rx + 1):
                for oj in range(-ry, ry + 1):
                    shift = oi * batch.cell[:, 0] + oj * batch.cell[:, 1]  # [B,3]
                    diff = batch.pos[:, None, :, :] + shift[:, None, None, :] - batch.pos[:, :, None, :]
                    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)  # grad-safe at i==j
                    m_img = pair_mask & (dist <= self.cutoff_aint) & (dist > 1e-2)
                    basis_a2a = basis_a2a + jnp.where(m_img[..., None], emb_aint(rbf_aint(dist)), 0.0)
            aa_mask = pair_mask  # per-image cutoffs already applied above

        # ---------------- embeddings (ref: forward :1272-1276) --------------
        z = batch.atomic_numbers
        h = AtomEmbedding(self.emb_size_atom, self.num_elements, name="atom_emb")(z)
        if self.energy_encoding == "scalar":
            e_cond = jnp.zeros_like(batch.energy) if self.sampling else batch.energy
            h = h + nn.Dense(self.emb_size_atom, name="energy_embedding")(e_cond[:, None])[:, None, :]
        # EdgeEmbedding concat order is [h_source, h_target, rbf]
        # (ref: layers/embedding_block.py:95-101: cat[h_s, h_t, m])
        h_src = _gather_rows(h, nl.src)
        m = DenseLayer(self.emb_size_edge, name="edge_emb")(
            jnp.concatenate([h_src, jnp.broadcast_to(h[:, :, None, :], h_src.shape), rad_main], axis=-1)
        )  # [B,N,K1,He]
        m = jnp.where(emask[..., None], m, 0.0)

        def out_block(i, h, m):
            """OutputBlock (ref: atom_update_block.py:92-195)."""
            name = f"out_block_{i}"
            be = DenseLayer(self.emb_size_edge, activation=False, name=f"{name}_rbf_E")(basis_output)
            xe = jnp.sum(jnp.where(emask[..., None], m * be, 0.0), axis=2)
            xe = ScaleFactor(name=f"{name}_scale_sum")(xe)
            xe = MLPStack(self.emb_size_atom, self.num_atom, name=f"{name}_seq_E")(xe)
            xe = (xe + h) * (1 / math.sqrt(2.0))
            xe = MLPStack(self.emb_size_atom, self.num_output_afteratom, name=f"{name}_seq_E2")(xe)
            xf = MLPStack(self.emb_size_edge, self.num_atom, dense_in=False, name=f"{name}_seq_F")(m)
            bf = DenseLayer(self.emb_size_edge, activation=False, name=f"{name}_rbf_F")(basis_output)
            xf = ScaleFactor(name=f"{name}_scale_rbf_F")(xf * bf)
            return xe, xf

        xs_e, xs_f = [], []
        xe, xf = out_block(0, h, m)
        xs_e.append(xe)
        xs_f.append(xf)

        inv_sqrt_2 = 1 / math.sqrt(2.0)

        if self.symmetric_mp:
            rev_flat, rev_valid = _reverse_edge_table(nl)
            bsz, n_atoms, k1 = nl.src.shape

            def swap_gather(x):
                """x[rev(e)] for every table entry e (zero where absent).

                Measured alternative: an [E, E] one-hot MXU matmul permutation
                costs the same ~4 ms/step its FLOPs save from the inefficient
                XLA row gather (71 GF/step over the 12 swap sites) — the
                gather stays for simplicity."""
                flat = x.reshape(bsz, n_atoms * k1, x.shape[-1])
                got = jnp.take_along_axis(flat, rev_flat.reshape(bsz, n_atoms * k1, 1), axis=1)
                got = got.reshape(bsz, n_atoms, k1, x.shape[-1])
                return jnp.where(rev_valid[..., None], got, 0.0)
        n_eint = 2 + int(self.quad_interaction) + int(self.atom_edge_interaction)
        n_aint = 1 + int(self.edge_atom_interaction) + int(self.atom_interaction)

        for blk in range(self.num_blocks):
            name = f"int_block_{blk}"
            x_skip = DenseLayer(self.emb_size_edge, name=f"{name}_dense_ca")(m)

            # --- e2e triplet interaction (ref: TripletInteraction) ----------
            x_ba = DenseLayer(self.emb_size_edge, name=f"{name}_tint_dense")(m)
            x_ba = ScaleFactor(name=f"{name}_tint_scale_rbf")(
                x_ba * DenseLayer(self.emb_size_edge, activation=False, name=f"{name}_tint_rbf")(rad_e2e)
            )
            x_ba = DenseLayer(self.emb_size_trip_in, name=f"{name}_tint_down")(x_ba)
            # in-edges b->a are the other slots of the SAME row a — no gather
            if self.fused_trip:
                from adsorbdiff_tpu.ops.pallas_kernels import gemnet_quad_chain

                outer_t = gemnet_quad_chain(
                    unit[:, :, :, None, :], unit[:, :, None, :, :],
                    tkey_out_e2e, tkey_in_e2e,
                    jnp.where(emask[..., None], x_ba, 0.0)[:, :, None],
                    radw_tint.astype(x_ba.dtype)[:, :, :, :, None, :],
                    self.num_spherical, out_dtype=compute_dtype() or jnp.float32,
                )  # [B,N,K1,F,E]
            else:
                d_t = jnp.einsum(e2e_eq, cbf_e2e, x_ba)
                outer_t = jnp.einsum("bnusf,bnuse->bnufe", radw_tint.astype(d_t.dtype), d_t)
            x_t = EfficientBilinear(self.emb_size_trip_in, self.emb_size_cbf, self.emb_size_trip_out,
                                    name=f"{name}_tint_bilinear")(outer=outer_t)
            x_t = ScaleFactor(name=f"{name}_tint_scale_sum")(x_t)
            x_e2e = DenseLayer(self.emb_size_edge, name=f"{name}_tint_up")(x_t)
            if self.symmetric_mp:
                x_e2e_ac = DenseLayer(self.emb_size_edge, name=f"{name}_tint_up_ac")(x_t)
                x_e2e = (x_e2e + swap_gather(x_e2e_ac)) * inv_sqrt_2

            x = x_skip + x_e2e

            # --- quadruplet interaction (ref: QuadrupletInteraction) --------
            if self.quad_interaction:
                x_db = DenseLayer(self.emb_size_edge, name=f"{name}_qint_dense")(m)
                x_db = ScaleFactor(name=f"{name}_qint_scale_rbf")(
                    x_db * DenseLayer(self.emb_size_edge, activation=False, name=f"{name}_qint_rbf")(rad_qint_edges)
                )
                x_db = DenseLayer(self.emb_size_quad_in, name=f"{name}_qint_down")(x_db)
                # triplets (a, kq(b), k2(d)): in-edge emb of b's edges x cbf(abd)
                x_db_t = _gather_rows(x_db, nl_q.src)  # [B,N,Kq,K2,eq]
                cbf_gate = DenseLayer(self.emb_size_quad_in, activation=False, name=f"{name}_qint_cbf_gate")(cir_q)
                x_db_t = ScaleFactor(name=f"{name}_qint_scale_cbf")(x_db_t * cbf_gate)
                # factorized contraction (see the basis-stage comment): contract
                # k2 against the (c==d-masked) dihedral Legendre, then (kq, j)
                # against the m1-folded (cab x radW) factor — no [K1,Kq,K2,F]
                # tensor exists
                xm = jnp.where(quad_m2[..., None], x_db_t, 0.0)  # [B,N,Kq,K2,eq]
                if self.fused_quad:
                    from adsorbdiff_tpu.ops.pallas_kernels import gemnet_quad_chain

                    outer = gemnet_quad_chain(
                        n1, n2, quad_keys[0], quad_keys[1], xm,
                        quad_p.astype(xm.dtype), self.num_spherical,
                        out_dtype=compute_dtype() or jnp.float32,
                    )
                elif self.use_pallas:
                    d2 = jnp.einsum("bnjquk,bnqke->bnuqje", y_dih_pl, xm)
                    outer = jnp.einsum("bnuqjf,bnuqje->bnufe", quad_p.astype(d2.dtype), d2)
                else:
                    d2 = jnp.einsum("bnuqkj,bnqke->bnuqje", cdt_cast(y_dih_full), xm)
                    outer = jnp.einsum("bnuqjf,bnuqje->bnufe", quad_p.astype(d2.dtype), d2)
                x_q = EfficientBilinear(self.emb_size_quad_in, self.emb_size_sbf, self.emb_size_quad_out,
                                        name=f"{name}_qint_bilinear")(outer=outer)
                x_q = ScaleFactor(name=f"{name}_qint_scale_sbf")(x_q)
                x_q_up = DenseLayer(self.emb_size_edge, name=f"{name}_qint_up")(x_q)
                if self.symmetric_mp:
                    x_q_ac = DenseLayer(self.emb_size_edge, name=f"{name}_qint_up_ac")(x_q)
                    x_q_up = (x_q_up + swap_gather(x_q_ac)) * inv_sqrt_2
                x = x + x_q_up

            # --- atom->edge interaction (ref: TripletInteraction a2e) -------
            if self.atom_edge_interaction:
                # a2e uses ATOM-sized dense/rbf (ref: InteractionBlock builds
                # atom_edge_interaction with emb_size_in=emb_size_atom)
                x_h = DenseLayer(self.emb_size_atom, name=f"{name}_aeint_dense")(h)
                x_h = _gather_rows(x_h, nl_ae.src)  # [B,N,Kae,A]: neighbor-atom embs
                x_h = ScaleFactor(name=f"{name}_aeint_scale_rbf")(
                    x_h * DenseLayer(self.emb_size_atom, activation=False, name=f"{name}_aeint_rbf")(rad_a2e)
                )
                x_h = DenseLayer(self.emb_size_trip_in, name=f"{name}_aeint_down")(x_h)
                # in-edges (a2ee2a b->a) are slots of the same row a — no gather
                if self.fused_trip:
                    from adsorbdiff_tpu.ops.pallas_kernels import gemnet_quad_chain

                    outer_ae = gemnet_quad_chain(
                        unit[:, :, :, None, :], unit_ae[:, :, None, :, :],
                        tkey_out_a2e, tkey_in_a2e,
                        jnp.where(nl_ae.mask[..., None], x_h, 0.0)[:, :, None],
                        radw_aeint.astype(x_h.dtype)[:, :, :, :, None, :],
                        self.num_spherical, out_dtype=compute_dtype() or jnp.float32,
                    )
                else:
                    d_ae = jnp.einsum(a2e_eq, cbf_a2e, x_h)
                    outer_ae = jnp.einsum("bnusf,bnuse->bnufe", radw_aeint.astype(d_ae.dtype), d_ae)
                x_ae = EfficientBilinear(self.emb_size_trip_in, self.emb_size_cbf, self.emb_size_trip_out,
                                         name=f"{name}_aeint_bilinear")(outer=outer_ae)
                x_ae = ScaleFactor(name=f"{name}_aeint_scale_sum")(x_ae)
                x_ae_up = DenseLayer(self.emb_size_edge, name=f"{name}_aeint_up")(x_ae)
                if self.symmetric_mp:
                    x_ae_ac = DenseLayer(self.emb_size_edge, name=f"{name}_aeint_up_ac")(x_ae)
                    x_ae_up = (x_ae_up + swap_gather(x_ae_ac)) * inv_sqrt_2
                x = x + x_ae_up

            x = x * (1 / math.sqrt(n_eint))

            # --- edge->atom interaction (aggregates into atoms) --------------
            h_new = h
            if self.edge_atom_interaction:
                x_m = DenseLayer(self.emb_size_edge, name=f"{name}_eaint_dense")(m)
                x_m = ScaleFactor(name=f"{name}_eaint_scale_rbf")(
                    x_m * DenseLayer(self.emb_size_edge, activation=False, name=f"{name}_eaint_rbf")(rad_e2a)
                )
                # e2a uses the TRIP sizes for down/bilinear (ref: InteractionBlock
                # builds edge_atom_interaction with emb_size_trip_in/out)
                x_m = DenseLayer(self.emb_size_trip_in, name=f"{name}_eaint_down")(x_m)
                # in-edges (main b->a) are slots of the same row a — no gather;
                # per atom: sum over (kae, s, k1) of radW(d_ca) Y(cab) x[b->a]
                if self.fused_trip:
                    from adsorbdiff_tpu.ops.pallas_kernels import gemnet_quad_chain

                    out_ea_u = gemnet_quad_chain(
                        unit_ae[:, :, :, None, :], unit[:, :, None, :, :],
                        tkey_out_e2a, tkey_in_e2a,
                        jnp.where(emask[..., None], x_m, 0.0)[:, :, None],
                        radw_eaint.astype(x_m.dtype)[:, :, :, :, None, :],
                        self.num_spherical, out_dtype=compute_dtype() or jnp.float32,
                    )  # [B,N,Kae,F,E]; e2a aggregates into the atom
                    outer_ea = jnp.sum(out_ea_u, axis=2)
                else:
                    d_ea = jnp.einsum("bnaks,bnke->bnase", cbf_e2a, x_m)  # [B,N,Kae,S,ei]
                    outer_ea = jnp.einsum("bnasf,bnase->bnfe", radw_eaint.astype(d_ea.dtype), d_ea)
                h_e2a_kb = EfficientBilinear(self.emb_size_trip_in, self.emb_size_cbf, self.emb_size_trip_out,
                                             name=f"{name}_eaint_bilinear")(outer=outer_ea)
                h_e2a = ScaleFactor(name=f"{name}_eaint_scale_sum")(h_e2a_kb)
                h_new = h_new + DenseLayer(self.emb_size_atom, name=f"{name}_eaint_up")(h_e2a)

            # --- atom->atom interaction (radial bilinear, ref: PairInteraction)
            if self.atom_interaction:
                x_a = DenseLayer(self.emb_size_aint_in, name=f"{name}_aint_down")(h)
                ba = jnp.where(aa_mask[..., None], basis_a2a, 0.0)
                h_a2a_f = jnp.einsum("bnjf,bnje->bnfe", ba[:, :, :, : self.emb_size_rbf], _pair_gather(x_a))
                h_a2a_f = h_a2a_f.reshape(h_a2a_f.shape[:2] + (-1,))
                w_aa = self.param(
                    "aint_bilinear_" + str(blk),
                    nn.initializers.orthogonal(),
                    (self.emb_size_rbf * self.emb_size_aint_in, self.emb_size_aint_out),
                )
                h_a2a = ScaleFactor(name=f"{name}_aint_scale")(h_a2a_f @ w_aa)
                h_new = h_new + DenseLayer(self.emb_size_atom, name=f"{name}_aint_up")(h_a2a)

            h_mid = h_new * (1 / math.sqrt(n_aint))

            # --- edge update residuals + skip (ref: interaction_block :324-335)
            for r in range(self.num_before_skip):
                x = ResidualLayer(self.emb_size_edge, name=f"{name}_before_skip_{r}")(x)
            m = (m + x) * inv_sqrt_2
            for r in range(self.num_after_skip):
                m = ResidualLayer(self.emb_size_edge, name=f"{name}_after_skip_{r}")(m)
            m = jnp.where(emask[..., None], m, 0.0)

            # --- atom update (ref: :337-344 + AtomUpdateBlock) ---------------
            for r in range(self.num_atom_emb_layers):
                h_mid = ResidualLayer(self.emb_size_atom, name=f"{name}_atom_emb_{r}")(h_mid)
            bau = DenseLayer(self.emb_size_edge, activation=False, name=f"{name}_au_rbf")(basis_atom_update)
            h2 = jnp.sum(jnp.where(emask[..., None], m * bau, 0.0), axis=2)
            h2 = ScaleFactor(name=f"{name}_au_scale")(h2)
            h2 = MLPStack(self.emb_size_atom, self.num_atom, name=f"{name}_au_mlp")(h2)
            h = (h_mid + h2) * inv_sqrt_2

            # --- concat layer: refresh m with updated atoms (ref: :346-355;
            # EdgeEmbedding order [h_s, h_t, m]) --
            h_src2 = _gather_rows(h, nl.src)
            m2 = DenseLayer(self.emb_size_edge, name=f"{name}_concat")(
                jnp.concatenate([h_src2, jnp.broadcast_to(h[:, :, None, :], h_src2.shape), m], axis=-1)
            )
            for r in range(self.num_concat):
                m2 = ResidualLayer(self.emb_size_edge, name=f"{name}_concat_res_{r}")(m2)
            m = (m + m2) * inv_sqrt_2
            m = jnp.where(emask[..., None], m, 0.0)

            xe, xf = out_block(blk + 1, h, m)
            xs_e.append(xe)
            xs_f.append(xf)

        # ---------------- global output (ref: forward :1306-1367) ------------
        x_e = MLPStack(self.emb_size_atom, 0, dense_in=True, name="out_mlp_E_in")(
            jnp.concatenate(xs_e, axis=-1)
        )
        for r in range(self.num_global_out_layers):
            x_e = ResidualLayer(self.emb_size_atom, name=f"out_mlp_E_{r}")(x_e)
        e_atom = nn.Dense(1, use_bias=False, name="out_energy")(x_e)[..., 0]
        e_atom = jnp.where(batch.atom_mask, e_atom, 0.0)
        energy = jnp.sum(e_atom, axis=1) if self.extensive else (
            jnp.sum(e_atom, axis=1) / jnp.maximum(jnp.sum(batch.atom_mask, axis=1), 1)
        )

        def force_head(tag: str):
            x_f = MLPStack(self.emb_size_edge, 0, dense_in=True, name=f"out_mlp_F_in{tag}")(
                jnp.concatenate(xs_f, axis=-1)
            )
            for r in range(self.num_global_out_layers):
                x_f = ResidualLayer(self.emb_size_edge, name=f"out_mlp_F{tag}_{r}")(x_f)
            f_st = nn.Dense(1, use_bias=False, name=f"out_forces{tag}")(x_f)[..., 0]  # [B,N,K1]
            f_st = jnp.where(emask, f_st, 0.0)
            # F_t += F_st * vector with vector pointing SOURCE -> TARGET
            # (ref: gemnet_oc.py:1348-1357; our unit points target -> source)
            f_vec = jnp.sum(f_st[..., None] * -unit, axis=2)  # [B,N,3] aggregated at target
            return jnp.where(batch.atom_mask[..., None], f_vec, 0.0)

        forces = force_head("")
        if self.mode == "denoising":
            if self.so3_denoising:
                return forces, force_head("_so3")
            return forces
        return {"energy": energy, "forces": forces}


def _pair_gather(x: jnp.ndarray) -> jnp.ndarray:
    """[B, N, E] -> [B, N(target), N(source), E] broadcast of source features."""
    return jnp.broadcast_to(x[:, None, :, :], (x.shape[0], x.shape[1], x.shape[1], x.shape[2]))
