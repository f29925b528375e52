"""Test-only torch implementation of the reference PaiNN-denoising math.

Written from the reference spec (ref: adsorbdiff/models/painn/
painn_denoising.py:498-697, gemnet_oc/layers/radial_basis.py:18-82) to serve
as the golden oracle for the torch-checkpoint import path: it produces a
state_dict with the reference's exact parameter names/layouts and computes the
reference's forward math over an explicit edge list.  It is NOT a copy of the
reference (plain index_add message passing instead of torch_geometric
``MessagePassing``; no edge symmetrization — the parity tests feed both models
the same full-degree edge set, where symmetrization is a no-op).
"""
import math

import torch
import torch.nn as nn


class ScaledSiLU(nn.Module):
    def forward(self, x):
        return torch.nn.functional.silu(x) * (1.0 / 0.6)


class RefAtomEmbedding(nn.Module):
    """ref: gemnet_oc/layers/embedding_block.py:15-43 (lookup at Z-1)."""

    def __init__(self, emb_size, num_elements):
        super().__init__()
        self.embeddings = nn.Embedding(num_elements, emb_size)

    def forward(self, z):
        return self.embeddings(z - 1)


def ref_radial_basis(dist, cutoff, num_rbf, exponent=5):
    """gaussian(d/cutoff on [0,1]) * polynomial envelope (ref: radial_basis.py)."""
    d = dist / cutoff
    p = float(exponent)
    a = -(p + 1) * (p + 2) / 2
    b = p * (p + 2)
    c = -p * (p + 1) / 2
    env = 1 + a * d**p + b * d ** (p + 1) + c * d ** (p + 2)
    env = torch.where(d < 1, env, torch.zeros_like(d))
    offsets = torch.linspace(0.0, 1.0, num_rbf)
    coeff = -0.5 / (1.0 / (num_rbf - 1)) ** 2
    basis = torch.exp(coeff * (d[:, None] - offsets[None, :]) ** 2)
    return basis * env[:, None]


class RefMessage(nn.Module):
    """ref: painn_denoising.py:498-575."""

    def __init__(self, h, num_rbf):
        super().__init__()
        self.h = h
        self.x_proj = nn.Sequential(nn.Linear(h, h), ScaledSiLU(), nn.Linear(h, h * 3))
        self.rbf_proj = nn.Linear(num_rbf, h * 3)
        self.x_layernorm = nn.LayerNorm(h)

    def forward(self, x, vec, edge_index, edge_rbf, edge_vector):
        j, i = edge_index[0], edge_index[1]  # source, target
        xh = self.x_proj(self.x_layernorm(x))
        rbfh = self.rbf_proj(edge_rbf)
        m = xh[j] * rbfh
        mx, m2, m3 = torch.split(m, self.h, dim=-1)
        m2 = m2 * (1.0 / math.sqrt(3.0))
        mv = vec[j] * m2.unsqueeze(1) + m3.unsqueeze(1) * edge_vector.unsqueeze(2)
        mv = mv * (1.0 / math.sqrt(self.h))
        dx = torch.zeros_like(x).index_add_(0, i, mx)
        dvec = torch.zeros_like(vec).index_add_(0, i, mv)
        return dx, dvec


class RefUpdate(nn.Module):
    """ref: painn_denoising.py:577-628."""

    def __init__(self, h):
        super().__init__()
        self.h = h
        self.vec_proj = nn.Linear(h, h * 2, bias=False)
        self.xvec_proj = nn.Sequential(nn.Linear(h * 2, h), ScaledSiLU(), nn.Linear(h, h * 3))

    def forward(self, x, vec):
        vec1, vec2 = torch.split(self.vec_proj(vec), self.h, dim=-1)
        vec_dot = (vec1 * vec2).sum(dim=1) * (1.0 / math.sqrt(self.h))
        x_vec_h = self.xvec_proj(torch.cat([x, torch.sqrt(torch.sum(vec2**2, dim=-2) + 1e-8)], dim=-1))
        xvec1, xvec2, xvec3 = torch.split(x_vec_h, self.h, dim=-1)
        dx = (xvec1 + xvec2 * vec_dot) * (1.0 / math.sqrt(2.0))
        dvec = xvec3.unsqueeze(1) * vec1
        return dx, dvec


class RefGatedBlock(nn.Module):
    """ref: painn_denoising.py:654-697 (torch.norm, no eps)."""

    def __init__(self, h, out):
        super().__init__()
        self.out = out
        self.vec1_proj = nn.Linear(h, h, bias=False)
        self.vec2_proj = nn.Linear(h, out, bias=False)
        self.update_net = nn.Sequential(nn.Linear(h * 2, h), ScaledSiLU(), nn.Linear(h, out * 2))
        self.act = ScaledSiLU()

    def forward(self, x, v):
        vec1 = torch.norm(self.vec1_proj(v), dim=-2)
        vec2 = self.vec2_proj(v)
        x, vg = torch.split(self.update_net(torch.cat([x, vec1], dim=-1)), self.out, dim=-1)
        v = vg.unsqueeze(1) * vec2
        return self.act(x), v


class RefOutput(nn.Module):
    def __init__(self, h):
        super().__init__()
        self.output_network = nn.ModuleList([RefGatedBlock(h, h // 2), RefGatedBlock(h // 2, 1)])

    def forward(self, x, vec):
        for layer in self.output_network:
            x, vec = layer(x, vec)
        return vec.squeeze(-1)


class RefScaleFactor(nn.Module):
    """ref: modules/scaling/scale_factor.py — fitted buffer named scale_factor."""

    def __init__(self, value=1.0):
        super().__init__()
        self.register_buffer("scale_factor", torch.tensor(float(value)))

    def forward(self, x):
        return x * self.scale_factor


class RefPaiNN(nn.Module):
    """Reference trunk + dual heads; takes an explicit edge list."""

    def __init__(self, h=32, num_layers=2, num_rbf=8, cutoff=6.0, num_elements=83):
        super().__init__()
        self.h, self.num_layers, self.num_rbf, self.cutoff = h, num_layers, num_rbf, cutoff
        self.atom_emb = RefAtomEmbedding(h, num_elements)
        self.message_layers = nn.ModuleList(RefMessage(h, num_rbf) for _ in range(num_layers))
        self.update_layers = nn.ModuleList(RefUpdate(h) for _ in range(num_layers))
        for i in range(num_layers):
            setattr(self, f"upd_out_scalar_scale_{i}", RefScaleFactor(0.8 + 0.1 * i))
        self.out_forces = RefOutput(h)
        self.out_forces2 = RefOutput(h)

    def forward(self, z, edge_index, edge_dist, edge_vector):
        edge_rbf = ref_radial_basis(edge_dist, self.cutoff, self.num_rbf)
        x = self.atom_emb(z)
        vec = torch.zeros(x.size(0), 3, x.size(1))
        inv_sqrt_2 = 1.0 / math.sqrt(2.0)
        for i in range(self.num_layers):
            dx, dvec = self.message_layers[i](x, vec, edge_index, edge_rbf, edge_vector)
            x = x + dx
            vec = vec + dvec
            x = x * inv_sqrt_2
            dx, dvec = self.update_layers[i](x, vec)
            x = x + dx
            vec = vec + dvec
            x = getattr(self, f"upd_out_scalar_scale_{i}")(x)
        return self.out_forces(x, vec), self.out_forces2(x, vec)
