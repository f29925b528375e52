"""Test-only torch implementation of the reference EquiformerV2 math.

Written from the reference spec (ref: adsorbdiff/models/equiformer_v2/
equiformer_v2_oc20.py, equiformer_v2_denoising.py, so2_ops.py,
transformer_block.py, so3.py, input_block.py, layer_norm.py, activation.py)
to serve as the golden oracle for the torch-checkpoint import path: it
produces a state_dict with the reference's exact parameter names/layouts and
computes the reference's forward math in the reference's e3nn coefficient
basis, using the shipped ``Jd.pt`` for Wigner matrices.

NOT a copy of the reference: no e3nn / SO3_Embedding machinery — coefficient
bookkeeping is explicit numpy/torch indexing on the full (lmax+1)^2 axis with
m-masks, the published-config branch (use_grid_mlp, use_sep_s2_act,
use_attn_renorm, internal/external radial weights) is hard-wired, and the
S^2 grids use Gauss-Legendre quadrature in the e3nn basis (derived from
Wigner matrices) rather than e3nn's soft grids — an equivalent quadrature of
the same basis (both sides of the parity test use GL grids, so this cancels;
real e3nn-grid checkpoints differ only by quadrature error of the silu
projection).

Conventions: e3nn y-up real SH, coefficient order m = -l..l within l.  The
edge frame maps the edge direction onto +y with a seeded random in-plane
gauge (ref: edge_rot_mat.py:6-63) — final outputs are gauge-independent,
which the parity test exercises (our implementation uses a different,
deterministic gauge).
"""
import math

import numpy as np
import torch
import torch.nn as nn

from tests.torch_ref_gemnet import Graph, build_graph  # brute-force PBC edges

JD_PATH = "/root/reference/adsorbdiff/models/equiformer_v2/Jd.pt"
_AVG_NUM_NODES = 77.81317
_AVG_DEGREE = 23.395238876342773


# ---------------------------------------------------------------------------
# Wigner machinery in the reference basis (Jd.pt + wigner.py formulas)
# ---------------------------------------------------------------------------
_JD = None


def _jd():
    global _JD
    if _JD is None:
        _JD = [j.double() for j in torch.load(JD_PATH, map_location="cpu", weights_only=True)]
    return _JD


def _z_rot_mat(angle, lv):
    """ref: wigner.py:33-43."""
    M = angle.new_zeros((*angle.shape, 2 * lv + 1, 2 * lv + 1))
    inds = torch.arange(0, 2 * lv + 1)
    rev = torch.arange(2 * lv, -1, -1)
    freq = torch.arange(lv, -lv - 1, -1, dtype=angle.dtype)
    M[..., inds, rev] = torch.sin(freq * angle[..., None])
    M[..., inds, inds] = torch.cos(freq * angle[..., None])
    return M


def wigner_D_ref(lv, a, b, c):
    """ref: wigner.py:16-31 (Xa J Xb J Xc)."""
    J = _jd()[lv]
    return _z_rot_mat(a, lv) @ J @ _z_rot_mat(b, lv) @ J @ _z_rot_mat(c, lv)


def _roty(a):
    ca, sa = torch.cos(a), torch.sin(a)
    o, z = torch.ones_like(a), torch.zeros_like(a)
    return torch.stack(
        [torch.stack([ca, z, sa], -1), torch.stack([z, o, z], -1), torch.stack([-sa, z, ca], -1)], -2
    )


def _rotx(a):
    ca, sa = torch.cos(a), torch.sin(a)
    o, z = torch.ones_like(a), torch.zeros_like(a)
    return torch.stack(
        [torch.stack([o, z, z], -1), torch.stack([z, ca, -sa], -1), torch.stack([z, sa, ca], -1)], -2
    )


def rotation_to_wigner(R, lmax):
    """ref: so3.py SO3_Rotation.RotationToWignerDMatrix :509-533 (e3nn
    xyz_to_angles / angles_to_matrix written out)."""
    x = R @ torch.tensor([0.0, 1.0, 0.0], dtype=R.dtype)
    xn = x / x.norm(dim=-1, keepdim=True)
    beta = torch.acos(xn[..., 1].clamp(-1, 1))
    alpha = torch.atan2(xn[..., 0], xn[..., 2])
    Rp = (_roty(alpha) @ _rotx(beta)).transpose(-1, -2) @ R
    gamma = torch.atan2(Rp[..., 0, 2], Rp[..., 0, 0])
    dim = (lmax + 1) ** 2
    W = torch.zeros(*R.shape[:-2], dim, dim, dtype=R.dtype)
    s = 0
    for lv in range(lmax + 1):
        n = 2 * lv + 1
        W[..., s : s + n, s : s + n] = wigner_D_ref(lv, alpha, beta, gamma)
        s += n
    return W


def ref_sph_harm(lmax, vecs):
    """e3nn-basis real SH values Y[(l,m), P] for unit vectors, derived from
    the Wigner matrices: Y(R yhat) = D(R) Y(yhat) with Y(yhat) nonzero only
    at m=0 where it equals sqrt((2l+1)/4pi) ('integral' normalization)."""
    vecs = torch.as_tensor(np.asarray(vecs), dtype=torch.float64)
    # rotation mapping yhat onto v: alpha/beta from xyz_to_angles, gamma = 0
    vn = vecs / vecs.norm(dim=-1, keepdim=True)
    beta = torch.acos(vn[..., 1].clamp(-1, 1))
    alpha = torch.atan2(vn[..., 0], vn[..., 2])
    dim = (lmax + 1) ** 2
    out = torch.zeros(len(vecs), dim, dtype=torch.float64)
    for lv in range(lmax + 1):
        D = wigner_D_ref(lv, alpha, beta, torch.zeros_like(alpha))  # [P, n, n]
        c = math.sqrt((2 * lv + 1) / (4 * math.pi))
        out[:, lv * lv : (lv + 1) * (lv + 1)] = D[:, :, lv] * c  # column of m=0
    return out  # [P, (L)^2]


def gl_s2_grids(lmax, res):
    """(to_grid [G, (L)^2], from_grid [(L)^2, G]) Gauss-Legendre x uniform
    quadrature in the e3nn basis; from @ to == I for bandlimited signals."""
    x_gl, w_gl = np.polynomial.legendre.leggauss(res)
    alphas = np.linspace(0, 2 * np.pi, res, endpoint=False)
    ct = x_gl
    st = np.sqrt(1 - ct**2)
    # SAME physical point set as adsorbdiff_tpu.models.so3.s2_grid_matrices
    # (z-up GL x uniform azimuth): the projection of the non-bandlimited
    # silu(f) depends on the quadrature points, so sharing them makes the
    # S^2 activations of the two implementations exactly comparable
    pts = np.stack(
        [
            np.outer(st, np.cos(alphas)).ravel(),
            np.outer(st, np.sin(alphas)).ravel(),
            np.outer(ct, np.ones_like(alphas)).ravel(),
        ],
        axis=-1,
    )
    y = ref_sph_harm(lmax, pts).numpy().T  # [(L)^2, G]
    w = (np.outer(w_gl, np.ones_like(alphas)) * (2 * np.pi / res)).ravel()
    return torch.tensor(y.T, dtype=torch.float64), torch.tensor(y * w, dtype=torch.float64)


def e3nn_s2_grids(lmax, res):
    """e3nn ToS2Grid/FromS2Grid(normalization="component") as the reference's
    SO3_Grid builds them (ref: so3.py:534-643) — midpoint betas, uniform
    alphas, e3nn's y-up angles_to_xyz, Driscoll-Healy weights, component
    per-l scale sqrt(4pi/((2l+1)(lmax+1))) — built HERE in the e3nn basis via
    the Wigner-derived ref_sph_harm, fully independent of
    adsorbdiff_tpu.models.so3.s2_grid_matrices (which expresses the same map
    in our basis): parity through the import conjugation proves the
    basis-change cancellation."""
    betas = (np.arange(res) + 0.5) / res * np.pi
    alphas = np.arange(res) / res * 2 * np.pi
    ct, st = np.cos(betas), np.sin(betas)
    # e3nn angles_to_xyz (y-up): x = sin b sin a, y = cos b, z = sin b cos a
    pts = np.stack(
        [
            np.outer(st, np.sin(alphas)).ravel(),
            np.outer(ct, np.ones_like(alphas)).ravel(),
            np.outer(st, np.cos(alphas)).ravel(),
        ],
        axis=-1,
    )
    y = ref_sph_harm(lmax, pts).numpy().T  # [(L)^2, G]
    # closed-form SOFT/Driscoll-Healy beta weights on the midpoint grid
    k = np.arange(res // 2)
    w_b = 4.0 / res * np.sin(betas) * (
        np.sin((2 * k[None, :] + 1) * betas[:, None]) / (2 * k[None, :] + 1)
    ).sum(1)
    w = (np.outer(w_b, np.ones_like(alphas)) * (2 * np.pi / res)).ravel()
    c = np.concatenate(
        [np.full(2 * lv + 1, math.sqrt(4 * math.pi / ((2 * lv + 1) * (lmax + 1))))
         for lv in range(lmax + 1)]
    )
    to = y.T * c[None, :]
    frm = (y * w) / c[:, None]
    return torch.tensor(to, dtype=torch.float64), torch.tensor(frm, dtype=torch.float64)


def m_mask(lmax, mmax):
    mask = np.zeros((lmax + 1) ** 2, bool)
    for lv in range(lmax + 1):
        for m in range(-min(lv, mmax), min(lv, mmax) + 1):
            mask[lv * lv + lv + m] = True
    return mask


def m_trunc_rescale(lmax, mmax):
    s = np.ones((lmax + 1) ** 2)
    for lv in range(mmax + 1, lmax + 1):
        s[lv * lv : (lv + 1) * (lv + 1)] = math.sqrt((2 * lv + 1) / (2 * mmax + 1))
    return torch.tensor(s, dtype=torch.float64)


def edge_rot_mats(vecs, gen):
    """ref: edge_rot_mat.py:6-63 — maps the edge direction onto +y with a
    random in-plane gauge (simplified: any random non-aligned helper vector
    gives a valid gauge; outputs are gauge-independent)."""
    vecs = torch.as_tensor(np.asarray(vecs), dtype=torch.float64)
    norm_x = vecs / vecs.norm(dim=-1, keepdim=True)
    rand = torch.rand(vecs.shape, generator=gen, dtype=torch.float64) - 0.5
    rand = rand / rand.norm(dim=-1, keepdim=True)
    # avoid near-alignment
    dot = (rand * norm_x).sum(-1, keepdim=True).abs()
    alt = torch.stack([-rand[:, 1], rand[:, 0], rand[:, 2]], dim=-1)
    rand = torch.where(dot > 0.9, alt, rand)
    norm_z = torch.cross(norm_x, rand, dim=-1)
    norm_z = norm_z / norm_z.norm(dim=-1, keepdim=True)
    norm_y = torch.cross(norm_x, norm_z, dim=-1)
    norm_y = -norm_y / norm_y.norm(dim=-1, keepdim=True)
    # edge_rot_mat_inv columns [z, x, y]; R = inv^T maps edge dir -> +y row
    inv = torch.stack([norm_z, norm_x, norm_y], dim=-1)
    return inv.transpose(-1, -2)


# ---------------------------------------------------------------------------
# reference modules (names == reference state_dict names)
# ---------------------------------------------------------------------------
class RadialFunction(nn.Module):
    """ref: radial_function.py — Sequential named `net`."""

    def __init__(self, channels):
        super().__init__()
        mods = []
        for i in range(len(channels) - 1):
            mods.append(nn.Linear(channels[i], channels[i + 1], bias=True))
            if i < len(channels) - 2:
                mods.append(nn.LayerNorm(channels[i + 1]))
                mods.append(nn.SiLU())
        self.net = nn.Sequential(*mods)

    def forward(self, x):
        return self.net(x)


class SO2_m_Convolution(nn.Module):
    """ref: so2_ops.py:13-76."""

    def __init__(self, m, c_in, c_out, lmax, mmax):
        super().__init__()
        n = lmax - m + 1
        self.fc = nn.Linear(n * c_in, 2 * c_out * n, bias=False)
        self.fc.weight.data.mul_(1 / math.sqrt(2))

    def forward(self, x_m):  # [E, 2, n*c_in]
        y = self.fc(x_m)
        half = self.fc.out_features // 2
        x_r, x_i = y[..., :half], y[..., half:]
        out_r = x_r[:, 0] - x_i[:, 1]
        out_i = x_r[:, 1] + x_i[:, 0]
        return torch.stack([out_r, out_i], dim=1)  # [E, 2, half]


class SO2_Convolution(nn.Module):
    """ref: so2_ops.py:78-238 (published branch)."""

    def __init__(self, c_in, c_out, lmax, mmax, internal_weights=True,
                 edge_channels=None, extra_m0=0):
        super().__init__()
        self.c_in, self.c_out, self.lmax, self.mmax = c_in, c_out, lmax, mmax
        self.extra_m0 = extra_m0
        n0 = lmax + 1
        self.fc_m0 = nn.Linear(n0 * c_in, n0 * c_out + extra_m0)
        self.so2_m_conv = nn.ModuleList(
            SO2_m_Convolution(m, c_in, c_out, lmax, mmax) for m in range(1, mmax + 1)
        )
        self.rad_func = None
        if not internal_weights:
            n_rad = n0 * c_in + sum((lmax - m + 1) * c_in for m in range(1, mmax + 1))
            self.rad_func = RadialFunction(list(edge_channels) + [n_rad])

    def forward(self, x_full, x_edge=None):
        """x_full: [E, (L)^2, c_in] in the edge frame (m > mmax zeroed)."""
        lmax, mmax, c_in = self.lmax, self.mmax, self.c_in
        E = x_full.shape[0]
        gates = self.rad_func(x_edge) if self.rad_func is not None else None
        off = 0

        idx0 = [lv * lv + lv for lv in range(lmax + 1)]
        x0 = x_full[:, idx0, :].reshape(E, -1)
        if gates is not None:
            x0 = x0 * gates[:, : x0.shape[1]]
            off = x0.shape[1]
        y0 = self.fc_m0(x0)
        extra = None
        if self.extra_m0:
            extra = y0[:, : self.extra_m0]
            y0 = y0[:, self.extra_m0 :]
        out = x_full.new_zeros(E, (lmax + 1) ** 2, self.c_out)
        out[:, idx0, :] = y0.reshape(E, lmax + 1, self.c_out)

        for m in range(1, mmax + 1):
            ip = [lv * lv + lv + m for lv in range(m, lmax + 1)]
            iq = [lv * lv + lv - m for lv in range(m, lmax + 1)]
            n = len(ip)
            xm = torch.stack(
                [x_full[:, ip, :].reshape(E, -1), x_full[:, iq, :].reshape(E, -1)], dim=1
            )  # [E, 2, n*c_in]
            if gates is not None:
                g = gates[:, off : off + n * c_in]
                off += n * c_in
                xm = xm * g[:, None, :]
            ym = self.so2_m_conv[m - 1](xm)  # [E, 2, n*c_out]
            out[:, ip, :] += ym[:, 0].reshape(E, n, self.c_out)
            out[:, iq, :] += ym[:, 1].reshape(E, n, self.c_out)
        return (out, extra) if self.extra_m0 else out


class SO3_LinearV2(nn.Module):
    """ref: so3.py:694-748."""

    def __init__(self, c_in, c_out, lmax):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(lmax + 1, c_out, c_in))
        bound = 1 / math.sqrt(c_in)
        nn.init.uniform_(self.weight, -bound, bound)
        self.bias = nn.Parameter(torch.zeros(c_out))
        self.lmax = lmax

    def forward(self, x):  # [*, (L)^2, c_in]
        idx = torch.cat(
            [torch.full((2 * lv + 1,), lv, dtype=torch.long) for lv in range(self.lmax + 1)]
        )
        w = self.weight[idx]  # [(L)^2, c_out, c_in]
        y = torch.einsum("zmi,moi->zmo", x, w)
        y[:, 0, :] = y[:, 0, :] + self.bias
        return y


class NormLayerSH(nn.Module):
    """ref: layer_norm.py EquivariantLayerNormArraySphericalHarmonics."""

    def __init__(self, lmax, c):
        super().__init__()
        self.lmax = lmax
        self.norm_l0 = nn.LayerNorm(c)
        self.affine_weight = nn.Parameter(torch.ones(lmax, c))

    def forward(self, x):  # [N, (L)^2, C]
        out0 = self.norm_l0(x[:, 0:1, :])
        rest = x[:, 1:, :]
        w_bal = torch.zeros((self.lmax + 1) ** 2 - 1, 1, dtype=x.dtype)
        for lv in range(1, self.lmax + 1):
            w_bal[lv * lv - 1 : (lv + 1) * (lv + 1) - 1] = 1.0 / (2 * lv + 1)
        w_bal = w_bal / self.lmax
        norm = (rest.pow(2) * w_bal).sum(dim=1, keepdim=True)  # [N,1,C]
        norm = norm.mean(dim=2, keepdim=True)
        inv = (norm + 1e-5).pow(-0.5)
        pieces = [out0]
        for lv in range(1, self.lmax + 1):
            seg = x[:, lv * lv : (lv + 1) * (lv + 1), :]
            pieces.append(seg * inv * self.affine_weight[lv - 1].view(1, 1, -1))
        return torch.cat(pieces, dim=1)


class SmoothLeakyReLU(nn.Module):
    def forward(self, x, alpha=0.2):
        return ((1 + alpha) / 2) * x + ((1 - alpha) / 2) * x * (2 * torch.sigmoid(x) - 1)


class GraphAttention(nn.Module):
    """ref: transformer_block.py SO2EquivariantGraphAttention (published
    branch: external rad weights on conv 1, extra m0 outputs for alpha +
    separable-S2 gating, LayerNorm-renormalized alpha)."""

    def __init__(self, cfg, c_out):
        super().__init__()
        c, h = cfg["sphere_channels"], cfg["attn_hidden_channels"]
        H, A, V = cfg["num_heads"], cfg["attn_alpha_channels"], cfg["attn_value_channels"]
        lmax, mmax = cfg["lmax"], cfg["mmax"]
        ec = cfg["edge_channels"]
        self.cfg, self.H, self.A, self.V = cfg, H, A, V
        self.source_embedding = nn.Embedding(cfg["max_num_elements"], ec)
        self.target_embedding = nn.Embedding(cfg["max_num_elements"], ec)
        nn.init.uniform_(self.source_embedding.weight, -0.001, 0.001)
        nn.init.uniform_(self.target_embedding.weight, -0.001, 0.001)
        extra = H * A + h
        self.so2_conv_1 = SO2_Convolution(
            2 * c, h, lmax, mmax, internal_weights=False,
            edge_channels=[cfg["num_gauss"] + 2 * ec, ec, ec], extra_m0=extra,
        )
        self.alpha_norm = nn.LayerNorm(A)
        self.alpha_act = SmoothLeakyReLU()
        self.alpha_dot = nn.Parameter(torch.randn(H, A))
        std = 1.0 / math.sqrt(A)
        nn.init.uniform_(self.alpha_dot, -std, std)
        self.so2_conv_2 = SO2_Convolution(h, H * V, lmax, mmax)
        self.proj = SO3_LinearV2(H * V, c_out, lmax)

    def forward(self, x, z, g, wig, wig_inv, edge_gauss, to_grid, from_grid):
        cfg = self.cfg
        lmax, mmax = cfg["lmax"], cfg["mmax"]
        src, tgt = torch.as_tensor(g.src), torch.as_tensor(g.tgt)
        x_edge = torch.cat(
            [edge_gauss, self.source_embedding(z[src]), self.target_embedding(z[tgt])], dim=-1
        )
        msg = torch.cat([x[src], x[tgt]], dim=-1)  # concat channels
        msg = torch.bmm(wig, msg)
        mask = torch.as_tensor(m_mask(lmax, mmax))
        msg = msg * mask[None, :, None]

        h, x0_extra = self.so2_conv_1(msg, x_edge)
        HA = self.H * self.A
        x0_alpha, x0_gating = x0_extra[:, :HA], x0_extra[:, HA:]

        # SeparableS2Activation with m-truncated rescaled grids
        resc = m_trunc_rescale(lmax, mmax)
        grid = torch.einsum("gc,ecf->egf", to_grid, h * (resc * mask)[None, :, None])
        grid = torch.nn.functional.silu(grid)
        h_act = torch.einsum("cg,egf->ecf", from_grid, grid) * (resc * mask)[None, :, None]
        h_act[:, 0, :] = torch.nn.functional.silu(x0_gating)
        v = self.so2_conv_2(h_act)

        a = x0_alpha.reshape(-1, self.H, self.A)
        a = self.alpha_act(self.alpha_norm(a))
        logits = torch.einsum("eha,ha->eh", a, self.alpha_dot)
        # edge softmax over incoming edges per target
        n_atoms = len(z)
        alpha = torch.zeros_like(logits)
        for t in range(n_atoms):
            sel = tgt == t
            if sel.any():
                alpha[sel] = torch.softmax(logits[sel], dim=0)
        v = v.reshape(v.shape[0], v.shape[1], self.H, self.V)
        v = v * alpha[:, None, :, None]
        v = v.reshape(v.shape[0], v.shape[1], self.H * self.V)

        v = torch.bmm(wig_inv, v * mask[None, :, None]) * resc[None, :, None]
        out = torch.zeros(n_atoms, v.shape[1], v.shape[2], dtype=v.dtype)
        out.index_add_(0, tgt, v)
        return self.proj(out)


class FeedForward(nn.Module):
    """ref: transformer_block.py FeedForwardNetwork (grid-MLP + sep-S2)."""

    def __init__(self, c_in, hidden, c_out, lmax):
        super().__init__()
        self.scalar_mlp = nn.Sequential(nn.Linear(c_in, hidden, bias=True), nn.SiLU())
        self.so3_linear_1 = SO3_LinearV2(c_in, hidden, lmax)
        self.grid_mlp = nn.Sequential(
            nn.Linear(hidden, hidden, bias=False), nn.SiLU(),
            nn.Linear(hidden, hidden, bias=False), nn.SiLU(),
            nn.Linear(hidden, hidden, bias=False),
        )
        self.so3_linear_2 = SO3_LinearV2(hidden, c_out, lmax)

    def forward(self, x, to_grid, from_grid):
        scalars = self.scalar_mlp(x[:, 0, :])
        y = self.so3_linear_1(x)
        grid = torch.einsum("gc,zcf->zgf", to_grid, y)
        grid = self.grid_mlp(grid)
        y = torch.einsum("cg,zgf->zcf", from_grid, grid)
        y[:, 0, :] = scalars
        return self.so3_linear_2(y)


class Block(nn.Module):
    """ref: transformer_block.py TransBlockV2 (prenorm, residuals)."""

    def __init__(self, cfg):
        super().__init__()
        c = cfg["sphere_channels"]
        self.norm_1 = NormLayerSH(cfg["lmax"], c)
        self.ga = GraphAttention(cfg, c)
        self.norm_2 = NormLayerSH(cfg["lmax"], c)
        self.ffn = FeedForward(c, cfg["ffn_hidden_channels"], c, cfg["lmax"])

    def forward(self, x, z, g, wig, wig_inv, edge_gauss, grids_attn, grids_ffn):
        y = self.ga(self.norm_1(x), z, g, wig, wig_inv, edge_gauss, *grids_attn)
        x = x + y
        y = self.ffn(self.norm_2(x), *grids_ffn)
        return x + y


class RefEquiformerV2(nn.Module):
    """Reference trunk at tiny config (denoising variant, dual force heads)."""

    def __init__(
        self,
        lmax=2,
        mmax=1,
        num_layers=2,
        sphere_channels=16,
        attn_hidden_channels=12,
        num_heads=2,
        attn_alpha_channels=8,
        attn_value_channels=4,
        ffn_hidden_channels=16,
        edge_channels=16,
        num_gauss=32,
        cutoff=4.5,
        max_num_elements=90,
        grid_res=10,
        grid_mode="gauss",
        mode="denoising",
        energy_encoding=None,
        subtract_radii=False,
    ):
        super().__init__()
        self.cfg = dict(
            lmax=lmax, mmax=mmax, sphere_channels=sphere_channels,
            attn_hidden_channels=attn_hidden_channels, num_heads=num_heads,
            attn_alpha_channels=attn_alpha_channels, attn_value_channels=attn_value_channels,
            ffn_hidden_channels=ffn_hidden_channels, edge_channels=edge_channels,
            num_gauss=num_gauss, cutoff=cutoff, max_num_elements=max_num_elements,
            grid_res=grid_res, grid_mode=grid_mode, mode=mode,
            subtract_radii=subtract_radii,
        )
        c = sphere_channels
        self.sphere_embedding = nn.Embedding(max_num_elements, c)
        if energy_encoding == "scalar":
            self.energy_embedding = nn.Linear(1, c)
        # edge-degree embedding (ref: input_block.py)
        class _EdgeDegree(nn.Module):
            def __init__(self):
                super().__init__()
                self.source_embedding = nn.Embedding(max_num_elements, edge_channels)
                self.target_embedding = nn.Embedding(max_num_elements, edge_channels)
                nn.init.uniform_(self.source_embedding.weight, -0.001, 0.001)
                nn.init.uniform_(self.target_embedding.weight, -0.001, 0.001)
                self.rad_func = RadialFunction(
                    [num_gauss + 2 * edge_channels, edge_channels, edge_channels, (lmax + 1) * c]
                )

        self.edge_degree_embedding = _EdgeDegree()
        self.blocks = nn.ModuleList(Block(self.cfg) for _ in range(num_layers))
        self.norm = NormLayerSH(lmax, c)
        if mode == "s2ef":
            self.energy_block = FeedForward(c, ffn_hidden_channels, 1, lmax)
        self.force_block = GraphAttention(self.cfg, 1)
        self.force_block2 = GraphAttention(self.cfg, 1)

    def forward(self, z, pos, cell, energy_cond=None, gauge_seed=0):
        cfg = self.cfg
        lmax, mmax = cfg["lmax"], cfg["mmax"]
        z = torch.as_tensor(z, dtype=torch.long)
        g = build_graph(np.asarray(pos, np.float64), np.asarray(cell, np.float64), cfg["cutoff"])
        n_atoms = len(z)
        src, tgt = torch.as_tensor(g.src), torch.as_tensor(g.tgt)

        dist = torch.as_tensor(g.dist, dtype=torch.float64)
        if cfg["subtract_radii"]:
            from adsorbdiff_tpu.models.equiformer_v2 import ATOMIC_RADII_PM

            radii = torch.as_tensor(ATOMIC_RADII_PM, dtype=torch.float64)
            dist = dist - radii[z[src]] - radii[z[tgt]]

        # edge frame: OCP edge_distance_vec = pos[src] - pos[tgt] (+offsets),
        # i.e. -vec of our Graph (which stores source->target)
        gen = torch.Generator().manual_seed(gauge_seed)
        rot = edge_rot_mats(-np.asarray(g.vec, np.float64), gen)
        wig = rotation_to_wigner(rot, lmax)
        wig_inv = wig.transpose(-1, -2)

        # gaussian smearing (0, cutoff, num_gauss, width 2.0)
        offsets = torch.linspace(0.0, cfg["cutoff"], cfg["num_gauss"], dtype=torch.float64)
        delta = cfg["cutoff"] / (cfg["num_gauss"] - 1)
        edge_gauss = torch.exp(-0.5 / (2.0 * delta) ** 2 * (dist[:, None] - offsets) ** 2)

        mk = e3nn_s2_grids if cfg.get("grid_mode") == "e3nn" else gl_s2_grids
        to_grid, from_grid = mk(lmax, cfg["grid_res"])
        grids = (to_grid, from_grid)

        dim = (lmax + 1) ** 2
        x = torch.zeros(n_atoms, dim, cfg["sphere_channels"], dtype=torch.float64)
        x[:, 0, :] = self.sphere_embedding(z).double()
        if hasattr(self, "energy_embedding") and energy_cond is not None:
            x[:, 0, :] += self.energy_embedding(
                torch.full((n_atoms, 1), float(energy_cond))
            ).double()

        # edge-degree embedding
        ede = self.edge_degree_embedding
        x_edge0 = torch.cat(
            [edge_gauss, ede.source_embedding(z[src]).double(), ede.target_embedding(z[tgt]).double()],
            dim=-1,
        )
        m0 = ede.rad_func.double()(x_edge0).reshape(-1, lmax + 1, cfg["sphere_channels"])
        deg = torch.zeros(len(g.src), dim, cfg["sphere_channels"], dtype=torch.float64)
        idx0 = [lv * lv + lv for lv in range(lmax + 1)]
        deg[:, idx0, :] = m0
        resc = m_trunc_rescale(lmax, mmax)
        mask = torch.as_tensor(m_mask(lmax, mmax))
        deg = torch.bmm(wig_inv, deg * mask[None, :, None]) * resc[None, :, None]
        agg = torch.zeros(n_atoms, dim, cfg["sphere_channels"], dtype=torch.float64)
        agg.index_add_(0, tgt, deg)
        x = x + agg / _AVG_DEGREE

        self.double()
        for blk in self.blocks:
            x = blk(x, z, g, wig, wig_inv, edge_gauss, grids, grids)
        x = self.norm(x)

        def head(block):
            f = block(x, z, g, wig, wig_inv, edge_gauss, to_grid, from_grid)
            return f[:, 1:4, 0]  # e3nn l=1 coefficients ARE (x, y, z)

        if cfg["mode"] == "s2ef":
            e = self.energy_block(x, to_grid, from_grid)[:, 0, 0]
            return {"energy": e.sum() / _AVG_NUM_NODES, "forces": head(self.force_block)}
        return head(self.force_block), head(self.force_block2)
