"""Independent torch oracle of the reference crossview-temporal MMDiT.

Implements the SD3.5 MMDiT semantics (diffusers 0.31 module math and state
dict naming) plus the reference's crossview/temporal additions
(src/dwm/models/crossview_temporal_dit.py:105-630) directly in torch — no
diffusers import — so checkpoint-conversion parity can be asserted in this
environment (diffusers/timm are not installable here; see docs/PARITY.md).

The state dict uses the exact reference key names, so
``opendwm_tpu.convert.torch_import.convert_ctsd_dit`` consumes it unchanged.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    """diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    freqs = torch.exp(exponent / half)
    args = t.float()[..., None] * freqs
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def sincos_pos_embed_2d(embed_dim, grid_size, base_size):
    gh = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size)
    gw = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size)
    mesh_w, mesh_h = np.meshgrid(gw, gh)

    def emb_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate(
        [emb_1d(embed_dim // 2, mesh_w), emb_1d(embed_dim // 2, mesh_h)], 1
    )
    return torch.from_numpy(emb.astype(np.float32))


class RMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        x32 = x.float()
        var = x32.pow(2).mean(-1, keepdim=True)
        return (x32 * torch.rsqrt(var + self.eps)) * self.weight


class TimestepEmbedder(nn.Module):
    def __init__(self, in_dim, dim, out_dim=None):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, out_dim or dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class CombinedTimestepTextProjEmbeddings(nn.Module):
    def __init__(self, dim, pooled_dim):
        super().__init__()
        self.timestep_embedder = TimestepEmbedder(256, dim)
        self.text_embedder = TimestepEmbedder(pooled_dim, dim)

    def forward(self, timestep, pooled):
        t = self.timestep_embedder(timestep_embedding(timestep, 256))
        return t + self.text_embedder(pooled)


class PatchEmbed(nn.Module):
    def __init__(self, patch, in_ch, dim, max_size, base_size):
        super().__init__()
        self.proj = nn.Conv2d(in_ch, dim, patch, stride=patch)
        self.max_size = max_size
        self.patch = patch
        self.table = sincos_pos_embed_2d(dim, max_size, base_size)

    def forward(self, x):  # (N, C, H, W)
        x = self.proj(x)
        n, d, gh, gw = x.shape
        x = x.flatten(2).transpose(1, 2)  # (N, L, D) row-major
        table = self.table.reshape(self.max_size, self.max_size, -1)
        top = (self.max_size - gh) // 2
        left = (self.max_size - gw) // 2
        pos = table[top:top + gh, left:left + gw].reshape(1, gh * gw, -1)
        return x + pos


class FeedForward(nn.Module):
    """diffusers FeedForward('gelu-approximate')."""

    def __init__(self, dim, activation="gelu-approximate"):
        super().__init__()
        self.activation = activation
        inner = dim * 4
        proj_dim = inner * 2 if activation == "geglu" else inner
        self.net = nn.ModuleList([
            nn.Module(), nn.Identity(), nn.Linear(inner, dim)
        ])
        self.net[0].proj = nn.Linear(dim, proj_dim)

    def forward(self, x):
        h = self.net[0].proj(x)
        if self.activation == "geglu":
            h, gate = h.chunk(2, dim=-1)
            h = h * F.gelu(gate)
        else:
            h = F.gelu(h, approximate="tanh")
        return self.net[2](h)


def sdpa(q, k, v):  # (B, L, H, D) → (B, L, H*D), fp32 softmax
    q, k, v = (t.transpose(1, 2) for t in (q, k, v))  # (B, H, L, D)
    out = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
    out = out.transpose(1, 2)
    return out.reshape(out.shape[0], out.shape[1], -1)


class JointAttention(nn.Module):
    """diffusers Attention with added_kv projections (MMDiT joint)."""

    def __init__(self, dim, heads, qk_norm=True, context=True,
                 context_pre_only=False):
        super().__init__()
        self.heads = heads
        self.head_dim = dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        if qk_norm:
            self.norm_q = RMSNorm(self.head_dim)
            self.norm_k = RMSNorm(self.head_dim)
        self.has_context = context
        self.context_pre_only = context_pre_only
        if context:
            self.add_q_proj = nn.Linear(dim, dim)
            self.add_k_proj = nn.Linear(dim, dim)
            self.add_v_proj = nn.Linear(dim, dim)
            if qk_norm:
                self.norm_added_q = RMSNorm(self.head_dim)
                self.norm_added_k = RMSNorm(self.head_dim)
            if not context_pre_only:
                self.to_add_out = nn.Linear(dim, dim)

    def _split(self, x):
        b, l, _ = x.shape
        return x.reshape(b, l, self.heads, self.head_dim)

    def forward(self, x, context=None):
        q = self._split(self.to_q(x))
        k = self._split(self.to_k(x))
        v = self._split(self.to_v(x))
        if hasattr(self, "norm_q"):
            q, k = self.norm_q(q), self.norm_k(k)
        if context is not None:
            cq = self._split(self.add_q_proj(context))
            ck = self._split(self.add_k_proj(context))
            cv = self._split(self.add_v_proj(context))
            if hasattr(self, "norm_added_q"):
                cq, ck = self.norm_added_q(cq), self.norm_added_k(ck)
            lc = context.shape[1]
            q = torch.cat([q, cq], 1)
            k = torch.cat([k, ck], 1)
            v = torch.cat([v, cv], 1)
            out = sdpa(q, k, v)
            sample, ctx = out[:, :-lc], out[:, -lc:]
            sample = self.to_out[0](sample)
            if self.context_pre_only:
                return sample, None
            return sample, self.to_add_out(ctx)
        return self.to_out[0](sdpa(q, k, v))


class AdaLNModulation(nn.Module):
    def __init__(self, dim, n_chunks):
        super().__init__()
        self.linear = nn.Linear(dim, n_chunks * dim)
        self.n_chunks = n_chunks

    def forward(self, temb):
        return self.linear(F.silu(temb))[:, None].chunk(self.n_chunks, -1)


class JointTransformerBlock(nn.Module):
    def __init__(self, dim, heads, dual=False, context_pre_only=False):
        super().__init__()
        self.dual = dual
        self.context_pre_only = context_pre_only
        self.norm1 = AdaLNModulation(dim, 9 if dual else 6)
        self.norm1_context = AdaLNModulation(
            dim, 2 if context_pre_only else 6
        )
        self.attn = JointAttention(
            dim, heads, context=True, context_pre_only=context_pre_only
        )
        if dual:
            self.attn2 = JointAttention(dim, heads, context=False)
        self.ff = FeedForward(dim)
        if not context_pre_only:
            self.ff_context = FeedForward(dim)
        self.ln = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)

    def forward(self, x, context, temb):
        mods = self.norm1(temb)
        shift_msa, scale_msa, gate_msa = mods[0], mods[1], mods[2]
        shift_mlp, scale_mlp, gate_mlp = mods[3], mods[4], mods[5]
        normed = self.ln(x)
        norm_x = normed * (1 + scale_msa) + shift_msa

        cmods = self.norm1_context(temb)
        if self.context_pre_only:
            c_scale, c_shift = cmods
            norm_ctx = self.ln(context) * (1 + c_scale) + c_shift
        else:
            norm_ctx = self.ln(context) * (1 + cmods[1]) + cmods[0]

        attn_out, ctx_out = self.attn(norm_x, norm_ctx)
        x = x + gate_msa * attn_out
        if self.dual:
            norm_x2 = normed * (1 + mods[7]) + mods[6]
            x = x + mods[8] * self.attn2(norm_x2)
        norm_x = self.ln(x) * (1 + scale_mlp) + shift_mlp
        x = x + gate_mlp * self.ff(norm_x)
        if self.context_pre_only:
            return x, None
        context = context + cmods[2] * ctx_out
        norm_ctx = self.ln(context) * (1 + cmods[4]) + cmods[3]
        context = context + cmods[5] * self.ff_context(norm_ctx)
        return x, context


class VTSelfAttentionBlock(nn.Module):
    """Reference crossview/temporal block (ff_in → attn → ff)."""

    def __init__(self, dim, heads, qk_norm=True):
        super().__init__()
        self.norm_in = nn.LayerNorm(dim, eps=1e-5)
        self.ff_in = FeedForward(dim, activation="geglu")
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = JointAttention(dim, heads, qk_norm=qk_norm,
                                    context=False)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = FeedForward(dim, activation="geglu")

    def forward(self, x):
        x = x + self.ff_in(self.norm_in(x))
        x = x + self.attn1(self.norm1(x))
        return x + self.ff(self.norm3(x))


class AlphaBlender(nn.Module):
    def __init__(self, alpha=2.0):
        super().__init__()
        self.mix_factor = nn.Parameter(torch.tensor([alpha]))

    def forward(self, a, b, image_only_indicator):
        alpha = torch.sigmoid(self.mix_factor)
        alpha = torch.where(image_only_indicator, 1.0, alpha)
        alpha = alpha.reshape(alpha.shape + (1,) * (a.ndim - alpha.ndim))
        return alpha * a + (1 - alpha) * b


class OracleDiT(nn.Module):
    """Tiny reference-semantics DiT: joint blocks + rowwise crossview +
    pointwise temporal + implicit perspective embedding."""

    def __init__(
        self, patch=2, layers=2, heads=2, head_dim=8, in_ch=16, out_ch=16,
        joint_dim=24, pooled_dim=16, max_size=16, base_size=4,
        dual_layers=(0,), crossview_layers=(0,), temporal_layers=(1,),
        added_ids=11,
    ):
        super().__init__()
        dim = heads * head_dim
        self.dim, self.heads, self.patch = dim, heads, patch
        self.out_ch = out_ch
        self.crossview_layers = crossview_layers
        self.temporal_layers = temporal_layers
        self.pos_embed = PatchEmbed(patch, in_ch, dim, max_size, base_size)
        self.context_embedder = nn.Linear(joint_dim, dim)
        self.time_text_embed = CombinedTimestepTextProjEmbeddings(
            dim, pooled_dim
        )
        self.view_embedding = TimestepEmbedder(added_ids * 256, dim)
        self.transformer_blocks = nn.ModuleList([
            JointTransformerBlock(
                dim, heads, dual=i in dual_layers,
                context_pre_only=i == layers - 1,
            )
            for i in range(layers)
        ])
        self.crossview_transformer_blocks = nn.ModuleList([
            VTSelfAttentionBlock(dim, heads) for _ in crossview_layers
        ])
        self.temporal_transformer_blocks = nn.ModuleList([
            VTSelfAttentionBlock(dim, heads) for _ in temporal_layers
        ])
        self.view_pos_embeds = nn.ModuleList([
            TimestepEmbedder(dim, dim * 4, dim) for _ in crossview_layers
        ])
        self.time_pos_embeds = nn.ModuleList([
            TimestepEmbedder(dim, dim * 4, dim) for _ in temporal_layers
        ])
        self.view_mixers = nn.ModuleList([
            AlphaBlender() for _ in crossview_layers
        ])
        self.time_mixers = nn.ModuleList([
            AlphaBlender() for _ in temporal_layers
        ])
        self.norm_out = AdaLNModulation(dim, 2)
        self.proj_out = nn.Linear(dim, patch * patch * out_ch)
        self.ln = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)

    def forward(self, sample, timestep, encoder_hidden_states,
                pooled_projections, added_time_ids):
        # sample: (b, t, v, h, w, c) channel-last like the flax model.
        b, t, v, hh, ww, c = sample.shape
        n = b * t * v
        p = self.patch
        gh, gw = hh // p, ww // p
        x = self.pos_embed(
            sample.reshape(n, hh, ww, c).permute(0, 3, 1, 2)
        )
        ctx = self.context_embedder(
            encoder_hidden_states.reshape(
                n, *encoder_hidden_states.shape[3:]
            )
        )
        temb = self.time_text_embed(
            timestep.reshape(-1), pooled_projections.reshape(n, -1)
        )
        view_cam_emb = self.view_embedding(
            timestep_embedding(added_time_ids.reshape(-1), 256).reshape(
                n, -1
            )
        )[:, None, :]

        dim = self.dim
        for i, block in enumerate(self.transformer_blocks):
            x, ctx = block(x, ctx, temb)
            if i in self.temporal_layers:
                j = self.temporal_layers.index(i)
                seq_idx = (
                    torch.arange(t, dtype=torch.float32)[None, :, None]
                    .expand(b, t, v).reshape(-1)
                )
                seq_emb = self.time_pos_embeds[j](
                    timestep_embedding(seq_idx, dim)
                )[:, None, :] + view_cam_emb
                h = x + seq_emb
                # pointwise temporal: attend over t per spatial token
                l = gh * gw
                h = h.reshape(b, t, v, l, dim).permute(0, 2, 3, 1, 4)
                h = h.reshape(b * v * l, t, dim)
                h = self.temporal_transformer_blocks[j](h)
                h = h.reshape(b, v, l, t, dim).permute(0, 3, 1, 2, 4)
                h = h.reshape(b, t * v, l, dim)
                xs = x.reshape(b, t * v, l, dim)
                x = self.time_mixers[j](
                    xs, h, torch.zeros(b, 1, 1, 1, dtype=torch.bool)
                ).reshape(n, l, dim)
            if i in self.crossview_layers:
                j = self.crossview_layers.index(i)
                view_idx = (
                    torch.arange(v, dtype=torch.float32)[None, None, :]
                    .expand(b, t, v).reshape(-1)
                )
                view_emb = self.view_pos_embeds[j](
                    timestep_embedding(view_idx, dim)
                )[:, None, :] + view_cam_emb
                h = x + view_emb
                # rowwise crossview: attend within a latent row across views
                h = h.reshape(b * t, v, gh, gw, dim).permute(0, 2, 1, 3, 4)
                h = h.reshape(b * t * gh, v * gw, dim)
                h = self.crossview_transformer_blocks[j](h)
                h = h.reshape(b * t, gh, v, gw, dim).permute(0, 2, 1, 3, 4)
                h = h.reshape(b, t * v, gh * gw, dim)
                xs = x.reshape(b, t * v, gh * gw, dim)
                x = self.view_mixers[j](
                    xs, h, torch.zeros(b, 1, 1, 1, dtype=torch.bool)
                ).reshape(n, gh * gw, dim)

        scale, shift = self.norm_out(temb)
        x = self.ln(x) * (1 + scale) + shift
        x = self.proj_out(x)
        x = x.reshape(n, gh, gw, p, p, self.out_ch)
        x = x.permute(0, 1, 3, 2, 4, 5)
        return x.reshape(b, t, v, hh, ww, self.out_ch)
