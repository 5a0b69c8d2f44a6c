"""Independent torch oracle of the reference crossview-temporal UNet.

Implements the ``UNetCrossviewTemporalConditionModel`` math (reference
src/dwm/models/crossview_temporal_unet.py:355-835 composing the
crossview_temporal.py primitives: ResBlock :75-164,
TemporalBasicTransformerBlock :167-266, TransformerModel :269-514,
AlphaBlender :9-72) directly in torch — no diffusers import — with the
exact reference state-dict key names, so
``convert.torch_import.convert_ctsd_unet`` consumes its ``state_dict()``
unchanged and numeric conversion parity can be asserted in this
environment (diffusers is not installable here; docs/PARITY.md).

Data layout is torch-native channels-first: sample (B, T, V, C, H, W).
"""

from __future__ import annotations

import math

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


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, hidden, out_dim=None):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, hidden)
        self.linear_2 = nn.Linear(hidden, out_dim or hidden)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class AlphaBlender(nn.Module):
    """alpha*a + (1-alpha)*b, alpha = sigmoid(mix_factor); samples with
    image_only_indicator True are forced to pure a."""

    def __init__(self, alpha: float):
        super().__init__()
        self.mix_factor = nn.Parameter(torch.tensor([alpha]))

    def forward(self, a, b, image_only_indicator=None):
        alpha = torch.sigmoid(self.mix_factor)
        if image_only_indicator is not None:
            alpha = torch.where(
                image_only_indicator, torch.ones_like(alpha), alpha
            )
        alpha = alpha.reshape(alpha.shape + (1,) * (a.ndim - alpha.ndim))
        return alpha * a + (1.0 - alpha) * b


class GEGLUFeedForward(nn.Module):
    """diffusers FeedForward with GEGLU; keys ff.net.0.proj / ff.net.2."""

    def __init__(self, dim, mult=4):
        super().__init__()
        proj = nn.Linear(dim, dim * mult * 2)
        self.net = nn.ModuleList(
            [nn.ModuleDict({"proj": proj}), nn.Identity(),
             nn.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        h, gate = self.net[0]["proj"](x).chunk(2, dim=-1)
        h = h * F.gelu(gate)
        return self.net[2](h)


class MHA(nn.Module):
    """diffusers Attention: to_q/k/v + to_out.0, softmax in f32."""

    def __init__(self, dim, heads, ctx_dim=None):
        super().__init__()
        self.heads = heads
        # diffusers Attention in the UNet context: qkv bias=False
        # (SD2.1-era), output projection with bias.
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, s, c = x.shape
        hd = c // self.heads

        def heads(y):
            return y.reshape(b, -1, self.heads, hd).transpose(1, 2)

        q, k, v = heads(self.to_q(x)), heads(self.to_k(ctx)), heads(
            self.to_v(ctx)
        )
        logits = torch.einsum("bhqd,bhkd->bhqk", q.float(), k.float())
        probs = torch.softmax(logits * hd ** -0.5, dim=-1).to(v.dtype)
        out = torch.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(1, 2).reshape(b, s, c)
        return self.to_out[0](out)


class BasicTransformerBlock(nn.Module):
    """self-attn, cross-attn, GEGLU ff (diffusers naming)."""

    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = MHA(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.attn2 = MHA(dim, heads, ctx_dim)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = GEGLUFeedForward(dim)

    def forward(self, x, context=None):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class TemporalBasicTransformerBlock(nn.Module):
    """ff_in → self-attn → ff (reference crossview_temporal.py:167-266,
    cross-attention disabled as the UNet instantiates it)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.norm_in = nn.LayerNorm(dim, eps=1e-5)
        self.ff_in = GEGLUFeedForward(dim)
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = MHA(dim, heads)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = GEGLUFeedForward(dim)

    def forward(self, x):
        x = x + self.ff_in(self.norm_in(x))
        x = x + self.attn1(self.norm1(x))
        return x + self.ff(self.norm3(x))


class SpatialResBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(min(32, in_ch), in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(min(32, out_ch), out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TemporalResBlock(nn.Module):
    """3D conv over (t, h, w) with kernel (3,1,1); input (N, C, T, H, W)."""

    def __init__(self, ch, temb_dim, eps=1e-6):
        super().__init__()
        self.norm1 = nn.GroupNorm(min(32, ch), ch, eps=eps)
        self.conv1 = nn.Conv3d(ch, ch, (3, 1, 1), padding=(1, 0, 0))
        self.time_emb_proj = nn.Linear(temb_dim, ch)
        self.norm2 = nn.GroupNorm(min(32, ch), ch, eps=eps)
        self.conv2 = nn.Conv3d(ch, ch, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, x, temb):
        # temb: (N, T, temb_dim)
        h = self.conv1(F.silu(self.norm1(x)))
        t = self.time_emb_proj(F.silu(temb))  # (N, T, C)
        h = h + t.permute(0, 2, 1)[:, :, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        return x + h


class CTResBlock(nn.Module):
    """Spatial + temporal resnet blended by time_mixer
    (reference crossview_temporal.py:75-164). Input (B, T, V, C, H, W)."""

    def __init__(self, in_ch, out_ch, temb_dim, eps=1e-5):
        super().__init__()
        self.spatial_res_block = SpatialResBlock(in_ch, out_ch, temb_dim, eps)
        self.temporal_res_block = TemporalResBlock(out_ch, temb_dim)
        self.time_mixer = AlphaBlender(0.5)

    def forward(self, x, temb, disable_temporal):
        b, t, v, c, hh, ww = x.shape
        flat = x.reshape(b * t * v, c, hh, ww)
        temb_flat = temb.reshape(b * t * v, -1)
        h = self.spatial_res_block(flat, temb_flat)
        oc = h.shape[1]
        h = h.reshape(b, t, v, oc, hh, ww)

        # (b, t, v, c, h, w) → (b*v, c, t, h, w)
        ht = h.permute(0, 2, 3, 1, 4, 5).reshape(b * v, oc, t, hh, ww)
        temb_t = temb.permute(0, 2, 1, 3).reshape(b * v, t, -1)
        ht = self.temporal_res_block(ht, temb_t)
        ht = ht.reshape(b, v, oc, t, hh, ww).permute(0, 3, 1, 2, 4, 5)
        ind = disable_temporal.reshape(b, 1, 1, 1, 1, 1)
        return self.time_mixer(h, ht, ind)


class TransformerModel(nn.Module):
    """Spatial transformer + crossview/temporal branches
    (reference crossview_temporal.py:269-514). Input (B, T, V, C, H, W)."""

    def __init__(self, ch, heads, ctx_dim, num_layers=1):
        super().__init__()
        self.norm = nn.GroupNorm(min(32, ch), ch, eps=1e-6)
        self.proj_in = nn.Linear(ch, ch)
        self.proj_out = nn.Linear(ch, ch)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, heads, ctx_dim)
             for _ in range(num_layers)]
        )
        self.crossview_transformer_blocks = nn.ModuleList(
            [TemporalBasicTransformerBlock(ch, heads)
             for _ in range(num_layers)]
        )
        self.temporal_transformer_blocks = nn.ModuleList(
            [TemporalBasicTransformerBlock(ch, heads)
             for _ in range(num_layers)]
        )
        self.view_pos_embed = TimestepEmbedding(ch, ch * 4, ch)
        self.time_pos_embed = TimestepEmbedding(ch, ch * 4, ch)
        self.view_mixer = AlphaBlender(0.5)
        self.time_mixer = AlphaBlender(0.5)

    def forward(self, x, context, disable_crossview, disable_temporal):
        b, t, v, c, hh, ww = x.shape
        residual = x
        h = self.norm(x.reshape(b * t * v, c, hh, ww))
        h = h.reshape(b * t * v, c, hh * ww).transpose(1, 2)  # (btv, l, c)
        h = self.proj_in(h)
        ctx = context.reshape(b * t * v, *context.shape[3:])

        view_idx = (
            torch.arange(v, dtype=torch.float32)[None, None, :]
            .expand(b, t, v).reshape(-1)
        )
        view_emb = self.view_pos_embed(
            timestep_embedding(view_idx, c)
        )[:, None, :]
        seq_idx = (
            torch.arange(t, dtype=torch.float32)[None, :, None]
            .expand(b, t, v).reshape(-1)
        )
        seq_emb = self.time_pos_embed(
            timestep_embedding(seq_idx, c)
        )[:, None, :]

        cv_ind = disable_crossview.reshape(b, 1, 1, 1)
        tp_ind = disable_temporal.reshape(b, 1, 1, 1)
        for i, blk in enumerate(self.transformer_blocks):
            h = blk(h, ctx)

            cv = h + view_emb
            cv = cv.reshape(b * t, v, hh * ww, c).transpose(1, 2)
            cv = cv.reshape(b * t * hh * ww, v, c)
            cv = self.crossview_transformer_blocks[i](cv)
            cv = cv.reshape(b * t, hh * ww, v, c).transpose(1, 2)
            cv = cv.reshape(b, t * v, hh * ww, c)
            h = self.view_mixer(
                h.reshape(b, t * v, hh * ww, c), cv, cv_ind
            ).reshape(b * t * v, hh * ww, c)

            tp = h + seq_emb
            tp = tp.reshape(b, t, v, hh * ww, c).permute(0, 2, 3, 1, 4)
            tp = tp.reshape(b * v * hh * ww, t, c)
            tp = self.temporal_transformer_blocks[i](tp)
            tp = tp.reshape(b, v, hh * ww, t, c).permute(0, 3, 1, 2, 4)
            tp = tp.reshape(b, t * v, hh * ww, c)
            h = self.time_mixer(
                h.reshape(b, t * v, hh * ww, c), tp, tp_ind
            ).reshape(b * t * v, hh * ww, c)

        h = self.proj_out(h)
        h = h.transpose(1, 2).reshape(b, t, v, c, hh, ww)
        return h + residual


class Downsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class Upsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _DownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, layers, heads, ctx_dim,
                 with_attn, add_downsample, eps):
        super().__init__()
        self.resnets = nn.ModuleList(
            [CTResBlock(in_ch if j == 0 else out_ch, out_ch, temb_dim, eps)
             for j in range(layers)]
        )
        self.attentions = nn.ModuleList(
            [TransformerModel(out_ch, heads, ctx_dim)
             for _ in range(layers)]
        ) if with_attn else None
        self.downsamplers = (
            nn.ModuleList([Downsample(out_ch)]) if add_downsample else None
        )

    def forward(self, x, temb, ctx, dis_cv, dis_tp):
        states = []
        for j, res in enumerate(self.resnets):
            x = res(x, temb, dis_tp)
            if self.attentions is not None:
                x = self.attentions[j](x, ctx, dis_cv, dis_tp)
            states.append(x)
        if self.downsamplers is not None:
            b, t, v, c, hh, ww = x.shape
            flat = self.downsamplers[0](x.reshape(b * t * v, c, hh, ww))
            x = flat.reshape(b, t, v, *flat.shape[1:])
            states.append(x)
        return x, states


class _UpBlock(nn.Module):
    def __init__(self, prev_ch, skip_chs, out_ch, temb_dim, heads, ctx_dim,
                 with_attn, add_upsample, eps):
        super().__init__()
        resnets, in_ch = [], prev_ch
        for skip in skip_chs:
            resnets.append(CTResBlock(in_ch + skip, out_ch, temb_dim, eps))
            in_ch = out_ch
        self.resnets = nn.ModuleList(resnets)
        self.attentions = nn.ModuleList(
            [TransformerModel(out_ch, heads, ctx_dim)
             for _ in range(len(resnets))]
        ) if with_attn else None
        self.upsamplers = (
            nn.ModuleList([Upsample(out_ch)]) if add_upsample else None
        )

    def forward(self, x, res_states, temb, ctx, dis_cv, dis_tp):
        for j, res in enumerate(self.resnets):
            skip = res_states.pop()
            x = torch.cat([x, skip], dim=3)  # channel axis of (b,t,v,c,h,w)
            x = res(x, temb, dis_tp)
            if self.attentions is not None:
                x = self.attentions[j](x, ctx, dis_cv, dis_tp)
        if self.upsamplers is not None:
            b, t, v, c, hh, ww = x.shape
            flat = self.upsamplers[0](x.reshape(b * t * v, c, hh, ww))
            x = flat.reshape(b, t, v, *flat.shape[1:])
        return x


class _MidBlock(nn.Module):
    def __init__(self, ch, temb_dim, heads, ctx_dim, eps):
        super().__init__()
        self.resnets = nn.ModuleList(
            [CTResBlock(ch, ch, temb_dim, eps), CTResBlock(ch, ch, temb_dim, eps)]
        )
        self.attentions = nn.ModuleList(
            [TransformerModel(ch, heads, ctx_dim)]
        )

    def forward(self, x, temb, ctx, dis_cv, dis_tp):
        x = self.resnets[0](x, temb, dis_tp)
        x = self.attentions[0](x, ctx, dis_cv, dis_tp)
        return self.resnets[1](x, temb, dis_tp)


class UNetCrossviewTemporalOracle(nn.Module):
    """sample (B, T, V, C, H, W) → same-shape prediction."""

    def __init__(self, in_channels=8, out_channels=4,
                 block_out_channels=(32, 64), layers_per_block=1,
                 num_attention_heads=(2, 4), cross_attention_dim=32,
                 addition_time_embed_dim=8,
                 projection_class_embeddings_input_dim=24, eps=1e-5):
        super().__init__()
        ch0 = block_out_channels[0]
        temb_dim = ch0 * 4
        self.ch0 = ch0
        self.addition_time_embed_dim = addition_time_embed_dim
        self.conv_in = nn.Conv2d(in_channels, ch0, 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch0, temb_dim)
        self.add_embedding = TimestepEmbedding(
            projection_class_embeddings_input_dim, temb_dim
        )

        n = len(block_out_channels)
        downs, in_ch = [], ch0
        for i, ch in enumerate(block_out_channels):
            downs.append(_DownBlock(
                in_ch, ch, temb_dim, layers_per_block,
                num_attention_heads[i], cross_attention_dim,
                with_attn=i < n - 1, add_downsample=i < n - 1, eps=eps,
            ))
            in_ch = ch
        self.down_blocks = nn.ModuleList(downs)
        self.mid_block = _MidBlock(
            block_out_channels[-1], temb_dim, num_attention_heads[-1],
            cross_attention_dim, eps,
        )

        # skip-state channel bookkeeping mirrors the flax model: conv_in
        # output + every resnet/downsample output per down block.
        skips = [ch0]
        for i, ch in enumerate(block_out_channels):
            skips += [ch] * layers_per_block
            if i < n - 1:
                skips.append(ch)
        rev = list(reversed(block_out_channels))
        rev_heads = list(reversed(num_attention_heads))
        ups, prev = [], block_out_channels[-1]
        for i, ch in enumerate(rev):
            take = layers_per_block + 1
            skip_chs = [skips.pop() for _ in range(take)]
            ups.append(_UpBlock(
                prev, skip_chs, ch, temb_dim, rev_heads[i],
                cross_attention_dim,
                with_attn=i != 0, add_upsample=i < n - 1, eps=eps,
            ))
            prev = ch
        self.up_blocks = nn.ModuleList(ups)
        self.conv_norm_out = nn.GroupNorm(min(32, rev[-1]), rev[-1], eps=eps)
        self.conv_out = nn.Conv2d(rev[-1], out_channels, 3, padding=1)

    def forward(self, sample, timestep, encoder_hidden_states,
                added_time_ids):
        b, t, v = sample.shape[:3]
        dis_cv = torch.zeros(b, dtype=torch.bool)
        dis_tp = torch.zeros(b, dtype=torch.bool)

        t_emb = timestep_embedding(timestep.reshape(-1), self.ch0)
        emb = self.time_embedding(t_emb).reshape(b, t, v, -1)
        aug = timestep_embedding(
            added_time_ids.reshape(-1), self.addition_time_embed_dim
        ).reshape(b * t * v, -1)
        emb = emb + self.add_embedding(aug).reshape(b, t, v, -1)

        x = self.conv_in(sample.reshape(-1, *sample.shape[3:]))
        x = x.reshape(b, t, v, *x.shape[1:])
        ctx = encoder_hidden_states

        down_states = [x]
        for blk in self.down_blocks:
            x, states = blk(x, emb, ctx, dis_cv, dis_tp)
            down_states += states

        x = self.mid_block(x, emb, ctx, dis_cv, dis_tp)

        for blk in self.up_blocks:
            x = blk(x, down_states, emb, ctx, dis_cv, dis_tp)

        flat = x.reshape(-1, *x.shape[3:])
        flat = self.conv_out(F.silu(self.conv_norm_out(flat)))
        return flat.reshape(b, t, v, *flat.shape[1:])
