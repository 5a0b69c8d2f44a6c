"""Cross-view temporal UNet (SD 2.1 / SVD skeleton), TPU-native.

Capability parity with the reference ``UNetCrossviewTemporalConditionModel``
(src/dwm/models/crossview_temporal_unet.py:355-835): an SVD-style
spatio-temporal UNet whose every block is widened with cross-view attention —
spatial ResnetBlock + temporal ResnetBlock mixed by AlphaBlender (reference
crossview_temporal.py:75-164), and a TransformerModel running spatial
self/cross-attention plus per-layer crossview and temporal attention branches
(crossview_temporal.py:269-514), each with optional *rowwise* factorization.

Layout: channel-last (b, t, v, h, w, c); per-(b,t,v) timesteps;
``added_time_ids`` (fps/camera/action) go through sinusoidal + MLP embedding
added to the time embedding (reference unet:710-715). ImageAdapter condition
residuals are added at conv_in and after each down stage (reference
unet:728-761).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from opendwm_tpu.config import register
from opendwm_tpu.models.adapters import ImageAdapter
from opendwm_tpu.models.layers import (
    AlphaBlender,
    Attention,
    FeedForward,
    TemporalBasicTransformerBlock,
    TimestepEmbedding,
    conv_factory,
    timestep_embedding,
)

Dtype = jnp.dtype


def _gn(h, dtype, name, eps=1e-5):
    return nn.GroupNorm(min(32, h.shape[-1]), epsilon=eps, dtype=dtype,
                        name=name)(h)


class SpatialResnetBlock(nn.Module):
    """diffusers ResnetBlock2D (silu act, temb injection after conv1)."""

    out_channels: Optional[int] = None
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    quantized: bool = False  # int8 W8A8 serving path (2-D convs)

    @nn.compact
    def __call__(self, x, temb=None):
        conv = conv_factory(self.quantized)
        out_ch = self.out_channels or x.shape[-1]
        h = _gn(x, self.dtype, "norm1", self.eps)
        h = nn.silu(h)
        h = conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                 name="conv1")(h)
        if temb is not None:
            t = nn.Dense(out_ch, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = _gn(h, self.dtype, "norm2", self.eps)
        h = nn.silu(h)
        h = conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                 name="conv2")(h)
        if x.shape[-1] != out_ch:
            x = conv(out_ch, (1, 1), dtype=self.dtype,
                     name="conv_shortcut")(x)
        return x + h


class TemporalResnetBlock(nn.Module):
    """diffusers TemporalResnetBlock: 3D conv with kernel (3,1,1) over
    (t, h, w); input (n, t, h, w, c)."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        c = x.shape[-1]
        h = _gn(x, self.dtype, "norm1", self.eps)
        h = nn.silu(h)
        h = nn.Conv(c, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    dtype=self.dtype, name="conv1")(h)
        if temb is not None:  # temb: (n, t, c)
            t = nn.Dense(c, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, :, None, None, :]
        h = _gn(h, self.dtype, "norm2", self.eps)
        h = nn.silu(h)
        h = nn.Conv(c, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    dtype=self.dtype, name="conv2")(h)
        return x + h


class CTResBlock(nn.Module):
    """Spatial + temporal resnet mixed by AlphaBlender
    (reference crossview_temporal.py:75-164). Input (b, t, v, h, w, c);
    temb (b, t, v, c_t)."""

    out_channels: Optional[int] = None
    eps: float = 1e-5
    enable_temporal: bool = True
    merge_factor: float = 0.5
    dtype: Dtype = jnp.float32
    # int8 serving: 2-D spatial convs quantize; the (3,1,1) temporal
    # convs stay bf16 (no QConv3D — small FLOPs share).
    quantized: bool = False

    @nn.compact
    def __call__(self, x, temb=None, disable_temporal=None):
        b, t, v = x.shape[:3]
        flat = x.reshape((-1,) + x.shape[3:])
        temb_flat = temb.reshape(-1, temb.shape[-1]) if temb is not None \
            else None
        h = SpatialResnetBlock(
            self.out_channels, eps=self.eps, dtype=self.dtype,
            quantized=self.quantized, name="spatial_res_block",
        )(flat, temb_flat)
        h = h.reshape((b, t, v) + h.shape[1:])

        if not self.enable_temporal:
            return h

        # (b, t, v, h, w, c) → (b*v, t, h, w, c)
        ht = h.transpose(0, 2, 1, 3, 4, 5)
        ht = ht.reshape((b * v,) + ht.shape[2:])
        temb_t = None
        if temb is not None:
            temb_t = temb.transpose(0, 2, 1, 3).reshape(b * v, t, -1)
        ht = TemporalResnetBlock(
            eps=self.eps, dtype=self.dtype, name="temporal_res_block"
        )(ht, temb_t)
        ht = ht.reshape((b, v, t) + ht.shape[2:]).transpose(0, 2, 1, 3, 4, 5)

        return AlphaBlender(
            alpha=self.merge_factor, dtype=self.dtype, name="time_mixer"
        )(h, ht, image_only_indicator=disable_temporal)


class BasicTransformerBlock(nn.Module):
    """diffusers BasicTransformerBlock: self-attn, cross-attn, GEGLU ff."""

    heads: int
    head_dim: int
    has_cross_attention: bool = True
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(heads=self.heads, head_dim=self.head_dim,
                          dtype=self.dtype, quantized=self.quantized,
                          name="attn1")(n)
        if self.has_cross_attention:
            n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
            x = x + Attention(heads=self.heads, head_dim=self.head_dim,
                              dtype=self.dtype, quantized=self.quantized,
                              name="attn2")(n, context=context)
        n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        return x + FeedForward(dtype=self.dtype, quantized=self.quantized,
                               name="ff")(n)


class TransformerModel(nn.Module):
    """Spatial transformer + per-layer crossview/temporal branches
    (reference crossview_temporal.py:269-514). Input (b, t, v, h, w, c)."""

    heads: int
    head_dim: int
    num_layers: int = 1
    enable_crossview: bool = True
    enable_temporal: bool = True
    enable_rowwise_crossview: bool = False
    enable_rowwise_temporal: bool = False
    merge_factor: float = 0.5
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(
        self, x, context=None, disable_crossview=None, disable_temporal=None,
        crossview_attention_mask=None,
    ):
        b, t, v, hh, ww, c = x.shape
        residual = x
        # GroupNorm stats must pool per (b,t,v) image — flax GroupNorm
        # treats only axis 0 as batch, so normalize on the flattened view
        # (parity bug caught by tests/torch_oracle_unet.py: pooling across
        # t/v diverged 0.59 from the reference on random init).
        h = _gn(x.reshape((-1,) + x.shape[3:]), self.dtype, "norm", eps=1e-6)
        from opendwm_tpu.models.layers import dense_factory

        dense = dense_factory(self.quantized)
        h = h.reshape(b * t * v, hh * ww, c)
        h = dense(c, dtype=self.dtype, name="proj_in")(h)
        ctx = context.reshape((b * t * v,) + context.shape[3:]) \
            if context is not None else None

        if self.enable_crossview:
            view_idx = jnp.broadcast_to(
                jnp.arange(v, dtype=jnp.float32)[None, None, :], (b, t, v)
            ).reshape(-1)
            view_emb = TimestepEmbedding(
                c * 4, out_dim=c, dtype=self.dtype, name="view_pos_embed"
            )(timestep_embedding(view_idx, c).astype(self.dtype))[:, None, :]
        if self.enable_temporal:
            seq_idx = jnp.broadcast_to(
                jnp.arange(t, dtype=jnp.float32)[None, :, None], (b, t, v)
            ).reshape(-1)
            seq_emb = TimestepEmbedding(
                c * 4, out_dim=c, dtype=self.dtype, name="time_pos_embed"
            )(timestep_embedding(seq_idx, c).astype(self.dtype))[:, None, :]

        # One mixer per branch, shared across layers (reference
        # crossview_temporal.py:314,332 creates a single view/time mixer).
        view_mixer = AlphaBlender(
            alpha=self.merge_factor, dtype=self.dtype, name="view_mixer"
        ) if self.enable_crossview else None
        time_mixer = AlphaBlender(
            alpha=self.merge_factor, dtype=self.dtype, name="time_mixer"
        ) if self.enable_temporal else None

        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                heads=self.heads, head_dim=self.head_dim, dtype=self.dtype,
                quantized=self.quantized, name=f"transformer_blocks_{i}",
            )(h, context=ctx)

            if self.enable_crossview:
                cv = h + view_emb
                if self.enable_rowwise_crossview:
                    cv = cv.reshape(b * t, v, hh, ww, c)
                    cv = cv.transpose(0, 2, 1, 3, 4).reshape(
                        b * t * hh, v * ww, c
                    )
                else:
                    cv = cv.reshape(b * t, v, hh * ww, c)
                    cv = cv.transpose(0, 2, 1, 3).reshape(
                        b * t * hh * ww, v, c
                    )
                cv = TemporalBasicTransformerBlock(
                    heads=self.heads, head_dim=self.head_dim,
                    dtype=self.dtype, quantized=self.quantized,
                    name=f"crossview_transformer_blocks_{i}",
                )(cv, mask=crossview_attention_mask)
                if self.enable_rowwise_crossview:
                    cv = cv.reshape(b * t, hh, v, ww, c)
                    cv = cv.transpose(0, 2, 1, 3, 4)
                else:
                    cv = cv.reshape(b * t, hh * ww, v, c)
                    cv = cv.transpose(0, 2, 1, 3).reshape(
                        b * t, v, hh, ww, c
                    )
                cv = cv.reshape(b, t * v, hh * ww, c)
                h = view_mixer(
                    h.reshape(b, t * v, hh * ww, c), cv,
                    image_only_indicator=disable_crossview,
                ).reshape(b * t * v, hh * ww, c)

            if self.enable_temporal:
                tp = h + seq_emb
                if self.enable_rowwise_temporal:
                    tp = tp.reshape(b, t, v, hh, ww, c)
                    tp = tp.transpose(0, 2, 3, 1, 4, 5).reshape(
                        b * v * hh, t * ww, c
                    )
                else:
                    tp = tp.reshape(b, t, v, hh * ww, c)
                    tp = tp.transpose(0, 2, 3, 1, 4).reshape(
                        b * v * hh * ww, t, c
                    )
                tp = TemporalBasicTransformerBlock(
                    heads=self.heads, head_dim=self.head_dim,
                    dtype=self.dtype, quantized=self.quantized,
                    name=f"temporal_transformer_blocks_{i}",
                )(tp)
                if self.enable_rowwise_temporal:
                    tp = tp.reshape(b, v, hh, t, ww, c)
                    tp = tp.transpose(0, 3, 1, 2, 4, 5)
                else:
                    tp = tp.reshape(b, v, hh * ww, t, c)
                    tp = tp.transpose(0, 3, 1, 2, 4)
                tp = tp.reshape(b, t * v, hh * ww, c)
                h = time_mixer(
                    h.reshape(b, t * v, hh * ww, c), tp,
                    image_only_indicator=disable_temporal,
                ).reshape(b * t * v, hh * ww, c)

        h = dense(c, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(b, t, v, hh, ww, c) + residual


# ---------------------------------------------------------------------------
# UNet blocks
# ---------------------------------------------------------------------------

class DownBlockCT(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    enable_temporal: bool = True
    merge_factor: float = 0.5
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x, temb, disable_temporal=None):
        states = []
        for i in range(self.num_layers):
            x = CTResBlock(
                self.out_channels, eps=self.eps,
                enable_temporal=self.enable_temporal,
                merge_factor=self.merge_factor, dtype=self.dtype,
                quantized=self.quantized, name=f"resnets_{i}",
            )(x, temb, disable_temporal)
            states.append(x)
        if self.add_downsample:
            b, t, v = x.shape[:3]
            flat = x.reshape((-1,) + x.shape[3:])
            flat = jnp.pad(flat, ((0, 0), (0, 1), (0, 1), (0, 0)))
            flat = conv_factory(self.quantized)(
                self.out_channels, (3, 3), strides=(2, 2),
                padding="VALID", dtype=self.dtype, name="downsample",
            )(flat)
            x = flat.reshape((b, t, v) + flat.shape[1:])
            states.append(x)
        return x, states


class CrossAttnDownBlockCT(nn.Module):
    out_channels: int
    heads: int
    num_layers: int = 2
    transformer_layers: int = 1
    add_downsample: bool = True
    enable_crossview: bool = True
    enable_temporal: bool = True
    enable_rowwise_crossview: bool = False
    enable_rowwise_temporal: bool = False
    merge_factor: float = 0.5
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(
        self, x, temb, context=None, disable_crossview=None,
        disable_temporal=None, crossview_attention_mask=None,
    ):
        states = []
        for i in range(self.num_layers):
            x = CTResBlock(
                self.out_channels, eps=self.eps,
                enable_temporal=self.enable_temporal,
                merge_factor=self.merge_factor, dtype=self.dtype,
                quantized=self.quantized, name=f"resnets_{i}",
            )(x, temb, disable_temporal)
            x = TransformerModel(
                heads=self.heads, head_dim=self.out_channels // self.heads,
                num_layers=self.transformer_layers,
                enable_crossview=self.enable_crossview,
                enable_temporal=self.enable_temporal,
                enable_rowwise_crossview=self.enable_rowwise_crossview,
                enable_rowwise_temporal=self.enable_rowwise_temporal,
                merge_factor=self.merge_factor, dtype=self.dtype,
                quantized=self.quantized, name=f"attentions_{i}",
            )(x, context, disable_crossview, disable_temporal,
              crossview_attention_mask)
            states.append(x)
        if self.add_downsample:
            b, t, v = x.shape[:3]
            flat = x.reshape((-1,) + x.shape[3:])
            flat = jnp.pad(flat, ((0, 0), (0, 1), (0, 1), (0, 0)))
            flat = conv_factory(self.quantized)(
                self.out_channels, (3, 3), strides=(2, 2),
                padding="VALID", dtype=self.dtype, name="downsample",
            )(flat)
            x = flat.reshape((b, t, v) + flat.shape[1:])
            states.append(x)
        return x, states


class MidBlockCT(nn.Module):
    heads: int
    transformer_layers: int = 1
    enable_crossview: bool = True
    enable_temporal: bool = True
    enable_rowwise_crossview: bool = False
    enable_rowwise_temporal: bool = False
    merge_factor: float = 0.5
    eps: float = 1e-5
    quantized: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, temb, context=None, disable_crossview=None,
        disable_temporal=None, crossview_attention_mask=None,
    ):
        c = x.shape[-1]
        x = CTResBlock(
            c, eps=self.eps, enable_temporal=self.enable_temporal,
            merge_factor=self.merge_factor, dtype=self.dtype,
            quantized=self.quantized, name="resnets_0",
        )(x, temb, disable_temporal)
        x = TransformerModel(
            heads=self.heads, head_dim=c // self.heads,
            num_layers=self.transformer_layers,
            enable_crossview=self.enable_crossview,
            enable_temporal=self.enable_temporal,
            enable_rowwise_crossview=self.enable_rowwise_crossview,
            enable_rowwise_temporal=self.enable_rowwise_temporal,
            merge_factor=self.merge_factor, dtype=self.dtype,
            quantized=self.quantized, name="attentions_0",
        )(x, context, disable_crossview, disable_temporal,
          crossview_attention_mask)
        x = CTResBlock(
            c, eps=self.eps, enable_temporal=self.enable_temporal,
            merge_factor=self.merge_factor, dtype=self.dtype,
            quantized=self.quantized, name="resnets_1",
        )(x, temb, disable_temporal)
        return x


class UpBlockCT(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    enable_temporal: bool = True
    merge_factor: float = 0.5
    eps: float = 1e-5
    has_attention: bool = False
    heads: int = 8
    transformer_layers: int = 1
    enable_crossview: bool = True
    enable_rowwise_crossview: bool = False
    enable_rowwise_temporal: bool = False
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(
        self, x, res_states, temb, context=None, disable_crossview=None,
        disable_temporal=None, crossview_attention_mask=None,
    ):
        for i in range(self.num_layers):
            res = res_states.pop()
            x = jnp.concatenate([x, res], axis=-1)
            x = CTResBlock(
                self.out_channels, eps=self.eps,
                enable_temporal=self.enable_temporal,
                merge_factor=self.merge_factor, dtype=self.dtype,
                quantized=self.quantized, name=f"resnets_{i}",
            )(x, temb, disable_temporal)
            if self.has_attention:
                x = TransformerModel(
                    heads=self.heads,
                    head_dim=self.out_channels // self.heads,
                    num_layers=self.transformer_layers,
                    enable_crossview=self.enable_crossview,
                    enable_temporal=self.enable_temporal,
                    enable_rowwise_crossview=self.enable_rowwise_crossview,
                    enable_rowwise_temporal=self.enable_rowwise_temporal,
                    merge_factor=self.merge_factor, dtype=self.dtype,
                    quantized=self.quantized, name=f"attentions_{i}",
                )(x, context, disable_crossview, disable_temporal,
                  crossview_attention_mask)
        if self.add_upsample:
            b, t, v, hh, ww, c = x.shape
            flat = x.reshape(-1, hh, ww, c)
            flat = jax.image.resize(
                flat, (flat.shape[0], hh * 2, ww * 2, c), "nearest"
            )
            flat = conv_factory(self.quantized)(
                self.out_channels, (3, 3), padding=1,
                dtype=self.dtype, name="upsample",
            )(flat)
            x = flat.reshape((b, t, v) + flat.shape[1:])
        return x


@register(
    "UNetCrossviewTemporal",
    aliases=(
        "dwm.models.crossview_temporal_unet.UNetCrossviewTemporalConditionModel",
    ),
)
class UNetCrossviewTemporal(nn.Module):
    """Top-level crossview-temporal UNet. See module docstring."""

    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    transformer_layers_per_block: int = 1
    num_attention_heads: Sequence[int] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: Optional[int] = 768
    norm_eps: float = 1e-5
    merge_factor: float = 0.5
    enable_crossview: bool = True
    enable_temporal: bool = True
    enable_rowwise_crossview: bool = False
    enable_rowwise_temporal: bool = False
    condition_image_adapter_config: Optional[dict] = None
    depth_net_config: Optional[dict] = None
    depth_frustum_range: Optional[Sequence[float]] = None
    gradient_checkpointing: bool = False
    dtype: Any = jnp.float32
    # int8 W8A8 serving path ("int8" | None): 2-D convs + transformer
    # denses quantize; (3,1,1) temporal convs and embeddings stay bf16.
    quantization: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        condition_image_tensor: Optional[jax.Array] = None,
        added_time_ids: Optional[jax.Array] = None,
        disable_crossview: Optional[jax.Array] = None,
        disable_temporal: Optional[jax.Array] = None,
        crossview_attention_mask: Optional[jax.Array] = None,
        camera_intrinsics: Optional[jax.Array] = None,
        camera_transforms: Optional[jax.Array] = None,
        **_unused,
    ) -> jax.Array:
        if sample.ndim == 5:
            squeeze_view = True
            sample = sample[:, :, None]
            timestep = timestep[:, :, None]
            if encoder_hidden_states is not None and \
                    encoder_hidden_states.ndim == 4:
                encoder_hidden_states = encoder_hidden_states[:, :, None]
            if condition_image_tensor is not None and \
                    condition_image_tensor.ndim == 5:
                condition_image_tensor = condition_image_tensor[:, :, None]
            if added_time_ids is not None and added_time_ids.ndim == 3:
                added_time_ids = added_time_ids[:, :, None]
        else:
            squeeze_view = False

        b, t, v = sample.shape[:3]
        compute = self.dtype
        sample = sample.astype(compute)
        ch0 = self.block_out_channels[0]
        time_embed_dim = ch0 * 4

        if disable_crossview is None:
            disable_crossview = jnp.zeros((b,), bool)
        if disable_temporal is None:
            disable_temporal = jnp.zeros((b,), bool)

        # 1. time embedding (per b,t,v) — SVD Timesteps(320, flip, shift=0).
        t_emb = timestep_embedding(timestep.reshape(-1), ch0)
        emb = TimestepEmbedding(
            time_embed_dim, dtype=compute, name="time_embedding"
        )(t_emb.astype(compute)).reshape(b, t, v, -1)

        if added_time_ids is not None and \
                self.projection_class_embeddings_input_dim is not None:
            aug = timestep_embedding(
                added_time_ids.reshape(-1), self.addition_time_embed_dim
            ).reshape(b * t * v, -1)
            emb = emb + TimestepEmbedding(
                time_embed_dim, dtype=compute, name="add_embedding"
            )(aug.astype(compute)).reshape(b, t, v, -1)

        # 2. adapter residuals + conv_in
        residuals = []
        if (
            self.condition_image_adapter_config is not None
            and condition_image_tensor is not None
        ):
            feats = ImageAdapter(
                **self.condition_image_adapter_config, dtype=compute,
                name="condition_image_adapter",
            )(condition_image_tensor.astype(compute))
            residuals = list(feats)

        q8 = self.quantization == "int8"
        x = conv_factory(q8)(
            ch0, (3, 3), padding=1, dtype=compute, name="conv_in"
        )(
            sample.reshape((-1,) + sample.shape[3:])
        ).reshape((b, t, v) + sample.shape[3:-1] + (ch0,))
        depth_inputs = [x]
        if residuals:
            x = x + residuals.pop(0)

        ctx = encoder_hidden_states.astype(compute) \
            if encoder_hidden_states is not None else None

        n_blocks = len(self.block_out_channels)
        heads = self.num_attention_heads
        down_states = [x]
        for i, ch in enumerate(self.block_out_channels):
            is_final = i == n_blocks - 1
            if i < n_blocks - 1:  # CrossAttn blocks for all but the last
                x, states = CrossAttnDownBlockCT(
                    out_channels=ch, heads=heads[i],
                    num_layers=self.layers_per_block,
                    transformer_layers=self.transformer_layers_per_block,
                    add_downsample=not is_final,
                    enable_crossview=self.enable_crossview,
                    enable_temporal=self.enable_temporal,
                    enable_rowwise_crossview=self.enable_rowwise_crossview,
                    enable_rowwise_temporal=self.enable_rowwise_temporal,
                    merge_factor=self.merge_factor, eps=self.norm_eps,
                    quantized=q8, dtype=compute, name=f"down_blocks_{i}",
                )(x, emb, ctx, disable_crossview, disable_temporal,
                  crossview_attention_mask)
            else:
                x, states = DownBlockCT(
                    out_channels=ch, num_layers=self.layers_per_block,
                    add_downsample=not is_final,
                    enable_temporal=self.enable_temporal,
                    merge_factor=self.merge_factor, eps=self.norm_eps,
                    quantized=q8, dtype=compute, name=f"down_blocks_{i}",
                )(x, emb, disable_temporal)
            depth_inputs.append(x)
            if residuals:
                x = x + residuals.pop(0)
                states[-1] = x
            down_states += states

        # DepthNet over multi-scale features resized to input resolution
        # (reference crossview_temporal_unet.py:766-782).
        depth_features = None
        if (
            self.depth_net_config is not None
            and camera_intrinsics is not None
            and camera_transforms is not None
        ):
            from opendwm_tpu.models.depth_net import DepthNet

            hh, ww = sample.shape[3:5]
            resized = []
            for f in depth_inputs:
                flat = f.reshape((-1,) + f.shape[3:])
                flat = jax.image.resize(
                    flat, (flat.shape[0], hh, ww, flat.shape[-1]), "nearest"
                )
                resized.append(flat)
            feats = jnp.concatenate(resized, -1).reshape(
                (b, t, v, hh, ww, -1)
            )
            cam_params = jnp.concatenate(
                [
                    camera_intrinsics.reshape(b, t, v, -1),
                    camera_transforms.reshape(b, t, v, -1),
                ],
                -1,
            )
            depth_features = DepthNet(
                **self.depth_net_config, dtype=compute, name="depth_net"
            )(feats, cam_params)

        x = MidBlockCT(
            heads=heads[-1],
            transformer_layers=self.transformer_layers_per_block,
            enable_crossview=self.enable_crossview,
            enable_temporal=self.enable_temporal,
            enable_rowwise_crossview=self.enable_rowwise_crossview,
            enable_rowwise_temporal=self.enable_rowwise_temporal,
            merge_factor=self.merge_factor, eps=self.norm_eps, dtype=compute,
            quantized=q8, name="mid_block",
        )(x, emb, ctx, disable_crossview, disable_temporal,
          crossview_attention_mask)

        rev_channels = list(reversed(self.block_out_channels))
        rev_heads = list(reversed(heads))
        for i, ch in enumerate(rev_channels):
            is_final = i == n_blocks - 1
            x = UpBlockCT(
                out_channels=ch, num_layers=self.layers_per_block + 1,
                add_upsample=not is_final,
                enable_temporal=self.enable_temporal,
                merge_factor=self.merge_factor, eps=self.norm_eps,
                has_attention=i != 0,  # first up block has no attention
                heads=rev_heads[i],
                transformer_layers=self.transformer_layers_per_block,
                enable_crossview=self.enable_crossview,
                enable_rowwise_crossview=self.enable_rowwise_crossview,
                enable_rowwise_temporal=self.enable_rowwise_temporal,
                quantized=q8, dtype=compute, name=f"up_blocks_{i}",
            )(x, down_states, emb, ctx, disable_crossview, disable_temporal,
              crossview_attention_mask)

        flat = x.reshape((-1,) + x.shape[3:])
        flat = _gn(flat, compute, "conv_norm_out")
        flat = nn.silu(flat)
        flat = conv_factory(q8)(
            self.out_channels, (3, 3), padding=1, dtype=compute,
            name="conv_out",
        )(flat)
        out = flat.reshape((b, t, v) + flat.shape[1:])
        if squeeze_view:
            out = out[:, :, 0]
        if depth_features is not None:
            return out, depth_features
        return out
