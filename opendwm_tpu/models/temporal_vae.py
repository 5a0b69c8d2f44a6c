"""Causal temporal (3D) video VAE — CogVideoX-style.

The reference optionally swaps the image VAE for diffusers'
AutoencoderKLCogVideoX to compress 4× in time (reference ctsd.py:963-964,
1206-1218 encode rearrange, 1113-1118 vae_pre/vae_stride frame bookkeeping):
with T = 1 + 4k input frames the latent video has 1 + k frames.

Faithful structural port, channel-last: causal 3D convolutions (front
replicate-padded in time so frame t never sees the future), ResNet3D blocks,
spatial 8× and temporal 4× compression (two temporally-strided downsamples),
no attention (CogVideoX VAE has none). Converters can map diffusers weights
onto this tree; the scaling contract matches AutoencoderKL
(``encode_to_scaled`` / ``decode_from_scaled``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from opendwm_tpu.config import register

Dtype = jnp.dtype


class CausalConv3d(nn.Module):
    """3D conv, causal in time: input padded with replicated first frame."""

    features: int
    kernel: Sequence[int] = (3, 3, 3)
    stride: Sequence[int] = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        st, sh, sw = self.stride
        pad_t = kt - 1  # all padding in front (causal)
        if pad_t:
            front = jnp.repeat(x[:, :1], pad_t, axis=1)
            x = jnp.concatenate([front, x], axis=1)
        return nn.Conv(
            self.features, (kt, kh, kw), strides=(st, sh, sw),
            padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
            dtype=self.dtype, name="conv",
        )(x)



def _gn_per_frame(x, dtype, name, groups=32):
    """GroupNorm with per-frame statistics (strict temporal causality —
    normalizing over the time axis would leak future frames into the past)."""
    b, t, h, w, c = x.shape
    flat = x.reshape(b * t, h, w, c)
    flat = nn.GroupNorm(min(groups, c), epsilon=1e-6, dtype=dtype,
                        name=name)(flat)
    return flat.reshape(b, t, h, w, c)

class ResBlock3D(nn.Module):
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or x.shape[-1]
        h = _gn_per_frame(x, self.dtype, "norm1")
        h = nn.silu(h)
        h = CausalConv3d(out_ch, dtype=self.dtype, name="conv1")(h)
        h = _gn_per_frame(h, self.dtype, "norm2")
        h = nn.silu(h)
        h = CausalConv3d(out_ch, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


def _causal_temporal_downsample(x):
    """Stride-2 temporal subsample keeping frame 0 (1+4k → 1+2k frames)."""
    return x[:, ::2]


def _causal_temporal_upsample(x):
    """Inverse: 1+k → 1+2k frames by duplicating every non-initial frame."""
    first, rest = x[:, :1], x[:, 1:]
    rest2 = jnp.repeat(rest, 2, axis=1)
    return jnp.concatenate([first, rest2], axis=1)


@register(
    "TemporalAutoencoderKL",
    aliases=("diffusers.AutoencoderKLCogVideoX",),
)
class TemporalAutoencoderKL(nn.Module):
    """Video VAE: (b, 1+4k, H, W, 3) ↔ (b, 1+k, H/8, W/8, latent)."""

    block_out_channels: Sequence[int] = (128, 256, 256, 512)
    latent_channels: int = 16
    layers_per_block: int = 3
    # Spatial downsample happens between every stage; temporal downsample at
    # the stages flagged here (2 → 4× temporal compression).
    temporal_downsample_stages: Sequence[int] = (1, 2)
    scaling_factor: float = 1.15258426
    shift_factor: float = 0.0
    dtype: Any = jnp.float32

    @property
    def spatial_downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @property
    def temporal_downscale(self) -> int:
        return 2 ** len(self.temporal_downsample_stages)

    @nn.compact
    def __call__(self, video, rng=None, method: str = "full"):
        raise NotImplementedError("use encode/decode via nn.apply method=")

    # -- encoder ---------------------------------------------------------------

    @nn.compact
    def encode(self, video):
        """video: (b, t, h, w, 3), t = 1 + 4k → (mean, logvar)."""
        x = video.astype(self.dtype)
        x = CausalConv3d(self.block_out_channels[0], dtype=self.dtype,
                         name="encoder_conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                x = ResBlock3D(ch, dtype=self.dtype,
                               name=f"encoder_down_{i}_res_{j}")(x)
            if i < len(self.block_out_channels) - 1:
                tdown = i in self.temporal_downsample_stages
                x = CausalConv3d(
                    ch, (3, 3, 3), (1, 2, 2), dtype=self.dtype,
                    name=f"encoder_down_{i}_downsample",
                )(x)
                if tdown:
                    x = _causal_temporal_downsample(x)
        x = ResBlock3D(dtype=self.dtype, name="encoder_mid_res_0")(x)
        x = ResBlock3D(dtype=self.dtype, name="encoder_mid_res_1")(x)
        x = _gn_per_frame(x, self.dtype, "encoder_norm_out")
        x = nn.silu(x)
        moments = CausalConv3d(
            2 * self.latent_channels, dtype=self.dtype, name="encoder_conv_out"
        )(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    # -- decoder ---------------------------------------------------------------

    @nn.compact
    def decode(self, latents):
        chans = list(reversed(self.block_out_channels))
        x = CausalConv3d(chans[0], dtype=self.dtype, name="decoder_conv_in")(
            latents.astype(self.dtype)
        )
        x = ResBlock3D(dtype=self.dtype, name="decoder_mid_res_0")(x)
        x = ResBlock3D(dtype=self.dtype, name="decoder_mid_res_1")(x)
        n_stages = len(chans)
        t_up_stages = {
            n_stages - 2 - s for s in self.temporal_downsample_stages
        }
        for i, ch in enumerate(chans):
            for j in range(self.layers_per_block):
                x = ResBlock3D(ch, dtype=self.dtype,
                               name=f"decoder_up_{i}_res_{j}")(x)
            if i < n_stages - 1:
                if i in t_up_stages:
                    x = _causal_temporal_upsample(x)
                b, t, h, w, c = x.shape
                x = x.reshape(b * t, h, w, c)
                x = jax.image.resize(x, (b * t, h * 2, w * 2, c), "nearest")
                x = x.reshape(b, t, h * 2, w * 2, c)
                x = CausalConv3d(ch, dtype=self.dtype,
                                 name=f"decoder_up_{i}_upsample")(x)
        x = _gn_per_frame(x, self.dtype, "decoder_norm_out")
        x = nn.silu(x)
        return CausalConv3d(3, dtype=self.dtype, name="decoder_conv_out")(x)

    # -- pipeline helpers ---------------------------------------------------------

    @staticmethod
    def sample_posterior(mean, logvar, rng):
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype
        )

    def encode_to_scaled(self, params, videos, rng=None):
        """(b, t, v, H, W, 3) multi-view videos → scaled latents with view
        folded through the batch (the reference's '(b v) c t h w' rearrange,
        ctsd.py:1206-1210)."""
        b, t, v = videos.shape[:3]
        flat = videos.transpose(0, 2, 1, 3, 4, 5).reshape(
            (b * v, t) + videos.shape[3:]
        )
        mean, logvar = self.apply(params, flat, method=self.encode)
        z = self.sample_posterior(mean, logvar, rng) if rng is not None \
            else mean
        z = (z - self.shift_factor) * self.scaling_factor
        tl = z.shape[1]
        z = z.reshape((b, v, tl) + z.shape[2:]).transpose(0, 2, 1, 3, 4, 5)
        return z

    def decode_from_scaled(self, params, latents):
        b, tl, v = latents.shape[:3]
        flat = latents.transpose(0, 2, 1, 3, 4, 5).reshape(
            (b * v, tl) + latents.shape[3:]
        )
        z = flat / self.scaling_factor + self.shift_factor
        out = self.apply(params, z, method=self.decode)
        t = out.shape[1]
        return out.reshape((b, v, t) + out.shape[2:]).transpose(
            0, 2, 1, 3, 4, 5
        )
