"""Layout-condition image adapter (T2I-Adapter style).

Pixel-unshuffles the rasterized 3dbox/hdmap condition images and emits one
residual feature map per denoiser stage, optionally through zero-initialized
1x1 convs and tanh zero-gates. Mirrors the capability of the reference
``ImageAdapter`` (src/dwm/models/adapters.py:6-60, built on diffusers
AdapterBlock/AdapterResnetBlock) with channel-last convs.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from opendwm_tpu.config import register

Dtype = jnp.dtype


def pixel_unshuffle(x: jax.Array, factor: int) -> jax.Array:
    """Channel-last pixel unshuffle matching torch's channel ordering
    (out channel index = c*r*r + i*r + j), so converted weights line up."""
    n, h, w, c = x.shape
    r = factor
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, h // r, w // r, c * r * r)


class AdapterResnetBlock(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="block1")(x)
        h = nn.relu(h)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="block2")(h)
        return h + x


class AdapterBlock(nn.Module):
    out_channels: int
    num_res_blocks: int
    down: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.down:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="in_conv"
            )(x)
        for i in range(self.num_res_blocks):
            x = AdapterResnetBlock(dtype=self.dtype, name=f"resnets_{i}")(x)
        return x


@register("ImageAdapter", aliases=("dwm.models.adapters.ImageAdapter",))
class ImageAdapter(nn.Module):
    in_channels: int = 3
    channels: Sequence[int] = (320, 320, 640, 1280, 1280)
    is_downblocks: Sequence[bool] = (False, True, True, True, False)
    num_res_blocks: int = 2
    downscale_factor: int = 8
    use_zero_convs: bool = False
    zero_gate_coef: Optional[float] = None
    gradient_checkpointing: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        """x: (..., H, W, C) with arbitrary leading batch dims. Returns one
        feature per stage, shaped (..., H_i, W_i, channels[i])."""
        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        x = pixel_unshuffle(x, self.downscale_factor)
        zero_gates = (
            self.param(
                "zero_gates", nn.initializers.zeros, (len(self.channels),),
                jnp.float32,
            )
            if self.zero_gate_coef
            else None
        )
        features = []
        for i, ch in enumerate(self.channels):
            block_cls = (
                nn.remat(AdapterBlock)
                if self.gradient_checkpointing
                else AdapterBlock
            )
            x = block_cls(
                out_channels=ch, num_res_blocks=self.num_res_blocks,
                down=self.is_downblocks[i], dtype=self.dtype, name=f"body_{i}",
            )(x)
            out = x
            if self.use_zero_convs:
                out = nn.Conv(
                    ch, (1, 1), kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name=f"zero_convs_{i}",
                )(out)
            if zero_gates is not None:
                out = out * jnp.tanh(
                    self.zero_gate_coef * zero_gates[i]
                ).astype(out.dtype)
            features.append(out.reshape(lead + out.shape[1:]))
        return features
