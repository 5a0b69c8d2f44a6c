"""BEVDepth-style monocular depth head (reference src/dwm/models/depth_net.py).

Consumes multi-scale UNet features (resized+concatenated by the caller) and
camera parameters; emits depth-bin logits used by the CTSD depth loss
(reference ctsd.py:466-616) for the HoloDrive joint image+LiDAR line.

Channel-last. Structure: reduce conv → camera-aware SE excitation (MLP over
flattened intrinsics+extrinsics) → 3 residual blocks → ASPP → classifier.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from opendwm_tpu.config import register

Dtype = jnp.dtype


def _bn(x, dtype, name):
    # The reference uses BatchNorm; GroupNorm is the TPU-friendly stand-in
    # with identical inference semantics after weight folding. Group count
    # is the largest divisor of the channel count that is <= 32.
    c = x.shape[-1]
    groups = next(g for g in range(min(32, c), 0, -1) if c % g == 0)
    return nn.GroupNorm(groups, dtype=dtype, name=name)(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (dilations 1/6/12/18 + image pool)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        feats.append(
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="conv1x1")(x)
        )
        for i, rate in enumerate((6, 12, 18)):
            feats.append(
                nn.Conv(
                    self.out_channels, (3, 3), kernel_dilation=(rate, rate),
                    padding=rate, dtype=self.dtype, name=f"atrous_{i}",
                )(x)
            )
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                         name="pool_conv")(pooled)
        pooled = jnp.broadcast_to(
            pooled, x.shape[:-1] + (self.out_channels,)
        )
        feats.append(pooled)
        y = jnp.concatenate(feats, -1)
        y = nn.relu(_bn(y, self.dtype, "bn"))
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="project")(y)


class CameraAware(nn.Module):
    """SE excitation from camera parameters (reference depth_net.py:67)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, camera_params):
        c = x.shape[-1]
        s = nn.Dense(c, dtype=self.dtype, name="fc1")(camera_params)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, name="fc2")(s)
        s = jax.nn.sigmoid(s)
        return x * s[:, None, None, :]


class ResBlock(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(_bn(h, self.dtype, "bn1"))
        h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        h = _bn(h, self.dtype, "bn2")
        return nn.relu(x + h)


@register("DepthNet", aliases=("dwm.models.depth_net.DepthNet",))
class DepthNet(nn.Module):
    mid_channels: int = 256
    depth_channels: int = 64  # number of depth bins
    upsample_scale: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jax.Array, camera_params: jax.Array):
        """features: (..., H, W, C); camera_params: (..., P) flattened
        intrinsics+extrinsics. Returns (..., H', W', depth_channels)."""
        lead = features.shape[:-3]
        x = features.reshape((-1,) + features.shape[-3:]).astype(self.dtype)
        cam = camera_params.reshape(-1, camera_params.shape[-1]).astype(
            self.dtype
        )
        x = nn.Conv(self.mid_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="reduce_conv")(x)
        x = nn.relu(_bn(x, self.dtype, "reduce_bn"))
        if self.upsample_scale:
            b, h, w, c = x.shape
            x = jax.image.resize(
                x, (b, h * self.upsample_scale, w * self.upsample_scale, c),
                "nearest",
            )
            x = nn.Conv(self.mid_channels, (3, 3), padding=1,
                        dtype=self.dtype, name="upsample_conv")(x)
        x = CameraAware(dtype=self.dtype, name="camera_aware")(x, cam)
        for i in range(3):
            x = ResBlock(dtype=self.dtype, name=f"res_{i}")(x)
        x = ASPP(self.mid_channels, dtype=self.dtype, name="aspp")(x)
        x = nn.Conv(self.depth_channels, (1, 1), dtype=self.dtype,
                    name="classifier")(x)
        return x.reshape(lead + x.shape[1:])
