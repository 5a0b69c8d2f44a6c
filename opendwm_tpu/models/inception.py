"""InceptionV3 (FID variant) — the FID feature network.

The reference computes FID with torchmetrics' FrechetInceptionDistance
(SURVEY.md §2.6), which wraps the TF "pt_inception-2015-12-05" InceptionV3:
standard IV3 except the FID-specific pooling quirks (average pools exclude
padding; Mixed_7b/7c differ in their pool branch). Implemented channel-last
in flax; weights convert from the released checkpoint via
convert.torch_import.convert_fid_inception.

Input: (n, 299, 299, 3) in [0, 1] (scaled to [-1, 1] internally, matching
torchmetrics). Output: (n, 2048) pool3 features.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from opendwm_tpu.config import register

Dtype = jnp.dtype


def avg_pool_nopad(x, window=3):
    """3x3 stride-1 average pool excluding padding (count_include_pad=False)."""
    ones = jnp.ones_like(x[..., :1])
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    return summed / counts


class BasicConv(nn.Module):
    out_channels: int
    kernel: Sequence[int] = (1, 1)
    stride: Sequence[int] = (1, 1)
    padding: Any = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels, tuple(self.kernel), strides=tuple(self.stride),
            padding=self.padding, use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv(48, dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=2, dtype=self.dtype,
                       name="branch5x5_2")(b5)
        b3 = BasicConv(64, dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=1, dtype=self.dtype,
                       name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=1, dtype=self.dtype,
                       name="branch3x3dbl_3")(b3)
        bp = avg_pool_nopad(x)
        bp = BasicConv(self.pool_features, dtype=self.dtype,
                       name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], -1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), (2, 2), dtype=self.dtype,
                       name="branch3x3")(x)
        bd = BasicConv(64, dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, dtype=self.dtype,
                       name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), (2, 2), dtype=self.dtype,
                       name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], -1)


class InceptionC(nn.Module):
    c7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv(c7, dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)),
                       dtype=self.dtype, name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)),
                       dtype=self.dtype, name="branch7x7_3")(b7)
        bd = BasicConv(c7, dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)),
                       dtype=self.dtype, name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)),
                       dtype=self.dtype, name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)),
                       dtype=self.dtype, name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)),
                       dtype=self.dtype, name="branch7x7dbl_5")(bd)
        bp = avg_pool_nopad(x)
        bp = BasicConv(192, dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], -1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), (2, 2), dtype=self.dtype,
                       name="branch3x3_2")(b3)
        b7 = BasicConv(192, dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)),
                       dtype=self.dtype, name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)),
                       dtype=self.dtype, name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), (2, 2), dtype=self.dtype,
                       name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], -1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # FID E_2 (Mixed_7c) uses max pool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv(384, dtype=self.dtype, name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)),
                        dtype=self.dtype, name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)),
                        dtype=self.dtype, name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], -1)
        bd = BasicConv(448, dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=1, dtype=self.dtype,
                       name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)),
                        dtype=self.dtype, name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)),
                        dtype=self.dtype, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], -1)
        if self.use_max_pool:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        else:
            bp = avg_pool_nopad(x)
        bp = BasicConv(192, dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], -1)


@register("FIDInceptionV3")
class FIDInceptionV3(nn.Module):
    """pool3 (2048-d) FID features from images in [0, 1], (n, 299, 299, 3)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        x = images.astype(self.dtype) * 2.0 - 1.0
        x = BasicConv(32, (3, 3), (2, 2), dtype=self.dtype,
                      name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=1, dtype=self.dtype,
                      name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE(dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, dtype=self.dtype,
                       name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # (n, 2048)
