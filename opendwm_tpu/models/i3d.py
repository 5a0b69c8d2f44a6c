"""Inflated 3D Inception (I3D) — the FVD feature network.

The reference computes FVD with the TATS I3D-400 logits
(src/dwm/metrics/fvd.py:5-6, externals/TATS pytorch_i3d). This is the same
InceptionV1-inflated architecture in flax (channel-last NDHWC); weights
convert from the released ``i3d_pretrained_400.pt`` via
:func:`opendwm_tpu.convert.torch_import.convert_i3d` so FVD matches the
reference within float tolerance once the checkpoint is supplied.

Input: (n, t, 224, 224, 3) videos scaled to [-1, 1], t >= 10
(reference fvd.py:73). Output: (n, 400) logits.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from opendwm_tpu.config import register

Dtype = jnp.dtype


class Unit3D(nn.Module):
    """Conv3D + BN + ReLU with TF-style SAME padding (I3D building block)."""

    out_channels: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels, tuple(self.kernel), strides=tuple(self.stride),
            padding="SAME", use_bias=self.use_bias, dtype=self.dtype,
            name="conv3d",
        )(x)
        if self.use_bn:
            # Inference-mode BN: scale/bias/mean/var converted from torch.
            x = nn.BatchNorm(
                use_running_average=True, epsilon=1e-3, dtype=self.dtype,
                name="bn",
            )(x)
        if self.activation:
            x = nn.relu(x)
        return x


class InceptionModule(nn.Module):
    out: Sequence[int]  # (b0, b1a, b1b, b2a, b2b, b3b)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Branch names follow the TATS pytorch_i3d checkpoint layout.
        b0 = Unit3D(self.out[0], dtype=self.dtype, name="b0")(x)
        b1 = Unit3D(self.out[1], dtype=self.dtype, name="b1a")(x)
        b1 = Unit3D(self.out[2], (3, 3, 3), dtype=self.dtype, name="b1b")(b1)
        b2 = Unit3D(self.out[3], dtype=self.dtype, name="b2a")(x)
        b2 = Unit3D(self.out[4], (3, 3, 3), dtype=self.dtype, name="b2b")(b2)
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        b3 = Unit3D(self.out[5], dtype=self.dtype, name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


_INCEPTIONS = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


@register("InceptionI3d")
class InceptionI3d(nn.Module):
    """I3D backbone → (n, num_classes) mean logits (TATS FVD contract)."""

    num_classes: int = 400
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array) -> jax.Array:
        x = video.astype(self.dtype)  # (n, t, h, w, 3)
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype,
                   name="Conv3d_1a_7x7")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(64, dtype=self.dtype, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype,
                   name="Conv3d_2c_3x3")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = InceptionModule(_INCEPTIONS["Mixed_3b"], dtype=self.dtype,
                            name="Mixed_3b")(x)
        x = InceptionModule(_INCEPTIONS["Mixed_3c"], dtype=self.dtype,
                            name="Mixed_3c")(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                     "Mixed_4f"):
            x = InceptionModule(_INCEPTIONS[name], dtype=self.dtype,
                                name=name)(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        x = InceptionModule(_INCEPTIONS["Mixed_5b"], dtype=self.dtype,
                            name="Mixed_5b")(x)
        x = InceptionModule(_INCEPTIONS["Mixed_5c"], dtype=self.dtype,
                            name="Mixed_5c")(x)
        # TATS head: AvgPool3d((2, 7, 7), stride 1) → 1x1x1 logits conv →
        # temporal mean (pytorch_i3d forward). Kernel clamps to the actual
        # grid so sub-224 inputs (tests) still pool to 1x1 spatially.
        kt = min(2, x.shape[1])
        kh = min(7, x.shape[2])
        kw = min(7, x.shape[3])
        x = nn.avg_pool(x, (kt, kh, kw), strides=(1, 1, 1), padding="VALID")
        x = Unit3D(
            self.num_classes, use_bn=False, activation=False, use_bias=True,
            dtype=self.dtype, name="logits",
        )(x)
        return jnp.mean(x[:, :, 0, 0, :], axis=1)  # (n, classes)
