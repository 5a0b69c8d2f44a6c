"""MaskGIT backbone for LiDAR token modeling (Copilot4D-style).

Capability parity with reference src/dwm/models/maskgit_model.py and
maskgit_base.py: a bidirectional transformer over VQ code tokens with
- mask-token substitution where ``x_id == -1`` (:325-341),
- optional ``extra_embedding`` input codes with top-k-cosine perturbation
  augmentation (:252-309),
- interleaved spatial Swin blocks and MMDiT-style temporal blocks with
  learned-frequency rotary embeddings (maskgit_base.py:16-191),
- per-block BEV layout condition residuals from an ImageAdapter (:107-144),
- LayerNorm+GELU head → n_e logits.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu.config import register
from opendwm_tpu.models.layers import FeedForward, sincos_pos_embed_2d
from opendwm_tpu.models.vq_point_cloud import SwinBlock

Dtype = jnp.dtype


class RotaryEmbedding(nn.Module):
    """Learned-frequency rotary embedding ('pixel' init), applied to the
    sequence axis of (..., seq, heads, head_dim) tensors."""

    head_dim: int
    max_freq: float = 10.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        half = self.head_dim // 2
        freqs = self.param(
            "freqs",
            lambda _key: jnp.linspace(1.0, self.max_freq / 2, half) * jnp.pi,
        )
        seq = x.shape[-3]
        t = jnp.arange(seq, dtype=jnp.float32)
        angles = t[:, None] * freqs[None, :]  # (seq, half)
        cos = jnp.cos(angles)[None, :, None, :]
        sin = jnp.sin(angles)[None, :, None, :]
        x1, x2 = x[..., 0::2], x[..., 1::2]
        out1 = x1 * cos - x2 * sin
        out2 = x1 * sin + x2 * cos
        return jnp.stack([out1, out2], axis=-1).reshape(x.shape)


class TemporalTransformerBlock(nn.Module):
    """Pre-LN self-attention (rotary q/k) + gelu-approx FF
    (reference maskgit_base.py:16-101). Input (n, t, c), attends over t."""

    heads: int
    head_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        n = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        shape = n.shape[:-1] + (self.heads, self.head_dim)
        q = nn.Dense(self.heads * self.head_dim, dtype=self.dtype,
                     name="to_q")(n).reshape(shape)
        k = nn.Dense(self.heads * self.head_dim, dtype=self.dtype,
                     name="to_k")(n).reshape(shape)
        v = nn.Dense(self.heads * self.head_dim, dtype=self.dtype,
                     name="to_v")(n).reshape(shape)
        rope = RotaryEmbedding(self.head_dim, name="rope")
        q = rope(q)
        k = rope(k)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(
            logits * (self.head_dim ** -0.5), -1
        ).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(x.shape[:-1] + (self.heads * self.head_dim,))
        x = x + nn.Dense(c, dtype=self.dtype, name="to_out")(out)

        n = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        return x + FeedForward(
            activation="gelu-approximate", dtype=self.dtype, name="ff"
        )(n)


class MaskgitTransformer(nn.Module):
    """Spatial Swin blocks, optionally interleaved with temporal blocks;
    per-block context residuals (reference maskgit_model.py:18-155)."""

    dim: int
    input_resolution: tuple[int, int]
    depth: int
    num_heads: int
    window_size: int = 2
    enable_temporal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[list] = None,
        batch_size: Optional[int] = None,
        num_frames: Optional[int] = None,
    ) -> jax.Array:
        context = list(context) if context is not None else []
        l = x.shape[-2]
        for i in range(self.depth):
            spatial = SwinBlock(
                heads=self.num_heads, window_size=self.window_size,
                shift=0 if i % 2 == 0 else self.window_size // 2,
                input_resolution=self.input_resolution, dtype=self.dtype,
                name=f"blocks_{i}",
            )
            if self.enable_temporal:
                bt = batch_size * num_frames
                x = spatial(x.reshape(bt, l, self.dim))
                x = x.reshape(batch_size, num_frames, l, self.dim)
                x = x.transpose(0, 2, 1, 3).reshape(
                    batch_size * l, num_frames, self.dim
                )
                x = TemporalTransformerBlock(
                    heads=self.num_heads,
                    head_dim=self.dim // self.num_heads,
                    dtype=self.dtype, name=f"temporal_blocks_{i}",
                )(x)
                x = x.reshape(batch_size, l, num_frames, self.dim)
                x = x.transpose(0, 2, 1, 3).reshape(bt, l, self.dim)
            else:
                x = spatial(x)
            if context:
                x = x + context.pop(0)
        return x


@register(
    "BidirectionalTransformerWithAdapter",
    aliases=(
        "dwm.models.maskgit_model.BidirectionalTransformerWithAdapter",
    ),
)
class BidirectionalTransformer(nn.Module):
    """See module docstring. Inputs:
      x:    (N, L, e_dim) quantized features (ignored when
            ``use_extra_embedding``),
      x_id: (N, L) code indices with -1 at masked positions,
      context: optional (N, H, W, C) BEV layout raster,
      batch_size/num_frames when temporal.
    Returns (N, L, n_e) logits.
    """

    n_e: int
    e_dim: int
    img_size: tuple[int, int]
    hidden_dim: int = 512
    depth: int = 24
    num_heads: int = 16
    window_size: int = 2
    use_extra_embedding: bool = False
    enable_temporal: bool = False
    condition_adapter_config: Optional[dict] = None
    enable_perturbation: bool = False
    perturbation_ratio: float = 0.1
    perturbation_topk: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Optional[jax.Array],
        x_id: jax.Array,
        context: Optional[jax.Array] = None,
        batch_size: Optional[int] = None,
        num_frames: Optional[int] = None,
        perturb_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, self.e_dim)
        )
        masked = (x_id == -1)[..., None]

        if self.use_extra_embedding:
            embed = nn.Embed(
                self.n_e, self.e_dim, dtype=self.dtype,
                name="extra_embedding",
            )
            tok = embed(jnp.maximum(x_id, 0))  # also materializes the table
            if self.enable_perturbation and perturb_rng is not None:
                table = embed.variables["params"]["embedding"]
                x_id = self._perturb(x_id, jnp.asarray(table), perturb_rng)
                tok = embed(jnp.maximum(x_id, 0))
        else:
            tok = x
        h = jnp.where(masked, mask_token.astype(tok.dtype), tok)

        h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     name="decoder_embed")(h)
        pos = sincos_pos_embed_2d(
            self.hidden_dim, tuple(self.img_size), base_size=self.img_size[0]
        )
        h = h + jnp.asarray(pos, h.dtype)[None]

        ctx_feats = None
        if self.condition_adapter_config is not None and context is not None:
            from opendwm_tpu.models.adapters import ImageAdapter

            feats = ImageAdapter(
                **self.condition_adapter_config, dtype=self.dtype,
                name="condition_adapter",
            )(context.astype(self.dtype))
            ctx_feats = [
                f.reshape(f.shape[0], -1, f.shape[-1]) for f in feats
            ]

        h = MaskgitTransformer(
            dim=self.hidden_dim, input_resolution=tuple(self.img_size),
            depth=self.depth, num_heads=self.num_heads,
            window_size=self.window_size,
            enable_temporal=self.enable_temporal, dtype=self.dtype,
            name="blocks",
        )(h, ctx_feats, batch_size=batch_size, num_frames=num_frames)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(h)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.n_e, dtype=self.dtype, name="pred")(h)

    def _perturb(
        self, x_id: jax.Array, table: jax.Array, rng: jax.Array
    ) -> jax.Array:
        """Replace ~ratio of visible tokens with one of their top-k cosine
        neighbors in the extra embedding (training augmentation,
        reference :252-309)."""
        table_n = table / jnp.maximum(
            jnp.linalg.norm(table, axis=-1, keepdims=True), 1e-12
        )
        k1, k2 = jax.random.split(rng)
        valid = x_id != -1
        do_perturb = (
            jax.random.uniform(k1, x_id.shape) < self.perturbation_ratio
        ) & valid
        tok = table_n[jnp.maximum(x_id, 0)]
        sim = tok @ table_n.T
        _, topk = jax.lax.top_k(sim, self.perturbation_topk)
        choice = jax.random.randint(
            k2, x_id.shape, 0, self.perturbation_topk
        )
        neighbor = jnp.take_along_axis(
            topk, choice[..., None], axis=-1
        )[..., 0]
        return jnp.where(do_perturb, neighbor, x_id)
