"""Shared neural net layers (flax.linen).

These reproduce the *semantics* (shapes, activations, eps, init) of the
diffusers building blocks the reference composes — sinusoidal timestep
embeddings, GEGLU feed-forward, qk-RMSNorm attention, AdaLayerNorm variants,
SD3 patch embedding with cropped sincos positions — so that released OpenDWM
``.pth`` checkpoints convert 1:1 into these parameter trees.

Reference usage sites: src/dwm/models/crossview_temporal.py (AlphaBlender :9,
VTSelfAttentionBlock :536, TemporalBasicTransformerBlock :167, Mixer :517) and
the diffusers SD3 skeleton subclassed at
src/dwm/models/crossview_temporal_dit.py:105.

Conventions: channel-last everywhere; ``dtype`` is the compute dtype
(bfloat16 by default at call sites), parameters are float32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype


# ---------------------------------------------------------------------------
# Sinusoidal embeddings
# ---------------------------------------------------------------------------

def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
    scale: float = 1.0,
) -> jax.Array:
    """Sinusoidal features of shape ``(*timesteps.shape, dim)`` (fp32).

    Matches diffusers ``get_timestep_embedding`` so converted checkpoints see
    identical MLP inputs.
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    args = scale * args
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], -1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


def sincos_pos_embed_2d(
    embed_dim: int,
    grid_size: tuple[int, int],
    base_size: int,
    interpolation_scale: float = 1.0,
) -> np.ndarray:
    """2-D sincos positional table, identical to diffusers' SD3 PatchEmbed.

    Returns ``(grid_h*grid_w, embed_dim)`` float32 (numpy; it is a constant).
    """
    gh = np.arange(grid_size[0], dtype=np.float32)
    gw = np.arange(grid_size[1], dtype=np.float32)
    gh = gh / (grid_size[0] / base_size) / interpolation_scale
    gw = gw / (grid_size[1] / base_size) / interpolation_scale
    mesh_w, mesh_h = np.meshgrid(gw, gh)  # xy indexing: w varies fastest

    def emb_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate(
        [emb_1d(embed_dim // 2, mesh_w), emb_1d(embed_dim // 2, mesh_h)],
        axis=1,
    )
    return emb.astype(np.float32)


# ---------------------------------------------------------------------------
# Basic modules
# ---------------------------------------------------------------------------

class TimestepEmbedding(nn.Module):
    """Two-layer MLP over sinusoidal features (diffusers TimestepEmbedding)."""

    time_embed_dim: int
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(
            sample.astype(self.dtype)
        )
        x = nn.silu(x)
        x = nn.Dense(
            self.out_dim or self.time_embed_dim, dtype=self.dtype,
            name="linear_2",
        )(x)
        return x


class RMSNorm(nn.Module):
    """RMSNorm with learned scale (diffusers RMSNorm, eps 1e-6)."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(x.dtype)


class LayerNorm(nn.LayerNorm):
    """Alias with diffusers' default eps."""


class FeedForward(nn.Module):
    """diffusers FeedForward. activation in {"geglu", "gelu-approximate"}."""

    dim_out: Optional[int] = None
    mult: int = 4
    activation: str = "geglu"
    dtype: Dtype = jnp.float32
    quantized: bool = False  # int8 serving path (QDense)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dense = dense_factory(self.quantized)
        dim = x.shape[-1]
        inner = dim * self.mult
        dim_out = self.dim_out or dim
        if self.activation == "geglu":
            h = dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate, approximate=False)
        elif self.activation == "gelu-approximate":
            h = dense(inner, dtype=self.dtype, name="proj_in")(x)
            h = nn.gelu(h, approximate=True)
        elif self.activation == "gelu":
            h = dense(inner, dtype=self.dtype, name="proj_in")(x)
            h = nn.gelu(h, approximate=False)
        else:
            raise ValueError(f"Unknown activation {self.activation!r}")
        return dense(dim_out, dtype=self.dtype, name="proj_out")(h)


class QDense(nn.Module):
    """Dense with offline-quantized int8 weights (ops/quant.py W8A8).

    Parameters: ``kernel_q`` int8 (K, N), ``kernel_scale`` f32 (N,) — built
    from a trained float checkpoint by :func:`opendwm_tpu.ops.quant
    .quantize_param_tree`; ``bias`` stays float. Activations quantize
    per-token on the fly; the matmul accumulates int32 on the MXU (2x bf16
    peak on v5e)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from opendwm_tpu.ops.quant import int8_matmul

        k = x.shape[-1]
        wq = self.param(
            "kernel_q",
            lambda key, shape: jax.random.randint(
                key, shape, -127, 128, jnp.int32
            ).astype(jnp.int8),
            (k, self.features),
        )
        ws = self.param(
            "kernel_scale",
            nn.initializers.constant(0.02 / 127),
            (self.features,),
            jnp.float32,
        )
        y = int8_matmul(x, wq, ws, self.dtype)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + b.astype(self.dtype)
        return y


def dense_factory(quantized: bool):
    """nn.Dense, or QDense when the serving path runs int8."""
    return QDense if quantized else nn.Dense


class QConv(nn.Module):
    """NHWC conv with offline-quantized int8 weights (ops/quant.int8_conv).

    Mirrors the nn.Conv surface used by the VAE/UNet stacks (kernel_size,
    strides, int or "SAME"/"VALID" padding). Parameters: ``kernel_q`` int8
    (kh, kw, in, out) + ``kernel_scale`` f32 (out,) + float ``bias``."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from opendwm_tpu.ops.quant import int8_conv

        kh, kw = self.kernel_size
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        wq = self.param(
            "kernel_q",
            lambda key, shape: jax.random.randint(
                key, shape, -127, 128, jnp.int32
            ).astype(jnp.int8),
            (kh, kw, x.shape[-1], self.features),
        )
        ws = self.param(
            "kernel_scale",
            nn.initializers.constant(0.02 / 127),
            (self.features,),
            jnp.float32,
        )
        y = int8_conv(x, wq, ws, self.strides, pad, self.dtype)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + b.astype(self.dtype)
        return y


def conv_factory(quantized: bool):
    """nn.Conv, or QConv when the serving path runs int8."""
    return QConv if quantized else nn.Conv


class Attention(nn.Module):
    """Multi-head (optionally joint two-stream) attention.

    Covers the reference's use of diffusers ``Attention``: self-attention with
    optional qk RMSNorm (SD3.5 style), cross-attention via ``context``, and the
    MMDiT *joint* mode where a context stream carries its own projections
    (``added_kv`` — diffusers ``add_q_proj``/``add_k_proj``/``add_v_proj``)
    and the two streams attend jointly then split.
    """

    heads: int
    head_dim: int
    qk_norm: Optional[str] = None
    out_dim: Optional[int] = None
    context_pre_only: bool = False  # joint mode: no output proj for context
    joint: bool = False
    dtype: Dtype = jnp.float32
    quantized: bool = False  # int8 serving path (QDense projections)
    backend: Optional[str] = None
    # Sequence-parallel ring attention over a mesh axis (set when the model
    # runs inside shard_map with tokens replicated over this axis; the
    # reference's enable_sequence_parallelism flag is dead —
    # mask_layers.py:113 — this is the working TPU-native version).
    sp_axis: Optional[str] = None

    def _heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, self.head_dim)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
    ):
        inner = self.heads * self.head_dim
        mk = dense_factory(self.quantized)
        dense = lambda name: mk(inner, dtype=self.dtype, name=name)
        q = self._heads(dense("to_q")(x))
        kv_src = x if (self.joint or context is None) else context
        k = self._heads(dense("to_k")(kv_src))
        v = self._heads(dense("to_v")(kv_src))
        if self.qk_norm == "rms_norm":
            q = RMSNorm(dtype=self.dtype, name="norm_q")(q)
            k = RMSNorm(dtype=self.dtype, name="norm_k")(k)
        elif self.qk_norm is not None:
            raise ValueError(f"Unsupported qk_norm {self.qk_norm!r}")

        ctx_len = 0
        if self.joint and context is not None:
            cq = self._heads(dense("add_q_proj")(context))
            ck = self._heads(dense("add_k_proj")(context))
            cv = self._heads(dense("add_v_proj")(context))
            if self.qk_norm == "rms_norm":
                cq = RMSNorm(dtype=self.dtype, name="norm_added_q")(cq)
                ck = RMSNorm(dtype=self.dtype, name="norm_added_k")(ck)
            ctx_len = context.shape[1]
            # Context tokens lead, matching SD3 ordering (context first is
            # diffusers' JointAttnProcessor convention: sample first, then
            # context appended).  We append context AFTER the sample tokens.
            q = jnp.concatenate([q, cq], axis=1)
            k = jnp.concatenate([k, ck], axis=1)
            v = jnp.concatenate([v, cv], axis=1)

        if self.sp_axis is not None and mask is None:
            from opendwm_tpu.ops.ring_attention import (
                ring_attention_replicated,
            )

            out = ring_attention_replicated(q, k, v, self.sp_axis)
        else:
            # (A channel-packed Pallas attention that avoids the head-split
            # transposes measured 27% faster in isolation but 6% SLOWER
            # full-model — XLA already folds the transposes into the
            # projection epilogues; see NEXT.md round-3 notes.)
            out = dot_product_attention(
                q, k, v, bias=mask, backend=self.backend
            )
        out = out.reshape(out.shape[0], out.shape[1], inner)

        if self.joint and context is not None:
            sample, ctx = out[:, :-ctx_len], out[:, -ctx_len:]
            sample = mk(
                self.out_dim or x.shape[-1], dtype=self.dtype, name="to_out"
            )(sample)
            if self.context_pre_only:
                return sample, None
            ctx = mk(
                self.out_dim or context.shape[-1], dtype=self.dtype,
                name="to_add_out",
            )(ctx)
            return sample, ctx

        return mk(
            self.out_dim or x.shape[-1], dtype=self.dtype, name="to_out"
        )(out)


# ---------------------------------------------------------------------------
# AdaLayerNorm family (SD3 / DiT modulation)
# ---------------------------------------------------------------------------

class AdaLayerNormZero(nn.Module):
    """LayerNorm modulated by 6 (or 9, dual-attention) chunks from temb."""

    n_chunks: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array):
        dim = x.shape[-1]
        mod = nn.Dense(
            self.n_chunks * dim, dtype=self.dtype, name="linear",
            kernel_init=nn.initializers.zeros,
        )(nn.silu(emb.astype(self.dtype)))
        chunks = jnp.split(mod[:, None, :], self.n_chunks, axis=-1)
        shift, scale, gate = chunks[0], chunks[1], chunks[2]
        normed = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype
        )(x)
        out = normed * (1 + scale) + shift
        return (out, gate, *chunks[3:])


class AdaLayerNormContinuous(nn.Module):
    """LayerNorm with scale/shift conditioned on an embedding (SD3 norm_out)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array):
        dim = x.shape[-1]
        mod = nn.Dense(2 * dim, dtype=self.dtype, name="linear")(
            nn.silu(emb.astype(self.dtype))
        )
        scale, shift = jnp.split(mod[:, None, :], 2, axis=-1)
        normed = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype
        )(x)
        return normed * (1 + scale) + shift


class CombinedTimestepTextProjEmbeddings(nn.Module):
    """SD3 ``time_text_embed``: sinusoidal timestep MLP + pooled-text MLP."""

    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, timestep: jax.Array, pooled_projection: jax.Array):
        t = timestep_embedding(timestep, 256)
        t = TimestepEmbedding(
            self.embed_dim, dtype=self.dtype, name="timestep_embedder"
        )(t)
        p = TimestepEmbedding(
            self.embed_dim, dtype=self.dtype, name="text_embedder"
        )(pooled_projection)
        return t + p


class PatchEmbed(nn.Module):
    """SD3 patch embedding with a cropped sincos position table.

    ``pos_embed_max_size`` crops centrally for the actual latent size
    (diffusers PatchEmbed.cropped_pos_embed), so any resolution up to
    max_size*patch works with one parameter set.
    """

    patch_size: int
    embed_dim: int
    pos_embed_max_size: int = 384
    base_size: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, H, W, C) channel-last.
        b, h, w, _ = x.shape
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
            name="proj",
        )(x)
        gh, gw = h // p, w // p
        x = x.reshape(b, gh * gw, self.embed_dim)
        table = sincos_pos_embed_2d(
            self.embed_dim,
            (self.pos_embed_max_size, self.pos_embed_max_size),
            self.base_size,
        ).reshape(self.pos_embed_max_size, self.pos_embed_max_size, -1)
        top = (self.pos_embed_max_size - gh) // 2
        left = (self.pos_embed_max_size - gw) // 2
        pos = table[top : top + gh, left : left + gw].reshape(1, gh * gw, -1)
        return x + jnp.asarray(pos, dtype=x.dtype)


# ---------------------------------------------------------------------------
# Crossview/temporal primitives (reference crossview_temporal.py)
# ---------------------------------------------------------------------------

class AlphaBlender(nn.Module):
    """Learned sigmoid mix of two branches with per-sample disable.

    ``alpha * a + (1 - alpha) * b``; for samples whose
    ``image_only_indicator`` is True, alpha is forced to 1 (pure spatial).
    Reference: src/dwm/models/crossview_temporal.py:9-72.
    """

    alpha: float = 2.0
    merge_strategy: str = "learned_with_images"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b, image_only_indicator=None):
        if self.merge_strategy == "fixed":
            alpha = jnp.asarray(self.alpha, dtype=jnp.float32)
        else:
            mix = self.param(
                "mix_factor",
                lambda _key: jnp.asarray([self.alpha], jnp.float32),
            )
            alpha = jax.nn.sigmoid(mix)
        if self.merge_strategy == "learned_with_images":
            if image_only_indicator is None:
                raise ValueError("learned_with_images requires the indicator")
            alpha = jnp.where(image_only_indicator, 1.0, alpha)
        alpha = alpha.reshape(alpha.shape + (1,) * (a.ndim - alpha.ndim))
        alpha = alpha.astype(a.dtype)
        return alpha * a + (1.0 - alpha) * b


class Mixer(nn.Module):
    """Scale-gated residual mixer (reference crossview_temporal.py:517)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b, image_only_indicator=None):
        dim = a.shape[-1]
        scale = self.param(
            "scale",
            lambda key: jax.random.normal(key, (1, dim)) / dim**0.5,
        )
        gate = 1.0
        if image_only_indicator is not None:
            gate = jnp.where(image_only_indicator, 0.0, 1.0)
            gate = gate.reshape(gate.shape + (1,) * (a.ndim - gate.ndim))
        return a + gate * scale.astype(a.dtype) * b


class VTSelfAttentionBlock(nn.Module):
    """ff_in → self-attention → ff residual block used for the crossview and
    temporal branches of the DiT (reference crossview_temporal.py:536-582)."""

    heads: int
    head_dim: int
    qk_norm: Optional[str] = None
    dtype: Dtype = jnp.float32
    quantized: bool = False  # int8 W8A8 serving path
    fusion_barriers: bool = True  # off under remat (see models/mmdit._b)

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None):
        # optimization_barrier between sublayers: stops XLA folding the
        # branch's transposed-layout residual/LN chains into oversized
        # fusions (see models/mmdit._b; identity in value and gradient;
        # must be off inside remat'd blocks — barriers in the recompute
        # graph block XLA's backward fusions).
        barrier = (
            jax.lax.optimization_barrier if self.fusion_barriers
            else (lambda y: y)
        )
        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_in")(x)
        h = FeedForward(dtype=self.dtype, quantized=self.quantized,
                        name="ff_in")(h)
        h = barrier(h + residual)

        n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(h)
        h = barrier(h + Attention(
            heads=self.heads, head_dim=self.head_dim, qk_norm=self.qk_norm,
            dtype=self.dtype, quantized=self.quantized, name="attn1",
        )(n, mask=mask))

        n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(h)
        h = barrier(h + FeedForward(dtype=self.dtype,
                                    quantized=self.quantized, name="ff")(n))
        return h


class TemporalBasicTransformerBlock(nn.Module):
    """UNet-side temporal/crossview block with optional cross-attention
    (reference crossview_temporal.py:167-266). Operates on the *frame* axis:
    callers reshape so attention runs over the desired axis."""

    heads: int
    head_dim: int
    use_cross_attention: bool = False
    dtype: Dtype = jnp.float32
    quantized: bool = False  # int8 W8A8 serving path

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
    ):
        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_in")(x)
        h = FeedForward(dtype=self.dtype, quantized=self.quantized,
                        name="ff_in")(h)
        h = h + residual

        n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(h)
        h = h + Attention(
            heads=self.heads, head_dim=self.head_dim, dtype=self.dtype,
            quantized=self.quantized, name="attn1",
        )(n, mask=mask)

        if self.use_cross_attention:
            n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
            h = h + Attention(
                heads=self.heads, head_dim=self.head_dim, dtype=self.dtype,
                quantized=self.quantized, name="attn2",
            )(n, context=context)

        n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(h)
        h = h + FeedForward(dtype=self.dtype, quantized=self.quantized,
                            name="ff")(n)
        return h
