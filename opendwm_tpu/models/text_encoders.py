"""Text encoders: CLIP text towers and the T5 encoder stack.

The reference conditions CTSD on CLIP (SD 2.1) or dual-CLIP + T5-XXL (SD 3.x)
prompt embeddings (reference src/dwm/pipelines/ctsd.py:186-253, 743-842;
T5 runs under its own FSDP group, ctsd.py:937-946). Here both are native flax
modules whose parameter trees convert 1:1 from HuggingFace checkpoints, so
the text stack runs on the TPU mesh like everything else — the T5-XXL
"sharded text encoder" capability is just `param_shardings(...)` over the
same fsdp axis.

Implemented faithfully (activation variants, causal masking, pooled outputs,
T5 relative position buckets) per the HF `transformers` semantics, which is
the numerical contract the released checkpoints assume.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu.config import register
from opendwm_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "gelu_new": lambda x: nn.gelu(x, approximate=True),
    "quick_gelu": quick_gelu,
}


# ---------------------------------------------------------------------------
# CLIP text model
# ---------------------------------------------------------------------------

class CLIPAttention(nn.Module):
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        d = x.shape[-1]
        hd = d // self.heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        shape = x.shape[:-1] + (self.heads, hd)
        out = dot_product_attention(
            q.reshape(shape), k.reshape(shape), v.reshape(shape), bias=mask
        )
        out = out.reshape(x.shape)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    heads: int
    intermediate_size: int
    act: str = "quick_gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="layer_norm1")(x)
        x = x + CLIPAttention(self.heads, dtype=self.dtype,
                              name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _ACTS[self.act](h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)
        return x + h


@register("CLIPTextEncoder",
          aliases=("transformers.CLIPTextModel",
                   "transformers.CLIPTextModelWithProjection"))
class CLIPTextEncoder(nn.Module):
    """CLIP text tower. Returns (last_hidden_state, pooled, hidden_states).

    ``pooled`` follows HF: the hidden state at each sequence's EOS token,
    through ``text_projection`` when ``projection_dim`` is set (SD3's
    CLIP-with-projection variants).
    """

    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    intermediate_size: Optional[int] = None
    max_position_embeddings: int = 77
    act: str = "gelu"
    eos_token_id: int = 49407
    projection_dim: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, output_hidden_state_index: int = -1):
        b, s = input_ids.shape
        d = self.hidden_size
        tok = nn.Embed(self.vocab_size, d, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (self.max_position_embeddings, d),
        )
        x = tok + jnp.asarray(pos[None, :s], dtype=tok.dtype)

        causal = jnp.triu(
            jnp.full((s, s), -jnp.inf, jnp.float32), 1
        )[None, None]
        hidden_states = []
        for i in range(self.num_layers):
            hidden_states.append(x)
            x = CLIPEncoderLayer(
                heads=self.num_heads,
                intermediate_size=self.intermediate_size or 4 * d,
                act=self.act, dtype=self.dtype, name=f"layers_{i}",
            )(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="final_layer_norm")(x)
        hidden_states.append(x)

        if self.eos_token_id == 2:
            # HF legacy path: models with eos_token_id==2 pool at the
            # highest token id (works because eos IS the max id in the CLIP
            # vocab); kept bug-for-bug for checkpoint parity.
            eos = jnp.argmax(input_ids, axis=-1)
        else:
            eos = jnp.argmax(
                (input_ids == self.eos_token_id).astype(jnp.int32), axis=-1
            )
        pooled = x[jnp.arange(b), eos]
        if self.projection_dim is not None:
            pooled = nn.Dense(
                self.projection_dim, use_bias=False, dtype=self.dtype,
                name="text_projection",
            )(pooled)
        return x, pooled, hidden_states


# ---------------------------------------------------------------------------
# T5 encoder
# ---------------------------------------------------------------------------

class T5LayerNorm(nn.Module):
    """RMS norm without bias/mean-centering (T5 style), eps 1e-6."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, -1, keepdims=True)
        return (x32 * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype) * w.astype(
            x.dtype
        )


def t5_relative_position_bucket(
    relative_position, num_buckets: int = 32, max_distance: int = 128
):
    """Bidirectional bucketing identical to HF T5."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5Attention(nn.Module):
    heads: int
    kv_dim: int  # d_kv per head
    has_relative_bias: bool = False
    relative_buckets: int = 32
    relative_max_distance: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        inner = self.heads * self.kv_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(x)
        b_, s, _ = x.shape
        shape = (b_, s, self.heads, self.kv_dim)

        if self.has_relative_bias:
            rel_emb = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (self.relative_buckets, self.heads),
            )
            ctx = jnp.arange(s)[:, None]
            mem = jnp.arange(s)[None, :]
            buckets = t5_relative_position_bucket(
                mem - ctx, self.relative_buckets, self.relative_max_distance
            )
            bias = jnp.asarray(rel_emb)[buckets]  # (s, s, heads)
            bias = bias.transpose(2, 0, 1)[None]  # (1, h, s, s)

        # T5 uses UNSCALED attention (scale folded into init).
        out = dot_product_attention(
            q.reshape(shape), k.reshape(shape), v.reshape(shape),
            bias=bias, scale=1.0,
        )
        out = out.reshape(b_, s, inner)
        return nn.Dense(x.shape[-1], use_bias=False, dtype=self.dtype,
                        name="o")(out), bias


class T5Block(nn.Module):
    heads: int
    kv_dim: int
    d_ff: int
    has_relative_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        h = T5LayerNorm(dtype=self.dtype, name="ln_attn")(x)
        attn_out, bias = T5Attention(
            self.heads, self.kv_dim,
            has_relative_bias=self.has_relative_bias, dtype=self.dtype,
            name="attention",
        )(h, bias)
        x = x + attn_out
        h = T5LayerNorm(dtype=self.dtype, name="ln_ff")(x)
        wi0 = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype,
                       name="wi_0")(h)
        wi1 = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype,
                       name="wi_1")(h)
        h = nn.gelu(wi0, approximate=True) * wi1
        x = x + nn.Dense(x.shape[-1], use_bias=False, dtype=self.dtype,
                         name="wo")(h)
        return x, bias


@register("T5TextEncoder", aliases=("transformers.T5EncoderModel",))
class T5TextEncoder(nn.Module):
    """T5 encoder stack (gated-gelu variant, e.g. t5-v1.1 / T5-XXL)."""

    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array):
        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                     name="shared")(input_ids)
        bias = None
        for i in range(self.num_layers):
            x, bias = T5Block(
                heads=self.num_heads, kv_dim=self.d_kv, d_ff=self.d_ff,
                has_relative_bias=(i == 0), dtype=self.dtype,
                name=f"block_{i}",
            )(x, bias)
        return T5LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)


# ---------------------------------------------------------------------------
# Prompt encoding stacks (SD 2.1 / SD 3.x)
# ---------------------------------------------------------------------------

def sd3_prompt_embeddings(
    clip_l_out, clip_g_out, t5_out, *, caption_dim: int = 4096
):
    """Combine dual-CLIP (+T5) into SD3's (tokens, pooled) conditioning.

    CLIP embeddings are the penultimate hidden states, concatenated
    channel-wise and zero-padded to the T5 width, then concatenated with the
    T5 tokens along the sequence axis; pooled = concat of both CLIP pooled
    projections (reference ctsd.py:743-842 semantics).
    """
    _, pooled_l, hs_l = clip_l_out
    _, pooled_g, hs_g = clip_g_out
    clip_tokens = jnp.concatenate([hs_l[-2], hs_g[-2]], -1)
    clip_tokens = jnp.pad(
        clip_tokens,
        [(0, 0)] * (clip_tokens.ndim - 1)
        + [(0, caption_dim - clip_tokens.shape[-1])],
    )
    tokens = (
        jnp.concatenate([clip_tokens, t5_out], -2)
        if t5_out is not None
        else clip_tokens
    )
    pooled = jnp.concatenate([pooled_l, pooled_g], -1)
    return tokens, pooled
