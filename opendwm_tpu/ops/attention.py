"""Attention dispatch: Pallas TPU flash attention with an XLA fallback.

The reference routes all attention through diffusers' `Attention` →
`F.scaled_dot_product_attention` (see reference src/dwm/models/maskgit_base.py:34-38
and the crossview/temporal blocks in src/dwm/models/crossview_temporal.py).
Here every attention in the framework funnels through
:func:`dot_product_attention`, which picks a backend:

- ``pallas``: `jax.experimental.pallas.ops.tpu.flash_attention` — used on TPU
  when shapes are tile-friendly (no bias mask, seq lengths padded internally).
- ``xla``:    a plain fused einsum/softmax; XLA fuses this well on any backend
  and it supports arbitrary additive masks.

All inputs are ``(batch, seq, heads, head_dim)`` ("BSHD", flax convention).
Softmax always accumulates in float32 regardless of input dtype.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_FLASH_MIN_SEQ = 128  # below this the kernel launch overhead dominates


def _can_use_flash(q, k, bias, backend_hint: str | None) -> bool:
    if backend_hint == "xla":
        return False
    if bias is not None:
        return False
    platform = jax.devices()[0].platform if jax.devices() else "cpu"
    if platform != "tpu" and backend_hint != "pallas":
        return False
    # Kernel constraints: block sizes divide padded seq; head_dim small enough
    # to keep the VMEM working set reasonable.
    q_seq, kv_seq = q.shape[1], k.shape[1]
    if q_seq < _FLASH_MIN_SEQ or kv_seq < _FLASH_MIN_SEQ:
        return False
    if q_seq % 128 or kv_seq % 128:
        return False
    return q.shape[-1] <= 256


def _can_use_tail_masked(q, k, bias, is_causal, backend_hint) -> bool:
    """Non-tile sequences (e.g. the 602-token joint attention) route to the
    whole-K Pallas kernel with in-kernel tail masking (ops/flash_tail.py)."""
    if backend_hint == "xla" or bias is not None or is_causal:
        return False
    platform = jax.devices()[0].platform if jax.devices() else "cpu"
    if platform != "tpu":
        return False
    from opendwm_tpu.ops.flash_tail import supported

    return supported(q.shape[1], k.shape[1], q.shape[-1])


_TINY_MAX_SEQ = 16


def _can_use_tiny(q, k, bias, is_causal, backend_hint) -> bool:
    if backend_hint == "xla" or is_causal:
        return False
    if bias is not None and bias.ndim != 4:
        return False
    platform = jax.devices()[0].platform if jax.devices() else "cpu"
    return (
        platform == "tpu"
        and q.shape[1] == k.shape[1]
        and q.shape[1] <= _TINY_MAX_SEQ
    )


def _tiny_seq_attention(q, k, v, scale, bias=None):
    """Dot-free attention for tiny sequences (the temporal ``pointwise``
    branch attends over t ≤ 8 frames per spatial token; the LiDAR Swin
    window branch attends over ws² = 4 tokens per window).

    XLA lowers the einsum formulation of this shape as ~64k batched 6x64x6
    matmuls — 128-wide MXU tiles run ~2% occupied — plus (N,S,H,D) head
    transposes; measured 8.4 ms per temporal branch on v5e. Expressing the
    scores as broadcast-multiply + reduce keeps everything on the VPU in
    the natural layout (the FLOPs are trivial): measured 23.1 → 18.2 ms
    per branch in context (perf/exp_tinyattn.py).

    ``bias``: optional additive ``(b_or_1, heads, q_seq, kv_seq)`` term
    (relative-position bias / shifted-window mask)."""
    s = q.shape[1]
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    logits = jnp.stack(
        [jnp.sum(q32 * k32[:, j][:, None], axis=-1) for j in range(s)],
        axis=2,
    ) * scale                                   # (b, i, j, h)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32).transpose(0, 2, 3, 1)
    m = jnp.max(logits, axis=2, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=2, keepdims=True)
    v32 = v.astype(jnp.float32)
    out = sum(p[:, :, j, :, None] * v32[:, j][:, None] for j in range(s))
    return out


def _xla_attention(q, k, v, bias, scale, is_causal):
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if is_causal:
        q_len, k_len = logits.shape[-2], logits.shape[-1]
        causal = jnp.tril(jnp.ones((q_len, k_len), dtype=bool), k_len - q_len)
        logits = jnp.where(causal, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(
    jax.jit, static_argnames=("scale", "is_causal", "backend")
)
def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,
    *,
    scale: float | None = None,
    is_causal: bool = False,
    backend: str | None = None,
) -> jax.Array:
    """Multi-head attention over BSHD tensors.

    Args:
      q, k, v: ``(batch, seq, heads, head_dim)``. k/v may have fewer heads
        (grouped-query) — they are broadcast.
      bias: optional additive mask/bias broadcastable to
        ``(batch, heads, q_seq, kv_seq)`` (use ``-inf``/large-negative to mask).
      scale: defaults to ``1/sqrt(head_dim)``.
      backend: force ``"pallas"`` or ``"xla"``; default auto.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if k.shape[2] != q.shape[2]:
        reps = q.shape[2] // k.shape[2]
        k = jnp.repeat(k, reps, axis=2)
        v = jnp.repeat(v, reps, axis=2)
    if _can_use_flash(q, k, bias, backend):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        # Tuned block sizes: the kernel defaults measured 2.5x slower than
        # blocks sized to the actual sequence (14.1 ms vs 5.7 ms at
        # b36 h24 s640 d64 on v5e). Large K blocks keep the kv stream
        # resident; q blocks capped at 512 bound the VMEM working set.
        q_seq, kv_seq = q.shape[1], k.shape[1]

        # Blocks must divide their sequence (kernel constraint, enforced
        # in the backward pass for q too).
        def best_block(seq, cap):
            for cand in range(min(cap, seq), 127, -128):
                if seq % cand == 0:
                    return cand
            return 128

        bq = best_block(q_seq, 512)
        bk = best_block(kv_seq, 1024)
        block_sizes = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk,
            block_q_dkv=bq, block_k_dkv=bk,
            block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk,
        )
        out = flash_attention(
            q.transpose(0, 2, 1, 3),  # kernel expects (b, h, s, d)
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            causal=is_causal,
            sm_scale=scale,
            block_sizes=block_sizes,
        )
        return out.transpose(0, 2, 1, 3).astype(q.dtype)
    if _can_use_tiny(q, k, bias, is_causal, backend):
        return _tiny_seq_attention(q, k, v, scale, bias).astype(q.dtype)
    if _can_use_tail_masked(q, k, bias, is_causal, backend):
        from opendwm_tpu.ops.flash_tail import tail_masked_attention

        return tail_masked_attention(q, k, v, scale).astype(q.dtype)
    return _xla_attention(q, k, v, bias, scale, is_causal).astype(q.dtype)
