"""Whole-K Pallas attention with in-kernel tail masking.

The flagship joint attention runs at seq 602 (448 latent + 154 context
tokens per view group) — not a 128 multiple, so the stock flash kernel
can't take it, and its segment-id masking path measured 4x slower than
XLA at this shape (see NEXT.md). This kernel pads to the next 128
multiple and masks the tail *inside* the kernel with an iota compare —
no segment machinery, no logits materialization in HBM.

Because the whole (padded) K/V fits VMEM at these sizes (<= 1024 x 128),
no online-softmax streaming is needed: each grid step computes one
q-tile's full softmax directly. Backward is a one-pass Pallas kernel per
batch-head (recomputed softmax + five matmuls, no probability matrix in
HBM); the XLA vjp fallback it replaced materialized f32 602x602 probs
per head and profiled as the largest train-step op family.

Measured (v5e, b36 h24 s602 d64 bf16): 5.0 ms vs 7.3 ms XLA fwd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MAX_KV_VMEM = 1024  # whole-K strategy bound: padded seq must fit VMEM


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_valid: int):
    q = q_ref[0]                      # (bq, d)
    k = k_ref[0]                      # (sp, d)
    v = v_ref[0]                      # (sp, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                          # (bq, sp)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_valid, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _pad_len(n: int) -> int:
    return -(-n // 128) * 128


def _forward(q, k, v, scale):
    """q/k/v: (B, S, H, D) -> (B, S, H, D); S arbitrary."""
    b, s, h, d = q.shape
    sp = _pad_len(s)
    pad = sp - s

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3).reshape(b * h, sp, d)

    qp, kp, vp = prep(q), prep(k), prep(v)
    # Whole-Q blocks measured fastest (4.0 ms vs 5.7 ms with 128-blocks at
    # s602): sp <= MAX_KV_VMEM keeps the (sp, sp) fp32 logits tile in VMEM.
    bq = sp
    grid = (b * h, sp // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, kv_valid=s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sp, d), q.dtype),
    )(qp, kp, vp)
    out = out.reshape(b, h, sp, d).transpose(0, 2, 1, 3)
    return out[:, :s]


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float, kv_valid: int):
    """One grid step = one batch-head: recompute the masked softmax and
    produce dq/dk/dv with five (sp, sp, d) matmuls — never materializing
    the probability matrix in HBM (the XLA vjp fallback stored the full
    f32 602x602 probs per head; profiled as the largest train-step op)."""
    q = q_ref[0]                       # (sp, d)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                          # (sp, sp)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_valid, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)          # (sp, sp) f32
    pb = p.astype(q.dtype)
    dv_ref[0] = jax.lax.dot_general(
        pb, do.astype(q.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)                               # p^T @ dO
    dp = jax.lax.dot_general(
        do.astype(q.dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # dO @ V^T
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(q.dtype)      # (sp, sp)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)                               # ds^T @ Q


def _backward(q, k, v, do, scale):
    b, s, h, d = q.shape
    sp = _pad_len(s)
    pad = sp - s

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3).reshape(b * h, sp, d)

    qp, kp, vp, dop = prep(q), prep(k), prep(v), prep(do)
    spec = pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0))
    shape = jax.ShapeDtypeStruct((b * h, sp, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, kv_valid=s),
        grid=(b * h,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[shape, shape, shape],
    )(qp, kp, vp, dop)

    def unprep(x):
        return x.reshape(b, h, sp, d).transpose(0, 2, 1, 3)[:, :s]

    return unprep(dq), unprep(dk), unprep(dv)


def _xla_reference(q, k, v, scale):
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def tail_masked_attention(q, k, v, scale: float):
    """BSHD attention for any seq length; Pallas fwd + one-pass Pallas bwd."""
    return _forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _forward(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    return _backward(q, k, v, g, scale)


tail_masked_attention.defvjp(_fwd, _bwd)


def supported(q_seq: int, kv_seq: int, head_dim: int) -> bool:
    return (
        q_seq == kv_seq
        and 128 <= q_seq  # measured faster than XLA from s168 up; tiny
        and _pad_len(q_seq) <= MAX_KV_VMEM  # seqs (temporal t=6) stay XLA
        and head_dim <= 128
    )
