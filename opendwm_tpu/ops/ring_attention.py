"""Ring attention: sequence-parallel exact attention over a mesh axis.

The reference has NO sequence parallelism (the STDiT3
``enable_sequence_parallelism`` flag is dead, reference mask_layers.py:113);
long sequences are handled algorithmically (SURVEY.md §2.7). This module
provides SP as a first-class option for the TPU rebuild (the BASELINE.json
north star): tokens are sharded over the ``tp`` mesh axis, each device holds
its local queries, and key/value blocks rotate around the ring via
``jax.lax.ppermute`` while an online-softmax accumulator keeps the result
exact — flash attention's streaming update across devices, communication
riding the ICI ring.

Usage::

    attn = ring_attention_sharded(q, k, v, mesh, axis="tp")

q/k/v: (batch, seq, heads, head_dim) globally; seq must divide by the axis
size. The inner per-device computation uses full-precision logits and is
itself XLA-fused; swap in the Pallas flash kernel per block for the next
perf notch.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attend(q, k, v, scale):
    """Local block attention returning (unnormalized_out, row_max, row_sum).

    Shapes: q (b, sq, h, d); k/v (b, sk, h, d). Online-softmax pieces are
    fp32.
    """
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(logits, axis=-1)                      # (b, h, sq)
    p = jnp.exp(logits - m[..., None])
    s = jnp.sum(p, axis=-1)                           # (b, h, sq)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
    return out.astype(jnp.float32), m, s


def _ring_attention_local(q, k, v, *, axis_name: str, scale: float):
    """Per-device body under shard_map: rotate k/v around the ring."""
    n = jax.lax.psum(1, axis_name)

    o, m, s = _block_attend(q, k, v, scale)

    def step(i, carry):
        o_acc, m_acc, s_acc, k_cur, v_cur = carry
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        o_blk, m_blk, s_blk = _block_attend(q, k_nxt, v_nxt, scale)
        m_new = jnp.maximum(m_acc, m_blk)
        alpha = jnp.exp(m_acc - m_new)
        beta = jnp.exp(m_blk - m_new)
        o_new = (
            o_acc * alpha.transpose(0, 2, 1)[..., None]
            + o_blk * beta.transpose(0, 2, 1)[..., None]
        )
        s_new = s_acc * alpha + s_blk * beta
        return o_new, m_new, s_new, k_nxt, v_nxt

    o, m, s, _, _ = jax.lax.fori_loop(0, n - 1, step, (o, m, s, k, v))
    out = o / s.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def ring_attention_replicated(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    scale: float | None = None,
) -> jax.Array:
    """Sequence-parallel attention INSIDE an enclosing ``shard_map`` where
    q/k/v arrive replicated over ``axis_name``.

    Each ring member takes its sequence slice of q/k/v, the k/v shards
    rotate around the ring with the online-softmax accumulator
    (:func:`_ring_attention_local`), and the outputs all-gather back to the
    replicated layout — attention FLOPs split 1/size per device, k/v
    traffic rides the ICI ring. seq must divide by the axis size.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    seq = q.shape[1]
    assert seq % n == 0, (seq, n)
    local = seq // n

    def sl(x):
        return jax.lax.dynamic_slice_in_dim(x, idx * local, local, 1)

    out_local = _ring_attention_local(
        sl(q), sl(k), sl(v), axis_name=axis_name, scale=scale
    )
    return jax.lax.all_gather(out_local, axis_name, axis=1, tiled=True)


def ring_attention_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    scale: float | None = None,
) -> jax.Array:
    """Exact attention with the sequence axis sharded over ``axis``."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    spec = P(None, axis, None, None)
    fn = jax.shard_map(
        functools.partial(
            _ring_attention_local, axis_name=axis, scale=scale
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
