"""Pipeline parallelism: GPipe schedule over a `pp` mesh axis.

The reference scales only by DDP/FSDP/HSDP (reference
src/dwm/pipelines/ctsd.py:1050-1082); depth-wise scaling is absent. Here a
24-layer DiT (or any homogeneous block stack) can also split across a
``pp`` mesh axis: stage *s* holds the parameters of its layer slice, and
microbatches stream through stages over ICI with ``lax.ppermute``.

TPU-native formulation: one SPMD program under ``jax.shard_map``. Every
device runs the same block code on its *local* parameter shard (stage
params are stacked on a leading axis sharded over ``pp``), so there is no
per-stage branching — the schedule is a single ``fori_loop`` of
``M + P - 1`` ticks (GPipe; the P-1 warmup/drain ticks are the usual
bubble, amortized by the microbatch count M).

The schedule is differentiable end to end (``ppermute`` and the dynamic
index ops have exact transposes), so the same function serves training;
activations for the backward are the loop carries (combine with
``jax.checkpoint`` on ``block_fn`` for long pipelines).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def stack_stage_params(per_stage_params: list):
    """[stage0_tree, stage1_tree, ...] -> one tree with leading stage dim.

    Shard the result's leading axis over ``pp`` (e.g. with
    ``NamedSharding(mesh, P("pp"))`` per leaf) before feeding
    :func:`pipeline_apply` at scale.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)


def pipeline_apply(
    block_fn,
    stacked_params,
    x: jax.Array,
    mesh,
    *,
    axis: str = "pp",
    microbatches: int,
    conds: tuple = (),
    batch_axis: str | None = None,
):
    """Run ``x`` through P pipeline stages of ``block_fn``.

    Args:
      block_fn: ``(stage_params, h, *stage_conds) -> h`` with ``h`` of
        constant shape (one pipeline stage; typically several layers).
      stacked_params: parameter tree whose leaves have leading dim P
        (one slice per stage) — sharded over ``axis`` or replicated.
      x: ``(batch, ...)`` input, replicated over ``axis``. ``batch`` must
        divide by ``microbatches``.
      mesh: a Mesh containing ``axis``.
      microbatches: number of microbatches M (>= P for good utilization).
      conds: extra per-sample conditioning arrays ``(batch, ...)`` passed
        to every stage (split into the matching microbatch).
      batch_axis: optional mesh axis sharding the batch dim of x/conds
        (data parallelism composed with the pipeline; the microbatch count
        then applies to the per-shard batch).

    Returns:
      ``(batch, ...)`` output, replicated over ``axis`` (sharded over
      ``batch_axis`` when given).
    """
    n_stages = mesh.shape[axis]
    m = microbatches
    local_batch = x.shape[0]
    if batch_axis is not None:
        local_batch //= mesh.shape[batch_axis]
    if local_batch % m:
        raise ValueError(f"batch {local_batch} not divisible by {m}.")

    def spmd(params, x, *conds):
        params = jax.tree.map(lambda a: a[0], params)  # local stage slice
        stage = jax.lax.axis_index(axis)
        xs = x.reshape(m, x.shape[0] // m, *x.shape[1:])
        cs = [c.reshape(m, c.shape[0] // m, *c.shape[1:]) for c in conds]
        buf = jnp.zeros_like(xs[0])
        outs = jnp.zeros_like(xs)

        def tick(t, carry):
            buf, outs = carry
            inject = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            h_in = jnp.where((stage == 0) & (t < m), inject, buf)
            # the microbatch currently flowing through this stage
            mb_here = jnp.clip(t - stage, 0, m - 1)
            cond_here = [
                jax.lax.dynamic_index_in_dim(c, mb_here, 0, keepdims=False)
                for c in cs
            ]
            h_out = block_fn(params, h_in, *cond_here)
            buf = jax.lax.ppermute(
                h_out, axis, [(i, i + 1) for i in range(n_stages - 1)]
            )
            out_idx = jnp.clip(t - (n_stages - 1), 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(
                outs, out_idx, 0, keepdims=False
            )
            keep = jnp.where(
                (stage == n_stages - 1) & (t >= n_stages - 1), h_out, cur
            )
            outs = jax.lax.dynamic_update_index_in_dim(outs, keep, out_idx, 0)
            return buf, outs

        _, outs = jax.lax.fori_loop(
            0, m + n_stages - 1, tick, (buf, outs)
        )
        # replicate the last stage's result across the pp axis
        outs = jax.lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)),
            axis,
        )
        return outs.reshape(x.shape)

    data = P(batch_axis) if batch_axis is not None else P()
    return jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(axis), stacked_params),
            data,
            *([data] * len(conds)),
        ),
        out_specs=data,
        check_vma=False,
    )(stacked_params, x, *conds)
