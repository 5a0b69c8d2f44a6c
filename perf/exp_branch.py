"""Experiment: why do temporal/crossview branch ops run 3-15x slower in the
full model than in isolation?  Times a 12-deep chain of temporal branches
(transpose -> VTSelfAttentionBlock -> Mixer) at flagship shapes under
variants:

  V0  current code path
  V1  optimization_barrier at branch entry/exit (forces materialization,
      stops XLA fusing the transpose into every consumer)
  V2  2D-flattened block interior (LN/FF on (B*S, C); 3D only for attention)
  V3  V1 + V2

Run on the TPU: python perf/exp_branch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from opendwm_tpu.models.layers import (  # noqa: E402
    Attention,
    FeedForward,
    Mixer,
)

B, T, V, GH, GW, C = 1, 6, 6, 16, 28, 1536
HEADS, HD = 24, 64
DEPTH = 12


class VTBlock2D(nn.Module):
    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        bb, ss, cc = x.shape
        x2 = x.reshape(bb * ss, cc)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_in")(x2)
        h = FeedForward(dtype=self.dtype, name="ff_in")(h)
        h = h + x2
        n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(h)
        att = Attention(
            heads=self.heads, head_dim=self.head_dim, qk_norm="rms_norm",
            dtype=self.dtype, name="attn1",
        )(n.reshape(bb, ss, cc))
        h = h + att.reshape(bb * ss, cc)
        n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(h)
        h = h + FeedForward(dtype=self.dtype, name="ff")(n)
        return h.reshape(bb, ss, cc)


class VTBlock3D(nn.Module):
    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_in")(x)
        h = FeedForward(dtype=self.dtype, name="ff_in")(h)
        h = h + x
        n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(h)
        h = h + Attention(
            heads=self.heads, head_dim=self.head_dim, qk_norm="rms_norm",
            dtype=self.dtype, name="attn1",
        )(n)
        n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(h)
        h = h + FeedForward(dtype=self.dtype, name="ff")(n)
        return h


class Chain(nn.Module):
    """DEPTH x (joint-block stand-in -> temporal branch)."""

    barrier: bool
    flat2d: bool
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, emb):
        blk = VTBlock2D if self.flat2d else VTBlock3D
        n_groups = B * T * V
        for i in range(DEPTH):
            # stand-in for the joint block's residual write (keeps layout
            # anchored to (btv, l, c) as in the real model)
            x = x + nn.Dense(C, dtype=self.dtype, name=f"joint_{i}")(x)
            h = x + emb
            h = h.reshape(B, T, V, GH * GW, C).transpose(0, 2, 3, 1, 4)
            h = h.reshape(B * V * GH * GW, T, C)
            if self.barrier:
                h = jax.lax.optimization_barrier(h)
            h = blk(
                heads=HEADS, head_dim=HD, dtype=self.dtype, name=f"tb_{i}"
            )(h)
            if self.barrier:
                h = jax.lax.optimization_barrier(h)
            h = h.reshape(B, V, GH * GW, T, C).transpose(0, 3, 1, 2, 4)
            h = h.reshape(B, T * V, GH * GW, C)
            xr = x.reshape(B, T * V, GH * GW, C)
            out = Mixer(dtype=self.dtype, name=f"mix_{i}")(xr, h)
            x = out.reshape(n_groups, GH * GW, C)
        return x


def run(barrier, flat2d):
    model = Chain(barrier=barrier, flat2d=flat2d)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B * T * V, GH * GW, C), jnp.bfloat16)
    emb = jax.random.normal(key, (B * T * V, 1, C), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(1), x, emb)
    fwd = jax.jit(lambda p, x, emb: model.apply(p, x, emb))
    o = fwd(params, x, emb)
    float(o.astype(jnp.float32).mean())
    t0 = time.perf_counter()
    for _ in range(10):
        o = fwd(params, x, emb)
    float(o.astype(jnp.float32).mean())
    dt = (time.perf_counter() - t0) / 10
    print(
        f"barrier={int(barrier)} flat2d={int(flat2d)}: "
        f"{dt*1e3:8.2f} ms for {DEPTH} branches "
        f"({dt/DEPTH*1e3:6.2f} ms/branch)"
    )
    return o


if __name__ == "__main__":
    outs = {}
    for barrier in (False, True):
        for flat2d in (False, True):
            outs[(barrier, flat2d)] = run(barrier, flat2d)
    # numerics: V1 must equal V0 exactly; V2/V3 equal up to reassociation
    import numpy as np

    a = np.asarray(outs[(False, False)].astype(jnp.float32))
    for k, o in outs.items():
        d = np.abs(a - np.asarray(o.astype(jnp.float32))).max()
        print(k, "max|delta| vs V0 =", d)
