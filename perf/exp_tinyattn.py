"""Which tiny-seq attention formulation is fast IN CONTEXT (inside the
temporal-branch chain, where XLA's layout choices differ from isolation)?

  bhqk     current _xla_attention einsum (scores (b,h,q,k))
  bijh     einsum with scores (b,i,j,h) — heads minor
  mulred   no-dot formulation: scores via broadcast multiply + reduce over d
           (VPU-friendly; keeps (N,S,H,D) layout, no head transposes)
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

from opendwm_tpu.models.layers import FeedForward, Mixer, RMSNorm  # noqa: E402

B, T, V, GH, GW, C = 1, 6, 6, 16, 28, 1536
HEADS, HD = 24, 64
DEPTH = 12
DT = jnp.bfloat16
SCALE = HD ** -0.5


def attn_bhqk(q, k, v):
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * SCALE
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def attn_bijh(q, k, v):
    logits = jnp.einsum(
        "bihd,bjhd->bijh", q, k, preferred_element_type=jnp.float32
    ) * SCALE
    p = jax.nn.softmax(logits, axis=2).astype(v.dtype)
    return jnp.einsum("bijh,bjhd->bihd", p, v)


def attn_mulred(q, k, v):
    s = q.shape[1]
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    logits = jnp.stack(
        [jnp.sum(q32 * k32[:, j][:, None], axis=-1) for j in range(s)],
        axis=2,
    ) * SCALE                                  # (b, i, j, h)
    m = jnp.max(logits, axis=2, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=2, keepdims=True)
    v32 = v.astype(jnp.float32)
    out = sum(
        p[:, :, j, :, None] * v32[:, j][:, None] for j in range(s)
    )
    return out.astype(v.dtype)


ATTNS = {"bhqk": attn_bhqk, "bijh": attn_bijh, "mulred": attn_mulred}


class VTBlock(nn.Module):
    attn_kind: str

    @nn.compact
    def __call__(self, x):
        bb, ss, cc = x.shape
        h = x + FeedForward(dtype=DT, name="ff_in")(
            nn.LayerNorm(epsilon=1e-5, dtype=DT, name="norm_in")(x)
        )
        n = nn.LayerNorm(epsilon=1e-5, dtype=DT, name="norm1")(h)
        q = nn.Dense(C, dtype=DT, name="to_q")(n).reshape(bb, ss, HEADS, HD)
        k = nn.Dense(C, dtype=DT, name="to_k")(n).reshape(bb, ss, HEADS, HD)
        v = nn.Dense(C, dtype=DT, name="to_v")(n).reshape(bb, ss, HEADS, HD)
        q = RMSNorm(dtype=DT, name="norm_q")(q)
        k = RMSNorm(dtype=DT, name="norm_k")(k)
        att = ATTNS[self.attn_kind](q, k, v).reshape(bb, ss, cc)
        h = h + nn.Dense(C, dtype=DT, name="to_out")(att)
        n = nn.LayerNorm(epsilon=1e-5, dtype=DT, name="norm3")(h)
        h = h + FeedForward(dtype=DT, name="ff")(n)
        return h


class Chain(nn.Module):
    attn_kind: str

    @nn.compact
    def __call__(self, x, emb):
        for i in range(DEPTH):
            x = x + nn.Dense(C, dtype=DT, name=f"joint_{i}")(x)
            h = x + emb
            h = h.reshape(B, T, V, GH * GW, C).transpose(0, 2, 3, 1, 4)
            h = h.reshape(B * V * GH * GW, T, C)
            h = VTBlock(attn_kind=self.attn_kind, name=f"tb_{i}")(h)
            h = h.reshape(B, V, GH * GW, T, C).transpose(0, 3, 1, 2, 4)
            h = h.reshape(B, T * V, GH * GW, C)
            xr = x.reshape(B, T * V, GH * GW, C)
            out = Mixer(dtype=DT, name=f"mix_{i}")(xr, h)
            x = out.reshape(B * T * V, GH * GW, C)
        return x


def run(kind):
    model = Chain(attn_kind=kind)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B * T * V, GH * GW, C), DT)
    emb = jax.random.normal(key, (B * T * V, 1, C), DT)
    params = model.init(jax.random.PRNGKey(1), x, emb)
    fwd = jax.jit(lambda p, x, emb: model.apply(p, x, emb))
    o = fwd(params, x, emb)
    float(o.astype(jnp.float32).mean())
    t0 = time.perf_counter()
    for _ in range(10):
        o = fwd(params, x, emb)
    float(o.astype(jnp.float32).mean())
    dt = (time.perf_counter() - t0) / 10
    print(f"{kind:8s}: {dt*1e3:8.2f} ms ({dt/DEPTH*1e3:6.2f} ms/branch)")
    return o


if __name__ == "__main__":
    import numpy as np

    outs = {k: run(k) for k in ATTNS}
    a = np.asarray(outs["bhqk"].astype(jnp.float32))
    for k, o in outs.items():
        print(k, "max|delta| vs bhqk:",
              np.abs(a - np.asarray(o.astype(jnp.float32))).max())
