"""Crossview rowwise branch (seq v*gw=168) formulation experiments.

From the fwd profile the 6 crossview branches cost ~9 ms each: Pallas
flash at the padded [2304, 256, 64] shape + head transposes + branch
LN/add fusions in the (96, 168, c) layout. Variants:

  flash    current path (pad 168->256, tail-masked Pallas kernel)
  xla      force the XLA einsum attention (no padding, no transposes
           beyond XLA's own)
  bijh     einsum with heads-minor scores (b, i, j, h)

Run on the TPU: python perf/exp_crossview.py
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
DEPTH = 6
DT = jnp.bfloat16
SCALE = HD ** -0.5


def attn_flash(q, k, v):  # dispatcher default (tail-masked Pallas)
    from opendwm_tpu.ops.attention import dot_product_attention

    return dot_product_attention(q, k, v)


def attn_xla(q, k, v):
    from opendwm_tpu.ops.attention import dot_product_attention

    return dot_product_attention(q, k, v, backend="xla")


def attn_bijh(q, k, v):
    logits = jnp.einsum(
        "bihd,bjhd->bijh", q, k, preferred_element_type=jnp.float32
    ) * SCALE
    p = jax.nn.softmax(logits, axis=2).astype(v.dtype)
    return jnp.einsum("bijh,bjhd->bihd", p, v)


ATTNS = {"flash": attn_flash, "xla": attn_xla, "bijh": attn_bijh}


class CVBlock(nn.Module):
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
            h = h.reshape(B * T, V, GH, GW, C).transpose(0, 2, 1, 3, 4)
            h = h.reshape(B * T * GH, V * GW, C)
            h = CVBlock(attn_kind=self.attn_kind, name=f"cb_{i}")(h)
            h = h.reshape(B * T, GH, V, GW, C).transpose(0, 2, 1, 3, 4)
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
    return {"kind": kind, "ms_total": round(dt * 1e3, 2),
            "ms_per_branch": round(dt / DEPTH * 1e3, 2)}


def main():
    import json
    results = [run(k) for k in ATTNS]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_CROSSVIEW.json")
    with open(path, "w") as f:
        json.dump({"depth": DEPTH, "variants": results}, f, indent=1)
    return results


if __name__ == "__main__":
    main()
