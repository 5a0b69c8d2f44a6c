"""Ablation: where do the ~23 ms/branch go inside the temporal branch?

Variants (cumulative pieces of the real branch):
  full        transpose + VT block (ff_in, attn, ff) + mixer   (= V0)
  no_attn     attention replaced by identity
  no_ffin     ff_in removed
  ff_only     just the two FFs on the transposed layout, no attn/mixer
  no_transp   VT block applied directly on (36, 448, C) without the
              (B*V*GH*GW, T) temporal regrouping — same FLOPs, friendly
              layout, attention over the 448 axis instead
  dense_eq    matmul-FLOP-equivalent plain stack (2x GEGLU FF + qkv/out
              Dense) on flat (16128, C) tokens — the roofline floor
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
DT = jnp.bfloat16


class VTBlock(nn.Module):
    use_attn: bool = True
    use_ffin: bool = True

    @nn.compact
    def __call__(self, x):
        h = x
        if self.use_ffin:
            n = nn.LayerNorm(epsilon=1e-5, dtype=DT, name="norm_in")(h)
            h = h + FeedForward(dtype=DT, name="ff_in")(n)
        if self.use_attn:
            n = nn.LayerNorm(epsilon=1e-5, dtype=DT, name="norm1")(h)
            h = h + Attention(
                heads=HEADS, head_dim=HD, qk_norm="rms_norm",
                dtype=DT, name="attn1",
            )(n)
        n = nn.LayerNorm(epsilon=1e-5, dtype=DT, name="norm3")(h)
        h = h + FeedForward(dtype=DT, name="ff")(n)
        return h


class DenseEq(nn.Module):
    @nn.compact
    def __call__(self, x):  # (tokens, C)
        h = x + FeedForward(dtype=DT, name="ff_in")(
            nn.LayerNorm(epsilon=1e-5, dtype=DT)(x)
        )
        n = nn.LayerNorm(epsilon=1e-5, dtype=DT)(h)
        q = nn.Dense(C, dtype=DT)(n)
        k = nn.Dense(C, dtype=DT)(n)
        vv = nn.Dense(C, dtype=DT)(n)
        h = h + nn.Dense(C, dtype=DT)(q * k * vv)  # stand-in for attention
        h = h + FeedForward(dtype=DT, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=DT)(h)
        )
        return h


class Chain(nn.Module):
    variant: str

    @nn.compact
    def __call__(self, x, emb):
        for i in range(DEPTH):
            x = x + nn.Dense(C, dtype=DT, name=f"joint_{i}")(x)
            if self.variant == "dense_eq":
                h = (x + emb).reshape(-1, C)
                h = DenseEq(name=f"tb_{i}")(h)
                x = Mixer(dtype=DT, name=f"mix_{i}")(x, h.reshape(x.shape))
                continue
            if self.variant == "no_transp":
                h = VTBlock(name=f"tb_{i}")(x + emb)
                x = Mixer(dtype=DT, name=f"mix_{i}")(x, h)
                continue
            h = x + emb
            h = h.reshape(B, T, V, GH * GW, C).transpose(0, 2, 3, 1, 4)
            h = h.reshape(B * V * GH * GW, T, C)
            blk = VTBlock(
                use_attn=self.variant not in ("no_attn", "ff_only"),
                use_ffin=self.variant != "no_ffin",
                name=f"tb_{i}",
            )
            h = blk(h)
            h = h.reshape(B, V, GH * GW, T, C).transpose(0, 3, 1, 2, 4)
            h = h.reshape(B, T * V, GH * GW, C)
            xr = x.reshape(B, T * V, GH * GW, C)
            out = Mixer(dtype=DT, name=f"mix_{i}")(xr, h)
            x = out.reshape(B * T * V, GH * GW, C)
        return x


def run(variant):
    model = Chain(variant=variant)
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
    print(f"{variant:10s}: {dt*1e3:8.2f} ms ({dt/DEPTH*1e3:6.2f} ms/branch)")


if __name__ == "__main__":
    for variant in ("full", "no_attn", "no_ffin", "ff_only",
                    "no_transp", "dense_eq"):
        run(variant)
