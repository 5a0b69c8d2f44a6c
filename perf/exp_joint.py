"""Joint-block chain experiment: can the residual+AdaLN modulate chain be
made memory-bound?

Variants over a 24-deep chain of real-shape JointTransformerBlocks
(flagship: latent (36,448,1536), ctx (36,154,1536), dual on first 13):

  v0       current code path (models/mmdit.JointTransformerBlock)
  pallas   sublayer boundaries through ops/fused_adaln kernels
           (adaln_modulate for the entry LNs, residual_adaln_modulate
           for the gated-residual + next-LN pairs)
  barrier  optimization_barrier after each sublayer (fusion-context probe)
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

from opendwm_tpu.models.layers import Attention, FeedForward  # noqa: E402
from opendwm_tpu.models.mmdit import (  # noqa: E402
    JointTransformerBlock,
    Modulation,
    _ln,
)
from opendwm_tpu.ops.fused_adaln import (  # noqa: E402
    adaln_modulate,
    residual_adaln_modulate,
)

N, L, LC, C = 36, 448, 154, 1536
HEADS, HD = 24, 64
DEPTH = 24
DT = jnp.bfloat16


class FusedJointBlock(nn.Module):
    """JointTransformerBlock with Pallas-fused sublayer boundaries."""

    dual_attention: bool = False
    barrier_only: bool = False

    def _mod(self, x, scale, shift, block_l):
        if self.barrier_only:
            y = _ln(x, DT) * (1 + scale) + shift
            return jax.lax.optimization_barrier(y)
        return adaln_modulate(x, scale, shift, 1e-6, block_l)

    def _res_mod(self, x, delta, gate, scale, shift, block_l):
        if self.barrier_only:
            xn = jax.lax.optimization_barrier(x + gate * delta)
            y = jax.lax.optimization_barrier(
                _ln(xn, DT) * (1 + scale) + shift
            )
            return xn, y
        return residual_adaln_modulate(x, delta, gate, scale, shift,
                                       1e-6, block_l)

    @nn.compact
    def __call__(self, x, context, temb):
        n_chunks = 9 if self.dual_attention else 6
        mods = Modulation(C, n_chunks, dtype=DT, name="norm1")(temb)
        cmods = Modulation(C, 6, dtype=DT, name="norm1_context")(temb)
        bl, blc = 112, 56

        norm_x = self._mod(x, mods[1], mods[0], bl)
        norm_ctx = self._mod(context, cmods[1], cmods[0], blc)
        attn_out, ctx_attn_out = Attention(
            heads=HEADS, head_dim=HD, qk_norm="rms_norm", joint=True,
            dtype=DT, name="attn",
        )(norm_x, context=norm_ctx)

        if self.dual_attention:
            # dual path's LN reads the PRE-residual x (mirrors v0's `normed`
            # reuse); its residual folds into the main one exactly:
            # x + g_msa*attn + g2*attn2 = x + g_msa*(attn + (g2/g_msa)*attn2)
            # — instead of dividing we just add both deltas first.
            norm_x2 = self._mod(x, mods[7], mods[6], bl)
            attn2 = Attention(
                heads=HEADS, head_dim=HD, qk_norm="rms_norm",
                dtype=DT, name="attn2",
            )(norm_x2)
            x = x + mods[8] * attn2
        x, norm_x = self._res_mod(x, attn_out, mods[2], mods[4], mods[3], bl)
        x = x + FeedForward(
            activation="gelu-approximate", dtype=DT, name="ff"
        )(norm_x) * mods[5]

        context, norm_ctx = self._res_mod(
            context, ctx_attn_out, cmods[2], cmods[4], cmods[3], blc
        )
        context = context + cmods[5] * FeedForward(
            activation="gelu-approximate", dtype=DT, name="ff_context"
        )(norm_ctx)
        return x, context


class Chain(nn.Module):
    variant: str

    @nn.compact
    def __call__(self, x, ctx, temb):
        for i in range(DEPTH):
            dual = i < 13
            if self.variant == "v0":
                blk = JointTransformerBlock(
                    heads=HEADS, head_dim=HD, qk_norm="rms_norm",
                    dual_attention=dual, dtype=DT, name=f"b{i}",
                )
            else:
                blk = FusedJointBlock(
                    dual_attention=dual,
                    barrier_only=self.variant == "barrier", name=f"b{i}",
                )
            x, ctx = blk(x, ctx, temb)
        return x


def run(variant):
    model = Chain(variant=variant)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, L, C), DT)
    ctx = jax.random.normal(key, (N, LC, C), DT)
    temb = jax.random.normal(key, (N, C), DT)
    params = model.init(jax.random.PRNGKey(1), x, ctx, temb)
    fwd = jax.jit(lambda p, *a: model.apply(p, *a))
    o = fwd(params, x, ctx, temb)
    float(o.astype(jnp.float32).mean())
    t0 = time.perf_counter()
    for _ in range(10):
        o = fwd(params, x, ctx, temb)
    float(o.astype(jnp.float32).mean())
    dt = (time.perf_counter() - t0) / 10
    print(f"{variant:8s}: {dt*1e3:8.2f} ms ({dt/DEPTH*1e3:6.2f} ms/block)")


if __name__ == "__main__":
    for v in ("v0", "pallas", "barrier"):
        run(v)
