"""Joint-attention kernel shootout at the flagship shapes.

PROFILE_ANALYSIS.json (r5): pallas custom-calls hold 25.2% of fwd device
time (156 ms/iter) while the attention math is only ~2.6e12 flops (~4% of
program flops) — the tail-masked whole-K kernel at (36,602,24,64) runs at
<10% MXU efficiency. This measures, at BOTH real joint shapes
(seq 602 = 448 latent + 154 ctx, and the dual-attention 448):

  tail     ops/flash_tail.tail_masked_attention (current dispatch)
  xla      plain jnp einsum+softmax attention (materialized scores)
  flashpad pad seq to the next 128 multiple, standard pallas flash with
           segment-id masking of the pad tokens, slice back

Each variant is timed standalone under jit (10 iters, value readback).
Numerics are cross-checked against the xla reference (<2e-2 bf16 max err)
before timing so a fast-but-wrong kernel can't win.

Writes perf/BENCH_ATTN602.json.

Ref shape source: factored joint attention of the reference's
crossview_temporal_dit (src/dwm/models/crossview_temporal_dit.py:300-370);
the reference runs torch SDPA (cuDNN flash) here.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(ROOT, "perf", "BENCH_ATTN602.json")

B, H, HD = 36, 24, 64
DT = jnp.bfloat16


def make_qkv(seq, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    shape = (B, seq, H, HD)
    return tuple(
        (jax.random.normal(k, shape) * 0.5).astype(DT) for k in ks
    )


def v_xla(q, k, v):
    scale = 1.0 / np.sqrt(HD)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(DT)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def v_tail(q, k, v):
    from opendwm_tpu.ops.flash_tail import tail_masked_attention
    return tail_masked_attention(q, k, v, scale=1.0 / np.sqrt(HD))


def v_flashpad(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )
    seq = q.shape[1]
    pad = (-seq) % 128
    p = ((0, 0), (0, pad), (0, 0), (0, 0))
    qp, kp, vp = (jnp.pad(x, p) for x in (q, k, v))
    sp = seq + pad
    # pad tokens get segment 1; kernel masks cross-segment pairs
    ids = jnp.concatenate(
        [jnp.zeros((B, seq), jnp.int32), jnp.ones((B, pad), jnp.int32)],
        axis=1,
    )
    bq = min(512, sp)
    while sp % bq:
        bq -= 128
    bk = min(1024, sp)
    while sp % bk:
        bk -= 128
    out = flash_attention(
        qp.transpose(0, 2, 1, 3), kp.transpose(0, 2, 1, 3),
        vp.transpose(0, 2, 1, 3),
        segment_ids=SegmentIds(ids, ids),
        sm_scale=1.0 / np.sqrt(HD),
        block_sizes=BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk,
            block_k_dkv=bk, block_q_dkv=bq,
            block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
        ),
    )
    return out.transpose(0, 2, 1, 3)[:, :seq]


VARIANTS = {"tail": v_tail, "xla": v_xla, "flashpad": v_flashpad}


def run(seq, label):
    q, k, v = make_qkv(seq)
    ref = np.asarray(jax.jit(v_xla)(q, k, v), np.float32)
    out = []
    for name, fn in VARIANTS.items():
        try:
            f = jax.jit(fn)
            got = np.asarray(f(q, k, v), np.float32)
            err = float(np.max(np.abs(got - ref)))
            assert err < 2e-2, f"{name} wrong: max err {err}"
            float(f(q, k, v).astype(jnp.float32).mean())  # warm + sync
            t0 = time.perf_counter()
            for _ in range(10):
                o = f(q, k, v)
            float(o.astype(jnp.float32).mean())
            ms = (time.perf_counter() - t0) / 10 * 1e3
            flops = 4 * seq * seq * H * HD * B
            out.append({
                "variant": name, "ms": round(ms, 3),
                "max_err_vs_xla": round(err, 5),
                "mxu_eff": round(flops / (ms / 1e3) / 197e12, 3),
            })
        except Exception as e:
            out.append({"variant": name, "status": "failed",
                        "error": f"{type(e).__name__}: {e}"[:200]})
        print(label, json.dumps(out[-1]), flush=True)
    return out


def main():
    report = {
        "shape": f"b{B} h{H} hd{HD}",
        "joint_602": run(602, "joint_602"),
        "dual_448": run(448, "dual_448"),
    }
    with open(PATH, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", PATH)


if __name__ == "__main__":
    main()
