"""Tail-kernel restructuring shootout: can the whole-K Pallas attention
(ops/flash_tail.py) beat its own 5.3 ms at the flagship joint shape?

BENCH_ATTN602.json (r5) established the tail kernel already wins against
XLA (6.8 ms) and padded stock flash (8.8 ms) at (b36 h24 s602 d64), but at
7.6% MXU efficiency. The per-grid-step matmuls are small (640x640x64,
~105 MFLOP ~ 0.5 us of MXU) while each step moves ~326 KB HBM->VMEM, so
the suspects are grid/DMA pipelining and the K=64 contraction (half an
MXU tile). Variants measured here, all numerics-checked against XLA
(<2e-2 bf16) before timing:

  tail      current kernel (one batch-head per grid step, whole-Q block)
  tail_h2   2 heads per grid step via batched in-kernel dot_general --
            halves grid steps, doubles per-step DMA, lets Mosaic overlap
            one head's compute with the other's copy
  tail_h4   4 heads per grid step
  tail_qN   current layout but 128/256-row q-blocks per batch-head --
            more grid steps, smaller working set, deeper DMA pipeline

Writes perf/BENCH_TAILVAR.json.

Ref: the reference runs torch SDPA here (cuDNN flash), factored joint
attention of src/dwm/models/crossview_temporal_dit.py:300-370.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(ROOT, "perf", "BENCH_TAILVAR.json")

B, H, HD = 36, 24, 64
DT = jnp.bfloat16
INTERPRET = os.environ.get("TAILVAR_INTERPRET", "0") == "1"


def _pad_len(n):
    return -(-n // 128) * 128


def _hpack_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_valid, nh):
    """nh heads per grid step; (nh, sp, d) blocks, batched dot_general."""
    q = q_ref[...]                     # (nh, bq, d)
    k = k_ref[...]                     # (nh, sp, d)
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                          # (nh, bq, sp)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < kv_valid, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (o / l).astype(o_ref.dtype)


def tail_hpack(q, k, v, scale, nh):
    b, s, h, d = q.shape
    assert h % nh == 0
    sp = _pad_len(s)
    pad = sp - s

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3).reshape(b * h, sp, d)

    qp, kp, vp = prep(q), prep(k), prep(v)
    grid = (b * h // nh,)
    spec = pl.BlockSpec((nh, sp, d), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_hpack_kernel, scale=scale, kv_valid=s, nh=nh),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, sp, d), q.dtype),
        interpret=INTERPRET,
    )(qp, kp, vp)
    return out.reshape(b, h, sp, d).transpose(0, 2, 1, 3)[:, :s]


def _qsplit_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_valid):
    q = q_ref[0]                       # (bq, d)
    k = k_ref[0]                       # (sp, d)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
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


def tail_qsplit(q, k, v, scale, bq):
    b, s, h, d = q.shape
    sp = _pad_len(s)
    pad = sp - s
    while sp % bq:
        bq -= 128
    nsplit = sp // bq

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3).reshape(b * h, sp, d)

    qp, kp, vp = prep(q), prep(k), prep(v)
    out = pl.pallas_call(
        functools.partial(_qsplit_kernel, scale=scale, kv_valid=s),
        grid=(b * h, nsplit),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sp, d), q.dtype),
        interpret=INTERPRET,
    )(qp, kp, vp)
    return out.reshape(b, h, sp, d).transpose(0, 2, 1, 3)[:, :s]


def v_tail(q, k, v):
    from opendwm_tpu.ops.flash_tail import _forward
    return _forward(q, k, v, 1.0 / np.sqrt(HD))


VARIANTS = {
    "tail": v_tail,
    "tail_h2": lambda q, k, v: tail_hpack(q, k, v, 1.0 / np.sqrt(HD), 2),
    "tail_h4": lambda q, k, v: tail_hpack(q, k, v, 1.0 / np.sqrt(HD), 4),
    "tail_q128": lambda q, k, v: tail_qsplit(q, k, v, 1.0 / np.sqrt(HD), 128),
    "tail_q256": lambda q, k, v: tail_qsplit(q, k, v, 1.0 / np.sqrt(HD), 256),
}


def v_xla(q, k, v):
    scale = 1.0 / np.sqrt(HD)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(DT)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def run(seq, label, b=B):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (
        (jax.random.normal(kk, (b, seq, H, HD)) * 0.5).astype(DT)
        for kk in ks
    )
    ref = np.asarray(jax.jit(v_xla)(q, k, v), np.float32)
    out = []
    for name, fn in VARIANTS.items():
        try:
            f = jax.jit(fn)
            got = np.asarray(f(q, k, v), np.float32)
            err = float(np.max(np.abs(got - ref)))
            assert err < 2e-2, f"{name} wrong: max err {err}"
            if INTERPRET:
                out.append({"variant": name, "max_err_vs_xla": round(err, 5),
                            "numerics": "ok (interpret)"})
            else:
                float(f(q, k, v).astype(jnp.float32).mean())
                t0 = time.perf_counter()
                for _ in range(10):
                    o = f(q, k, v)
                float(o.astype(jnp.float32).mean())
                ms = (time.perf_counter() - t0) / 10 * 1e3
                flops = 4 * seq * seq * H * HD * b
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
