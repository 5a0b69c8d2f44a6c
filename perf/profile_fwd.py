"""Capture a TPU op-level profile of the flagship denoiser forward.

Usage:  python perf/profile_fwd.py [--train] [--outdir /tmp/dwmprof]

Reuses bench.py's model construction, traces a few steps with
jax.profiler, then parses the xplane proto with tensorboard_plugin_profile
and prints the top HLO ops by self-time — the data VERDICT round 1 said
was missing for the perf work ("no jax.profiler hooks anywhere").
"""

import glob
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def build(train: bool):
    """Flagship fwd closure at bench.py shapes (bench.py:43-126)."""
    from bench import flops_per_frame  # noqa: F401  (same config source)
    from opendwm_tpu.models.mmdit import DiTCrossviewTemporal

    full = jax.devices()[0].platform == "tpu"
    layers = (4 if train else 24) if full else 2
    heads, head_dim = (24, 64) if full else (4, 8)
    t, v, h, w = (6, 6, 32, 56) if full else (2, 2, 8, 8)
    ctx_len = 154 if full else 8
    d_model = heads * head_dim
    model = DiTCrossviewTemporal(
        patch_size=2, num_layers=layers, attention_head_dim=head_dim,
        num_attention_heads=heads, in_channels=16, out_channels=16,
        joint_attention_dim=d_model, caption_projection_dim=d_model,
        pooled_projection_dim=2048 if full else 16,
        pos_embed_max_size=384 if full else 16,
        sample_size=128 if full else 8, qk_norm="rms_norm",
        dual_attention_layers=tuple(range(13 * layers // 24)) if full else (),
        enable_crossview=True, crossview_attention_type="rowwise",
        crossview_block_layers=tuple(
            i for i in (1, 5, 9, 13, 17, 21) if i < layers
        ) if full else (0,),
        enable_temporal=True, temporal_attention_type="pointwise",
        temporal_block_layers=tuple(
            i for i in (2, 3, 6, 7, 10, 11, 14, 15, 18, 19, 22, 23)
            if i < layers
        ) if full else (1,),
        qk_norm_on_additional_modules="rms_norm",
        perspective_modeling_type="implicit",
        projection_class_embeddings_input_dim=2816,
        dtype=jnp.bfloat16,
        gradient_checkpointing=train,
        crossview_gradient_checkpointing=train,
        temporal_gradient_checkpointing=train,
    )
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    inputs = dict(
        sample=jax.random.normal(ks[0], (1, t, v, h, w, 16), jnp.bfloat16),
        timestep=jnp.full((1, t, v), 500.0),
        encoder_hidden_states=jax.random.normal(
            ks[1], (1, t, v, ctx_len, d_model), jnp.bfloat16
        ),
        pooled_projections=jax.random.normal(
            ks[2], (1, t, v, 2048 if full else 16), jnp.bfloat16
        ),
        added_time_ids=jax.random.normal(ks[3], (1, t, v, 11)),
    )
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(1), **inputs)
    rng = np.random.default_rng(0)
    base = (rng.standard_normal(1 << 20, dtype=np.float32) * 0.02)
    base = base.astype(jnp.bfloat16)

    def fill(s):
        n = int(np.prod(s.shape))
        return jax.device_put(
            np.tile(base, -(-n // base.size))[:n].reshape(s.shape)
        )

    params = jax.tree.map(fill, shapes, is_leaf=lambda x: hasattr(x, "shape"))

    if train:
        target = inputs["sample"]

        def loss_fn(p, kw):
            pred = model.apply(p, **kw)
            return jnp.mean(
                (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
            )

        step = jax.jit(jax.value_and_grad(loss_fn))
        return lambda: float(step(params, inputs)[0])
    fwd = jax.jit(lambda p, kw: model.apply(p, **kw))
    return lambda: float(fwd(params, inputs).astype(jnp.float32).mean())


def summarize(outdir: str, top: int = 40, json_path: str = None):
    """Parse the captured xplane directly (the tensorboard profile plugin's
    native wrapper is broken in this env) and print top TPU ops by time."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = glob.glob(os.path.join(outdir, "plugins/profile/*/*.xplane.pb"))
    assert xplanes, f"no xplane under {outdir}"
    xs = xplane_pb2.XSpace()
    with open(max(xplanes, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if "/device:TPU" in p.name)
    meta = plane.event_metadata
    line = next(ln for ln in plane.lines if ln.name == "XLA Ops")
    by_name: dict[str, float] = {}
    t0 = min(e.offset_ps for e in line.events)
    t1 = max(e.offset_ps + e.duration_ps for e in line.events)
    for e in line.events:
        name = meta[e.metadata_id].name
        by_name[name] = by_name.get(name, 0.0) + e.duration_ps / 1e6  # us
    total = sum(by_name.values())
    span = (t1 - t0) / 1e6

    def cat(name: str) -> str:
        n = name.lower()
        if "custom-call" in n or "tpu_custom_call" in n:
            return "custom-call(pallas)"
        for k in ("fusion", "dot", "conv", "copy", "transpose", "reduce",
                  "all-reduce", "scatter", "gather", "bitcast", "broadcast"):
            if k in n:
                return k
        return "other"

    by_cat: dict[str, float] = {}
    for name, us in by_name.items():
        by_cat[cat(name)] = by_cat.get(cat(name), 0.0) + us
    print(f"\n=== device busy {total/1e3:.1f} ms / span {span/1e3:.1f} ms "
          f"(idle {100*(1-total/span):.0f}%) ===")
    for k, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {us/1e3:9.3f} ms {100*us/total:5.1f}%  {k}")
    print(f"\n=== top {top} ops by total time ===")
    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us/1e3:9.3f} ms {100*us/total:5.1f}%  {name[:100]}")
    if json_path:
        import json
        with open(json_path, "w") as f:
            json.dump({
                "device_busy_ms": round(total / 1e3, 3),
                "span_ms": round(span / 1e3, 3),
                "idle_pct": round(100 * (1 - total / span), 1),
                "by_category_ms": {
                    k: round(us / 1e3, 3)
                    for k, us in sorted(by_cat.items(), key=lambda kv: -kv[1])
                },
                "top_ops": [
                    {"ms": round(us / 1e3, 3),
                     "pct": round(100 * us / total, 1),
                     "op": name[:160]}
                    for name, us in sorted(
                        by_name.items(), key=lambda kv: -kv[1])[:top]
                ],
            }, f, indent=1)
        print("wrote", json_path)


_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8, "u64": 8,
}


def _parse_shapes(text: str):
    """All typed tensor shapes in an HLO instruction string, in order of
    appearance (result first, then operands)."""
    import re
    out = []
    for m in re.finditer(r"\b(pred|[su](?:8|16|32|64)|bf16|f16|f32|f64)"
                         r"\[([\d,]*)\]", text):
        dt, dims = m.group(1), m.group(2)
        shape = tuple(int(d) for d in dims.split(",")) if dims else ()
        out.append((dt, shape))
    return out


def _op_bytes(shapes):
    """HBM traffic upper bound: every distinct operand/result tensor read or
    written once. Overcounts operands resident in VMEM across the fusion;
    undercounts multi-pass access — a floor-of-record, not an exact model."""
    total = 0
    for dt, shape in shapes:
        n = 1
        for d in shape:
            n *= d
        total += n * _DTYPE_BYTES.get(dt, 2)
    return total


def _op_flops(name: str, shapes):
    """GEMM flops inferred from shape algebra: for a matmul-carrying op
    (dot / convolution fusion), find an operand pair ([..,M,K],[K,N] or
    [..,K,N]) consistent with the result [..,M,N] and return 2*prod(out)*K.
    Returns 0 when no consistent contraction is found (elementwise fusions,
    copies, pallas custom-calls — the latter get their flops from the
    kernel shootout artifacts instead)."""
    low = name.lower()
    if not ("dot" in low or "convolution" in low or "matmul" in low):
        return 0
    if not shapes:
        return 0
    out = shapes[0][1]
    if len(out) < 2:
        return 0
    m, n = out[-2], out[-1]
    out_n = 1
    for d in out:
        out_n *= d
    best = 0
    for _, s in shapes[1:]:
        if len(s) < 2:
            continue
        # operand shaped [.., M, K]: contraction size K pairs with some
        # [.., K, N] operand (or the weight may be elided from the
        # truncated text — accept the [.., M, K] evidence alone).
        if s[-2] == m and s[-1] != n:
            best = max(best, 2 * out_n * s[-1])
        if s[-1] == n and s[-2] != m:
            best = max(best, 2 * out_n * s[-2])
    return best


def roofline(outdir: str, json_path: str, iters: int = 3,
             peak_flops: float = 197e12, hbm_bw: float = 819e9):
    """Per-bucket roofline from the captured xplane: measured ms vs the
    HBM-bytes floor and the MXU-flops floor, per iteration.

    The per-op fields parsed from the HLO text give, for each bucket,
      flops_floor_ms = sum(op flops) / peak_flops
      bytes_floor_ms = sum(op bytes) / hbm_bw
      floor_ms       = sum(max(per-op flops time, per-op bytes time))
    so `measured / floor` is the headroom XLA left on the table for that
    bucket. v5e: 197 TFLOP/s bf16, 819 GB/s HBM."""
    import json

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = glob.glob(os.path.join(outdir, "plugins/profile/*/*.xplane.pb"))
    assert xplanes, f"no xplane under {outdir}"
    xs = xplane_pb2.XSpace()
    with open(max(xplanes, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if "/device:TPU" in p.name)
    meta = plane.event_metadata
    line = next(ln for ln in plane.lines if ln.name == "XLA Ops")
    agg: dict[str, list] = {}  # name -> [total_us, count]
    for e in line.events:
        name = meta[e.metadata_id].name
        rec = agg.setdefault(name, [0.0, 0])
        rec[0] += e.duration_ps / 1e6
        rec[1] += 1

    def bucket(name: str) -> str:
        n = name.lower()
        if "custom-call" in n or "tpu_custom_call" in n:
            return "attention(pallas)"
        if "dot" in n or "convolution" in n or "matmul" in n:
            return "matmul"
        if "copy" in n or "transpose" in n or "bitcast" in n:
            return "copy"
        if "fusion" in n or "reduce" in n or "broadcast" in n:
            return "memel"
        return "other"

    buckets: dict[str, dict] = {}
    ops = []
    for name, (us, cnt) in agg.items():
        shapes = _parse_shapes(name)
        nbytes = _op_bytes(shapes) * cnt
        flops = _op_flops(name, shapes) * cnt
        b = buckets.setdefault(bucket(name), {
            "measured_ms": 0.0, "flops": 0.0, "bytes": 0.0, "floor_ms": 0.0})
        b["measured_ms"] += us / 1e3
        b["flops"] += flops
        b["bytes"] += nbytes
        b["floor_ms"] += max(flops / peak_flops, nbytes / hbm_bw) * 1e3
        ops.append((us, name, flops, nbytes))

    report = {"iters": iters, "peak_flops": peak_flops, "hbm_bw": hbm_bw,
              "buckets": {}, "top_ops": []}
    total_meas = total_floor = 0.0
    for k, b in sorted(buckets.items(), key=lambda kv: -kv[1]["measured_ms"]):
        meas = b["measured_ms"] / iters
        floor = b["floor_ms"] / iters
        total_meas += meas
        total_floor += floor
        report["buckets"][k] = {
            "measured_ms": round(meas, 3),
            "floor_ms": round(floor, 3),
            "headroom_x": round(meas / floor, 2) if floor > 0 else None,
            "flops_floor_ms": round(b["flops"] / peak_flops * 1e3 / iters, 3),
            "bytes_floor_ms": round(b["bytes"] / hbm_bw * 1e3 / iters, 3),
            "tflops": round(b["flops"] / iters / 1e12, 2),
            "gbytes": round(b["bytes"] / iters / 1e9, 2),
        }
    report["total_measured_ms"] = round(total_meas, 3)
    report["total_floor_ms"] = round(total_floor, 3)
    for us, name, flops, nbytes in sorted(ops, reverse=True)[:25]:
        ms = us / 1e3 / iters
        floor = max(flops / peak_flops, nbytes / hbm_bw) * 1e3 / iters
        report["top_ops"].append({
            "ms": round(ms, 3), "floor_ms": round(floor, 3),
            "bound": ("flops" if flops / peak_flops > nbytes / hbm_bw
                      else "bytes"),
            "op": name[:160]})
    with open(json_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", json_path)
    return report


def main():
    train = "--train" in sys.argv
    outdir = "/tmp/dwmprof_train" if train else "/tmp/dwmprof"
    json_path = None
    for i, a in enumerate(sys.argv):
        if a == "--outdir":
            outdir = sys.argv[i + 1]
        if a == "--json":
            json_path = sys.argv[i + 1]
    run = build(train)
    run()  # compile + warm
    run()
    jax.profiler.start_trace(outdir)
    for _ in range(3):
        run()
    jax.profiler.stop_trace()
    print("trace captured to", outdir)
    summarize(outdir, json_path=json_path)


if __name__ == "__main__":
    main()
