"""Speed-of-light ceiling analysis for the flagship denoiser forward.

VERDICT r5 item 5: the bf16 fwd headline has been ~9.6 f/s for three
rounds — either push past 10 f/s or prove the ceiling with per-op
HBM/FLOP accounting. This harness does the accounting WITHOUT the chip:

  1. traces the exact bench program (bench.build_denoiser_setup
     abstract=True — full 24-layer flagship geometry as
     ShapeDtypeStructs, no params materialized) with jax.make_jaxpr;
  2. walks the jaxpr (recursing through pjit/scan/cond/custom-vjp and
     into pallas kernel jaxprs × their grid) summing dot_general /
     conv_general_dilated FLOPs and the fusion-ideal HBM bytes of every
     matmul (read A + read B + write C exactly once);
  3. prices the floors against v5e physics (197 TFLOP/s bf16 MXU,
     819 GB/s HBM) and compares each floor with the measured per-bucket
     device time from perf/PROFILE_ANALYSIS.json (xplane capture of the
     real chip, round 5).

The ceiling model is serial-bucket: matmul and attention share the MXU,
so speed-of-light step = matmul floor + attention floor + the residual
-stream HBM traffic that no fusion can remove (each attention/MLP
sublayer must read and re-write the bf16 residual stream once across
the custom-call boundary). Copies and standalone LN/modulate chains
have floor 0 — a perfect program folds them into matmul epilogues.

Reference for the shapes being analyzed: factored crossview/temporal
attention of src/dwm/models/crossview_temporal_dit.py:300-370 (the
reference never published throughput or an efficiency analysis).

Writes perf/CEILING.json. Pure host-side analysis — runs on CPU
(use: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python
perf/ceiling_analytic.py).
"""

import json
import math
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PEAK_BF16 = 197e12   # v5e MXU bf16 FLOP/s
HBM_BW = 819e9       # v5e HBM bytes/s
OUT = os.path.join(ROOT, "perf", "CEILING.json")


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


class Acc:
    def __init__(self):
        self.gemm_flops = 0.0       # dot/conv outside pallas
        self.gemm_bytes = 0.0       # fusion-ideal bytes for those
        self.attn_flops = 0.0       # dots inside pallas kernels x grid
        self.attn_bytes = 0.0       # pallas operands + results, once
        self.gemms = {}             # (m, n, k, batch) -> count

    def add_dot(self, m, n, k, batch, mult, dtype_bytes, in_pallas):
        flops = 2.0 * batch * m * n * k * mult
        byts = (batch * (m * k + k * n + m * n)) * dtype_bytes * mult
        if in_pallas:
            self.attn_flops += flops
        else:
            self.gemm_flops += flops
            self.gemm_bytes += byts
            key = (int(m), int(n), int(k), int(batch))
            self.gemms[key] = self.gemms.get(key, 0) + mult


def _dot_dims(eqn):
    ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
    lsh = eqn.invars[0].aval.shape
    rsh = eqn.invars[1].aval.shape
    batch = _prod(lsh[i] for i in lb) or 1
    k = _prod(lsh[i] for i in lc) or 1
    m = _prod(lsh) // max(batch * k, 1)
    n = _prod(rsh) // max(batch * k, 1)
    return m, n, k, batch


def _conv_flops(eqn):
    out = eqn.outvars[0].aval
    lhs = eqn.invars[0].aval
    rhs = eqn.invars[1].aval  # kernel
    groups = eqn.params.get("feature_group_count", 1)
    dnums = eqn.params["dimension_numbers"]
    ksp = _prod(rhs.shape[i] for i in dnums.rhs_spec[2:])
    in_ch = rhs.shape[dnums.rhs_spec[1]]  # per-group input channels
    flops = 2.0 * _prod(out.shape) * ksp * in_ch
    byts = (_prod(lhs.shape) + _prod(rhs.shape) + _prod(out.shape)) * 2
    return flops, byts, groups


def walk(jaxpr, acc, mult=1.0, in_pallas=False):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            m, n, k, batch = _dot_dims(eqn)
            dt = eqn.invars[0].aval.dtype
            acc.add_dot(m, n, k, batch, mult, dt.itemsize, in_pallas)
        elif name == "conv_general_dilated":
            flops, byts, _ = _conv_flops(eqn)
            acc.gemm_flops += flops * mult
            acc.gemm_bytes += byts * mult
        elif name == "pallas_call":
            # attention kernels: dots inside execute once per grid cell
            grid = 1
            gm = eqn.params.get("grid_mapping")
            if gm is not None:
                grid = _prod(getattr(gm, "grid", ()) or ())
            inner = eqn.params.get("jaxpr")
            if inner is not None:
                walk(getattr(inner, "jaxpr", inner), acc,
                     mult * max(grid, 1), in_pallas=True)
            # HBM floor: every operand read once, every result written once
            byts = sum(_prod(v.aval.shape) * v.aval.dtype.itemsize
                       for v in eqn.invars)
            byts += sum(_prod(v.aval.shape) * v.aval.dtype.itemsize
                        for v in eqn.outvars)
            acc.attn_bytes += byts * mult
            continue
        # recurse into sub-jaxprs (pjit, scan, cond, remat, custom_*)
        submult = mult
        if name == "scan":
            submult = mult * eqn.params.get("length", 1)
        for v in eqn.params.values():
            for sub in _iter_jaxprs(v):
                walk(sub, acc, submult, in_pallas)


def _iter_jaxprs(v):
    import jax.core as core
    vals = v if isinstance(v, (list, tuple)) else [v]
    for item in vals:
        j = getattr(item, "jaxpr", None)
        if j is not None and hasattr(j, "eqns"):
            yield j
        elif hasattr(item, "eqns"):
            yield item


def main():
    import jax

    import bench

    model, pshapes, inputs, cfg, (t, v, h, w, ctx_len) = (
        bench.build_denoiser_setup(abstract=True))
    print(f"tracing flagship: {cfg}, t{t} v{v} {h}x{w} ctx{ctx_len}",
          flush=True)
    jaxpr = jax.make_jaxpr(
        lambda p, kw: model.apply(p, **kw))(pshapes, inputs)
    acc = Acc()
    walk(jaxpr.jaxpr, acc)

    n_params = sum(_prod(s.shape) for s in jax.tree.leaves(pshapes))
    weight_bytes = n_params * 2  # bf16-resident serving weights

    # Residual-stream floor: each attention / MLP sublayer reads and
    # re-writes the bf16 residual across an unfusable boundary.
    d = cfg["heads"] * cfg["head_dim"]
    img_tok = t * v * (h // 2) * (w // 2)
    txt_tok = t * v * ctx_len
    L = cfg["layers"]
    n_dual = 13 * L // 24
    n_cv = sum(1 for i in (1, 5, 9, 13, 17, 21) if i < L)
    n_tmp = sum(1 for i in range(2, 24) if i < L and i % 4 in (2, 3))
    img_subl = 2 * L + n_dual + 2 * n_cv + 2 * n_tmp  # attn+mlp each
    txt_subl = 2 * L
    resid_bytes = 2 * 2 * (img_subl * img_tok + txt_subl * txt_tok) * d

    matmul_floor_ms = acc.gemm_flops / PEAK_BF16 * 1e3
    attn_mxu_ms = acc.attn_flops / PEAK_BF16 * 1e3
    attn_hbm_ms = acc.attn_bytes / HBM_BW * 1e3
    attn_floor_ms = max(attn_mxu_ms, attn_hbm_ms)
    resid_floor_ms = resid_bytes / HBM_BW * 1e3
    weights_ms = weight_bytes / HBM_BW * 1e3
    # weights stream overlaps matmul compute unless it exceeds it
    ceiling_ms = (max(matmul_floor_ms, weights_ms)
                  + attn_floor_ms + resid_floor_ms)

    measured = {}
    pa_path = os.path.join(ROOT, "perf", "PROFILE_ANALYSIS.json")
    if os.path.exists(pa_path):
        with open(pa_path) as f:
            pa = json.load(f)
        measured = {k: b["ms_per_iter"] for k, b in pa["buckets"].items()}
        measured["device_busy"] = pa["device_busy_ms_per_iter"]

    top = sorted(acc.gemms.items(),
                 key=lambda kv: -2 * math.prod(kv[0][:3]) * kv[0][3] * kv[1])
    report = {
        "method": (
            "jax.make_jaxpr over the exact bench program (abstract full "
            "geometry); dot/conv FLOPs and fusion-ideal bytes summed per "
            "op; pallas kernel dots x grid; floors priced at v5e physics "
            "(197 TFLOP/s bf16, 819 GB/s HBM)"),
        "program": {
            "layers": cfg["layers"], "d_model": d,
            "img_tokens": img_tok, "txt_tokens": txt_tok,
            "params_M": round(n_params / 1e6),
        },
        "floors_ms_per_step": {
            "matmul_mxu": round(matmul_floor_ms, 1),
            "attention_mxu": round(attn_mxu_ms, 1),
            "attention_hbm": round(attn_hbm_ms, 1),
            "residual_stream_hbm": round(resid_floor_ms, 1),
            "weight_stream_hbm": round(weights_ms, 1),
            "copies_and_standalone_elementwise": 0.0,
        },
        "totals": {
            "gemm_tflops_per_step": round(acc.gemm_flops / 1e12, 2),
            "attention_tflops_per_step": round(acc.attn_flops / 1e12, 2),
            "gemm_fusion_ideal_gb": round(acc.gemm_bytes / 1e9, 2),
            "attention_io_gb": round(acc.attn_bytes / 1e9, 2),
        },
        "ceiling": {
            "step_ms": round(ceiling_ms, 1),
            "frames_per_sec": round(6.0 / (ceiling_ms / 1e3), 2),
            "model": "serial MXU buckets: max(matmul, weight-stream) + "
                     "attention + residual-stream HBM",
        },
        "measured_ms_per_iter": measured,
        "top_gemms": [
            {"mnk_batch": list(k), "count": round(c, 1),
             "tflops": round(2 * math.prod(k[:3]) * k[3] * c / 1e12, 2)}
            for k, c in top[:10]
        ],
    }
    if measured:
        busy = measured["device_busy"]
        report["headroom"] = {
            "measured_step_ms": busy,
            "fraction_of_ceiling": round(ceiling_ms / busy, 3),
            "gap_ms": {
                "matmul_vs_floor": round(
                    measured.get("matmul", 0) - matmul_floor_ms, 1),
                "attention_vs_floor": round(
                    measured.get("attention(pallas)", 0) - attn_floor_ms, 1),
                "memel_vs_residual_floor": round(
                    measured.get("memel", 0) - resid_floor_ms, 1),
                "copies": measured.get("copy", 0),
            },
        }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["floors_ms_per_step"]))
    print(json.dumps(report["ceiling"]))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
