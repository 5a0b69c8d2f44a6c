"""Roofline bucket accounting from a captured fwd xplane.

VERDICT r5 item 5: if the bf16 denoiser forward stays <=9.7 f/s after real
optimization attempts, the alternative deliverable is a profile-backed
ceiling analysis — what fraction of device-busy time is MXU matmul work
(and at what efficiency) vs HBM-bound elementwise/copy floor. This parses
the same xplane as profile_fwd.summarize but buckets every op into

  matmul    — fusions whose root output is a convolution/dot (the op name
              XLA assigns carries "convolution"/"dot" for matmul-rooted
              fusions on TPU) — MXU work
  attention — pallas flash kernels (custom-call)
  copy      — explicit layout copies (the T(8,128)(2,1) retiling ops)
  memel     — every remaining fusion: LN/modulate/residual chains — these
              run at HBM speed, flops ~ 0
  other     — reduces, bitcasts, etc.

and writes perf/PROFILE_ANALYSIS.json with per-bucket ms + the implied
per-bucket efficiency given the program's known total matmul flops
(XLA cost_analysis, scan-aware — taken from bench.py's fwd program at the
same geometry: 6-frame window, 619M-param 24-L flagship).

Usage: python perf/analyze_profile.py [xplane_dir] [n_iters]
  (defaults /tmp/dwmprof 3 — matches run_chip_session's profile stage)
"""

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "perf", "PROFILE_ANALYSIS.json")


def parse(outdir):
    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = glob.glob(
        os.path.join(outdir, "plugins/profile/*/*.xplane.pb"))
    assert xplanes, f"no xplane under {outdir}"
    xs = xplane_pb2.XSpace()
    with open(max(xplanes, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if "/device:TPU" in p.name)
    meta = plane.event_metadata
    line = next(ln for ln in plane.lines if ln.name == "XLA Ops")
    by_name = {}
    for e in line.events:
        name = meta[e.metadata_id].name
        by_name[name] = by_name.get(name, 0.0) + e.duration_ps / 1e6  # us
    return by_name


def bucket(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n:
        return "attention(pallas)"
    if "copy" in n and "fusion" not in n:
        return "copy"
    if "fusion" in n:
        # XLA names matmul-rooted fusions after their root instruction
        if "convolution" in n or "dot" in n:
            return "matmul"
        return "memel"
    if "convolution" in n or "dot" in n:
        return "matmul"
    if "bitcast" in n or "reshape" in n:
        return "other"
    return "other"


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dwmprof"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    by_name = parse(outdir)
    total_us = sum(by_name.values())
    buckets = {}
    tops = {}
    for name, us in by_name.items():
        b = bucket(name)
        buckets[b] = buckets.get(b, 0.0) + us
        cur = tops.setdefault(b, [])
        cur.append((us, name))
    report = {
        "source": outdir,
        "iters": iters,
        "device_busy_ms_per_iter": round(total_us / 1e3 / iters, 3),
        "buckets": {},
    }
    for b, us in sorted(buckets.items(), key=lambda kv: -kv[1]):
        ops = sorted(tops[b], reverse=True)[:6]
        report["buckets"][b] = {
            "ms_per_iter": round(us / 1e3 / iters, 3),
            "pct_of_busy": round(100 * us / total_us, 1),
            "top_ops": [
                {"ms_per_iter": round(u / 1e3 / iters, 3),
                 "op": n[:140]} for u, n in ops
            ],
        }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(
        {b: v["pct_of_busy"] for b, v in report["buckets"].items()},
        indent=1))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
