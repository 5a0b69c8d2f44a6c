"""Train-step depth sweep: MFU/throughput at 4/6/8 layers + 24-L extrapolation.

Full flagship depth (24 L) cannot train on one 16 GB v5e: with f32 master
weights (the standard mixed-precision recipe — bf16 masters collapse the
grad program on this backend, see _param_filler in bench.py) the resident
state is 12 bytes/param (f32 params + f32 grads + 2 bf16 moments), so the
single-chip ceiling is ~1.3B params ≈ 8 layers at flagship width. The
multi-chip FSDP path shards the f32 masters (see dryrun_multichip). This
harness makes the single-chip train number interpretable instead (VERDICT
r2 weak #2): it measures bench.py --train at increasing depths, reports
per-depth MFU, and extrapolates the 24-layer frames/s from the marginal
per-layer step time (step(d) fits a + b*d; fixed overhead a amortizes away
with depth, so the extrapolation is an upper bound on what more HBM would
deliver).

Writes perf/BENCH_TRAIN_SWEEP.json.

Usage: python perf/exp_train_depth.py [depths...]
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_depth(layers: int, retries: int = 2):
    env = dict(os.environ, BENCH_TRAIN_LAYERS=str(layers))
    for attempt in range(retries + 1):
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py"), "--train"],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        # the axon tunnel intermittently fails to hand out the chip right
        # after the previous client released it (TPU_WORKER_HOSTNAMES
        # INVALID_ARGUMENT) — transient; back off and retry
        if "TPU_WORKER_HOSTNAMES" in proc.stderr and attempt < retries:
            print(f"depth {layers}: transient tunnel init failure, "
                  f"retrying ({attempt + 1}/{retries})", flush=True)
            time.sleep(60)
            continue
        break
    print(f"depth {layers} failed:\n{proc.stderr[-2000:]}")
    err = [ln for ln in proc.stderr.splitlines() if "Error" in ln]
    return {"error": (err[-1][:300] if err else "no output")}


def main(depths):
    # merge with prior successful entries so partial re-runs (e.g. after a
    # tunnel flake) don't discard measured depths
    path = os.path.join(ROOT, "perf", "BENCH_TRAIN_SWEEP.json")
    results = []
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f).get("sweep", [])
        results = [r for r in prior
                   if r.get("value") and r["layers"] not in depths]
    for d in depths:
        print(f"=== depth {d} ===", flush=True)
        r = run_depth(d)
        if "error" in r:
            results.append({"layers": d, "status": "failed",
                            "error": r["error"]})
            continue
        r["layers"] = d
        r["step_seconds"] = round(6.0 / r["value"], 4) if r["value"] else None
        results.append(r)
        print(json.dumps(r), flush=True)

    results.sort(key=lambda r: r["layers"])
    ok = [r for r in results if r.get("value")]
    out = {"sweep": results}
    if len(ok) >= 2:
        # step(d) = a + b*d  (least squares); 24-layer projection
        ds = np.array([r["layers"] for r in ok], float)
        ts = np.array([r["step_seconds"] for r in ok], float)
        b, a = np.polyfit(ds, ts, 1)
        t24 = a + b * 24
        frames = 6.0 / t24
        out["extrapolation_24_layers"] = {
            "fixed_overhead_s": round(float(a), 4),
            "per_layer_s": round(float(b), 4),
            "step_seconds": round(float(t24), 4),
            "frames_per_sec_per_chip": round(float(frames), 3),
            "note": "upper bound: assumes the 16 GB ceiling is the only "
                    "obstacle; sharded multi-chip training is the real "
                    "full-depth path",
        }
        print("24-layer extrapolation:",
              json.dumps(out["extrapolation_24_layers"]))
    path = os.path.join(ROOT, "perf", "BENCH_TRAIN_SWEEP.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main([int(x) for x in sys.argv[1:]] or [4, 6, 8])
