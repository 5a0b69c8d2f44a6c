"""One-process chip session: every overdue on-chip measurement, in order.

VERDICT r4's central finding: round 4 built measurement harnesses it never
ran, and the per-measurement-subprocess pattern is the proven failure mode
(the axon tunnel reliably hands the chip to the FIRST client and
intermittently fails every re-acquisition with TPU_WORKER_HOSTNAMES —
depths 5/6/8 died that way). This driver acquires the chip ONCE and runs
all pending stages sequentially in-process, writing each artifact the
moment its stage finishes so a mid-session crash loses nothing:

  1. train-depth sweep 4/6/8 + 24-L extrapolation  (VERDICT r5 item 1)
     -> perf/BENCH_TRAIN_SWEEP.json
  2. LiDAR MaskGIT generation                      (item 2)
     -> perf/BENCH_LIDAR.json
  3. streaming latency bf16 + int8                 (item 2)
     -> perf/BENCH_STREAMING.json
  4. e2e bf16 re-measure post window-glue          (item 2)
     -> perf/BENCH_E2E.json (appended)
  5. int8 fidelity at serving depth (8w x 30s)     (item 3)
     -> perf/INT8_FIDELITY.json

Stages are independent try/except blocks; jax.clear_caches() + gc between
stages frees HBM and compiled executables. A session log goes to
perf/CHIP_SESSION.json.

Usage: python perf/run_chip_session.py [stage ...]
  stage in {sweep, lidar, streaming, e2e, fidelity}; default = all.
"""

import gc
import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LOG_PATH = os.path.join(ROOT, "perf", "CHIP_SESSION.json")
_log = {"started": time.strftime("%Y-%m-%d %H:%M:%S"), "stages": []}


def _record(name, status, seconds, detail=None):
    _log["stages"].append({
        "stage": name, "status": status, "seconds": round(seconds, 1),
        **({"detail": detail} if detail else {}),
    })
    with open(LOG_PATH, "w") as f:
        json.dump(_log, f, indent=1)


def _stage(name):
    def deco(fn):
        fn._stage_name = name
        return fn
    return deco


@_stage("sweep")
def stage_sweep():
    """Depths from SWEEP_DEPTHS (default "4,5,6"). Depth 8 needs ~14.5 GB
    of resident state and reliably OOMs the 16 GB chip — and a failed
    program poisons the tunnel backend server-side (every later
    allocation in the SAME process returns RESOURCE_EXHAUSTED; scrub +
    in-process retry demonstrably does not recover it — r5 sessions 1-2).
    Run the sweep LAST and keep OOM-risky depths out of shared sessions."""
    import exp_train_depth
    depths = [int(x) for x in os.environ.get(
        "SWEEP_DEPTHS", "4,5,6").split(",")]
    exp_train_depth.main(depths)
    return "wrote BENCH_TRAIN_SWEEP.json"


@_stage("lidar")
def stage_lidar():
    import bench
    r = bench.run_lidar_bench()
    r["command"] = "python bench.py --lidar"
    r["date"] = time.strftime("%Y-%m-%d")
    path = os.path.join(ROOT, "perf", "BENCH_LIDAR.json")
    runs = []
    if os.path.exists(path):
        with open(path) as f:
            runs = json.load(f).get("runs", [])
    runs.append(r)
    with open(path, "w") as f:
        json.dump({"runs": runs}, f, indent=1)
    return json.dumps(r)


@_stage("streaming")
def stage_streaming():
    import jax

    import bench
    path = os.path.join(ROOT, "perf", "BENCH_STREAMING.json")
    runs = []
    if os.path.exists(path):
        with open(path) as f:
            runs = json.load(f).get("runs", [])
    out = []
    for int8 in (False, True):
        r = bench.run_streaming_bench(int8=int8)
        r["command"] = "python bench.py --streaming" + (
            " --int8" if int8 else "")
        r["date"] = time.strftime("%Y-%m-%d")
        runs.append(r)
        out.append(r)
        with open(path, "w") as f:
            json.dump({"runs": runs}, f, indent=1)
        jax.clear_caches()
        gc.collect()
    return json.dumps(out)


@_stage("e2e")
def stage_e2e():
    import bench
    r = bench.run_e2e_bench(int8=False)
    r["command"] = "python bench.py --e2e"
    r["date"] = time.strftime("%Y-%m-%d")
    path = os.path.join(ROOT, "perf", "BENCH_E2E.json")
    with open(path) as f:
        doc = json.load(f)
    doc["runs"].append(r)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    return json.dumps(r)


@_stage("fidelity")
def stage_fidelity():
    import exp_int8_fidelity
    exp_int8_fidelity.main()
    return "wrote INT8_FIDELITY.json"


@_stage("dvgo")
def stage_dvgo():
    """DVGO ray-render rays/s (corner8 vs block) — the data VERDICT r5
    item 7 gates the Pallas march kernel on."""
    import sys as _sys

    import exp_lidar
    argv, _sys.argv = _sys.argv, ["exp_lidar.py"]
    try:
        exp_lidar.main()
    finally:
        _sys.argv = argv
    return "wrote BENCH_LIDAR_RENDER.json"


@_stage("lidar_breakdown")
def stage_lidar_breakdown():
    """Localize the 800 ms LiDAR gen cost (MFU 0.02 — latency-bound)."""
    import exp_lidar_breakdown
    exp_lidar_breakdown.main()
    return "wrote BENCH_LIDAR_BREAKDOWN.json"


@_stage("remat")
def stage_remat():
    """Remat-variant train step at shallow depths. Defaults to the
    selective 'half' variant (odd joint blocks only) — 'full' and 'none'
    are already recorded in BENCH_TRAIN_REMAT.json and the merge keeps
    them."""
    import exp_train_remat
    os.environ.setdefault("REMAT_VARIANTS", "half")
    exp_train_remat.main([4])
    return "wrote BENCH_TRAIN_REMAT.json"


@_stage("profile")
def stage_profile():
    """Op-level xplane profile of the 24-L bf16 forward -> committed
    JSON (the per-op accounting VERDICT r5 item 5's ceiling analysis
    needs)."""
    import profile_fwd
    run = profile_fwd.build(False)
    run()
    run()
    import jax
    outdir = "/tmp/dwmprof"
    jax.profiler.start_trace(outdir)
    for _ in range(3):
        run()
    jax.profiler.stop_trace()
    path = os.path.join(ROOT, "perf", "PROFILE_FWD.json")
    profile_fwd.summarize(outdir, json_path=path)
    profile_fwd.roofline(
        outdir, os.path.join(ROOT, "perf", "CEILING.json"), iters=3)
    return "wrote PROFILE_FWD.json + CEILING.json"


@_stage("lidar_batch")
def stage_lidar_batch():
    """LiDAR MaskGIT gen at the throughput-optimal serving batch
    (BENCH_LIDAR_BATCH, default 4): at b=1 the 512-dim matmuls leave the
    MXU underfed (MFU 0.28) — frames/s/chip at a server batch is the
    honest serving throughput."""
    import bench
    b = os.environ.get("BENCH_LIDAR_BATCH", "4")
    os.environ["BENCH_LIDAR_BATCH"] = b
    r = bench.run_lidar_bench()
    r["command"] = f"BENCH_LIDAR_BATCH={b} python bench.py --lidar"
    r["date"] = time.strftime("%Y-%m-%d")
    path = os.path.join(ROOT, "perf", "BENCH_LIDAR.json")
    with open(path) as f:
        data = json.load(f)
    data["runs"].append(r)
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    return f"lidar b={b}: {r['value']} frames/s"


@_stage("diag")
def stage_diag():
    """Depth diagnostic (grad vs apply split + per-depth profile) for the
    non-monotonic d2/d3 train pathology — see diag_depth.py docstring."""
    import diag_depth
    diag_depth.main()
    return "wrote DIAG_DEPTH.json"


@_stage("attn")
def stage_attn():
    """Joint-attention kernel shootout at the real 602/448 shapes
    (PROFILE_ANALYSIS: pallas bucket = 25% of fwd time at <10% MXU
    efficiency — the largest single fwd lever identified in r5)."""
    import exp_attn602
    exp_attn602.main()
    return "wrote BENCH_ATTN602.json"


@_stage("crossview")
def stage_crossview():
    """Crossview-branch attention formulation ablation (NEXT.md item 6)."""
    import exp_crossview
    return json.dumps(exp_crossview.main())


ALL = [stage_sweep, stage_lidar, stage_streaming, stage_e2e, stage_fidelity,
       stage_dvgo, stage_lidar_breakdown, stage_remat, stage_crossview,
       stage_profile, stage_lidar_batch, stage_attn, stage_diag]


def _scrub():
    """Free everything between stages: compiled executables AND any device
    buffers a failed stage leaked (a raised exception can leave params/
    grads referenced from traceback frames — sys.last_traceback kept the
    whole depth-8 state alive and starved every later stage in the first
    r5 session)."""
    import jax
    sys.last_traceback = sys.last_value = sys.last_exc = None
    jax.clear_caches()
    gc.collect()
    for a in jax.live_arrays():
        try:
            a.delete()
        except Exception:
            pass
    gc.collect()


def main(names):
    # CLI order is execution order (OOM-risky stages belong LAST: a failed
    # program poisons the tunnel backend for the rest of the process)
    by_name = {s._stage_name: s for s in ALL}
    stages = [by_name[n] for n in names] if names else list(ALL)
    print(f"chip session: {[s._stage_name for s in stages]}", flush=True)
    for s in stages:
        t0 = time.time()
        print(f"\n===== stage: {s._stage_name} =====", flush=True)
        for attempt in (1, 2):
            try:
                detail = s()
                _record(s._stage_name, "ok", time.time() - t0, detail)
                break
            except Exception as e:
                traceback.print_exc()
                err = f"{type(e).__name__}: {e}"[:300]
                # transient tunnel faults worth one in-process retry:
                # remote-compile HTTP 500s. (RESOURCE_EXHAUSTED is NOT
                # retryable in-process — the backend stays poisoned.)
                if attempt == 1 and (
                        "remote_compile" in err or "INTERNAL" in err):
                    print("retrying after scrub...", flush=True)
                    _scrub()
                    continue
                _record(s._stage_name, "failed", time.time() - t0, err)
                if "RESOURCE_EXHAUSTED" in err:
                    print("chip poisoned (RESOURCE_EXHAUSTED) — aborting "
                          "session; restart a fresh process for the "
                          "remaining stages", flush=True)
                    return
                break
        _scrub()
    print(f"\nsession log -> {LOG_PATH}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
