"""Diagnose the reproducible shallow-depth train-step slowdown.

BENCH_TRAIN_SWEEP (r5, two independent sessions): per-step time is
NON-MONOTONIC in depth — d2 1.34 s, d3 2.89 s, d4 0.70 s — with d2/d3
reproducing within 7% across sessions, so this is a real program
pathology, not tunnel noise. This harness, in ONE process:

  1. per depth in DEPTHS (default 4,3,2 — fast depth first as the
     control): times the grad program and the optimizer-apply program
     SEPARATELY (the sweep only ever timed their sum), 5 iters each;
  2. captures an xplane profile of one grad step at the slowest and the
     fastest depth and buckets device time (busy vs idle, matmul vs
     copy vs elementwise) via profile_fwd.summarize's parser.

Writes perf/DIAG_DEPTH.json.

Candidate causes this discriminates:
  - dispatch/tunnel stall (idle% dominates at shallow depth);
  - an XLA layout/fusion pathology in the grad program (busy, but the
    bucket mix shifts);
  - the optimizer apply (flat AdamW) misbehaving at some flat sizes;
  - the depth-dependent block mix (dual/crossview/temporal layer sets
    change with depth — bench.py build_denoiser_setup) producing a
    pathological backward for some mixes.
"""

import gc
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(ROOT, "perf", "DIAG_DEPTH.json")
PROF_BASE = "/tmp/dwm_diag_depth"


def build_step(layers):
    """Same construction as bench.run_train_bench (bench.py:496-575)."""
    from functools import partial

    import optax

    import bench
    from opendwm_tpu.parallel.flat_optim import flat_adamw

    model, params, inputs, cfg, geom = bench.build_denoiser_setup(
        train=True, layers=layers)
    tx = flat_adamw(1e-4, weight_decay=0.01, mu_dtype=jnp.bfloat16)
    opt_state = tx.init(params)
    target = inputs["sample"]

    def loss_fn(p, kw, tgt):
        pred = model.apply(p, **kw)
        return jnp.mean(
            (pred.astype(jnp.float32) - tgt.astype(jnp.float32)) ** 2)

    gradf = jax.jit(jax.value_and_grad(loss_fn))

    # NO grad donation here (the sweep donates): the apply-alone timing
    # loop below reuses one grads tree across iters, and a donated input
    # is deleted after the first call -> INVALID_ARGUMENT on the second
    # (this exact crash killed the first diag run on-chip).
    @jax.jit
    def apply(p, o, grads):
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    return gradf, apply, params, opt_state, inputs, target


def time_depth(layers, iters=5):
    gradf, apply, params, opt_state, inputs, target = build_step(layers)
    # warm both programs
    loss, grads = gradf(params, inputs, target)
    params, opt_state = apply(params, opt_state, grads)
    float(loss)
    jax.block_until_ready(params)

    # grad program alone
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = gradf(params, inputs, target)
    jax.block_until_ready(grads)
    grad_s = (time.perf_counter() - t0) / iters

    # apply program alone (grads constant across iters — fine for timing)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state = apply(params, opt_state, grads)
    jax.block_until_ready(params)
    apply_s = (time.perf_counter() - t0) / iters

    # interleaved (the sweep's measurement) for cross-checking
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = gradf(params, inputs, target)
        params, opt_state = apply(params, opt_state, grads)
    float(loss)
    jax.block_until_ready(params)
    both_s = (time.perf_counter() - t0) / iters

    rec = {
        "layers": layers,
        "grad_s": round(grad_s, 4),
        "apply_s": round(apply_s, 4),
        "interleaved_s": round(both_s, 4),
    }
    print(json.dumps(rec), flush=True)
    return rec, (gradf, params, inputs, target)


def profile_grad(layers, closure, tag):
    """One profiled grad step -> bucket summary dict."""
    import profile_fwd
    gradf, params, inputs, target = closure
    outdir = f"{PROF_BASE}_{tag}"
    jax.profiler.start_trace(outdir)
    for _ in range(2):
        loss, grads = gradf(params, inputs, target)
    jax.block_until_ready(grads)
    jax.profiler.stop_trace()
    path = os.path.join(ROOT, "perf", f"_diag_depth_{tag}.json")
    profile_fwd.summarize(outdir, top=15, json_path=path)
    with open(path) as f:
        d = json.load(f)
    os.remove(path)
    d["note"] = "2 grad iters traced; ms figures are totals over both"
    return d


def _scrub():
    """Free the finished depth's state before building the next one:
    holding two depths' (params + grads + moments) simultaneously is
    ~12.6 GB at depths 4+3 — an OOM risk that would poison the tunnel
    backend for the rest of the process (run_chip_session.py:_scrub)."""
    sys.last_traceback = sys.last_value = None
    if hasattr(sys, "last_exc"):
        sys.last_exc = None
    jax.clear_caches()
    gc.collect()
    for a in jax.live_arrays():
        try:
            a.delete()
        except Exception:
            pass
    gc.collect()


def main():
    depths = [int(x) for x in os.environ.get(
        "DIAG_DEPTHS", "4,3,2").split(",")]
    report = {"timings": [], "profiles": {}}
    for d in depths:
        rec, closure = time_depth(d)
        report["timings"].append(rec)
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
        # profile while this depth's closure is the only resident state
        report["profiles"][str(d)] = profile_grad(d, closure, f"d{d}")
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
        del closure
        _scrub()
    print("wrote", OUT)


if __name__ == "__main__":
    main()
