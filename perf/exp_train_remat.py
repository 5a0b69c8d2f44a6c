"""Train-step remat ablation: is full remat the wrong trade at bench depths?

VERDICT r5 item 1 wants train MFU 0.33 → ≥0.45. Hypothesis: the bench
trains with FULL block remat (bench.py build_denoiser_setup,
gradient_checkpointing=train), which (a) recomputes exactly the
memory-bound LN/modulate chains the fwd-perf work showed run far above
the HBM floor, and (b) forces the inter-sublayer fusion barriers OFF
(models/mmdit._b — barriers inside a remat'd block collapse the step
8.96 → 1.95 f/s), giving the in-train forward the pre-barrier
inefficiency. At depth 4 the resident state (619M × 12 B ≈ 7.4 GB)
leaves ~8 GB for activations — full activations may simply fit, making
remat pure overhead. (`remat_policy="dots"` measured neutral in round 2,
consistent with this: dots still recomputes the elementwise chains.)

Measures run_train_bench at each depth with remat on vs off, in ONE
process (fresh chip acquisitions flake; an OOM'd variant would poison
the process, so the no-remat variants — the only OOM-risky ones — run
after their same-depth remat baselines and deepest last).

Writes perf/BENCH_TRAIN_REMAT.json.

Usage: python perf/exp_train_remat.py [depths...]   (default 4 6)
"""

import gc
import json
import os
import sys
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PATH = os.path.join(ROOT, "perf", "BENCH_TRAIN_REMAT.json")


def main(depths):
    import jax

    import bench

    results = []
    # remat=1 first at every depth (safe), then remat=0 shallow→deep:
    # the first OOM poisons the process, so risky variants go last.
    runs = [(d, True) for d in depths] + [(d, False) for d in depths]
    for d, remat in runs:
        label = f"depth {d}, remat={'full' if remat else 'none'}"
        print(f"=== {label} ===", flush=True)
        os.environ["BENCH_TRAIN_REMAT"] = "1" if remat else "0"
        try:
            r = bench.run_train_bench(layers=d)
            r["layers"] = d
            r["remat"] = "full" if remat else "none"
            r["step_seconds"] = (
                round(6.0 / r["value"], 4) if r["value"] else None)
        except Exception as e:
            traceback.print_exc()
            r = {"layers": d, "remat": "full" if remat else "none",
                 "status": "failed",
                 "error": f"{type(e).__name__}: {e}"[:300]}
        results.append(r)
        print(json.dumps(r), flush=True)
        with open(PATH, "w") as f:
            json.dump({"ablation": results}, f, indent=1)
        if "RESOURCE_EXHAUSTED" in r.get("error", ""):
            print("chip poisoned — aborting remaining variants", flush=True)
            break
        jax.clear_caches()
        gc.collect()
        for a in jax.live_arrays():
            try:
                a.delete()
            except Exception:
                pass
        gc.collect()
    print(f"wrote {PATH}", flush=True)


if __name__ == "__main__":
    main([int(x) for x in sys.argv[1:]] or [4, 6])
