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
  REMAT_VARIANTS=1,half,0 selects the variants to run (comma list;
  default all three — set e.g. REMAT_VARIANTS=half to skip the
  known-OOM no-remat case on a shared chip session).
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
    # Safe variants first at every depth, OOM-risky ones shallow→deep
    # last: the first OOM poisons the process. "half" remats only the
    # odd-indexed joint blocks (bench.py remat_block_layers) — the even
    # blocks keep full activations AND their fusion barriers.
    variants = [
        v for v in os.environ.get("REMAT_VARIANTS", "1,half,0").split(",")
        if v
    ]
    runs = [(d, v) for v in variants for d in depths]
    names = {"1": "full", "half": "half", "quarter": "quarter",
             "0": "none"}
    # Restore the caller's remat setting on exit: leaking the last
    # variant into os.environ would silently contaminate any later
    # stage in a shared chip-session process (bench.py reads
    # BENCH_TRAIN_REMAT at model-construction time).
    prior_env = os.environ.get("BENCH_TRAIN_REMAT")
    for d, remat in runs:
        label = f"depth {d}, remat={names[remat]}"
        print(f"=== {label} ===", flush=True)
        os.environ["BENCH_TRAIN_REMAT"] = remat
        try:
            r = bench.run_train_bench(layers=d)
            r["layers"] = d
            r["remat"] = names[remat]
            r["step_seconds"] = (
                round(6.0 / r["value"], 4) if r["value"] else None)
        except Exception as e:
            traceback.print_exc()
            r = {"layers": d, "remat": names[remat],
                 "status": "failed",
                 "error": f"{type(e).__name__}: {e}"[:300]}
        results.append(r)
        print(json.dumps(r), flush=True)
        # merge over the prior artifact keyed by (layers, remat) so a
        # partial re-run doesn't erase earlier variants; a failed re-run
        # keeps the prior success (same policy as exp_train_depth._merge)
        prior = []
        if os.path.exists(PATH):
            with open(PATH) as f:
                prior = json.load(f).get("ablation", [])
        by_key = {(p.get("layers"), p.get("remat")): p for p in prior}
        for cur in results:
            k = (cur.get("layers"), cur.get("remat"))
            old = by_key.get(k)
            if (cur.get("status") == "failed" and old is not None
                    and old.get("value") is not None):
                old = dict(old)
                old["last_rerun_failed"] = cur.get("error", "unknown")
                by_key[k] = old
            else:
                by_key[k] = cur
        merged = sorted(
            by_key.values(),
            key=lambda p: (p.get("layers") or 0, str(p.get("remat"))))
        with open(PATH, "w") as f:
            json.dump({"ablation": merged}, f, indent=1)
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
    if prior_env is None:
        os.environ.pop("BENCH_TRAIN_REMAT", None)
    else:
        os.environ["BENCH_TRAIN_REMAT"] = prior_env
    print(f"wrote {PATH}", flush=True)


if __name__ == "__main__":
    main([int(x) for x in sys.argv[1:]] or [4, 6])
