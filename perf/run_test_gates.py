"""Measure the test gates in both cache states and write TESTS_r05.json.

VERDICT r4 weak #8 / r5 item 6: the fast-gate cold/warm claim has never
been recorded in an artifact. This runner:
  1. fast gate COLD  — moves the persistent compile cache aside first
  2. fast gate WARM  — repeat against the rebuilt cache
  3. slow gate WARM  — the 165-test slow set against the same cache
(the slow-gate COLD number lives in TESTS_r03.json's full-suite run:
2942 s on this 1-core host; re-measuring it costs ~50 min of wall clock
for no new information, so it is carried forward with attribution.)

Run on an otherwise-idle host — the suite is compile-dominated and the
single CPU core makes any concurrent load show up in the numbers.

Usage: python perf/run_test_gates.py
"""

import json
import os
import re
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = "/tmp/jax_cache_tests"


def run_gate(marker_args):
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q"] + marker_args
    t0 = time.time()
    p = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    dt = time.time() - t0
    tail = (p.stdout or "").strip().splitlines()[-1:]
    summary = tail[0] if tail else ""
    m = re.search(r"(\d+) passed", summary)
    passed = int(m.group(1)) if m else 0
    failed = 0
    mf = re.search(r"(\d+) failed", summary)
    if mf:
        failed = int(mf.group(1))
    return {
        "command": " ".join(["python -m pytest tests/ -q"] + marker_args),
        "passed": passed,
        "failed": failed,
        "wall_seconds": round(dt, 1),
        "summary": summary,
        "returncode": p.returncode,
    }


def main():
    out = {"date": time.strftime("%Y-%m-%d"),
           "host": "1-core CPU, virtual 8-device mesh (tests/conftest.py)"}

    stash = CACHE + ".stash"
    if os.path.isdir(CACHE):
        if os.path.isdir(stash):
            shutil.rmtree(stash)
        os.rename(CACHE, stash)
    print("fast gate, cold cache...", flush=True)
    out["fast_gate_cold"] = run_gate(["-m", "not slow"])
    print(json.dumps(out["fast_gate_cold"]), flush=True)

    print("fast gate, warm cache...", flush=True)
    out["fast_gate_warm"] = run_gate(["-m", "not slow"])
    out["fast_gate_warm"]["budget_seconds"] = 120
    print(json.dumps(out["fast_gate_warm"]), flush=True)

    print("slow gate, warm-ish cache (fast-gate programs cached; "
          "slow-only programs compile fresh)...", flush=True)
    out["slow_gate"] = run_gate(["-m", "slow"])
    print(json.dumps(out["slow_gate"]), flush=True)

    out["full_suite_cold_reference"] = {
        "wall_seconds": 2942, "passed": 337,
        "note": "carried from TESTS_r03.json (2026-08-18 cold run); "
                "not re-measured — ~50 min for no new information",
    }

    path = os.path.join(ROOT, "TESTS_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}", flush=True)
    if os.path.isdir(stash):
        shutil.rmtree(stash)


if __name__ == "__main__":
    main()
