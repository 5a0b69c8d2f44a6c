"""PP bubble / SP overhead vs pure-fsdp at mid scale (VERDICT r3 item 6).

Runs the mid-size flagship slice (6 L x 512 d, the __graft_entry__ entry()
model) on an 8-device virtual CPU mesh in three parallelization shapes:

  fsdp8     — params sharded over all 8 devices, plain forward
  sp(tp=2)  — ring joint attention over a tp=2 axis x fsdp=4
  pp(2)x... — 2 pipeline stages x dp=2 x tp=2, 2 microbatches (GPipe)

and reports wall-clock per step plus the overhead ratio vs fsdp8. On ONE
host core all device parallelism serializes, so the ratio measures the
EXTRA WORK a sharding introduces (collective ops, bubble recompute,
transfer glue) rather than its real-hardware speedup — an upper bound on
the overhead a real ICI mesh would see, useful for catching gross
regressions (e.g. a PP schedule that recomputes a stage).

Writes perf/BENCH_SHARD_OVERHEAD.json.

Usage: JAX_PLATFORMS=cpu python perf/exp_shard_overhead.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    from __graft_entry__ import _example_inputs, _flagship_model
    from opendwm_tpu.parallel import MeshSpec, make_mesh
    from opendwm_tpu.parallel.dit_pipeline import (
        convert_dit_params_to_stages,
        pipelined_dit_forward,
    )
    from opendwm_tpu.parallel.sharding import param_shardings, replicated

    model = _flagship_model()  # mid slice: 6 L, 8 heads x 64
    # Per-device compute must stay well under XLA:CPU's hard 40 s collective
    # rendezvous deadline: on a 1-core host the 8 virtual devices execute
    # serially, so a ring ppermute only completes once ALL 8 have reached it
    # (~8x one device's step). h=w=16/b=4 deadlocked here; default small.
    scale = int(os.environ.get("SHARD_OVERHEAD_SCALE", 1))
    # b=4 is the floor: the pp stage splits batch over dp=2 then into 2
    # microbatches (b=2 leaves a zero-size microbatch).
    inputs = _example_inputs(
        jax.random.PRNGKey(0), b=4, t=2, v=2, h=8 * scale, w=8 * scale,
        ctx_dim=256, pooled_dim=128,
    )
    params = model.init(jax.random.PRNGKey(1), **inputs)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    names = tuple(sorted(inputs))
    results = {"model": f"mid flagship slice ({n_params/1e6:.0f}M params)",
               "shape": {k: list(v.shape) for k, v in inputs.items()}}

    # --- fsdp8 baseline ----------------------------------------------------
    mesh8 = make_mesh(MeshSpec(dp=1, fsdp=8), jax.devices()[:8])
    sh = param_shardings(params, mesh8, "fsdp")
    p8 = jax.tree.map(jax.device_put, params, sh)
    in8 = jax.tree.map(lambda x: jax.device_put(x, replicated(mesh8)), inputs)
    fwd8 = jax.jit(
        lambda p, kw: model.apply(p, **kw),
        in_shardings=(sh, jax.tree.map(lambda _: replicated(mesh8), inputs)),
        out_shardings=replicated(mesh8),
    )
    t_fsdp, want = timed(fwd8, p8, in8)
    results["fsdp8_s"] = round(t_fsdp, 4)

    # --- sp: ring attention over tp=2 --------------------------------------
    mesh_sp = make_mesh(MeshSpec(dp=1, fsdp=4, tp=2), jax.devices()[:8])
    from jax.sharding import PartitionSpec as P

    ring = model.clone(sequence_parallel_axis="tp")

    @partial(
        jax.shard_map, mesh=mesh_sp,
        in_specs=(jax.tree.map(lambda _: P(), params),) + (P(),) * len(names),
        out_specs=P(), check_vma=False,
    )
    def sp_fwd(p, *vals):
        return ring.apply(p, **dict(zip(names, vals)))

    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    results["out_scale"] = round(scale, 4)

    t_sp, got_sp = timed(
        jax.jit(sp_fwd), params, *(inputs[k] for k in names))
    err_sp = float(jnp.max(jnp.abs(
        got_sp.astype(jnp.float32) - want.astype(jnp.float32)))) / scale
    results["sp_tp2_s"] = round(t_sp, 4)
    results["sp_overhead_x"] = round(t_sp / t_fsdp, 3)
    results["sp_max_rel_err"] = round(err_sp, 6)

    # --- pp: 2 stages x dp=2 x tp=2, 2 microbatches -------------------------
    mesh_pp = make_mesh(MeshSpec(dp=2, fsdp=1, pp=2, tp=2), jax.devices()[:8])
    stacked = convert_dit_params_to_stages(model, params, n_stages=2)

    def pp_fwd():
        return pipelined_dit_forward(
            model, params, n_stages=2, stacked=stacked, mesh=mesh_pp,
            microbatches=2, batch_axis="dp", sp_axis="tp", **inputs,
        )

    t_pp, got_pp = timed(lambda: pp_fwd())
    err_pp = float(jnp.max(jnp.abs(
        got_pp.astype(jnp.float32) - want.astype(jnp.float32)))) / scale
    results["pp2_dp2_tp2_s"] = round(t_pp, 4)
    results["pp_overhead_x"] = round(t_pp / t_fsdp, 3)
    results["pp_max_rel_err"] = round(err_pp, 6)
    results["note"] = (
        "single-host virtual mesh: ratios measure extra work "
        "(collectives/bubble), not real-chip scaling"
    )

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_SHARD_OVERHEAD.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    print(f"wrote {path}")
    # the entry model runs bf16: sharded-vs-single divergence is bf16
    # reduction-order noise; 2% of output scale bounds it comfortably
    # (exact-parity claims live in the f32 tests/dryrun).
    assert err_sp < 2e-2 and err_pp < 2e-2, (err_sp, err_pp)
    assert np.isfinite(t_sp) and np.isfinite(t_pp)


if __name__ == "__main__":
    main()
