"""LiDAR DVGO ray-render throughput: gather-layout before/after.

The LiDAR tokenizer's depth/SDF losses ray-march a (F=16, Zc=10, 640, 640)
density grid (reference dvgo_utils.py:56-166 runs hand-written CUDA; our
XLA path is gather-bound — VERDICT r2 weak #8 / NEXT item 7). This harness
measures the renderer at the published lidar_vqvae_nwa geometry
(32768 rays x 768 steps, the train-time shape) in both query modes:

  corner8 — eight advanced-index gathers per sample point (round-2 layout)
  block   — ONE lax.gather of the 2x2x2xC corner block per point

for forward and forward+grad (the render is a training loss), and writes
perf/BENCH_LIDAR.json with rays/s for each.

Usage: python perf/exp_lidar.py [--rays N] [--steps S]
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=768)
    args = ap.parse_args()

    from opendwm_tpu.ops.dvgo import DVGORenderer

    platform = jax.devices()[0].platform
    full = platform == "tpu"
    n_rays = args.rays if full else 512
    n_steps = args.steps if full else 64
    f, zc, hw = (16, 10, 640) if full else (4, 4, 32)

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    grid = jax.random.normal(k1, (f, zc, hw, hw), jnp.float32) * 0.1
    # LiDAR-like returns: uniform directions, ranges 2-50 m
    dirs = jax.random.normal(k2, (n_rays, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rng_r = jax.random.uniform(k3, (n_rays, 1), minval=2.0, maxval=50.0)
    rays_d = dirs * rng_r
    rays_o = jnp.zeros((n_rays, 3))
    mlp_w1 = jax.random.normal(jax.random.PRNGKey(4), (f, 32)) * 0.1
    mlp_w2 = jax.random.normal(jax.random.PRNGKey(5), (32, 1)) * 0.1

    def mlp(feats):
        h = jax.nn.relu(feats @ mlp_w1)
        return (h @ mlp_w2)[..., 0] - 5.0

    results = {}
    for mode in ("corner8", "block"):
        renderer = DVGORenderer(
            xyz_min=(-50.0, -50.0, -3.0), xyz_max=(50.0, 50.0, 2.6),
            stepsize=0.05, max_steps=n_steps, query_mode=mode,
        )

        @jax.jit
        def fwd(grid):
            depth, sdf, _ = renderer(mlp, rays_o, rays_d, grid)
            return depth.sum() + sdf

        @jax.jit
        def bwd(grid):
            return jax.grad(lambda g: fwd(g))(grid)

        for name, fn, out_probe in (
            ("fwd", fwd, lambda o: float(o)),
            ("fwd+grad", bwd, lambda o: float(o.sum())),
        ):
            o = fn(grid)
            out_probe(o)  # readback: surface async errors
            iters = 10 if full else 2
            t0 = time.perf_counter()
            for _ in range(iters):
                o = fn(grid)
            out_probe(o)
            dt = (time.perf_counter() - t0) / iters
            rays_per_s = n_rays / dt
            results[f"{mode}_{name}"] = {
                "seconds": round(dt, 4),
                "rays_per_s": round(rays_per_s),
            }
            print(mode, name, f"{dt*1e3:.1f} ms", f"{rays_per_s:,.0f} rays/s",
                  flush=True)

    out = {
        "workload": (
            f"DVGO depth/SDF render, ({f},{zc},{hw},{hw}) density grid, "
            f"{n_rays} rays x {n_steps} steps ({platform})"
        ),
        "results": results,
    }
    if "corner8_fwd+grad" in results and "block_fwd+grad" in results:
        out["speedup_fwd"] = round(
            results["corner8_fwd"]["seconds"]
            / results["block_fwd"]["seconds"], 3)
        out["speedup_fwd_grad"] = round(
            results["corner8_fwd+grad"]["seconds"]
            / results["block_fwd+grad"]["seconds"], 3)
    path = os.path.join(ROOT, "perf", "BENCH_LIDAR_RENDER.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
