"""Measure the host-chained window rollout with device-fused glue.

The whole-rollout scan fusion (one program) dies on this tunnel: the axon
TPU worker crashes on any single program executing longer than ~60 s
(probed: 2w x 5s = 11 s OK, 8w x 5s = 49 s OK, 2w x 30s = 66 s CRASH,
8w x 30s = 264 s CRASH). So the e2e bench must chain per-window programs
(~33 s each) from the host. Round 2 measured 68 s of inter-window overhead
with slicing/concat glue dispatched op-by-op from the host; this experiment
times the fused alternative: ONE jitted program per window that denoises AND
produces (output slice, next reference latent), with keys pre-split, so the
host does exactly one dispatch per window.

Usage: python perf/exp_window_chain.py [--int8]
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main(int8: bool):
    from bench import build_denoiser_setup

    model, params, inputs, cfg, geom = build_denoiser_setup(int8=int8)
    t, v, h, w, ctx_len = geom
    n_steps = int(os.environ.get("BENCH_E2E_STEPS", 30))
    guidance = 3.0
    total_frames = int(os.environ.get("BENCH_E2E_FRAMES", 40))
    ref_frames = 1
    stride = t - ref_frames
    n_windows = max(1, -(-(total_frames - t) // stride) + 1)
    sigmas = jnp.linspace(1.0, 0.0, n_steps + 1)
    cond_ctx = inputs["encoder_hidden_states"]
    uncond_ctx = jnp.zeros_like(cond_ctx)
    fixed = {
        k: val for k, val in inputs.items()
        if k not in ("sample", "timestep", "encoder_hidden_states")
    }
    frame_idx = jnp.arange(t)[None, :, None]
    lat_shape = (1, t, v, h, w, 16)

    @partial(jax.jit, static_argnames=("use_ref",), donate_argnums=(2,))
    def step_window(p, key, ref_lat, use_ref: bool):
        """Denoise one window and emit (kept frames, next window's ref)."""
        lat0 = jax.random.normal(key, lat_shape, jnp.bfloat16)

        def body(lat, i):
            sig, sig_next = sigmas[i], sigmas[i + 1]
            ts = jnp.full((1, t, v), sig * 1000.0)
            if use_ref:
                is_ref = frame_idx < ref_frames
                lat_in = jnp.where(
                    is_ref[..., None, None, None], ref_lat, lat
                )
                ts = jnp.where(is_ref, 0.0, ts)
            else:
                lat_in = lat

            def run(ctx):
                return model.apply(
                    p, sample=lat_in, timestep=ts,
                    encoder_hidden_states=ctx, **fixed,
                )

            uncond = run(uncond_ctx)
            cond = run(cond_ctx)
            vfield = uncond + guidance * (cond - uncond)
            lat = (
                lat.astype(jnp.float32)
                + (sig_next - sig) * vfield.astype(jnp.float32)
            ).astype(lat.dtype)
            return lat, ()

        lat, _ = jax.lax.scan(body, lat0, jnp.arange(n_steps))
        if use_ref:
            is_ref = frame_idx[..., None, None, None] < ref_frames
            lat = jnp.where(is_ref, ref_lat, lat)
        next_ref = jnp.concatenate(
            [lat[:, -ref_frames:], jnp.zeros(
                (1, t - ref_frames) + lat_shape[2:], lat.dtype
            )], 1,
        )
        out = lat if not use_ref else lat[:, ref_frames:]
        # pad window-0 output to a fixed shape? No: two variants, two
        # executables — same as the reference rollout.
        return out, next_ref

    keys = list(jax.random.split(jax.random.PRNGKey(1), n_windows + 1))
    ref = jnp.zeros(lat_shape, jnp.bfloat16)
    # warm both variants
    o0, ref_w = step_window(params, keys[-1], ref, False)
    o1, ref_w2 = step_window(params, keys[-1], ref_w, True)
    float(o1.astype(jnp.float32).mean())

    per_window = []
    ref = jnp.zeros(lat_shape, jnp.bfloat16)
    start_all = time.perf_counter()
    outputs = []
    for wi in range(n_windows):
        s = time.perf_counter()
        out, ref = step_window(params, keys[wi], ref, wi > 0)
        outputs.append(out)
        per_window.append(time.perf_counter() - s)  # dispatch only (async)
    cat = jnp.concatenate(outputs, 1)[:, :total_frames]
    float(cat.astype(jnp.float32).mean())
    total = time.perf_counter() - start_all
    print(f"dispatch times: {[f'{x:.2f}' for x in per_window]}")
    print(
        f"rollout {n_windows} windows x {n_steps} steps: {total:.2f} s "
        f"({total / n_windows:.2f} s/window incl. glue+readback) "
        f"-> {total_frames / total:.4f} latent f/s"
    )


if __name__ == "__main__":
    main(int8="--int8" in sys.argv)
