"""Flagship-scale int8 fidelity: bf16 vs int8 denoiser outputs on-chip.

VERDICT r2 weak #6: int8 accuracy was validated only on tiny random-init
models, while int8 is the headline serving number. This harness compares,
at the full 3776M bench configuration on the real chip:
  (a) one denoiser forward: cosine similarity + max relative error between
      the bf16 model and the int8 (W8A8) model quantized FROM THE SAME
      bf16 weights;
  (b) a fixed-seed short AR rollout (2 windows) of e2e video latents:
      cosine between bf16 and int8 trajectories (error accumulates through
      the 30-step CFG sampler — the serving-relevant metric).

Writes perf/INT8_FIDELITY.json; PARITY.md cites it.

Usage: python perf/exp_int8_fidelity.py
"""

import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(
        np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
    )


def main():
    from bench import build_denoiser_setup
    from opendwm_tpu.ops.quant import quantize_param_tree

    # bf16 model + params; int8 params derived from the SAME weights so the
    # comparison isolates quantization (bench's int8 filler would otherwise
    # use unrelated random int8 values).
    model, params, inputs, cfg, geom = build_denoiser_setup(int8=False)
    t, v, h, w, ctx_len = geom
    qmodel = model.clone(quantization="int8")
    quant_shapes = jax.eval_shape(
        lambda kw: qmodel.init(jax.random.PRNGKey(0), **kw), inputs
    )
    qparams = quantize_param_tree(params, quant_shapes)

    fwd = jax.jit(lambda p, kw: model.apply(p, **kw))
    qfwd = jax.jit(lambda p, kw: qmodel.apply(p, **kw))

    out_bf16 = np.asarray(fwd(params, inputs).astype(jnp.float32))
    out_int8 = np.asarray(qfwd(qparams, inputs).astype(jnp.float32))
    denom = np.maximum(np.abs(out_bf16), 1e-3)
    rel = np.abs(out_bf16 - out_int8) / denom
    # Localize the max rel err (VERDICT r3 weak #5): is it a
    # small-denominator artifact (|bf16| near the 1e-3 clamp) or a real
    # tail error on a large output? Report the bf16 magnitude at the
    # argmax, the absolute error there, and the max rel err restricted to
    # outputs of meaningful magnitude.
    k = int(np.argmax(rel))
    big = np.abs(out_bf16) > 0.1 * float(out_bf16.std())
    fwd_report = {
        "cosine": round(cosine(out_bf16, out_int8), 6),
        "max_rel_err": round(float(rel.max()), 4),
        "mean_rel_err": round(float(rel.mean()), 5),
        "max_rel_err_at": {
            "bf16_value": round(float(out_bf16.ravel()[k]), 6),
            "abs_err": round(
                float(np.abs(out_bf16 - out_int8).ravel()[k]), 6),
        },
        "max_rel_err_where_big": round(float(rel[big].max()), 4),
        "max_abs_err": round(float(np.abs(out_bf16 - out_int8).max()), 5),
        "out_std_bf16": round(float(out_bf16.std()), 4),
        "out_std_int8": round(float(out_int8.std()), 4),
    }
    print("forward:", json.dumps(fwd_report), flush=True)

    # Short fixed-seed rollout (2 windows x 30 steps, same sampler as the
    # e2e bench) — per-window programs stay under the tunnel's ~60 s
    # execution ceiling.
    n_steps = int(os.environ.get("BENCH_E2E_STEPS", 30))
    guidance, ref_frames = 3.0, 1
    # Serving depth: the e2e bench's 40-frame rollout is 8 windows
    # (VERDICT r3 item 4 — error accumulation over all 8x30 CFG denoiser
    # calls is the serving-relevant question).
    n_windows = int(os.environ.get("FIDELITY_WINDOWS", 8))
    sigmas = jnp.linspace(1.0, 0.0, n_steps + 1)
    cond_ctx = inputs["encoder_hidden_states"]
    uncond_ctx = jnp.zeros_like(cond_ctx)
    fixed = {
        k: val for k, val in inputs.items()
        if k not in ("sample", "timestep", "encoder_hidden_states")
    }
    frame_idx = jnp.arange(t)[None, :, None]
    lat_shape = (1, t, v, h, w, 16)

    def make_window(themodel):
        @partial(jax.jit, static_argnames=("use_ref",))
        def step_window(p, key, ref_lat, use_ref: bool):
            lat0 = jax.random.normal(key, lat_shape, jnp.bfloat16)

            def body(lat, i):
                sig, sig_next = sigmas[i], sigmas[i + 1]
                ts = jnp.full((1, t, v), sig * 1000.0)
                if use_ref:
                    is_ref = frame_idx < ref_frames
                    lat_in = jnp.where(
                        is_ref[..., None, None, None], ref_lat, lat)
                    ts = jnp.where(is_ref, 0.0, ts)
                else:
                    lat_in = lat

                def run(ctx):
                    return themodel.apply(
                        p, sample=lat_in, timestep=ts,
                        encoder_hidden_states=ctx, **fixed)

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
                    (1, t - ref_frames) + lat_shape[2:], lat.dtype)], 1)
            return lat, next_ref

        return step_window

    def rollout(themodel, p):
        """Returns (full latent trajectory, per-window output list)."""
        step = make_window(themodel)
        keys = jax.random.split(jax.random.PRNGKey(7), n_windows)
        ref = jnp.zeros(lat_shape, jnp.bfloat16)
        outs = []
        for wi in range(n_windows):
            lat, ref = step(p, keys[wi], ref, wi > 0)
            outs.append(np.asarray(
                (lat if wi == 0 else lat[:, ref_frames:])
                .astype(jnp.float32)
            ))
            print(f"  window {wi + 1}/{n_windows} done", flush=True)
        return np.concatenate(outs, 1), outs

    t0 = time.time()
    lat_bf16, wins_bf16 = rollout(model, params)
    lat_int8, wins_int8 = rollout(qmodel, qparams)
    roll_report = {
        "windows": n_windows,
        "steps": n_steps,
        "cosine": round(cosine(lat_bf16, lat_int8), 6),
        "lat_std_bf16": round(float(lat_bf16.std()), 4),
        "lat_std_int8": round(float(lat_int8.std()), 4),
        # drift curve: cosine per AR window — shows whether quantization
        # error compounds through the reference-latent chain
        "per_window_cosine": [
            round(cosine(a, b), 6)
            for a, b in zip(wins_bf16, wins_int8)
        ],
        "per_frame_cosine_min": round(min(
            cosine(lat_bf16[:, i], lat_int8[:, i])
            for i in range(lat_bf16.shape[1])
        ), 6),
        "seconds": round(time.time() - t0, 1),
    }
    print("rollout:", json.dumps(roll_report), flush=True)

    out = {"config": "3776M flagship bench geometry",
           "forward": fwd_report, "rollout": roll_report}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "INT8_FIDELITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
