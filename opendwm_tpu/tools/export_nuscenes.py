"""Export generated frames in the nuScenes directory layout.

Reference src/dwm/export_generation_result_as_nuscenes_data.py:9-148 —
generated multi-view videos are written back as
``samples/{CHANNEL}/{token}.jpg`` plus patched ``sample_data`` records so
downstream nuScenes consumers (detectors, simulators) read synthetic data
transparently.

    python -m opendwm_tpu.tools.export_nuscenes -c config.json -o export/
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from opendwm_tpu.config import create_instance_from_config
from opendwm_tpu.train import to_device_batch

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def export_batch(
    output_path: str,
    frames: np.ndarray,           # (t, v, H, W, 3) float in [0, 1]
    sensor_channels: list,
    timestamps: np.ndarray,       # (t, v) ms
    scene_name: str = "generated",
) -> list[dict]:
    """Write frames + return the sample_data records."""
    records = []
    for t in range(frames.shape[0]):
        for v, channel in enumerate(sensor_channels):
            token = f"{scene_name}_{t:04d}_{channel}"
            rel = f"samples/{channel}/{token}.jpg"
            path = os.path.join(output_path, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            Image.fromarray(
                (np.clip(frames[t, v], 0, 1) * 255).astype(np.uint8)
            ).save(path)
            records.append({
                "token": token,
                "sample_token": f"{scene_name}_{t:04d}",
                "filename": rel,
                "timestamp": int(timestamps[t, v] * 1000),
                "is_key_frame": True,
                "fileformat": "jpg",
                "width": int(frames.shape[3]),
                "height": int(frames.shape[2]),
            })
    return records


def main(args=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config-path", required=True)
    parser.add_argument("-o", "--output-path", required=True)
    parser.add_argument("--checkpoint", type=int, default=None)
    parser.add_argument("--max-batches", type=int, default=1)
    args = args or parser.parse_args()
    with open(args.config_path) as f:
        config = json.load(f)

    if "jax_platform" in config:
        jax.config.update("jax_platforms", config["jax_platform"])
    if "num_virtual_cpu_devices" in config:
        jax.config.update(
            "jax_num_cpu_devices", config["num_virtual_cpu_devices"]
        )

    pipeline = create_instance_from_config(config["pipeline"])
    dataset = create_instance_from_config(config["preview_dataset"])
    collate = create_instance_from_config(
        config.get("preview_collate_fn", {})
    )
    channels = config.get("sensor_channels", ["CAM_FRONT"])

    rng = jax.random.PRNGKey(config.get("generator_seed", 0))
    all_records = []
    state = None
    for i in range(args.max_batches):
        host = collate([dataset[i]])
        batch = to_device_batch(host, pipeline.mesh)
        if state is None:
            state = pipeline.init_state(rng, batch)
            if args.checkpoint is not None:
                from opendwm_tpu import checkpoint as ckpt_lib

                state = ckpt_lib.load_checkpoint(
                    args.output_path, args.checkpoint, state
                )
        batch = pipeline.ensure_latents(batch)
        gen = pipeline.inference_pipeline(
            state.params, batch, batch["latents"].shape,
            jax.random.fold_in(rng, i),
        )
        frames = np.asarray(pipeline.decode_latents(gen))[0]
        frames = np.clip((frames + 1) / 2, 0, 1)
        ts = np.asarray(host.get(
            "pts", np.zeros(frames.shape[:2], np.float32)
        ))
        ts = ts[0] if ts.ndim == 3 else ts
        all_records += export_batch(
            args.output_path, frames, channels, ts, f"gen{i:03d}"
        )

    with open(os.path.join(args.output_path, "sample_data.json"), "w") as f:
        json.dump(all_records, f, indent=1)
    print(f"exported {len(all_records)} sample_data records")


if __name__ == "__main__":
    main()
