"""Checkpoint-only generation example (reference
examples/ctsd_generation_example.py:24-103): the config embeds a literal
batch (pre-encoded conditions), so no dataset is required — build the
pipeline, denoise, and write the preview.

    python examples/ctsd_generation_example.py \
        -c examples/ctsd_generation_example.json -o out/
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu.config import create_instance_from_config
from opendwm_tpu.utils.preview import (
    make_ctsd_preview_tensor,
    save_tensor_to_video,
)


def literal_batch(spec: dict, rng) -> dict:
    """Materialize the literal batch: explicit arrays pass through, entries
    of the form {"_shape": [...], "_fill"|"_randn": ...} are synthesized."""
    batch = {}
    for key, value in spec.items():
        if isinstance(value, dict) and "_shape" in value:
            shape = tuple(value["_shape"])
            if "_randn" in value:
                batch[key] = (
                    jax.random.normal(rng, shape) * value["_randn"]
                )
            else:
                batch[key] = jnp.full(shape, value.get("_fill", 0.0))
        else:
            batch[key] = jnp.asarray(value)
    return batch


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config-path", required=True)
    parser.add_argument("-o", "--output-path", required=True)
    args = parser.parse_args()
    with open(args.config_path) as f:
        config = json.load(f)

    if "jax_platform" in config:
        jax.config.update("jax_platforms", config["jax_platform"])
    if "num_virtual_cpu_devices" in config:
        jax.config.update(
            "jax_num_cpu_devices", config["num_virtual_cpu_devices"]
        )

    rng = jax.random.PRNGKey(config.get("generator_seed", 0))
    pipeline = create_instance_from_config(config["pipeline"])
    batch = literal_batch(config["batch"], jax.random.fold_in(rng, 1))

    state = pipeline.init_state(jax.random.fold_in(rng, 2), batch)
    if config.get("checkpoint_path"):
        from opendwm_tpu import checkpoint as ckpt_lib

        state = state.replace(
            params=ckpt_lib.load_model_only(
                config["checkpoint_path"], state.params
            )
        )

    latents = pipeline.inference_pipeline(
        state.params, batch, batch["latents"].shape,
        jax.random.fold_in(rng, 3),
    )
    frames = np.asarray(pipeline.decode_latents(latents))

    def to01(x):
        lo, hi = x.min(), x.max()
        return (x - lo) / max(hi - lo, 1e-6)

    grid = make_ctsd_preview_tensor([to01(frames[0])[..., :3]])
    os.makedirs(args.output_path, exist_ok=True)
    path = save_tensor_to_video(
        os.path.join(args.output_path, "generation.mp4"), 2.0, grid
    )
    print(f"wrote {path}; latents shape {latents.shape}")


if __name__ == "__main__":
    main()
