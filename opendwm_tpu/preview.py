"""Preview CLI (reference src/dwm/preview.py:85-173).

Offline generation over a preview dataset with optional prompt rewriting
(add / replace / template, reference :8-63), writing composited media per
batch.

    python -m opendwm_tpu.preview -c config.json -o output/
"""

from __future__ import annotations

import argparse
import json

import jax

from opendwm_tpu import checkpoint as ckpt_lib
from opendwm_tpu.config import create_instance_from_config, global_state
from opendwm_tpu.train import to_device_batch


def rewrite_prompts(batch: dict, settings: dict) -> dict:
    """Prompt rewriting modes (reference preview.py:8-63):
    - "add": append text to each description
    - "replace": replace all descriptions
    - "template": format a template with the original description
    """
    if not settings or "image_description" not in batch:
        return batch
    mode = settings.get("mode")
    text = settings.get("text", "")

    def rewrite(s: str) -> str:
        if mode == "add":
            return f"{s} {text}"
        if mode == "replace":
            return text
        if mode == "template":
            return text.format(s)
        return s

    out = dict(batch)
    out["image_description"] = [
        [[rewrite(s) for s in view] if isinstance(view, list)
         else rewrite(view) for view in frame]
        if isinstance(frame, list) else rewrite(frame)
        for frame in batch["image_description"]
    ]
    return out


def create_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config-path", required=True)
    parser.add_argument("-o", "--output-path", required=True)
    parser.add_argument("--checkpoint", type=int, default=None)
    parser.add_argument("--max-batches", type=int, default=1)
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
    dataset = create_instance_from_config(config["preview_dataset"])
    collate = create_instance_from_config(
        config.get("preview_collate_fn", {})
    ) or (lambda items: items[0])
    prompt_settings = config.get("prompt_rewriting")

    bs = config.get("batch_size", 1)
    rng = jax.random.PRNGKey(config.get("generator_seed", 0))
    state = None
    for i in range(args.max_batches):
        items = [dataset[i * bs + j] for j in range(bs)]
        host = collate(items)
        if prompt_settings:
            host = rewrite_prompts(host, prompt_settings)
        batch = to_device_batch(host, pipeline.mesh)
        if state is None:
            state = pipeline.init_state(rng, batch)
            if args.checkpoint is not None:
                state = ckpt_lib.load_checkpoint(
                    args.output_path, args.checkpoint, state
                )
        path = pipeline.preview_pipeline(
            state, batch, args.output_path, i
        )
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
