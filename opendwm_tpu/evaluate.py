"""Evaluation CLI (reference src/dwm/evaluate.py:24-94).

Builds the pipeline + validation dataset from a JSON config, truncates the
dataset to a multiple of the data-parallel batch (reference :64-71), and
runs ``evaluate_pipeline`` once.

    python -m opendwm_tpu.evaluate -c config.json -o output/ \
        [--checkpoint STEP]
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from opendwm_tpu import checkpoint as ckpt_lib
from opendwm_tpu.config import create_instance_from_config, global_state
from opendwm_tpu.train import JsonlLogger, to_device_batch


def create_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config-path", required=True)
    parser.add_argument("-o", "--output-path", required=True)
    parser.add_argument("--checkpoint", type=int, default=None)
    parser.add_argument("--max-batches", type=int, default=None)
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
    dataset = create_instance_from_config(config["validation_dataset"])
    collate = create_instance_from_config(
        config.get("validation_collate_fn", {})
    ) or (lambda items: items[0])
    metrics = {
        name: create_instance_from_config(cfg)
        for name, cfg in config.get("metrics", {}).items()
    }

    bs = config.get("batch_size", 1)
    n = (len(dataset) // bs) * bs  # even sharding truncation
    batches = []
    limit = args.max_batches or (n // bs)
    for i in range(0, min(n, limit * bs), bs):
        host = collate([dataset[j] for j in range(i, i + bs)])
        batches.append(to_device_batch(host, pipeline.mesh))

    rng = jax.random.PRNGKey(config.get("generator_seed", 0))
    state = pipeline.init_state(rng, batches[0])
    if args.checkpoint is not None:
        state = ckpt_lib.load_checkpoint(
            args.output_path, args.checkpoint, state
        )

    logger = JsonlLogger(args.output_path)
    results = pipeline.evaluate_pipeline(
        state, args.checkpoint or 0, batches=batches, logger=logger,
        metrics=metrics,
    )
    print(json.dumps({k: float(v) for k, v in results.items()}))


if __name__ == "__main__":
    main()
