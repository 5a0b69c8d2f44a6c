"""Find the "blank" (free-space) VQ codes for MaskGIT suppression.

Reference src/dwm/utils/make_blank_code.py:31-92 — runs the frozen VQVAE
over a validation set, counts code usage, and takes the top-K most frequent
codes as the blank list (free space dominates LiDAR BEV grids). The list
feeds MaskGITPipeline(blank_code=...).

    python -m opendwm_tpu.tools.make_blank_code -c config.json -o blank.json
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from opendwm_tpu.config import create_instance_from_config


def find_blank_codes(
    vq_model, vq_params, batches, top_k: int = 10
) -> list[int]:
    counts = None
    for batch in batches:
        _, _, _, idx = vq_model.apply(
            vq_params, batch["lidar_points"], batch["lidar_points_mask"],
            method=vq_model.encode,
        )
        flat = np.asarray(idx).reshape(-1)
        c = np.bincount(flat, minlength=vq_model.vector_quantizer.n_e)
        counts = c if counts is None else counts + c
    return [int(i) for i in np.argsort(-counts)[:top_k]]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config-path", required=True)
    parser.add_argument("-o", "--output-path", required=True)
    parser.add_argument("--top-k", type=int, default=10)
    parser.add_argument("--max-batches", type=int, default=16)
    args = parser.parse_args(argv)
    with open(args.config_path) as f:
        config = json.load(f)
    if "jax_platform" in config:
        jax.config.update("jax_platforms", config["jax_platform"])

    vq_model = create_instance_from_config(config["vq_point_cloud"])
    dataset = create_instance_from_config(config["validation_dataset"])
    collate = create_instance_from_config(
        config.get("validation_collate_fn", {})
    )
    bs = config.get("batch_size", 1)

    rng = jax.random.PRNGKey(0)
    first = collate([dataset[i] for i in range(bs)])
    vq_params = vq_model.init(
        rng, first["lidar_points"], first["lidar_points_mask"],
        render_rays=False,
    )
    if config.get("vq_checkpoint_path"):
        from opendwm_tpu import checkpoint as ckpt_lib

        vq_params = ckpt_lib.load_model_only(
            config["vq_checkpoint_path"], vq_params
        )

    batches = [
        collate([dataset[i * bs + j] for j in range(bs)])
        for i in range(min(args.max_batches, len(dataset) // bs))
    ]
    blank = find_blank_codes(vq_model, vq_params, batches, args.top_k)
    with open(args.output_path, "w") as f:
        json.dump({"blank_code": blank}, f)
    print(f"wrote {args.output_path}: {blank}")


if __name__ == "__main__":
    main()
