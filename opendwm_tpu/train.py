"""Training CLI.

Mirrors the reference entry point (src/dwm/train.py:46-214): a JSON config
is reflected into a pipeline + datasets, then a step loop dispatches
``train_step`` / ``log`` / ``preview_pipeline`` / ``save_checkpoint`` /
``evaluate_pipeline`` at configured intervals.

    python -m opendwm_tpu.train -c config.json -o output/ \
        [--resume-from STEP]

TPU-native differences: no torchrun/process groups — `jax.distributed` +
the config's mesh spec cover multi-host; the train state is an explicit
functional object checkpointed via Orbax; RNG is a threaded key seeded from
``generator_seed``.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Any, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu import checkpoint as ckpt_lib
from opendwm_tpu.config import create_instance_from_config, global_state
from opendwm_tpu.parallel.sharding import shard_batch


def create_parser():
    parser = argparse.ArgumentParser(
        description="Train a world model pipeline from a JSON config."
    )
    parser.add_argument("-c", "--config-path", required=True)
    parser.add_argument("-o", "--output-path", required=True)
    parser.add_argument("--resume-from", type=int, default=None)
    parser.add_argument("--log-steps", type=int, default=100)
    parser.add_argument("--preview-steps", type=int, default=0)
    parser.add_argument("--evaluation-steps", type=int, default=0)
    parser.add_argument("--checkpointing-steps", type=int, default=0)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument(
        "--profile-steps", type=str, default=None,
        help="START:COUNT — capture a jax.profiler device trace for COUNT "
             "steps starting at START, written to {output}/profile",
    )
    parser.add_argument("--wandb", type=str, default=None,
                        help="W&B project name (optional)")
    return parser


class JsonlLogger:
    """stdout + {output}/log/events.jsonl + TensorBoard scalars.

    Observability parity with the reference: TensorBoard SummaryWriter at
    ``{output}/log`` (reference ctsd.py:1084-1086) and optional Weights &
    Biases (reference train.py:87-89); both are soft dependencies — JSONL
    is always written.
    """

    def __init__(
        self, output_path: str, tensorboard: bool = True,
        wandb_project: Optional[str] = None,
    ):
        self.dir = os.path.join(output_path, "log")
        os.makedirs(self.dir, exist_ok=True)
        self.f = open(os.path.join(self.dir, "events.jsonl"), "a")
        self.tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(self.dir)
            except Exception:
                self.tb = None
        self.wandb = None
        if wandb_project:
            try:
                import wandb

                wandb.init(project=wandb_project, dir=self.dir)
                self.wandb = wandb
            except Exception:
                self.wandb = None

    def log(self, step: int, values: dict):
        payload = {"step": step}
        for k, v in values.items():
            try:
                payload[k] = float(v)
            except (TypeError, ValueError):
                payload[k] = str(v)
        self.f.write(json.dumps(payload) + "\n")
        self.f.flush()
        if self.tb is not None:
            for k, v in payload.items():
                if k != "step" and isinstance(v, float):
                    self.tb.add_scalar(k, v, step)
            self.tb.flush()
        if self.wandb is not None:
            self.wandb.log(
                {k: v for k, v in payload.items() if k != "step"},
                step=step,
            )
        msg = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in payload.items()
        )
        print(msg, flush=True)


def batch_iterator(
    dataset, batch_size: int, collate_fn, sampler=None, seed: int = 0
) -> Iterable[dict]:
    """Minimal host-side loader: sampler (bucket or shuffled-range) →
    collate. Runs in-process; swap for a multiprocess loader when the data
    plane becomes the bottleneck."""
    if sampler is not None:
        while True:
            for micro in sampler:
                yield collate_fn([dataset[i] for i in micro])
            sampler.set_epoch(getattr(sampler, "epoch", 0) + 1)
    rng = np.random.default_rng(seed)
    while True:
        order = rng.permutation(len(dataset))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            yield collate_fn([dataset[j] for j in order[i: i + batch_size]])


def to_device_batch(batch: dict, mesh) -> dict:
    """numpy → device arrays, dropping non-array fields."""
    arrays = {
        k: v
        for k, v in batch.items()
        if isinstance(v, (np.ndarray, jnp.ndarray))
    }
    return shard_batch(arrays, mesh)


def main(args=None):
    args = args or create_parser().parse_args()
    with open(args.config_path) as f:
        config = json.load(f)

    # Device setup must precede backend init (the shell may preset
    # JAX_PLATFORMS=<tpu plugin>; configs can pin cpu + virtual devices for
    # local runs, mirroring the test harness).
    if "jax_platform" in config:
        jax.config.update("jax_platforms", config["jax_platform"])
    if "num_virtual_cpu_devices" in config:
        jax.config.update(
            "jax_num_cpu_devices", config["num_virtual_cpu_devices"]
        )

    if "global_state" in config:
        for key, value in config["global_state"].items():
            global_state[key] = create_instance_from_config(value)

    seed = config.get("generator_seed", 0)
    rng = jax.random.PRNGKey(seed)

    pipeline = create_instance_from_config(config["pipeline"])

    # Frozen-stage checkpoints (reference chains stages via config paths,
    # README.md:169 of the reference).
    if config.get("vq_checkpoint_path") and hasattr(
        pipeline, "load_vq_params"
    ):

        pipeline.load_vq_params(
            ckpt_lib.load_model_only(config["vq_checkpoint_path"])
        )
    if config.get("autoencoder_checkpoint_path") and hasattr(
        pipeline, "load_autoencoder_params"
    ):

        pipeline.load_autoencoder_params(
            ckpt_lib.load_model_only(config["autoencoder_checkpoint_path"])
        )
    if config.get("blank_code_path") and hasattr(pipeline, "blank_code"):
        with open(config["blank_code_path"]) as f:
            pipeline.blank_code = tuple(json.load(f)["blank_code"])
    if config.get("vae_checkpoint_path") and hasattr(pipeline, "set_vae"):

        vae = create_instance_from_config(config["vae"])
        pipeline.set_vae(
            vae, ckpt_lib.load_model_only(config["vae_checkpoint_path"])
        )

    dataset = create_instance_from_config(config["training_dataset"])
    # reference config shape: training_dataloader {batch_size, num_workers,
    # prefetch_factor, collate_fn} (e.g. configs/ctsd/multi_datasets of the
    # reference); the flat keys remain supported.
    dl_cfg = dict(config.get("training_dataloader", {}))
    collate = (
        create_instance_from_config(dl_cfg["collate_fn"])
        if "collate_fn" in dl_cfg
        else create_instance_from_config(
            config.get("training_collate_fn", {})
        )
    ) or (lambda items: items[0])
    sampler = None
    if "training_sampler" in config:
        sampler = create_instance_from_config(
            config["training_sampler"], dataset=dataset
        )
    batch_size = dl_cfg.get("batch_size", config.get("batch_size", 1))
    num_workers = dl_cfg.get("num_workers", 0)
    if num_workers > 0:
        from opendwm_tpu.datasets.loader import PrefetchLoader

        loader = iter(PrefetchLoader(
            dataset, batch_size, collate, sampler, seed,
            num_workers=num_workers,
            prefetch_batches=dl_cfg.get("prefetch_factor", 2),
        ))
    else:
        loader = batch_iterator(dataset, batch_size, collate, sampler, seed)

    # In-train validation evaluation (reference train.py:202-208 builds a
    # validation dataloader and calls evaluate_pipeline at intervals).
    validation_batches = None
    if args.evaluation_steps and "validation_dataset" in config:
        val_dataset = create_instance_from_config(
            config["validation_dataset"]
        )
        val_dl_cfg = dict(config.get("validation_dataloader", {}))
        val_collate = (
            create_instance_from_config(val_dl_cfg["collate_fn"])
            if "collate_fn" in val_dl_cfg
            else collate
        )
        val_bs = val_dl_cfg.get("batch_size", batch_size)
        n = (len(val_dataset) // val_bs) * val_bs  # even sharding
        limit = config.get("evaluation_batches", 4) * val_bs
        validation_batches = [
            to_device_batch(
                val_collate(
                    [val_dataset[j] for j in range(i, i + val_bs)]
                ),
                pipeline.mesh,
            )
            for i in range(0, min(n, limit), val_bs)
        ]
    if hasattr(pipeline, "metrics") and "metrics" in config:
        pipeline.metrics = {
            name: create_instance_from_config(cfg)
            for name, cfg in config["metrics"].items()
        }

    first = next(loader)
    device_batch = to_device_batch(first, pipeline.mesh)
    rng, init_rng = jax.random.split(rng)
    state = pipeline.init_state(init_rng, device_batch)

    if args.resume_from is not None:
        state = ckpt_lib.load_checkpoint(
            args.output_path, args.resume_from, state
        )
        print(f"resumed from step {args.resume_from}")

    logger = JsonlLogger(args.output_path, wandb_project=args.wandb)
    max_steps = args.max_steps or config.get("train_steps", 1000)
    durations: list[float] = []
    global_step = int(state.step)

    profile_start, profile_count = -1, 0
    if args.profile_steps:
        parts = args.profile_steps.split(":")
        profile_start = int(parts[0])
        # COUNT=0 would leave the trace unterminated (stop condition
        # global_step == start + count could never fire after start).
        profile_count = max(1, int(parts[1])) if len(parts) > 1 else 3

    from opendwm_tpu.utils import profiling

    batch = device_batch
    trace_active = False
    try:
      while global_step < max_steps:
        if global_step == profile_start:
            jax.profiler.start_trace(
                os.path.join(args.output_path, "profile")
            )
            trace_active = True
        t0 = time.time()
        rng, step_rng = jax.random.split(rng)
        state, metrics = pipeline.train_step(state, batch, step_rng)
        global_step += 1
        if trace_active and global_step >= profile_start + profile_count:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            trace_active = False
            logger.log(global_step, dict(
                profile_written=1.0, **profiling.device_memory_stats()
            ))

        if global_step % args.log_steps == 0:
            jax.block_until_ready(metrics)
            durations.append(time.time() - t0)
            logger.log(
                global_step,
                dict(metrics, s_per_step=float(np.mean(durations[-20:]))),
            )
        else:
            durations.append(time.time() - t0)

        if (
            args.checkpointing_steps
            and global_step % args.checkpointing_steps == 0
        ):
            ckpt_lib.save_checkpoint(args.output_path, global_step, state)

        if (
            args.evaluation_steps
            and global_step % args.evaluation_steps == 0
            and hasattr(pipeline, "evaluate_pipeline")
        ):
            import inspect

            first_param = next(iter(inspect.signature(
                pipeline.evaluate_pipeline
            ).parameters))
            if first_param == "params":  # lidar maskgit-style signature
                pipeline.evaluate_pipeline(
                    state.params, validation_batches or [],
                    jax.random.PRNGKey(seed + global_step),
                    global_step=global_step, logger=logger,
                )
            else:
                pipeline.evaluate_pipeline(
                    state, global_step, batches=validation_batches,
                    logger=logger,
                )

        if (
            args.preview_steps
            and global_step % args.preview_steps == 0
            and hasattr(pipeline, "preview_pipeline")
        ):
            pipeline.preview_pipeline(
                state, batch, args.output_path, global_step
            )

        batch = to_device_batch(next(loader), pipeline.mesh)
    finally:
        if trace_active:
            # Loop exited (max_steps or exception) with a trace still
            # open — flush it so the capture is not lost.
            jax.profiler.stop_trace()

    ckpt_lib.save_checkpoint(args.output_path, global_step, state)
    print(f"done at step {global_step}")


if __name__ == "__main__":
    main()
