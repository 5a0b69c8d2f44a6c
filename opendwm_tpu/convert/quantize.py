"""Offline int8 quantization of a converted checkpoint.

Builds the model twice from its JSON config (float and
``quantization="int8"``), and maps the float checkpoint onto the
quantized parameter structure via :func:`opendwm_tpu.ops.quant
.quantize_param_tree` — so exactly the layers the int8 model serves as
QDense/QConv get per-channel int8 kernels, and everything else (norms,
embeddings, temporal 3-D convs) passes through untouched.

Usage:
    python -m opendwm_tpu.convert.quantize \
        --config configs/ctsd/ctsd_35_6views_video_synthetic.json \
        --model-key pipeline.model \
        --input /path/model_ckpt --output /path/model_int8_ckpt \
        --example-shape 1,2,2,8,8,16

The config entry must be a ``_class_name`` object config for a model
that accepts ``quantization`` (DiTCrossviewTemporal,
UNetCrossviewTemporal, AutoencoderKL).
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from opendwm_tpu import checkpoint as ckpt_lib
from opendwm_tpu.config import create_instance_from_config
from opendwm_tpu.ops.quant import quantize_param_tree


def _dig(cfg: dict, dotted: str) -> dict:
    node = cfg
    for part in dotted.split("."):
        node = node[part]
    return node


def _example_inputs(model, shape):
    """Minimal init inputs for the three quantizable model families."""
    name = type(model).__name__
    key = jax.random.PRNGKey(0)
    if name == "AutoencoderKL":
        return (jnp.zeros(shape, jnp.float32),), {}
    b, t, v = shape[:3]
    sample = jnp.zeros(shape, jnp.float32)
    common = dict(
        timestep=jnp.full((b, t, v), 500.0),
        added_time_ids=jnp.zeros((b, t, v, 3)),
    )
    if name == "UNetCrossviewTemporal":
        ctx_dim = 1024
        common["encoder_hidden_states"] = jax.random.normal(
            key, (b, t, v, 3, ctx_dim)
        )
        return (sample,), common
    # DiTCrossviewTemporal
    d = model.inner_dim
    common["encoder_hidden_states"] = jax.random.normal(
        key, (b, t, v, 3, model.joint_attention_dim)
    )
    common["pooled_projections"] = jnp.zeros(
        (b, t, v, model.pooled_projection_dim)
    )
    common["added_time_ids"] = jnp.zeros((b, t, v, 11))
    del d
    return (sample,), common


def quantize_checkpoint(config: dict, params, shape):
    """Return the int8 parameter tree for ``params`` of ``config``."""
    import dataclasses

    fmodel = create_instance_from_config(config)
    qmodel = dataclasses.replace(fmodel, quantization="int8")
    args_, kwargs = _example_inputs(qmodel, shape)
    qshapes = jax.eval_shape(
        lambda: qmodel.init(jax.random.PRNGKey(0), *args_, **kwargs)
    )
    return quantize_param_tree(params, qshapes)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True,
                        help="JSON file holding the model object config")
    parser.add_argument("--model-key", default=None,
                        help="dotted path to the _class_name object inside "
                             "the config JSON (default: the file root)")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--example-shape", default="1,2,2,8,8,16",
                        help="comma sample shape used to trace the structure")
    args = parser.parse_args(argv)

    with open(args.config) as f:
        cfg = json.load(f)
    if args.model_key:
        cfg = _dig(cfg, args.model_key)
    shape = tuple(int(x) for x in args.example_shape.split(","))
    params = ckpt_lib.load_model_only(args.input)
    qtree = quantize_checkpoint(cfg, params, shape)
    ckpt_lib.save_model_only(args.output, qtree)
    n8 = sum(
        p.size for p in jax.tree.leaves(qtree)
        if getattr(p, "dtype", None) == jnp.int8
    )
    print(f"quantized: {n8/1e6:.1f}M int8 params → {args.output}")


if __name__ == "__main__":
    main()
