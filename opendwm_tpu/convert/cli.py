"""Checkpoint conversion CLI: released torch checkpoints → orbax snapshots.

    python -m opendwm_tpu.convert.cli --kind ctsd_dit \
        --input ctsd_35.pth --output converted/ctsd_35 [--num-layers 24]

Kinds: ctsd_dit (DiTCrossviewTemporalConditionModel state dicts, incl. the
OpenDWM crossview/temporal additions), vae (diffusers AutoencoderKL),
clip (HF CLIPTextModel), t5 (HF T5EncoderModel), i3d (TATS FVD net),
fid_inception (pt_inception FID net).

The SD2.1→SVD resnet key remap of the reference
(crossview_temporal_unet.py:358-373) is applied automatically for UNet-style
dicts before conversion.
"""

from __future__ import annotations

import argparse
import re

from opendwm_tpu import checkpoint as ckpt_lib
from opendwm_tpu.convert import torch_import as ti


def sd21_to_svd_keys(sd: dict) -> dict:
    """Insert .spatial_res_block into resnet paths for SD2.1-era dicts
    (reference try_to_convert_state_dict)."""
    pattern = re.compile(r"resnets\.(\d+)\.conv")
    if not any(pattern.search(k) for k in sd):
        return sd
    sub = re.compile(r"resnets\.(\d+)")
    return {
        (sub.sub(r"resnets.\1.spatial_res_block", k) if "resnets" in k
         else k): v
        for k, v in sd.items()
    }


CONVERTERS = {
    "ctsd_dit": lambda sd, args: ti.convert_ctsd_dit(sd, args.num_layers),
    "ctsd_unet": lambda sd, args: ti.convert_ctsd_unet(sd),
    "vae": lambda sd, args: ti.convert_autoencoder_kl(sd),
    "clip": lambda sd, args: ti.convert_clip_text(sd),
    "t5": lambda sd, args: ti.convert_t5_encoder(sd),
    "i3d": lambda sd, args: ti.convert_i3d(sd),
    "fid_inception": lambda sd, args: ti.convert_fid_inception(sd),
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", required=True, choices=sorted(CONVERTERS))
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--num-layers", type=int, default=24)
    parser.add_argument(
        "--dtype", default=None, choices=("bf16", "f32"),
        help="cast float leaves before saving (bf16 is the TPU serving "
        "dtype: halves checkpoint size and weight-streaming HBM traffic; "
        "default keeps the source dtypes)",
    )
    args = parser.parse_args(argv)

    sd = ti.load_torch_state_dict(args.input)
    sd = sd21_to_svd_keys(sd)
    tree = CONVERTERS[args.kind](sd, args)
    if args.dtype:
        import jax.numpy as jnp
        import numpy as np

        target = jnp.bfloat16 if args.dtype == "bf16" else np.float32
        tree = _map_leaves(
            lambda v: v.astype(target)
            if np.issubdtype(v.dtype, np.floating) else v, tree,
        )
    ckpt_lib.save_model_only(args.output, tree)
    n = sum(
        v.size for v in _leaves(tree)
    )
    print(f"converted {args.kind}: {n/1e6:.1f}M params → {args.output}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


def _map_leaves(fn, tree):
    if isinstance(tree, dict):
        return {k: _map_leaves(fn, v) for k, v in tree.items()}
    return fn(tree)


if __name__ == "__main__":
    main()
