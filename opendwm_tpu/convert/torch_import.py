"""Convert released torch checkpoints (.pth / safetensors / HF state dicts)
into this framework's flax parameter trees.

This is the parity anchor of the rebuild (SURVEY.md §7 step 2): OpenDWM ships
`.pth` checkpoints for its CTSD/UniMLVG models built on diffusers SD 2.1 /
SD 3.5 skeletons plus the crossview/temporal additions; loading them here
must reproduce reference outputs. Conversion rules:

- torch ``nn.Linear``   weight (out,in)      → flax Dense ``kernel`` (in,out)
- torch ``nn.Conv2d``   weight (out,in,kh,kw)→ flax Conv ``kernel`` (kh,kw,in,out)
- torch ``nn.Embedding``weight               → flax Embed ``embedding``
- norms: weight→scale/weight, bias→bias (module-specific names)

All functions take a flat ``{torch_name: np.ndarray}`` dict (load with
:func:`load_torch_state_dict`, which uses torch CPU only for deserialization)
and return nested flax param dicts.
"""

from __future__ import annotations

import re
from typing import Callable, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Deserialize a .pth/.safetensors file to numpy on host (no device)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {
        k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
        for k, v in sd.items()
    }


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def linear(sd, tree, src: str, dst: str, transpose: bool = True):
    w = sd[f"{src}.weight"]
    _set(tree, f"{dst}/kernel", w.T if transpose else w)
    # bias-free torch layers (e.g. SD2.1 UNet attention qkv) map onto the
    # flax Dense's always-present bias as zeros — numerically identical.
    bias = sd.get(f"{src}.bias")
    _set(tree, f"{dst}/bias",
         bias if bias is not None else np.zeros(w.shape[0], w.dtype))


def conv(sd, tree, src: str, dst: str):
    w = sd[f"{src}.weight"]
    _set(tree, f"{dst}/kernel", w.transpose(2, 3, 1, 0))
    bias = sd.get(f"{src}.bias")
    _set(tree, f"{dst}/bias",
         bias if bias is not None else np.zeros(w.shape[0], w.dtype))


def layer_norm(sd, tree, src: str, dst: str):
    _set(tree, f"{dst}/scale", sd[f"{src}.weight"])
    if f"{src}.bias" in sd:
        _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def rms_norm(sd, tree, src: str, dst: str, param: str = "scale"):
    _set(tree, f"{dst}/{param}", sd[f"{src}.weight"])


def group_norm(sd, tree, src: str, dst: str):
    _set(tree, f"{dst}/scale", sd[f"{src}.weight"])
    _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


# ---------------------------------------------------------------------------
# CLIP text model (HF transformers naming)
# ---------------------------------------------------------------------------

def convert_clip_text(sd: Mapping[str, np.ndarray]) -> dict:
    sd = {k.removeprefix("text_model."): v for k, v in sd.items()}
    tree: dict = {}
    _set(tree, "token_embedding/embedding",
         sd["embeddings.token_embedding.weight"])
    _set(tree, "position_embedding",
         sd["embeddings.position_embedding.weight"])
    n_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"encoder\.layers\.(\d+)\.", k))
    )
    for i in range(n_layers):
        src = f"encoder.layers.{i}"
        dst = f"layers_{i}"
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            linear(sd, tree, f"{src}.self_attn.{p}", f"{dst}/self_attn/{p}")
        layer_norm(sd, tree, f"{src}.layer_norm1", f"{dst}/layer_norm1")
        layer_norm(sd, tree, f"{src}.layer_norm2", f"{dst}/layer_norm2")
        linear(sd, tree, f"{src}.mlp.fc1", f"{dst}/fc1")
        linear(sd, tree, f"{src}.mlp.fc2", f"{dst}/fc2")
    layer_norm(sd, tree, "final_layer_norm", "final_layer_norm")
    if "text_projection.weight" in sd:
        linear(sd, tree, "text_projection", "text_projection")
    return {"params": tree}


# ---------------------------------------------------------------------------
# T5 encoder (HF transformers naming)
# ---------------------------------------------------------------------------

def convert_t5_encoder(sd: Mapping[str, np.ndarray]) -> dict:
    tree: dict = {}
    _set(tree, "shared/embedding", sd["shared.weight"])
    n_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"encoder\.block\.(\d+)\.", k))
    )
    for i in range(n_layers):
        src = f"encoder.block.{i}.layer"
        dst = f"block_{i}"
        for p in ("q", "k", "v", "o"):
            linear(sd, tree, f"{src}.0.SelfAttention.{p}",
                   f"{dst}/attention/{p}")
        if i == 0:
            _set(
                tree, f"{dst}/attention/relative_attention_bias",
                sd[f"{src}.0.SelfAttention.relative_attention_bias.weight"],
            )
        rms_norm(sd, tree, f"{src}.0.layer_norm", f"{dst}/ln_attn",
                 param="weight")
        linear(sd, tree, f"{src}.1.DenseReluDense.wi_0", f"{dst}/wi_0")
        linear(sd, tree, f"{src}.1.DenseReluDense.wi_1", f"{dst}/wi_1")
        linear(sd, tree, f"{src}.1.DenseReluDense.wo", f"{dst}/wo")
        rms_norm(sd, tree, f"{src}.1.layer_norm", f"{dst}/ln_ff",
                 param="weight")
    rms_norm(sd, tree, "encoder.final_layer_norm", "final_layer_norm",
             param="weight")
    return {"params": tree}


# ---------------------------------------------------------------------------
# AutoencoderKL (diffusers naming)
# ---------------------------------------------------------------------------

def convert_autoencoder_kl(sd: Mapping[str, np.ndarray]) -> dict:
    tree: dict = {}

    def vae_attn(src, dst):
        group_norm(sd, tree, f"{src}.group_norm", f"{dst}/group_norm")
        for p in ("to_q", "to_k", "to_v"):
            linear(sd, tree, f"{src}.{p}", f"{dst}/{p}")
        linear(sd, tree, f"{src}.to_out.0", f"{dst}/to_out")

    def resnet(src, dst):
        group_norm(sd, tree, f"{src}.norm1", f"{dst}/norm1")
        group_norm(sd, tree, f"{src}.norm2", f"{dst}/norm2")
        conv(sd, tree, f"{src}.conv1", f"{dst}/conv1")
        conv(sd, tree, f"{src}.conv2", f"{dst}/conv2")
        if f"{src}.conv_shortcut.weight" in sd:
            conv(sd, tree, f"{src}.conv_shortcut", f"{dst}/conv_shortcut")

    # encoder
    conv(sd, tree, "encoder.conv_in", "encoder/conv_in")
    n_down = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"encoder\.down_blocks\.(\d+)\.", k))
    )
    for i in range(n_down):
        j = 0
        while f"encoder.down_blocks.{i}.resnets.{j}.norm1.weight" in sd:
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   f"encoder/down_{i}_resnet_{j}")
            j += 1
        key = f"encoder.down_blocks.{i}.downsamplers.0.conv"
        if f"{key}.weight" in sd:
            conv(sd, tree, key, f"encoder/down_{i}_downsample")
    resnet("encoder.mid_block.resnets.0", "encoder/mid_resnet_0")
    resnet("encoder.mid_block.resnets.1", "encoder/mid_resnet_1")
    vae_attn("encoder.mid_block.attentions.0", "encoder/mid_attn")
    group_norm(sd, tree, "encoder.conv_norm_out", "encoder/conv_norm_out")
    conv(sd, tree, "encoder.conv_out", "encoder/conv_out")

    # decoder
    conv(sd, tree, "decoder.conv_in", "decoder/conv_in")
    resnet("decoder.mid_block.resnets.0", "decoder/mid_resnet_0")
    resnet("decoder.mid_block.resnets.1", "decoder/mid_resnet_1")
    vae_attn("decoder.mid_block.attentions.0", "decoder/mid_attn")
    n_up = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"decoder\.up_blocks\.(\d+)\.", k))
    )
    for i in range(n_up):
        j = 0
        while f"decoder.up_blocks.{i}.resnets.{j}.norm1.weight" in sd:
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   f"decoder/up_{i}_resnet_{j}")
            j += 1
        key = f"decoder.up_blocks.{i}.upsamplers.0.conv"
        if f"{key}.weight" in sd:
            conv(sd, tree, key, f"decoder/up_{i}_upsample")
    group_norm(sd, tree, "decoder.conv_norm_out", "decoder/conv_norm_out")
    conv(sd, tree, "decoder.conv_out", "decoder/conv_out")

    if "quant_conv.weight" in sd:
        conv(sd, tree, "quant_conv", "quant_conv")
        conv(sd, tree, "post_quant_conv", "post_quant_conv")
    return {"params": tree}


# ---------------------------------------------------------------------------
# Crossview-temporal MMDiT (diffusers SD3 + OpenDWM additions)
# ---------------------------------------------------------------------------

def _vt_block(sd, tree, src, dst):
    layer_norm(sd, tree, f"{src}.norm_in", f"{dst}/norm_in")
    linear(sd, tree, f"{src}.ff_in.net.0.proj", f"{dst}/ff_in/proj_in")
    linear(sd, tree, f"{src}.ff_in.net.2", f"{dst}/ff_in/proj_out")
    layer_norm(sd, tree, f"{src}.norm1", f"{dst}/norm1")
    for p in ("to_q", "to_k", "to_v"):
        linear(sd, tree, f"{src}.attn1.{p}", f"{dst}/attn1/{p}")
    linear(sd, tree, f"{src}.attn1.to_out.0", f"{dst}/attn1/to_out")
    if f"{src}.attn1.norm_q.weight" in sd:
        rms_norm(sd, tree, f"{src}.attn1.norm_q", f"{dst}/attn1/norm_q")
        rms_norm(sd, tree, f"{src}.attn1.norm_k", f"{dst}/attn1/norm_k")
    layer_norm(sd, tree, f"{src}.norm3", f"{dst}/norm3")
    linear(sd, tree, f"{src}.ff.net.0.proj", f"{dst}/ff/proj_in")
    linear(sd, tree, f"{src}.ff.net.2", f"{dst}/ff/proj_out")


def _mmdit_attn(sd, tree, src, dst, has_context, context_pre_only):
    for p in ("to_q", "to_k", "to_v"):
        linear(sd, tree, f"{src}.{p}", f"{dst}/{p}")
    linear(sd, tree, f"{src}.to_out.0", f"{dst}/to_out")
    if f"{src}.norm_q.weight" in sd:
        rms_norm(sd, tree, f"{src}.norm_q", f"{dst}/norm_q")
        rms_norm(sd, tree, f"{src}.norm_k", f"{dst}/norm_k")
    if has_context:
        for p, q in (("add_q_proj", "add_q_proj"), ("add_k_proj",
                     "add_k_proj"), ("add_v_proj", "add_v_proj")):
            linear(sd, tree, f"{src}.{p}", f"{dst}/{q}")
        if f"{src}.norm_added_q.weight" in sd:
            rms_norm(sd, tree, f"{src}.norm_added_q", f"{dst}/norm_added_q")
            rms_norm(sd, tree, f"{src}.norm_added_k", f"{dst}/norm_added_k")
        if not context_pre_only:
            linear(sd, tree, f"{src}.to_add_out", f"{dst}/to_add_out")


def convert_ctsd_dit(sd: Mapping[str, np.ndarray], num_layers: int) -> dict:
    """Convert the reference DiTCrossviewTemporalConditionModel state dict."""
    tree: dict = {}
    conv(sd, tree, "pos_embed.proj", "pos_embed/proj")
    linear(sd, tree, "context_embedder", "context_embedder")
    for name in ("timestep_embedder", "text_embedder"):
        linear(sd, tree, f"time_text_embed.{name}.linear_1",
               f"time_text_embed/{name}/linear_1")
        linear(sd, tree, f"time_text_embed.{name}.linear_2",
               f"time_text_embed/{name}/linear_2")
    if "view_embedding.linear_1.weight" in sd:
        linear(sd, tree, "view_embedding.linear_1",
               "view_embedding/linear_1")
        linear(sd, tree, "view_embedding.linear_2",
               "view_embedding/linear_2")
    if "rayencoder.proj.weight" in sd:
        linear(sd, tree, "rayencoder.proj", "rayencoder_proj")

    for i in range(num_layers):
        src = f"transformer_blocks.{i}"
        dst = f"transformer_blocks_{i}"
        last = i == num_layers - 1
        linear(sd, tree, f"{src}.norm1.linear", f"{dst}/norm1/linear")
        linear(sd, tree, f"{src}.norm1_context.linear",
               f"{dst}/norm1_context/linear")
        _mmdit_attn(sd, tree, f"{src}.attn", f"{dst}/attn", True, last)
        if f"{src}.attn2.to_q.weight" in sd:
            _mmdit_attn(sd, tree, f"{src}.attn2", f"{dst}/attn2", False,
                        False)
        linear(sd, tree, f"{src}.ff.net.0.proj", f"{dst}/ff/proj_in")
        linear(sd, tree, f"{src}.ff.net.2", f"{dst}/ff/proj_out")
        if not last:
            linear(sd, tree, f"{src}.ff_context.net.0.proj",
                   f"{dst}/ff_context/proj_in")
            linear(sd, tree, f"{src}.ff_context.net.2",
                   f"{dst}/ff_context/proj_out")

    # crossview / temporal additions
    for kind, prefix in (
        ("crossview_transformer_blocks", "crossview_transformer_blocks"),
        ("temporal_transformer_blocks", "temporal_transformer_blocks"),
    ):
        j = 0
        while f"{kind}.{j}.norm_in.weight" in sd:
            _vt_block(sd, tree, f"{kind}.{j}", f"{prefix}_{j}")
            j += 1
    for kind, prefix in (
        ("view_pos_embeds", "view_pos_embeds"),
        ("time_pos_embeds", "time_pos_embeds"),
    ):
        j = 0
        while f"{kind}.{j}.linear_1.weight" in sd:
            linear(sd, tree, f"{kind}.{j}.linear_1",
                   f"{prefix}_{j}/linear_1")
            linear(sd, tree, f"{kind}.{j}.linear_2",
                   f"{prefix}_{j}/linear_2")
            j += 1
    for kind, prefix in (
        ("view_mixers", "view_mixers"),
        ("time_mixers", "time_mixers"),
    ):
        j = 0
        while f"{kind}.{j}.mix_factor" in sd:
            _set(tree, f"{prefix}_{j}/mix_factor", sd[f"{kind}.{j}.mix_factor"])
            j += 1

    # condition image adapter
    if "condition_image_adapter.body.0.in_conv.weight" in sd:
        i = 0
        while f"condition_image_adapter.body.{i}.resnets.0.block1.weight" in sd:
            src = f"condition_image_adapter.body.{i}"
            dst = f"condition_image_adapter/body_{i}"
            if f"{src}.in_conv.weight" in sd:
                conv(sd, tree, f"{src}.in_conv", f"{dst}/in_conv")
            j = 0
            while f"{src}.resnets.{j}.block1.weight" in sd:
                conv(sd, tree, f"{src}.resnets.{j}.block1",
                     f"{dst}/resnets_{j}/block1")
                conv(sd, tree, f"{src}.resnets.{j}.block2",
                     f"{dst}/resnets_{j}/block2")
                j += 1
            zc = f"condition_image_adapter.zero_convs.{i}"
            if f"{zc}.weight" in sd:
                conv(sd, tree, zc,
                     f"condition_image_adapter/zero_convs_{i}")
            i += 1
        if "condition_image_adapter.zero_gates" in sd:
            _set(tree, "condition_image_adapter/zero_gates",
                 sd["condition_image_adapter.zero_gates"])

    linear(sd, tree, "norm_out.linear", "norm_out/linear")
    linear(sd, tree, "proj_out", "proj_out")
    return {"params": tree}


# ---------------------------------------------------------------------------
# I3D (TATS pytorch_i3d) and FID InceptionV3
# ---------------------------------------------------------------------------

def conv3d(sd, tree, src: str, dst: str):
    w = sd[f"{src}.weight"]
    _set(tree, f"{dst}/kernel", w.transpose(2, 3, 4, 1, 0))
    if f"{src}.bias" in sd:
        _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _batch_norm(sd, params, stats, src: str, dst: str):
    _set(params, f"{dst}/scale", sd[f"{src}.weight"])
    _set(params, f"{dst}/bias", sd[f"{src}.bias"])
    _set(stats, f"{dst}/mean", sd[f"{src}.running_mean"])
    _set(stats, f"{dst}/var", sd[f"{src}.running_var"])


def convert_i3d(sd: Mapping[str, np.ndarray]) -> dict:
    """TATS i3d_pretrained_400.pt → flax InceptionI3d variables."""
    params: dict = {}
    stats: dict = {}
    units = set()
    for k in sd:
        if k.endswith("conv3d.weight"):
            units.add(k[: -len(".conv3d.weight")])
    for unit in sorted(units):
        dst = unit.replace(".", "/")
        conv3d(sd, params, f"{unit}.conv3d", f"{dst}/conv3d")
        if f"{unit}.bn.weight" in sd:
            _batch_norm(sd, params, stats, f"{unit}.bn", f"{dst}/bn")
    return {"params": params, "batch_stats": stats}


def convert_fid_inception(sd: Mapping[str, np.ndarray]) -> dict:
    """pt_inception-2015-12-05 (torchmetrics FID net) → flax variables."""
    params: dict = {}
    stats: dict = {}
    convs = set()
    for k in sd:
        if k.endswith(".conv.weight"):
            convs.add(k[: -len(".conv.weight")])
    for unit in sorted(convs):
        dst = unit.replace(".", "/")
        conv(sd, params, f"{unit}.conv", f"{dst}/conv")
        _batch_norm(sd, params, stats, f"{unit}.bn", f"{dst}/bn")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Crossview-temporal UNet (diffusers SVD skeleton + OpenDWM additions)
# ---------------------------------------------------------------------------

def _ct_resblock(sd, tree, src, dst):
    """reference crossview_temporal.ResBlock → CTResBlock."""
    for part in ("spatial_res_block",):
        base = f"{src}.{part}"
        group_norm(sd, tree, f"{base}.norm1", f"{dst}/{part}/norm1")
        group_norm(sd, tree, f"{base}.norm2", f"{dst}/{part}/norm2")
        conv(sd, tree, f"{base}.conv1", f"{dst}/{part}/conv1")
        conv(sd, tree, f"{base}.conv2", f"{dst}/{part}/conv2")
        if f"{base}.time_emb_proj.weight" in sd:
            linear(sd, tree, f"{base}.time_emb_proj",
                   f"{dst}/{part}/time_emb_proj")
        if f"{base}.conv_shortcut.weight" in sd:
            conv(sd, tree, f"{base}.conv_shortcut",
                 f"{dst}/{part}/conv_shortcut")
    base = f"{src}.temporal_res_block"
    if f"{base}.norm1.weight" in sd:
        part = "temporal_res_block"
        group_norm(sd, tree, f"{base}.norm1", f"{dst}/{part}/norm1")
        group_norm(sd, tree, f"{base}.norm2", f"{dst}/{part}/norm2")
        conv3d(sd, tree, f"{base}.conv1", f"{dst}/{part}/conv1")
        conv3d(sd, tree, f"{base}.conv2", f"{dst}/{part}/conv2")
        if f"{base}.time_emb_proj.weight" in sd:
            linear(sd, tree, f"{base}.time_emb_proj",
                   f"{dst}/{part}/time_emb_proj")
        _set(tree, f"{dst}/time_mixer/mix_factor",
             sd[f"{src}.time_mixer.mix_factor"])


def _basic_block(sd, tree, src, dst, cross=True):
    """diffusers BasicTransformerBlock → BasicTransformerBlock."""
    layer_norm(sd, tree, f"{src}.norm1", f"{dst}/norm1")
    for p in ("to_q", "to_k", "to_v"):
        linear(sd, tree, f"{src}.attn1.{p}", f"{dst}/attn1/{p}")
    linear(sd, tree, f"{src}.attn1.to_out.0", f"{dst}/attn1/to_out")
    if cross and f"{src}.attn2.to_q.weight" in sd:
        layer_norm(sd, tree, f"{src}.norm2", f"{dst}/norm2")
        for p in ("to_q", "to_k", "to_v"):
            linear(sd, tree, f"{src}.attn2.{p}", f"{dst}/attn2/{p}")
        linear(sd, tree, f"{src}.attn2.to_out.0", f"{dst}/attn2/to_out")
    layer_norm(sd, tree, f"{src}.norm3", f"{dst}/norm3")
    linear(sd, tree, f"{src}.ff.net.0.proj", f"{dst}/ff/proj_in")
    linear(sd, tree, f"{src}.ff.net.2", f"{dst}/ff/proj_out")


def _vt_temporal_block(sd, tree, src, dst):
    """reference TemporalBasicTransformerBlock → TemporalBasicTransformerBlock."""
    layer_norm(sd, tree, f"{src}.norm_in", f"{dst}/norm_in")
    linear(sd, tree, f"{src}.ff_in.net.0.proj", f"{dst}/ff_in/proj_in")
    linear(sd, tree, f"{src}.ff_in.net.2", f"{dst}/ff_in/proj_out")
    layer_norm(sd, tree, f"{src}.norm1", f"{dst}/norm1")
    for p in ("to_q", "to_k", "to_v"):
        linear(sd, tree, f"{src}.attn1.{p}", f"{dst}/attn1/{p}")
    linear(sd, tree, f"{src}.attn1.to_out.0", f"{dst}/attn1/to_out")
    if f"{src}.attn2.to_q.weight" in sd:
        layer_norm(sd, tree, f"{src}.norm2", f"{dst}/norm2")
        for p in ("to_q", "to_k", "to_v"):
            linear(sd, tree, f"{src}.attn2.{p}", f"{dst}/attn2/{p}")
        linear(sd, tree, f"{src}.attn2.to_out.0", f"{dst}/attn2/to_out")
    layer_norm(sd, tree, f"{src}.norm3", f"{dst}/norm3")
    linear(sd, tree, f"{src}.ff.net.0.proj", f"{dst}/ff/proj_in")
    linear(sd, tree, f"{src}.ff.net.2", f"{dst}/ff/proj_out")


def _transformer_model(sd, tree, src, dst):
    """reference crossview_temporal.TransformerModel → TransformerModel."""
    group_norm(sd, tree, f"{src}.norm", f"{dst}/norm")
    linear(sd, tree, f"{src}.proj_in", f"{dst}/proj_in")
    linear(sd, tree, f"{src}.proj_out", f"{dst}/proj_out")
    k = 0
    while f"{src}.transformer_blocks.{k}.norm1.weight" in sd:
        _basic_block(sd, tree, f"{src}.transformer_blocks.{k}",
                     f"{dst}/transformer_blocks_{k}")
        k += 1
    for kind, prefix, embed in (
        ("crossview_transformer_blocks", "crossview_transformer_blocks",
         "view_pos_embed"),
        ("temporal_transformer_blocks", "temporal_transformer_blocks",
         "time_pos_embed"),
    ):
        k = 0
        while f"{src}.{kind}.{k}.norm_in.weight" in sd:
            _vt_temporal_block(sd, tree, f"{src}.{kind}.{k}",
                               f"{dst}/{prefix}_{k}")
            k += 1
        if f"{src}.{embed}.linear_1.weight" in sd:
            linear(sd, tree, f"{src}.{embed}.linear_1",
                   f"{dst}/{embed}/linear_1")
            linear(sd, tree, f"{src}.{embed}.linear_2",
                   f"{dst}/{embed}/linear_2")
    for mixer in ("view_mixer", "time_mixer"):
        if f"{src}.{mixer}.mix_factor" in sd:
            _set(tree, f"{dst}/{mixer}/mix_factor",
                 sd[f"{src}.{mixer}.mix_factor"])


def convert_ctsd_unet(sd: Mapping[str, np.ndarray]) -> dict:
    """Convert the reference UNetCrossviewTemporalConditionModel state dict
    (apply convert.cli.sd21_to_svd_keys first for SD2.1-era dicts)."""
    tree: dict = {}
    conv(sd, tree, "conv_in", "conv_in")
    linear(sd, tree, "time_embedding.linear_1", "time_embedding/linear_1")
    linear(sd, tree, "time_embedding.linear_2", "time_embedding/linear_2")
    if "add_embedding.linear_1.weight" in sd:
        linear(sd, tree, "add_embedding.linear_1", "add_embedding/linear_1")
        linear(sd, tree, "add_embedding.linear_2", "add_embedding/linear_2")

    for group in ("down_blocks", "up_blocks"):
        i = 0
        while any(k.startswith(f"{group}.{i}.") for k in sd):
            src = f"{group}.{i}"
            dst = f"{group}_{i}"
            j = 0
            while f"{src}.resnets.{j}.spatial_res_block.norm1.weight" in sd:
                _ct_resblock(sd, tree, f"{src}.resnets.{j}",
                             f"{dst}/resnets_{j}")
                j += 1
            j = 0
            while f"{src}.attentions.{j}.proj_in.weight" in sd:
                _transformer_model(sd, tree, f"{src}.attentions.{j}",
                                   f"{dst}/attentions_{j}")
                j += 1
            if f"{src}.downsamplers.0.conv.weight" in sd:
                conv(sd, tree, f"{src}.downsamplers.0.conv",
                     f"{dst}/downsample")
            if f"{src}.upsamplers.0.conv.weight" in sd:
                conv(sd, tree, f"{src}.upsamplers.0.conv", f"{dst}/upsample")
            i += 1

    for j in (0, 1):
        _ct_resblock(sd, tree, f"mid_block.resnets.{j}",
                     f"mid_block/resnets_{j}")
    if "mid_block.attentions.0.proj_in.weight" in sd:
        _transformer_model(sd, tree, "mid_block.attentions.0",
                           "mid_block/attentions_0")

    group_norm(sd, tree, "conv_norm_out", "conv_norm_out")
    conv(sd, tree, "conv_out", "conv_out")

    if "condition_image_adapter.body.0.resnets.0.block1.weight" in sd:
        i = 0
        while f"condition_image_adapter.body.{i}.resnets.0.block1.weight" \
                in sd:
            src = f"condition_image_adapter.body.{i}"
            dst = f"condition_image_adapter/body_{i}"
            if f"{src}.in_conv.weight" in sd:
                conv(sd, tree, f"{src}.in_conv", f"{dst}/in_conv")
            j = 0
            while f"{src}.resnets.{j}.block1.weight" in sd:
                conv(sd, tree, f"{src}.resnets.{j}.block1",
                     f"{dst}/resnets_{j}/block1")
                conv(sd, tree, f"{src}.resnets.{j}.block2",
                     f"{dst}/resnets_{j}/block2")
                j += 1
            i += 1
    return {"params": tree}
