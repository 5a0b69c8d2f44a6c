"""Cross-view temporal MMDiT denoiser (SD 3.x skeleton), TPU-native.

Capability parity with the reference
``DiTCrossviewTemporalConditionModel`` (src/dwm/models/crossview_temporal_dit.py:105-630):

- SD3 MMDiT backbone: patch embedding with cropped sincos positions, joint
  two-stream (latent+text) attention blocks with adaLN-Zero modulation,
  qk-RMSNorm, dual-attention layers (SD3.5), AdaLayerNormContinuous output.
- Inserted *crossview* blocks (attention across camera views; ``rowwise`` =
  attend within one latent row across views, ``full`` = all views jointly)
  and *temporal* blocks (``pointwise`` = per-token across frames, ``rowwise``,
  ``full``) at configured layer ids, each mixed back via AlphaBlender with a
  per-sample disable flag (reference :223-370).
- Implicit perspective modeling: sinusoidal embedding of
  fps+intrinsics+extrinsics ids (reference :434-439); explicit mode: Plücker
  ray map via RayEncoder (reference :39-102,440-457).
- T2I-Adapter residuals injected into the first N blocks (reference :491-494).

TPU-first design notes (why this is not a translation):
- Channel-last layout throughout; the factored attentions are pure reshapes
  around one fused attention op (Pallas flash / XLA), so XLA lays every
  branch on the MXU with no transposes materialized.
- Static Python layer loop (fixed depth) → one compiled graph; per-branch
  `jax.checkpoint` (remat) replaces torch.utils.checkpoint.
- All timestep/index embeddings are computed vectorized over (b, t, v) at
  fp32 and cast once.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from opendwm_tpu.config import register
from opendwm_tpu.models.adapters import ImageAdapter
from opendwm_tpu.models.layers import (
    AlphaBlender,
    Attention,
    CombinedTimestepTextProjEmbeddings,
    FeedForward,
    Mixer,
    PatchEmbed,
    TimestepEmbedding,
    VTSelfAttentionBlock,
    timestep_embedding,
)

Dtype = jnp.dtype


class Modulation(nn.Module):
    """adaLN modulation head: silu(temb) → Dense(n_chunks*dim), zero-init."""

    dim: int
    n_chunks: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jax.Array) -> tuple[jax.Array, ...]:
        mod = nn.Dense(
            self.n_chunks * self.dim, dtype=self.dtype, name="linear"
        )(nn.silu(emb.astype(self.dtype)))
        return tuple(jnp.split(mod[:, None, :], self.n_chunks, axis=-1))


def _ln(x, dtype):
    return nn.LayerNorm(
        use_bias=False, use_scale=False, epsilon=1e-6, dtype=dtype
    )(x)


def _b(x, on: bool = True):
    """Materialization boundary between transformer sublayers.

    Without it XLA folds the residual-add + LN-stats + modulate chain of
    neighbouring sublayers into oversized tuple fusions that run ~16x above
    the memory-bound floor on v5e (profiled: broadcast_add_fusion 3.9 ms at
    (36,448,1536) vs 0.25 ms ideal; perf/exp_joint.py measures the barrier
    variant at 17.0 vs 21.4 ms/block; full-model fwd 9.27 -> 9.66 f/s).
    The barrier is the identity — exact in value and gradient on every
    backend. It must be OFF inside remat'd (training) blocks: barriers in
    the recompute graph block XLA's backward fusions (measured train-step
    collapse 8.96 -> 1.95 f/s), so blocks pass ``on=not remat``."""
    return jax.lax.optimization_barrier(x) if on else x


class JointTransformerBlock(nn.Module):
    """SD3 MMDiT block (diffusers JointTransformerBlock semantics).

    Latent and context streams each carry their own adaLN modulation and MLP;
    attention runs jointly over concatenated tokens. ``dual_attention`` adds a
    second, latent-only self-attention (SD3.5). ``context_pre_only`` marks the
    final block whose context stream has no outputs.
    """

    heads: int
    head_dim: int
    qk_norm: Optional[str] = "rms_norm"
    dual_attention: bool = False
    context_pre_only: bool = False
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None  # ring-shard the joint attention
    quantized: bool = False  # int8 W8A8 serving path
    fusion_barriers: bool = True  # off under remat (see _b)

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array, temb: jax.Array):
        def _b_(y):
            return _b(y, self.fusion_barriers)

        dim = self.heads * self.head_dim
        n_chunks = 9 if self.dual_attention else 6
        mods = Modulation(dim, n_chunks, dtype=self.dtype, name="norm1")(temb)
        shift_msa, scale_msa, gate_msa = mods[0], mods[1], mods[2]
        shift_mlp, scale_mlp, gate_mlp = mods[3], mods[4], mods[5]

        normed = _ln(x, self.dtype)
        norm_x = _b_(normed * (1 + scale_msa) + shift_msa)

        if self.context_pre_only:
            # AdaLayerNormContinuous on the context (final block).
            cmods = Modulation(dim, 2, dtype=self.dtype, name="norm1_context")(
                temb
            )
            c_scale, c_shift = cmods  # diffusers order: scale, shift
            norm_ctx = _b_(_ln(context, self.dtype) * (1 + c_scale) + c_shift)
        else:
            cmods = Modulation(dim, 6, dtype=self.dtype, name="norm1_context")(
                temb
            )
            c_shift_msa, c_scale_msa, c_gate_msa = cmods[0], cmods[1], cmods[2]
            c_shift_mlp, c_scale_mlp, c_gate_mlp = cmods[3], cmods[4], cmods[5]
            norm_ctx = _b_(
                _ln(context, self.dtype) * (1 + c_scale_msa) + c_shift_msa
            )

        attn_out, ctx_attn_out = Attention(
            heads=self.heads, head_dim=self.head_dim, qk_norm=self.qk_norm,
            joint=True, context_pre_only=self.context_pre_only,
            dtype=self.dtype, sp_axis=self.sp_axis,
            quantized=self.quantized, name="attn",
        )(norm_x, context=norm_ctx)
        x = _b_(x + gate_msa * attn_out)

        if self.dual_attention:
            shift2, scale2, gate2 = mods[6], mods[7], mods[8]
            norm_x2 = _b_(normed * (1 + scale2) + shift2)
            x = _b_(x + gate2 * Attention(
                heads=self.heads, head_dim=self.head_dim,
                qk_norm=self.qk_norm, dtype=self.dtype,
                quantized=self.quantized, name="attn2",
            )(norm_x2))

        norm_x = _b_(_ln(x, self.dtype) * (1 + scale_mlp) + shift_mlp)
        x = _b_(x + gate_mlp * FeedForward(
            activation="gelu-approximate", dtype=self.dtype,
            quantized=self.quantized, name="ff",
        )(norm_x))

        if self.context_pre_only:
            return x, None

        context = _b_(context + c_gate_msa * ctx_attn_out)
        norm_ctx = _b_(
            _ln(context, self.dtype) * (1 + c_scale_mlp) + c_shift_mlp
        )
        context = _b_(context + c_gate_mlp * FeedForward(
            activation="gelu-approximate", dtype=self.dtype,
            quantized=self.quantized, name="ff_context",
        )(norm_ctx))
        return x, context


class RayEncoder(nn.Module):
    """Explicit perspective modeling: octave-encoded camera origin + ray
    directions projected to the token dim (reference
    crossview_temporal_dit.py:39-63, UniMLVG)."""

    pos_octaves: int = 8
    ray_octaves: int = 4
    dtype: Dtype = jnp.float32

    @staticmethod
    def _octave_encode(coords: jax.Array, n_octaves: int, start: int = 0):
        octaves = 2.0 ** jnp.arange(start, start + n_octaves) * jnp.pi
        scaled = coords[..., None] * octaves  # (..., dim, oct)
        sines = scaled.reshape(*scaled.shape[:-2], -1)
        return jnp.concatenate([jnp.sin(sines), jnp.cos(sines)], -1)

    out_dim: int = 1536

    @nn.compact
    def __call__(self, rays_o: jax.Array, rays_d: jax.Array) -> jax.Array:
        # rays_o: (N, 3); rays_d: (N, H, W, 3)
        n, h, w, _ = rays_d.shape
        pos = self._octave_encode(rays_o, self.pos_octaves)  # (N, 48)
        pos = jnp.broadcast_to(pos[:, None, None, :], (n, h, w, pos.shape[-1]))
        ray = self._octave_encode(rays_d, self.ray_octaves)  # (N, H, W, 24)
        x = jnp.concatenate([pos, ray], -1).astype(self.dtype)
        return nn.Dense(
            self.out_dim, use_bias=False, dtype=self.dtype, name="proj"
        )(x)


def get_rays(intrinsics: jax.Array, cam2ref: jax.Array, hw: tuple[int, int]):
    """Per-pixel unit ray directions and camera origins.

    intrinsics: (N, 3, 3) scaled to the latent grid; cam2ref: (N, 4, 4).
    Returns rays_o (N, 3), rays_d (N, H, W, 3). Reference
    crossview_temporal_dit.py:66-102.
    """
    h, w = hw
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    grid_x, grid_y = jnp.meshgrid(xs, ys)  # (h, w)
    pix = jnp.stack(
        [grid_x.reshape(-1), grid_y.reshape(-1), jnp.ones(h * w)], axis=0
    )  # (3, h*w)
    inv_k = jnp.linalg.inv(intrinsics.astype(jnp.float32))
    dirs = inv_k @ pix[None]  # (N, 3, h*w)
    rays_d = cam2ref[:, :3, :3].astype(jnp.float32) @ dirs
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=1, keepdims=True)
    rays_d = rays_d.transpose(0, 2, 1).reshape(-1, h, w, 3)
    rays_o = cam2ref[:, :3, 3].astype(jnp.float32)
    return rays_o, rays_d


@register(
    "DiTCrossviewTemporal",
    aliases=(
        "dwm.models.crossview_temporal_dit.DiTCrossviewTemporalConditionModel",
    ),
)
class DiTCrossviewTemporal(nn.Module):
    """The flagship denoiser. See module docstring.

    Call with channel-last video latents:
      sample                (b, t, v, h, w, in_channels)
      timestep              (b, t, v)   — per-frame noise levels (diffusion
                                          forcing needs independent values)
      encoder_hidden_states (b, t, v, L, joint_attention_dim-projected) text
      pooled_projections    (b, t, v, pooled_projection_dim)
      condition_image_tensor(b, t, v, H, W, C_cond) pixel-space layout rasters
      added_time_ids        (b, t, v, K) numeric conditions (implicit mode)
      camera_intrinsics_norm/camera2referego: explicit mode inputs
      disable_crossview / disable_temporal: (b,) bool AlphaBlender overrides
    """

    # SD3 backbone config (names follow the reference JSON config keys).
    patch_size: int = 2
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    in_channels: int = 16
    out_channels: int = 16
    joint_attention_dim: int = 4096
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 384
    sample_size: int = 128
    qk_norm: Optional[str] = "rms_norm"
    dual_attention_layers: Sequence[int] = tuple(range(13))
    # Crossview/temporal extensions.
    enable_crossview: bool = False
    crossview_attention_type: Optional[str] = None  # rowwise|full|fuse|adj_fuse
    crossview_block_layers: Sequence[int] = ()
    enable_temporal: bool = False
    temporal_attention_type: Optional[str] = None  # pointwise|rowwise|full
    temporal_block_layers: Sequence[int] = ()
    qk_norm_on_additional_modules: Optional[str] = None
    mixer_type: str = "AlphaBlender"
    merge_factor: float = 2.0
    merge_strategy: str = "learned_with_images"
    disable_view_emb_on_temporal_module: bool = False
    # Perspective modeling.
    perspective_modeling_type: str = ""  # ""|implicit|explicit
    projection_class_embeddings_input_dim: Optional[int] = None
    # Condition adapter.
    condition_image_adapter_config: Optional[dict] = None
    # MaskGWM masked-reconstruction module (models.mask_layers).
    mask_module_config: Optional[dict] = None
    # Remat.
    gradient_checkpointing: bool = False
    crossview_gradient_checkpointing: bool = False
    temporal_gradient_checkpointing: bool = False
    # Selective remat: when gradient_checkpointing is on, remat only the
    # joint blocks listed here (None = all of them). Middle ground
    # between full remat (recomputes every memory-bound LN/modulate
    # chain in the backward) and no remat (full activations OOM at
    # flagship width on 16 GB — perf/BENCH_TRAIN_REMAT.json). Blocks NOT
    # remat'd also get their inter-sublayer fusion barriers back (see
    # _b), recovering the forward-path fusion win inside the train step.
    remat_block_layers: Optional[Sequence[int]] = None
    # Remat policy: None = recompute everything; "dots" = save matmul
    # outputs and recompute only elementwise ops in the backward
    # (jax.checkpoint_policies.dots_saveable) — trades HBM for the
    # recompute FLOPs that dominate the rematerialized backward.
    remat_policy: Optional[str] = None
    dtype: Any = jnp.float32
    attention_backend: Optional[str] = None
    # int8 W8A8 serving path ("int8" | None): QDense projections/MLPs with
    # offline-quantized weights — 2x MXU peak on v5e (see ops/quant.py).
    quantization: Optional[str] = None
    # Ring-shard the joint attention over this mesh axis (requires running
    # inside shard_map with tokens replicated over the axis; see
    # ops/ring_attention.ring_attention_replicated).
    sequence_parallel_axis: Optional[str] = None

    @property
    def inner_dim(self) -> int:
        return self.attention_head_dim * self.num_attention_heads

    def _mixer(self, name: str):
        if self.mixer_type == "AlphaBlender":
            return AlphaBlender(
                alpha=self.merge_factor, merge_strategy=self.merge_strategy,
                dtype=self.dtype, name=name,
            )
        return Mixer(dtype=self.dtype, name=name)

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        pooled_projections: jax.Array,
        condition_image_tensor: Optional[jax.Array] = None,
        added_time_ids: Optional[jax.Array] = None,
        camera_intrinsics_norm: Optional[jax.Array] = None,
        camera2referego: Optional[jax.Array] = None,
        disable_crossview: Optional[jax.Array] = None,
        disable_temporal: Optional[jax.Array] = None,
        crossview_attention_mask: Optional[jax.Array] = None,
        crossview_attention_index: Optional[jax.Array] = None,
        mask_rng: Optional[jax.Array] = None,
        **_unused,
    ) -> jax.Array:
        if sample.ndim == 5:  # single-view input (b, t, h, w, c)
            squeeze_view = True
            sample = sample[:, :, None]
            timestep = timestep[:, :, None]
            if encoder_hidden_states.ndim == 4:
                encoder_hidden_states = encoder_hidden_states[:, :, None]
            if pooled_projections.ndim == 3:
                pooled_projections = pooled_projections[:, :, None]
            if added_time_ids is not None and added_time_ids.ndim == 3:
                added_time_ids = added_time_ids[:, :, None]
            if condition_image_tensor is not None and \
                    condition_image_tensor.ndim == 5:
                condition_image_tensor = condition_image_tensor[:, :, None]
        else:
            squeeze_view = False

        b, t, v, hh, ww, _ = sample.shape
        p = self.patch_size
        gh, gw = hh // p, ww // p
        n = b * t * v
        dim = self.inner_dim
        compute = self.dtype

        x = PatchEmbed(
            patch_size=p, embed_dim=dim,
            pos_embed_max_size=self.pos_embed_max_size,
            base_size=self.sample_size // p, dtype=compute, name="pos_embed",
        )(sample.reshape(n, hh, ww, -1).astype(compute))

        ctx = nn.Dense(
            self.caption_projection_dim, dtype=compute,
            name="context_embedder",
        )(encoder_hidden_states.reshape(n, *encoder_hidden_states.shape[3:])
          .astype(compute))

        temb = CombinedTimestepTextProjEmbeddings(
            embed_dim=dim, dtype=compute, name="time_text_embed"
        )(
            timestep.reshape(-1),
            pooled_projections.reshape(n, -1).astype(compute),
        )

        # --- perspective embedding -------------------------------------
        view_cam_emb = None
        if self.perspective_modeling_type == "implicit":
            assert added_time_ids is not None
            feats = timestep_embedding(added_time_ids.reshape(-1), 256)
            feats = feats.reshape(n, -1)
            view_cam_emb = TimestepEmbedding(
                dim, dtype=compute, name="view_embedding"
            )(feats.astype(compute))[:, None, :]
        elif self.perspective_modeling_type == "explicit":
            assert camera_intrinsics_norm is not None
            k = camera_intrinsics_norm.reshape(n, 3, 3).astype(jnp.float32)
            scale = jnp.array(
                [[gw, 1, gw], [1, gh, gh], [1, 1, 1]], dtype=jnp.float32
            )
            k = k * scale
            rays_o, rays_d = get_rays(
                k, camera2referego.reshape(n, 4, 4), (gh, gw)
            )
            pos = RayEncoder._octave_encode(rays_o, 8)
            pos = jnp.broadcast_to(
                pos[:, None, None, :], (n, gh, gw, pos.shape[-1])
            )
            ray = RayEncoder._octave_encode(rays_d, 4)
            raymap = jnp.concatenate([pos, ray], -1).astype(compute)
            raymap = nn.Dense(
                dim, use_bias=False, dtype=compute, name="rayencoder_proj"
            )(raymap)
            view_cam_emb = raymap.reshape(n, gh * gw, dim)

        # --- adapter residuals ------------------------------------------
        residuals: list[jax.Array] = []
        if (
            self.condition_image_adapter_config is not None
            and condition_image_tensor is not None
        ):
            feats = ImageAdapter(
                **self.condition_image_adapter_config, dtype=compute,
                name="condition_image_adapter",
            )(condition_image_tensor.astype(compute))
            # Each feature (b, t, v, gh, gw, dim) → tokens.
            residuals = [f.reshape(n, -1, f.shape[-1]) for f in feats]

        if disable_crossview is None:
            disable_crossview = jnp.zeros((b,), dtype=bool)
        if disable_temporal is None:
            disable_temporal = jnp.zeros((b,), dtype=bool)

        # --- MaskGWM: drop tokens before the blocks --------------------------
        mask_controller = None
        mask_metas = None
        cur_gw = gw
        if self.mask_module_config is not None and mask_rng is not None:
            from opendwm_tpu.models.mask_layers import MaskController

            mask_controller = MaskController(
                hidden_size=dim, num_heads=self.num_attention_heads,
                attention_head_dim=self.attention_head_dim,
                **self.mask_module_config, dtype=compute,
                name="mask_module",
            )
            # group by (b, v) with t as the frame axis (reference :465-471)
            xg = x.reshape(b, t, v, gh * gw, dim).transpose(0, 2, 1, 3, 4)
            xg = xg.reshape(b * v, t, gh * gw, dim)
            xg, mask_metas, _ = mask_controller.random_masking(
                mask_rng, xg, gh, gw
            )
            keep = xg.shape[2]
            x = xg.reshape(b, v, t, keep, dim).transpose(0, 2, 1, 3, 4)
            x = x.reshape(n, keep, dim)
            cur_gw = keep // gh
            residuals = [
                jnp.take_along_axis(
                    r.reshape(b, t, v, gh * gw, dim)
                    .transpose(0, 2, 1, 3, 4)
                    .reshape(b * v * t, gh * gw, dim),
                    jnp.repeat(
                        mask_metas["ids_keep"][..., None], dim, -1
                    ),
                    axis=1,
                )
                .reshape(b, v, t, keep, dim)
                .transpose(0, 2, 1, 3, 4)
                .reshape(n, keep, dim)
                for r in residuals
            ]

        crossview_ids = list(self.crossview_block_layers)
        temporal_ids = list(self.temporal_block_layers)
        heads, head_dim = self.num_attention_heads, self.attention_head_dim

        def maybe_remat(module_cls, flag, **kw):
            if not flag:
                return module_cls(**kw)
            policy = {
                None: None,
                "dots": jax.checkpoint_policies.dots_saveable,
                "dots_no_batch":
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            }[self.remat_policy]
            return nn.remat(module_cls, policy=policy)(**kw)

        for i in range(self.num_layers):
            if (
                mask_controller is not None
                and mask_controller.is_first_decoder_layer(
                    i, self.num_layers
                )
            ):
                keep = x.shape[1]
                xg = x.reshape(b, t, v, keep, dim).transpose(0, 2, 1, 3, 4)
                xg = xg.reshape(b * v, t, keep, dim)
                temb_g = temb.reshape(b, t, v, -1).transpose(0, 2, 1, 3)
                temb_g = temb_g.reshape(b * v * t, -1)
                xg = mask_controller.mask_reconstruction(
                    xg, mask_metas, None, temb_g
                )
                x = xg.reshape(b, v, t, gh * gw, dim)
                x = x.transpose(0, 2, 1, 3, 4).reshape(n, gh * gw, dim)
                cur_gw = gw

            if residuals:
                x = x + residuals.pop(0)

            block_remat = self.gradient_checkpointing and (
                self.remat_block_layers is None
                or i in self.remat_block_layers
            )
            block = maybe_remat(
                JointTransformerBlock,
                block_remat,
                quantized=self.quantization == "int8",
                fusion_barriers=not block_remat,
                heads=heads, head_dim=head_dim, qk_norm=self.qk_norm,
                dual_attention=i in self.dual_attention_layers,
                context_pre_only=i == self.num_layers - 1,
                dtype=compute, sp_axis=self.sequence_parallel_axis,
                name=f"transformer_blocks_{i}",
            )
            x, ctx = block(x, ctx, temb)

            if self.enable_temporal and i in temporal_ids:
                j = temporal_ids.index(i)
                seq_idx = jnp.broadcast_to(
                    jnp.arange(t, dtype=jnp.float32)[None, :, None], (b, t, v)
                )
                seq_feats = timestep_embedding(seq_idx.reshape(-1), dim)
                seq_emb = TimestepEmbedding(
                    dim * 4, out_dim=dim, dtype=compute,
                    name=f"time_pos_embeds_{j}",
                )(seq_feats.astype(compute))[:, None, :]
                if (
                    self.enable_crossview
                    and not self.disable_view_emb_on_temporal_module
                    and view_cam_emb is not None
                ):
                    seq_emb = seq_emb + view_cam_emb
                tb = maybe_remat(
                    VTSelfAttentionBlock,
                    self.temporal_gradient_checkpointing,
                    quantized=self.quantization == "int8",
                    fusion_barriers=not self.temporal_gradient_checkpointing,
                    heads=heads, head_dim=head_dim,
                    qk_norm=self.qk_norm_on_additional_modules,
                    dtype=compute, name=f"temporal_transformer_blocks_{j}",
                )
                x = self._temporal_branch(
                    tb, self._mixer(f"time_mixers_{j}"), x, seq_emb,
                    (b, t, v, gh, cur_gw, dim), disable_temporal,
                )

            if self.enable_crossview and i in crossview_ids:
                j = crossview_ids.index(i)
                view_idx = jnp.broadcast_to(
                    jnp.arange(v, dtype=jnp.float32)[None, None, :], (b, t, v)
                )
                view_feats = timestep_embedding(view_idx.reshape(-1), dim)
                view_emb = TimestepEmbedding(
                    dim * 4, out_dim=dim, dtype=compute,
                    name=f"view_pos_embeds_{j}",
                )(view_feats.astype(compute))[:, None, :]
                if view_cam_emb is not None:
                    view_emb = view_emb + view_cam_emb
                cb = maybe_remat(
                    VTSelfAttentionBlock,
                    self.crossview_gradient_checkpointing,
                    quantized=self.quantization == "int8",
                    fusion_barriers=not self.crossview_gradient_checkpointing,
                    heads=heads, head_dim=head_dim,
                    qk_norm=self.qk_norm_on_additional_modules,
                    dtype=compute, name=f"crossview_transformer_blocks_{j}",
                )
                x = self._crossview_branch(
                    cb, self._mixer(f"view_mixers_{j}"), x, view_emb,
                    (b, t, v, gh, cur_gw, dim), disable_crossview,
                    crossview_attention_mask, crossview_attention_index,
                )

        # --- output -----------------------------------------------------
        out_mods = Modulation(dim, 2, dtype=compute, name="norm_out")(temb)
        scale, shift = out_mods  # AdaLayerNormContinuous: (scale, shift)
        x = _ln(x, compute) * (1 + scale) + shift
        x = nn.Dense(
            p * p * self.out_channels, dtype=compute, name="proj_out"
        )(x)
        x = x.reshape(n, gh, gw, p, p, self.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # n, gh, p, gw, p, c
        x = x.reshape(b, t, v, hh, ww, self.out_channels)
        if squeeze_view:
            x = x[:, :, 0]
        return x

    # -- factored branches -------------------------------------------------

    def _temporal_branch(self, block, mixer, x, emb, shape, disable):
        b, t, v, gh, gw, c = shape
        h = x + emb
        if self.temporal_attention_type == "full":
            h = h.reshape(b, t, v, gh * gw, c).transpose(0, 2, 1, 3, 4)
            h = h.reshape(b * v, t * gh * gw, c)
            h = block(h)
            h = h.reshape(b, v, t, gh * gw, c).transpose(0, 2, 1, 3, 4)
        elif self.temporal_attention_type == "rowwise":
            h = h.reshape(b, t, v, gh, gw, c).transpose(0, 2, 3, 1, 4, 5)
            h = h.reshape(b * v * gh, t * gw, c)
            h = block(h)
            h = h.reshape(b, v, gh, t, gw, c).transpose(0, 3, 1, 2, 4, 5)
        else:  # pointwise: attend over t per spatial token
            # (A transpose-free axis-1 form of this branch — attention in
            # the canonical t-major layout via broadcast-multiply-reduce —
            # measured NET SLOWER on v5e: 9.41 vs 9.66 f/s full-model; the
            # 5-D intermediates tile worse than the one-off transposes.)
            h = h.reshape(b, t, v, gh * gw, c).transpose(0, 2, 3, 1, 4)
            h = h.reshape(b * v * gh * gw, t, c)
            h = block(h)
            h = h.reshape(b, v, gh * gw, t, c).transpose(0, 3, 1, 2, 4)
        h = h.reshape(b, t * v, gh * gw, c)
        x = x.reshape(b, t * v, gh * gw, c)
        out = mixer(x, h, image_only_indicator=disable)
        return out.reshape(b * t * v, gh * gw, c)

    def _crossview_branch(
        self, block, mixer, x, emb, shape, disable, mask, neighbor_index=None
    ):
        b, t, v, gh, gw, c = shape
        h = x + emb
        if self.crossview_attention_type == "full":
            # (bt, v, gh, gw) → attend over (gh v gw) jointly per frame.
            h = h.reshape(b * t, v, gh, gw, c).transpose(0, 2, 1, 3, 4)
            h = h.reshape(b * t, gh * v * gw, c)
            h = block(h, mask=mask)
            h = h.reshape(b * t, gh, v, gw, c).transpose(0, 2, 1, 3, 4)
        elif self.crossview_attention_type == "rowwise":
            h = h.reshape(b * t, v, gh, gw, c).transpose(0, 2, 1, 3, 4)
            h = h.reshape(b * t * gh, v * gw, c)
            h = block(h, mask=mask)
            h = h.reshape(b * t, gh, v, gw, c).transpose(0, 2, 1, 3, 4)
        elif self.crossview_attention_type in ("fuse", "adj_fuse"):
            # Windowed neighbor-view variants (reference
            # crossview_temporal_dit.py:231-287): each view attends over its
            # 3-view camera-ring neighborhood — 'fuse' jointly across ALL
            # frames per view, 'adj_fuse' per frame paired with the previous
            # frame. ``neighbor_index`` (v, 3) defaults to [v-1, v, v+1]
            # (ring order; the reference reads it from the batch).
            l = gh * gw
            if neighbor_index is None:
                vs = jnp.arange(v)
                neighbor_index = jnp.stack(
                    [(vs - 1) % v, vs, (vs + 1) % v], axis=1
                )
            hg = h.reshape(b, t, v, l, c)
            # gather: (b, t, v, 3, l, c) — view v's 3-neighborhood
            gathered = jnp.take(hg, neighbor_index.reshape(-1), axis=2)
            gathered = gathered.reshape(b, t, v, 3, l, c)
            if self.crossview_attention_type == "fuse":
                # (b v) (t 3 l) c — all frames of the neighborhood jointly
                g = gathered.transpose(0, 2, 1, 3, 4, 5).reshape(
                    b * v, t * 3 * l, c
                )
                g = block(g, mask=mask)
                g = g.reshape(b, v, t, 3, l, c)
                h = g[:, :, :, 1].transpose(0, 2, 1, 3, 4)  # center view
            else:  # adj_fuse: pair each frame with its predecessor
                prev = jnp.concatenate(
                    [gathered[:, :1], gathered[:, :-1]], axis=1
                )
                pair = jnp.stack([prev, gathered], axis=2)  # (b,t,2,v,3,l,c)
                g = pair.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
                    b * t * v, 2 * 3 * l, c
                )
                g = block(g, mask=mask)
                g = g.reshape(b, t, v, 2, 3, l, c)
                h = g[:, :, :, 1, 1]  # current frame, center view
            h = h.reshape(b * t, v, gh, gw, c)
        else:
            raise ValueError(
                f"Unsupported crossview type {self.crossview_attention_type!r}"
            )
        h = h.reshape(b, t * v, gh * gw, c)
        x = x.reshape(b, t * v, gh * gw, c)
        out = mixer(x, h, image_only_indicator=disable)
        return out.reshape(b * t * v, gh * gw, c)
