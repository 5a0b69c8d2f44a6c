"""Stage-sliced flagship DiT for pipeline parallelism.

Round-1 shipped the GPipe mechanism (parallel/pipeline.py) demoed on a toy
MLP; this module applies it to the REAL flagship layer stack
(configs/ctsd/ctsd_35_tirda_bm_nwao.json pattern — reference
crossview_temporal_dit.py:105-630): per layer, an SD3.5 joint block
(dual-attention on the first 13), a pointwise-temporal branch on layers
{2,3, 6,7, ...}, and a rowwise-crossview branch on layers {1,5,9,...},
each mixed back through AlphaBlender.

The pp schedule streams microbatches through stages whose parameters live
on their own devices; stages must be structurally homogeneous for the
stacked-parameter SPMD formulation, so every layer carries the maximal
structure (dual + crossview + temporal params) and the published pattern
is applied EXACTLY through per-layer gates carried in the (stacked) stage
parameters:

- dual attention is multiplied by a {0,1} gate (0 → bit-exact no-op),
- crossview/temporal branches use AlphaBlender's image_only_indicator
  (True → alpha = 1 → bit-exact passthrough).

Embeddings (patchify, temb, per-layer position embedders) and unpatchify
stay outside the pipelined region: the per-layer position embedders live
in stage params; patchify/temb/unpatchify run replicated (they are <1% of
FLOPs). The joint attention optionally ring-shards over a ``tp`` axis
(models.layers.Attention sp_axis → ops.ring_attention).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from opendwm_tpu.models.layers import (
    AlphaBlender,
    TimestepEmbedding,
    VTSelfAttentionBlock,
    timestep_embedding,
)
from opendwm_tpu.models.mmdit import JointTransformerBlock
from opendwm_tpu.parallel.pipeline import pipeline_apply, stack_stage_params

Dtype = Any


class FlagshipStage(nn.Module):
    """``layers_per_stage`` maximal flagship layers.

    Carry ``h``: (n, L_x + L_ctx, dim) — the latent and context streams
    concatenated so the pipeline moves ONE array between stages.
    ``temb``: (n, dim). Gates: (layers_per_stage,) f32/bool arrays.
    """

    heads: int
    head_dim: int
    layers_per_stage: int
    ctx_len: int
    # static group layout for the factored branches
    t: int
    v: int
    gh: int
    gw: int
    qk_norm: Optional[str] = "rms_norm"
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        temb: jax.Array,
        dual_gate: jax.Array,       # (lps,) f32 0/1
        crossview_on: jax.Array,    # (lps,) bool
        temporal_on: jax.Array,     # (lps,) bool
    ) -> jax.Array:
        n = h.shape[0]
        dim = self.heads * self.head_dim
        b = n // (self.t * self.v)
        lx = h.shape[1] - self.ctx_len
        x, ctx = h[:, :lx], h[:, lx:]

        for i in range(self.layers_per_stage):
            x, ctx = GatedJointBlock(
                heads=self.heads, head_dim=self.head_dim,
                qk_norm=self.qk_norm, dtype=self.dtype,
                sp_axis=self.sp_axis, name=f"joint_{i}",
            )(x, ctx, temb, dual_gate[i])

            # temporal branch (pointwise over t), gate via AlphaBlender
            seq_idx = jnp.broadcast_to(
                jnp.arange(self.t, dtype=jnp.float32)[None, :, None],
                (b, self.t, self.v),
            )
            seq_emb = TimestepEmbedding(
                dim * 4, out_dim=dim, dtype=self.dtype,
                name=f"time_pos_embed_{i}",
            )(timestep_embedding(seq_idx.reshape(-1), dim)
              .astype(self.dtype))[:, None, :]
            tb = VTSelfAttentionBlock(
                heads=self.heads, head_dim=self.head_dim,
                qk_norm=self.qk_norm, dtype=self.dtype,
                name=f"temporal_{i}",
            )
            l = self.gh * self.gw
            tp_in = (x + seq_emb).reshape(b, self.t, self.v, l, dim)
            tp_in = tp_in.transpose(0, 2, 3, 1, 4).reshape(
                b * self.v * l, self.t, dim
            )
            tp = tb(tp_in)
            tp = tp.reshape(b, self.v, l, self.t, dim)
            tp = tp.transpose(0, 3, 1, 2, 4).reshape(b, self.t * self.v,
                                                     l, dim)
            x4 = x.reshape(b, self.t * self.v, l, dim)
            x = AlphaBlender(
                alpha=2.0, dtype=self.dtype, name=f"time_mixer_{i}"
            )(
                x4, tp,
                image_only_indicator=jnp.broadcast_to(
                    ~temporal_on[i], (b,)
                ),
            ).reshape(n, l, dim)

            # crossview branch (rowwise over v*gw)
            view_idx = jnp.broadcast_to(
                jnp.arange(self.v, dtype=jnp.float32)[None, None, :],
                (b, self.t, self.v),
            )
            view_emb = TimestepEmbedding(
                dim * 4, out_dim=dim, dtype=self.dtype,
                name=f"view_pos_embed_{i}",
            )(timestep_embedding(view_idx.reshape(-1), dim)
              .astype(self.dtype))[:, None, :]
            cb = VTSelfAttentionBlock(
                heads=self.heads, head_dim=self.head_dim,
                qk_norm=self.qk_norm, dtype=self.dtype,
                name=f"crossview_{i}",
            )
            cv_in = (x + view_emb).reshape(
                b * self.t, self.v, self.gh, self.gw, dim
            )
            cv_in = cv_in.transpose(0, 2, 1, 3, 4).reshape(
                b * self.t * self.gh, self.v * self.gw, dim
            )
            cv = cb(cv_in)
            cv = cv.reshape(b * self.t, self.gh, self.v, self.gw, dim)
            cv = cv.transpose(0, 2, 1, 3, 4).reshape(
                b, self.t * self.v, l, dim
            )
            x4 = x.reshape(b, self.t * self.v, l, dim)
            x = AlphaBlender(
                alpha=2.0, dtype=self.dtype, name=f"view_mixer_{i}"
            )(
                x4, cv,
                image_only_indicator=jnp.broadcast_to(
                    ~crossview_on[i], (b,)
                ),
            ).reshape(n, l, dim)

        return jnp.concatenate([x, ctx], axis=1)


class GatedJointBlock(nn.Module):
    """JointTransformerBlock with the dual attention statically present and
    multiplied by a gate (0 → exact no-op) so all layers share structure."""

    heads: int
    head_dim: int
    qk_norm: Optional[str] = "rms_norm"
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, ctx, temb, gate):
        from opendwm_tpu.models.layers import Attention, FeedForward
        from opendwm_tpu.models.mmdit import Modulation, _ln

        dim = self.heads * self.head_dim
        mods = Modulation(dim, 9, dtype=self.dtype, name="norm1")(temb)
        shift_msa, scale_msa, gate_msa = mods[0], mods[1], mods[2]
        shift_mlp, scale_mlp, gate_mlp = mods[3], mods[4], mods[5]
        cmods = Modulation(dim, 6, dtype=self.dtype, name="norm1_context")(
            temb
        )

        normed = _ln(x, self.dtype)
        norm_x = normed * (1 + scale_msa) + shift_msa
        norm_ctx = _ln(ctx, self.dtype) * (1 + cmods[1]) + cmods[0]
        attn_out, ctx_attn = Attention(
            heads=self.heads, head_dim=self.head_dim, qk_norm=self.qk_norm,
            joint=True, dtype=self.dtype, sp_axis=self.sp_axis, name="attn",
        )(norm_x, context=norm_ctx)
        x = x + gate_msa * attn_out

        # dual attention, gated (gate 0 → bit-exact passthrough)
        norm_x2 = normed * (1 + mods[7]) + mods[6]
        dual_out = Attention(
            heads=self.heads, head_dim=self.head_dim, qk_norm=self.qk_norm,
            dtype=self.dtype, name="attn2",
        )(norm_x2)
        x = x + gate.astype(x.dtype) * (mods[8] * dual_out)

        norm_x = _ln(x, self.dtype) * (1 + scale_mlp) + shift_mlp
        x = x + gate_mlp * FeedForward(
            activation="gelu-approximate", dtype=self.dtype, name="ff"
        )(norm_x)

        ctx = ctx + cmods[2] * ctx_attn
        norm_ctx = _ln(ctx, self.dtype) * (1 + cmods[4]) + cmods[3]
        ctx = ctx + cmods[5] * FeedForward(
            activation="gelu-approximate", dtype=self.dtype,
            name="ff_context",
        )(norm_ctx)
        return x, ctx


FLAGSHIP_DUAL = tuple(range(13))
FLAGSHIP_CROSSVIEW = (1, 5, 9, 13, 17, 21)
FLAGSHIP_TEMPORAL = (2, 3, 6, 7, 10, 11, 14, 15, 18, 19, 22, 23)


def build_flagship_stages(
    rng: jax.Array,
    *,
    n_stages: int,
    num_layers: int = 24,
    heads: int = 24,
    head_dim: int = 64,
    ctx_len: int = 154,
    t: int = 6,
    v: int = 6,
    gh: int = 16,
    gw: int = 28,
    batch: int = 1,
    dual_layers=FLAGSHIP_DUAL,
    crossview_layers=FLAGSHIP_CROSSVIEW,
    temporal_layers=FLAGSHIP_TEMPORAL,
    dtype=jnp.float32,
    sp_axis: Optional[str] = None,
):
    """Init per-stage params for the flagship pattern and stack them.

    Returns (stage_module, stacked_params, example_inputs) where
    stacked_params = {"params": <stacked stage trees>, "gates": {...}} and
    gates encode the published dual/crossview/temporal layer pattern.
    """
    assert num_layers % n_stages == 0, (num_layers, n_stages)
    lps = num_layers // n_stages
    dim = heads * head_dim
    stage = FlagshipStage(
        heads=heads, head_dim=head_dim, layers_per_stage=lps,
        ctx_len=ctx_len, t=t, v=v, gh=gh, gw=gw, dtype=dtype,
        sp_axis=sp_axis,
    )
    n = batch * t * v
    h0 = jax.random.normal(rng, (n, gh * gw + ctx_len, dim), dtype)
    temb0 = jax.random.normal(jax.random.fold_in(rng, 1), (n, dim), dtype)

    def stage_gates(s):
        layer_ids = range(s * lps, (s + 1) * lps)
        return {
            "dual": jnp.asarray(
                [1.0 if i in dual_layers else 0.0 for i in layer_ids],
                jnp.float32,
            ),
            "crossview": jnp.asarray(
                [i in crossview_layers for i in layer_ids], bool
            ),
            "temporal": jnp.asarray(
                [i in temporal_layers for i in layer_ids], bool
            ),
        }

    gates0 = stage_gates(0)
    # init outside shard_map: the ring axis is unbound there, and sp only
    # changes the attention schedule — the parameter tree is identical.
    init_stage = stage.clone(sp_axis=None) if sp_axis else stage
    per_stage = []
    for s in range(n_stages):
        params = init_stage.init(
            jax.random.fold_in(rng, 100 + s), h0, temb0,
            gates0["dual"], gates0["crossview"], gates0["temporal"],
        )
        per_stage.append({"params": params, "gates": stage_gates(s)})
    stacked = stack_stage_params(per_stage)
    return stage, stacked, (h0, temb0)


def flagship_stage_fn(stage: FlagshipStage):
    """``(stacked-slice, h, temb) -> h`` for pipeline_apply."""

    def block_fn(stage_params, h, temb):
        g = stage_params["gates"]
        return stage.apply(
            stage_params["params"], h, temb,
            g["dual"], g["crossview"], g["temporal"],
        )

    return block_fn


def flagship_sequential_apply(stage, stacked_params, h, temb):
    """Reference: run the same stages one after another (no pipeline)."""
    n_stages = jax.tree.leaves(stacked_params)[0].shape[0]
    fn = flagship_stage_fn(stage)
    for s in range(n_stages):
        stage_slice = jax.tree.map(lambda a: a[s], stacked_params)
        h = fn(stage_slice, h, temb)
    return h


def flagship_pipeline_apply(
    stage, stacked_params, h, temb, mesh, *, microbatches: int,
    axis: str = "pp", batch_axis: Optional[str] = None,
):
    """GPipe the flagship stages over the ``pp`` mesh axis (optionally
    data-parallel over ``batch_axis``; tp ring attention activates via the
    stage's ``sp_axis``)."""
    return pipeline_apply(
        flagship_stage_fn(stage),
        stacked_params,
        h,
        mesh,
        axis=axis,
        microbatches=microbatches,
        conds=(temb,),
        batch_axis=batch_axis,
    )
