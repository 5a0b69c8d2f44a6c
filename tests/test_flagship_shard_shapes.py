"""Sharded parity at REAL flagship tile shapes (VERDICT r3 item 6).

All other multi-chip evidence runs at toy widths (h=w=8, 4 heads); sharding
bugs that depend on the actual tile geometry — head counts not divisible by
the mesh axis, 32x56 latents hitting different `_fsdp_spec` choices, the
154-token SD3 context — would slip through. This test runs the flagship
denoiser at REAL width (24 heads x 64 head_dim, 32x56 latents, 6 views,
154-token context; depth reduced to 2 layers so one CPU core finishes) and
asserts the fsdp=8-sharded forward equals the single-device forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.models.mmdit import DiTCrossviewTemporal
from opendwm_tpu.parallel import MeshSpec, make_mesh
from opendwm_tpu.parallel.sharding import param_shardings, replicated

pytestmark = pytest.mark.slow


def test_fsdp8_matches_single_device_at_flagship_width():
    layers = 2
    model = DiTCrossviewTemporal(
        patch_size=2, num_layers=layers, attention_head_dim=64,
        num_attention_heads=24, in_channels=16, out_channels=16,
        joint_attention_dim=1536, caption_projection_dim=1536,
        pooled_projection_dim=2048, pos_embed_max_size=384, sample_size=128,
        qk_norm="rms_norm", dual_attention_layers=(0,),
        enable_crossview=True, crossview_attention_type="rowwise",
        crossview_block_layers=(0,), enable_temporal=True,
        temporal_attention_type="pointwise", temporal_block_layers=(1,),
        qk_norm_on_additional_modules="rms_norm",
        perspective_modeling_type="implicit",
        projection_class_embeddings_input_dim=2816,
        dtype=jnp.float32,
    )
    t, v, h, w, ctx = 2, 6, 32, 56, 154
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    inputs = dict(
        sample=jax.random.normal(ks[0], (1, t, v, h, w, 16)),
        timestep=jnp.full((1, t, v), 500.0),
        encoder_hidden_states=jax.random.normal(
            ks[1], (1, t, v, ctx, 1536)) * 0.02,
        pooled_projections=jax.random.normal(ks[2], (1, t, v, 2048)) * 0.02,
        added_time_ids=jax.random.normal(ks[3], (1, t, v, 11)),
    )
    params = model.init(jax.random.PRNGKey(1), **inputs)

    # single-device reference
    mesh1 = make_mesh(MeshSpec(dp=1, fsdp=1), jax.devices()[:1])
    ref_fn = jax.jit(
        lambda p, kw: model.apply(p, **kw),
        in_shardings=(
            jax.tree.map(lambda _: replicated(mesh1), params),
            jax.tree.map(lambda _: replicated(mesh1), inputs),
        ),
    )
    want = np.asarray(ref_fn(params, inputs))

    # fsdp=8 sharded forward at the same weights
    mesh8 = make_mesh(MeshSpec(dp=1, fsdp=8), jax.devices()[:8])
    shardings = param_shardings(params, mesh8, "fsdp")
    sharded_params = jax.tree.map(jax.device_put, params, shardings)
    # every large tensor must actually be sharded at this width, or the
    # test silently degrades to replicated-vs-replicated
    n_sharded = sum(
        s.spec != jax.sharding.PartitionSpec()
        for s in jax.tree.leaves(shardings)
    )
    assert n_sharded >= 20, f"only {n_sharded} params sharded"
    fwd = jax.jit(
        lambda p, kw: model.apply(p, **kw),
        in_shardings=(
            shardings, jax.tree.map(lambda _: replicated(mesh8), inputs),
        ),
        out_shardings=replicated(mesh8),
    )
    got = np.asarray(
        fwd(sharded_params, jax.tree.map(
            lambda x: jax.device_put(x, replicated(mesh8)), inputs))
    )
    assert np.isfinite(got).all()
    scale = np.abs(want).max()
    err = np.abs(got - want).max() / max(scale, 1e-8)
    assert err < 5e-5, f"sharded/single rel err {err} at flagship width"
