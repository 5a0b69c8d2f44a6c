"""DiTCrossviewTemporal forward: shapes, disable flags, adapter residuals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.models.mmdit import DiTCrossviewTemporal

pytestmark = pytest.mark.slow


TINY = dict(
    patch_size=2,
    num_layers=4,
    attention_head_dim=8,
    num_attention_heads=4,
    in_channels=16,
    out_channels=16,
    joint_attention_dim=32,
    caption_projection_dim=32,
    pooled_projection_dim=24,
    pos_embed_max_size=16,
    sample_size=8,
    qk_norm="rms_norm",
    dual_attention_layers=(0,),
    enable_crossview=True,
    crossview_attention_type="rowwise",
    crossview_block_layers=(1,),
    enable_temporal=True,
    temporal_attention_type="pointwise",
    temporal_block_layers=(2,),
    qk_norm_on_additional_modules="rms_norm",
    perspective_modeling_type="implicit",
    projection_class_embeddings_input_dim=2816,
)

B, T, V, H, W = 1, 2, 3, 8, 8
L = 5  # text tokens


def make_inputs(key, b=B):
    ks = jax.random.split(key, 6)
    return dict(
        sample=jax.random.normal(ks[0], (b, T, V, H, W, 16)),
        timestep=jnp.full((b, T, V), 500.0),
        encoder_hidden_states=jax.random.normal(ks[1], (b, T, V, L, 32)),
        pooled_projections=jax.random.normal(ks[2], (b, T, V, 24)),
        added_time_ids=jax.random.normal(ks[3], (b, T, V, 11)),
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = DiTCrossviewTemporal(**TINY)
    params = model.init(jax.random.PRNGKey(0), **make_inputs(jax.random.PRNGKey(1)))
    return model, params


class TestMMDiT:
    def test_output_shape(self, model_and_params):
        model, params = model_and_params
        out = model.apply(params, **make_inputs(jax.random.PRNGKey(1)))
        assert out.shape == (B, T, V, H, W, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_jit_compiles(self, model_and_params):
        model, params = model_and_params
        fn = jax.jit(lambda p, **kw: model.apply(p, **kw))
        out = fn(params, **make_inputs(jax.random.PRNGKey(1)))
        assert out.shape == (B, T, V, H, W, 16)

    def test_disable_flags_force_spatial_path(self, model_and_params):
        model, params = model_and_params
        inputs = make_inputs(jax.random.PRNGKey(2), b=2)
        flags_mixed = jnp.array([True, False])
        out_mixed = model.apply(
            params, **inputs,
            disable_crossview=flags_mixed, disable_temporal=flags_mixed,
        )
        out_all_disabled = model.apply(
            params, **inputs,
            disable_crossview=jnp.array([True, True]),
            disable_temporal=jnp.array([True, True]),
        )
        # Sample 0 (disabled in both runs) must agree exactly.
        np.testing.assert_allclose(
            np.asarray(out_mixed)[0], np.asarray(out_all_disabled)[0],
            atol=1e-6,
        )
        # Sample 1 (enabled vs disabled) must differ.
        assert not np.allclose(
            np.asarray(out_mixed)[1], np.asarray(out_all_disabled)[1]
        )

    def test_single_view_input(self, model_and_params):
        model, params = model_and_params
        inp = make_inputs(jax.random.PRNGKey(3))
        out = model.apply(
            params,
            sample=inp["sample"][:, :, 0],
            timestep=inp["timestep"][:, :, 0],
            encoder_hidden_states=inp["encoder_hidden_states"][:, :, 0],
            pooled_projections=inp["pooled_projections"][:, :, 0],
            added_time_ids=inp["added_time_ids"][:, :, :1],
        )
        assert out.shape == (B, T, H, W, 16)

    def test_adapter_residuals_change_output(self):
        cfg = dict(TINY)
        cfg["condition_image_adapter_config"] = dict(
            in_channels=6,
            channels=[32, 32],
            is_downblocks=[True, False],
            num_res_blocks=1,
            downscale_factor=8,
            use_zero_convs=False,
        )
        model = DiTCrossviewTemporal(**cfg)
        inp = make_inputs(jax.random.PRNGKey(4))
        cond = jax.random.normal(
            jax.random.PRNGKey(5), (B, T, V, H * 8, W * 8, 6)
        )
        params = model.init(
            jax.random.PRNGKey(0), **inp, condition_image_tensor=cond
        )
        out_with = model.apply(params, **inp, condition_image_tensor=cond)
        out_zero = model.apply(
            params, **inp, condition_image_tensor=jnp.zeros_like(cond)
        )
        assert out_with.shape == (B, T, V, H, W, 16)
        assert not np.allclose(np.asarray(out_with), np.asarray(out_zero))

    def test_explicit_perspective(self):
        cfg = dict(TINY)
        cfg["perspective_modeling_type"] = "explicit"
        model = DiTCrossviewTemporal(**cfg)
        inp = make_inputs(jax.random.PRNGKey(6))
        del inp["added_time_ids"]
        intr = jnp.broadcast_to(jnp.eye(3), (B, T, V, 3, 3))
        c2r = jnp.broadcast_to(jnp.eye(4), (B, T, V, 4, 4))
        params = model.init(
            jax.random.PRNGKey(0), **inp,
            camera_intrinsics_norm=intr, camera2referego=c2r,
        )
        out = model.apply(
            params, **inp, camera_intrinsics_norm=intr, camera2referego=c2r
        )
        assert out.shape == (B, T, V, H, W, 16)

    def test_remat_matches_no_remat(self):
        model = DiTCrossviewTemporal(**TINY)
        model_remat = DiTCrossviewTemporal(
            **TINY, gradient_checkpointing=True,
            crossview_gradient_checkpointing=True,
            temporal_gradient_checkpointing=True,
        )
        inp = make_inputs(jax.random.PRNGKey(7))
        params = model.init(jax.random.PRNGKey(0), **inp)
        out1 = model.apply(params, **inp)
        out2 = model_remat.apply(params, **inp)
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(out2), atol=1e-5
        )


class TestFuseCrossview:
    """Windowed neighbor-view crossview variants (reference
    crossview_temporal_dit.py:231-287)."""

    @pytest.mark.parametrize("kind", ["fuse", "adj_fuse"])
    def test_forward_and_locality(self, kind):
        cfg = dict(TINY, crossview_attention_type=kind)
        model = DiTCrossviewTemporal(**cfg)
        inp = make_inputs(jax.random.PRNGKey(1))
        params = model.init(jax.random.PRNGKey(0), **inp)
        out = model.apply(params, **inp)
        assert out.shape == inp["sample"].shape
        assert np.isfinite(np.asarray(out)).all()
        # Neighborhood locality with an explicit index that EXCLUDES view 0
        # from views 1/2's windows: perturbing view 0's input must leave
        # their crossview context unchanged relative to the ring default,
        # i.e. different index → different output (the index is live).
        idx_ring = jnp.stack(
            [(jnp.arange(V) - 1) % V, jnp.arange(V),
             (jnp.arange(V) + 1) % V], axis=1
        )
        idx_self = jnp.stack([jnp.arange(V)] * 3, axis=1)  # self-only
        out_ring = model.apply(
            params, **inp, crossview_attention_index=idx_ring
        )
        out_self = model.apply(
            params, **inp, crossview_attention_index=idx_self
        )
        np.testing.assert_allclose(
            np.asarray(out_ring), np.asarray(out), atol=1e-5
        )  # explicit ring == default
        assert np.abs(np.asarray(out_self) - np.asarray(out)).max() > 1e-6
