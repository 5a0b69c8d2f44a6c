"""UniMLVG pipeline (ar_input styles) + MaskGWM mask module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.models.mmdit import DiTCrossviewTemporal
from opendwm_tpu.parallel import MeshSpec, make_mesh
from opendwm_tpu.pipelines.unimlvg import UnimlvgPipeline, fill_svd_mask
from opendwm_tpu.schedulers import FlowMatchEulerScheduler

pytestmark = pytest.mark.slow


B, T, V, H, W, C = 2, 3, 2, 8, 8, 16


def tiny_model(in_ch=C, mask_module=None):
    return DiTCrossviewTemporal(
        patch_size=2, num_layers=4, attention_head_dim=8,
        num_attention_heads=4, in_channels=in_ch, out_channels=C,
        joint_attention_dim=24, caption_projection_dim=32,
        pooled_projection_dim=16, pos_embed_max_size=16, sample_size=8,
        dual_attention_layers=(), enable_crossview=True,
        crossview_attention_type="rowwise", crossview_block_layers=(0,),
        enable_temporal=True, temporal_attention_type="pointwise",
        temporal_block_layers=(1,), mask_module_config=mask_module,
    )


def make_batch(key, b=B):
    ks = jax.random.split(key, 3)
    return {
        "latents": jax.random.normal(ks[0], (b, T, V, H, W, C)),
        "encoder_hidden_states": jax.random.normal(ks[1], (b, T, V, 4, 24)),
        "pooled_projections": jax.random.normal(ks[2], (b, T, V, 16)),
    }


def make_pipe(ar_type, in_ch=C, **common):
    return UnimlvgPipeline(
        model=tiny_model(in_ch=in_ch),
        train_scheduler=FlowMatchEulerScheduler(shift=3.0),
        test_scheduler=FlowMatchEulerScheduler(shift=3.0),
        common_config=dict(
            {"ar_input_type": ar_type, "visible_frame": 1,
             "ar_input_cfg": {"num_init_frames": 1}},
            **common,
        ),
        training_config={"video_gen_ratio": 0.3, "image_pred_ratio": 0.3},
        inference_config={"inference_steps": 2, "guidance_scale": 2.0},
        optimizer_config={"lr": 1e-3},
        mesh=make_mesh(MeshSpec(dp=8, fsdp=1)),
        sharding_policy="ddp",
    )


class TestFillSvdMask:
    def test_mask_marks_visible_prefix(self):
        lat = jnp.ones((1, 3, 1, 2, 2, 4))
        ori, mask = fill_svd_mask(2, lat)
        assert float(ori[0, 2].sum()) == 0
        assert float(ori[0, 0].sum()) == 16
        np.testing.assert_array_equal(
            np.asarray(mask[0, :, 0, 0, 0, 0]), [1, 1, 0]
        )

    def test_empty_context_zeroes_mask(self):
        lat = jnp.zeros((1, 3, 1, 2, 2, 4))
        _, mask = fill_svd_mask(2, lat)
        assert float(mask.sum()) == 0


class TestUnimlvg:
    def test_pred_style_train_and_infer(self):
        pipe = make_pipe("pred", common={})
        batch = make_batch(jax.random.PRNGKey(0), b=8)
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        state, m = pipe.train_step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(m["sd_loss"]))
        lat = pipe.inference_pipeline(
            state.params, batch, (8, T, V, H, W, C), jax.random.PRNGKey(3),
            image_latents=batch["latents"],
        )
        assert lat.shape == (8, T, V, H, W, C)
        assert np.isfinite(np.asarray(lat)).all()

    def test_svd_style_concat_channels(self):
        # svd input doubles latent channels + 1 mask channel
        pipe = make_pipe("svd", in_ch=2 * C + 1)
        batch = make_batch(jax.random.PRNGKey(0), b=8)
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        state, m = pipe.train_step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(m["sd_loss"]))

    def test_init_state_uses_ar_channels(self):
        pipe = make_pipe("vista", in_ch=2 * C + 1)
        batch = make_batch(jax.random.PRNGKey(0), b=8)
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        assert state is not None


class TestMaskGWM:
    def test_masked_forward_shapes_and_determinism(self):
        model = tiny_model(
            mask_module=dict(decode_layer=2, mask_ratio=0.25,
                             interpolater_layer=1),
        )
        inp = dict(
            sample=jax.random.normal(jax.random.PRNGKey(0),
                                     (B, T, V, H, W, C)),
            timestep=jnp.full((B, T, V), 500.0),
            encoder_hidden_states=jax.random.normal(
                jax.random.PRNGKey(1), (B, T, V, 4, 24)
            ),
            pooled_projections=jax.random.normal(
                jax.random.PRNGKey(2), (B, T, V, 16)
            ),
        )
        params = model.init(
            jax.random.PRNGKey(3), **inp, mask_rng=jax.random.PRNGKey(4)
        )
        out = model.apply(params, **inp, mask_rng=jax.random.PRNGKey(4))
        assert out.shape == (B, T, V, H, W, C)
        assert np.isfinite(np.asarray(out)).all()
        # Without mask_rng the module is bypassed (inference path).
        out2 = model.apply(params, **inp)
        assert out2.shape == (B, T, V, H, W, C)
        # Masked and unmasked paths differ (mask tokens injected).
        assert not np.allclose(np.asarray(out), np.asarray(out2))
