"""CTSD pipeline: sharded train step, condition assembly, samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.models.mmdit import DiTCrossviewTemporal
from opendwm_tpu.parallel import MeshSpec, make_mesh, shard_batch
from opendwm_tpu.pipelines.ctsd import (
    CTSDPipeline,
    get_action_ids,
    get_conditions,
    make_input_for_prediction,
)
from opendwm_tpu.schedulers import DDPMScheduler, FlowMatchEulerScheduler

pytestmark = pytest.mark.slow


B, T, V, H, W, C = 2, 2, 2, 8, 8, 16
L = 4


def tiny_model(**over):
    cfg = dict(
        patch_size=2, num_layers=2, attention_head_dim=8,
        num_attention_heads=4, in_channels=C, out_channels=C,
        joint_attention_dim=24, caption_projection_dim=32,
        pooled_projection_dim=16, pos_embed_max_size=16, sample_size=8,
        dual_attention_layers=(), enable_crossview=True,
        crossview_attention_type="rowwise", crossview_block_layers=(0,),
        enable_temporal=True, temporal_attention_type="pointwise",
        temporal_block_layers=(1,),
    )
    cfg.update(over)
    return DiTCrossviewTemporal(**cfg)


def make_batch(key, b=B):
    ks = jax.random.split(key, 4)
    return {
        "latents": jax.random.normal(ks[0], (b, T, V, H, W, C)),
        "encoder_hidden_states": jax.random.normal(ks[1], (b, T, V, L, 24)),
        "pooled_projections": jax.random.normal(ks[2], (b, T, V, 16)),
        "3dbox_images": jax.random.uniform(ks[3], (b, T, V, H * 8, W * 8, 3)),
    }


def make_pipeline(policy="fsdp", mesh_spec=MeshSpec(dp=2, fsdp=4), **over):
    common = dict(over.pop("common_config", {}))
    training = dict(
        {"text_prompt_condition_ratio": 0.8, "3dbox_condition_ratio": 0.8},
        **over.pop("training_config", {}),
    )
    inference = dict(
        {"inference_steps": 4, "guidance_scale": 3.0},
        **over.pop("inference_config", {}),
    )
    model = tiny_model(
        condition_image_adapter_config=dict(
            in_channels=3, channels=[32, 32], is_downblocks=[True, False],
            num_res_blocks=1, downscale_factor=8, use_zero_convs=True,
        )
    )
    return CTSDPipeline(
        model=model,
        train_scheduler=FlowMatchEulerScheduler(shift=3.0),
        test_scheduler=FlowMatchEulerScheduler(shift=3.0),
        common_config=common,
        training_config=training,
        inference_config=inference,
        optimizer_config={"lr": 1e-3},
        mesh=make_mesh(mesh_spec),
        sharding_policy=policy,
        sharding_min_size=1024,  # tiny test model params
        **over,
    )


class TestTrainStep:
    def test_loss_decreases_and_params_sharded(self):
        pipe = make_pipeline("fsdp")
        batch = make_batch(jax.random.PRNGKey(0), b=8)
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        batch = shard_batch(batch, pipe.mesh)
        losses = []
        for i in range(8):
            state, metrics = pipe.train_step(
                state, batch, jax.random.PRNGKey(100 + i)
            )
            losses.append(float(metrics["sd_loss"]))
        assert np.isfinite(losses).all()
        # Memorizing one fixed batch must reduce loss.
        assert np.mean(losses[-3:]) < np.mean(losses[:3])
        # At least one large param is sharded over fsdp.
        specs = jax.tree.leaves(
            jax.tree.map(
                lambda p: str(p.sharding.spec), state.params,
                is_leaf=lambda x: hasattr(x, "sharding"),
            )
        )
        assert any("fsdp" in s for s in specs)

    def test_ddp_policy_replicates(self):
        pipe = make_pipeline("ddp", MeshSpec(dp=8, fsdp=1))
        batch = make_batch(jax.random.PRNGKey(0), b=8)
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        state, metrics = pipe.train_step(
            state, shard_batch(batch, pipe.mesh), jax.random.PRNGKey(2)
        )
        assert np.isfinite(float(metrics["sd_loss"]))
        specs = jax.tree.leaves(
            jax.tree.map(
                lambda p: p.sharding.spec, state.params,
                is_leaf=lambda x: hasattr(x, "sharding"),
            )
        )
        assert all(len(s) == 0 for s in specs)

    def test_ctsd_prediction_style_trains(self):
        pipe = make_pipeline(
            "fsdp",
            common_config={"frame_prediction_style": "ctsd"},
            training_config={
                "generation_task_ratio": 0.5,
                "image_generation_ratio": 0.3,
                "all_reference_visible_ratio": 0.5,
                "reference_latent_count": 1,
                "disable_reference_frame_loss": True,
            },
        )
        batch = make_batch(jax.random.PRNGKey(0), b=8)
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        state, metrics = pipe.train_step(
            state, shard_batch(batch, pipe.mesh), jax.random.PRNGKey(2)
        )
        assert np.isfinite(float(metrics["sd_loss"]))


class TestMakeInputForPrediction:
    def test_ctsd_reference_frames_are_clean_at_t0(self):
        rng = jax.random.PRNGKey(0)
        lat = jax.random.normal(jax.random.fold_in(rng, 1), (4, 3, 2, 4, 4, 8))
        noisy = jnp.zeros_like(lat)
        ts = jnp.full((4, 3, 2), 500.0)
        made, made_t, extra, ref = make_input_for_prediction(
            rng, noisy, lat, ts,
            {"all_reference_visible_ratio": 1.0, "reference_latent_count": 2},
            {"frame_prediction_style": "ctsd"},
            reference_latent_count=2,
        )
        ref = np.asarray(ref)
        # No reference frames beyond the first 2.
        assert not ref[:, 2:].any()
        # Where indicated: input == clean latents, timestep == 0.
        np.testing.assert_allclose(
            np.asarray(made)[ref], np.asarray(lat)[ref]
        )
        assert (np.asarray(made_t)[ref] == 0).all()
        assert (np.asarray(made_t)[~ref] == 500).all()

    def test_passthrough_without_style(self):
        rng = jax.random.PRNGKey(0)
        x = jnp.ones((2, 2, 2, 4, 4, 8))
        ts = jnp.ones((2, 2, 2))
        made, made_t, extra, ref = make_input_for_prediction(
            rng, x, x * 2, ts, {}, {}, 0
        )
        np.testing.assert_array_equal(np.asarray(made), np.asarray(x))
        assert not np.asarray(ref).any()


class TestConditions:
    def test_text_dropout_uses_uncond(self):
        batch = make_batch(jax.random.PRNGKey(0))
        mask = jnp.array([True, False])
        conds = get_conditions(batch, {}, text_condition_mask=mask)
        emb = np.asarray(conds["encoder_hidden_states"])
        np.testing.assert_array_equal(emb[1], 0)
        assert np.abs(emb[0]).sum() > 0

    def test_cfg_duplicates_batch(self):
        batch = make_batch(jax.random.PRNGKey(0))
        conds = get_conditions(batch, {}, do_classifier_free_guidance=True)
        assert conds["encoder_hidden_states"].shape[0] == 2 * B
        assert conds["condition_image_tensor"].shape[0] == 2 * B
        # First half is unconditional.
        np.testing.assert_array_equal(
            np.asarray(conds["encoder_hidden_states"])[:B], 0
        )

    def test_added_time_ids_shape(self):
        b = 2
        batch = {
            "fps": jnp.full((b,), 12.0),
            "camera_intrinsics": jnp.broadcast_to(
                jnp.eye(3) * 500, (b, T, V, 3, 3)
            ),
            "camera_transforms": jnp.broadcast_to(
                jnp.eye(4), (b, T, V, 4, 4)
            ),
            "image_size": jnp.full((b, T, V, 2), 448.0),
            "latents": jnp.zeros((b, T, V, H, W, C)),
        }
        cc = {
            "added_time_ids": "fps_camera_transforms",
            "camera_intrinsic_embedding_indices": [0, 4, 2, 5],
            "camera_intrinsic_denom_embedding_indices": [0, 1, 0, 1],
            "camera_transform_embedding_indices": [3, 7, 11, 0, 1, 2],
        }
        conds = get_conditions(batch, cc)
        assert conds["added_time_ids"].shape == (b, T, V, 11)

    def test_action_ids_identity_pose_unconditioned(self):
        b = 2
        batch = {
            "ego_transforms": jnp.broadcast_to(jnp.eye(4), (b, T, 3, 4, 4)),
            "fps": jnp.full((b,), 12.0),
        }
        ids = get_action_ids(batch, {"camera_ego_sensor_indices": [0]}, None)
        np.testing.assert_array_equal(np.asarray(ids), -1000.0)


class TestInference:
    @pytest.fixture(scope="class")
    def pipe_state(self):
        pipe = make_pipeline("fsdp")
        batch = make_batch(jax.random.PRNGKey(0))
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        return pipe, state, batch

    def test_full_sequence_cfg(self, pipe_state):
        pipe, state, batch = pipe_state
        lat = pipe.inference_pipeline(
            state.params, batch, (B, T, V, H, W, C), jax.random.PRNGKey(7)
        )
        assert lat.shape == (B, T, V, H, W, C)
        assert np.isfinite(np.asarray(lat)).all()

    def test_reference_frame_injection_keeps_reference(self, pipe_state):
        pipe, state, batch = pipe_state
        ref = jax.random.normal(jax.random.PRNGKey(8), (B, T, V, H, W, C))
        lat = pipe.inference_pipeline(
            state.params, batch, (B, T, V, H, W, C), jax.random.PRNGKey(9),
            image_latents=ref, reference_frame_count=1,
        )
        np.testing.assert_allclose(
            np.asarray(lat)[:, 0], np.asarray(ref)[:, 0]
        )
        assert not np.allclose(np.asarray(lat)[:, 1], np.asarray(ref)[:, 1])

    def test_diffusion_forcing_mode(self):
        pipe = make_pipeline(
            "fsdp",
            common_config={"frame_prediction_style": "diffusion_forcing"},
            inference_config={"inference_steps": 2 * T, "guidance_scale": 2.0},
        )
        batch = make_batch(jax.random.PRNGKey(0))
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        lat = pipe.inference_pipeline(
            state.params, batch, (B, T, V, H, W, C), jax.random.PRNGKey(2)
        )
        assert lat.shape == (B, T, V, H, W, C)
        assert np.isfinite(np.asarray(lat)).all()

    def test_autoregressive_rollout_length(self, pipe_state):
        pipe, state, batch = pipe_state
        total = 4  # two windows of T=2 with 1 reference frame
        lat = pipe.autoregressive_inference_pipeline(
            state.params, batch, (B, T, V, H, W, C), jax.random.PRNGKey(3),
            total_frames=total, reference_frame_count=1,
        )
        assert lat.shape == (B, total, V, H, W, C)
        assert np.isfinite(np.asarray(lat)).all()

    def test_autoregressive_rollout_slices_conditions_per_window(
        self, pipe_state
    ):
        # Conditions carry the FULL horizon; later windows must consume
        # their own absolute-frame slice (reference ctsd.py:1726-1801),
        # so changing window-2 conditions must change only later latents.
        pipe, state, _ = pipe_state
        total = 6  # windows at frames [0,2), [1,3), ... with stride 1
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        long_batch = {
            "latents": jax.random.normal(ks[0], (B, T, V, H, W, C)),
            "encoder_hidden_states": jax.random.normal(
                ks[1], (B, total, V, L, 24)
            ),
            "pooled_projections": jax.random.normal(ks[2], (B, total, V, 16)),
            "3dbox_images": jax.random.uniform(
                ks[3], (B, total, V, H * 8, W * 8, 3)
            ),
        }
        lat_a = pipe.autoregressive_inference_pipeline(
            state.params, long_batch, (B, T, V, H, W, C),
            jax.random.PRNGKey(3), total_frames=total,
            reference_frame_count=1,
        )
        # Perturb only the tail-frame conditions.
        mod = dict(long_batch)
        mod["encoder_hidden_states"] = (
            long_batch["encoder_hidden_states"]
            .at[:, -2:].set(
                jax.random.normal(jax.random.PRNGKey(42), (B, 2, V, L, 24))
            )
        )
        lat_b = pipe.autoregressive_inference_pipeline(
            state.params, mod, (B, T, V, H, W, C),
            jax.random.PRNGKey(3), total_frames=total,
            reference_frame_count=1,
        )
        a, b_ = np.asarray(lat_a), np.asarray(lat_b)
        # Early frames (windows untouched by the perturbation) identical...
        np.testing.assert_allclose(a[:, :3], b_[:, :3], atol=1e-5)
        # ...later frames respond to their own window's conditions.
        assert np.abs(a[:, -1] - b_[:, -1]).max() > 1e-4
