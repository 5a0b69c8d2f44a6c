"""Streaming CTSD FIFO pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.models.mmdit import DiTCrossviewTemporal
from opendwm_tpu.parallel import MeshSpec, make_mesh
from opendwm_tpu.pipelines.ctsd_streaming import StreamingCTSDPipeline
from opendwm_tpu.schedulers import FlowMatchEulerScheduler

pytestmark = pytest.mark.slow


B, T, V, H, W, C = 1, 3, 2, 8, 8, 16


@pytest.fixture(scope="module")
def pipe_state():
    model = DiTCrossviewTemporal(
        patch_size=2, num_layers=2, attention_head_dim=8,
        num_attention_heads=4, in_channels=C, out_channels=C,
        joint_attention_dim=24, caption_projection_dim=32,
        pooled_projection_dim=16, pos_embed_max_size=16, sample_size=8,
        dual_attention_layers=(), enable_crossview=True,
        crossview_attention_type="rowwise", crossview_block_layers=(0,),
        enable_temporal=True, temporal_attention_type="pointwise",
        temporal_block_layers=(1,),
    )
    pipe = StreamingCTSDPipeline(
        model=model,
        train_scheduler=FlowMatchEulerScheduler(shift=3.0),
        test_scheduler=FlowMatchEulerScheduler(shift=3.0),
        inference_config={"inference_steps": 6, "guidance_scale": 2.0},
        mesh=make_mesh(MeshSpec(dp=8, fsdp=1)),
        sharding_policy="ddp",
    )
    key = jax.random.PRNGKey(0)
    batch = {
        "latents": jax.random.normal(key, (B, T, V, H, W, C)),
        "encoder_hidden_states": jax.random.normal(
            jax.random.fold_in(key, 1), (B, T, V, 4, 24)
        ),
        "pooled_projections": jax.random.normal(
            jax.random.fold_in(key, 2), (B, T, V, 16)
        ),
    }
    state = pipe.init_state(jax.random.PRNGKey(1), batch)
    return pipe, state, batch


def frame_batch(key):
    return {
        "latents": jnp.zeros((B, 1, V, H, W, C)),
        "encoder_hidden_states": jax.random.normal(key, (B, 1, V, 4, 24)),
        "pooled_projections": jax.random.normal(
            jax.random.fold_in(key, 1), (B, 1, V, 16)
        ),
    }


class TestStreaming:
    def test_fifo_loop(self, pipe_state):
        pipe, train_state, batch = pipe_state
        cond_template = {
            "encoder_hidden_states": batch["encoder_hidden_states"],
            "pooled_projections": batch["pooled_projections"],
        }
        s = pipe.reset_streaming(
            (B, T, V, H, W, C), cond_template, jax.random.PRNGKey(5)
        )
        outputs = []
        for i in range(5):
            s = pipe.send_frame_condition(
                s, frame_batch(jax.random.PRNGKey(100 + i))
            )
            s, out, ready = pipe.receive_frame(train_state.params, s)
            outputs.append((np.asarray(out), bool(ready)))
        assert outputs[0][1] is False  # warmup: not ready
        assert outputs[-1][1] is True  # steady state
        for out, _ in outputs:
            assert out.shape == (B, V, H, W, C)
            assert np.isfinite(out).all()
        # consecutive outputs differ (new frames flow through)
        assert not np.allclose(outputs[3][0], outputs[4][0])

    def test_steps_divisibility_assert(self, pipe_state):
        pipe, _, _ = pipe_state
        with pytest.raises(AssertionError):
            pipe.steps_per_inference(4)  # 6 % 4 != 0

    def test_cfg_uncond_uses_provided_text_and_time_ids(self, pipe_state):
        # The CFG unconditional branch must use the batch-provided uncond
        # text embeddings (not zeros) and keep added_time_ids passthrough
        # with only the action ids at -1000 (ADVICE r1; reference
        # get_conditions CFG path).
        pipe, train_state, batch = pipe_state
        cond_template = {
            "encoder_hidden_states": batch["encoder_hidden_states"],
            "pooled_projections": batch["pooled_projections"],
        }
        uncond = {
            "encoder_hidden_states": jax.random.normal(
                jax.random.PRNGKey(77), (B, 1, V, 4, 24)
            ),
        }
        s0 = pipe.reset_streaming(
            (B, T, V, H, W, C), cond_template, jax.random.PRNGKey(5),
            uncond_text=uncond,
        )
        s1 = pipe.reset_streaming(
            (B, T, V, H, W, C), cond_template, jax.random.PRNGKey(5)
        )
        fb = frame_batch(jax.random.PRNGKey(9))
        s0 = pipe.send_frame_condition(s0, fb)
        s1 = pipe.send_frame_condition(s1, fb)
        _, out0, _ = pipe.step_stream(train_state.params, s0)
        _, out1, _ = pipe.step_stream(train_state.params, s1)
        # Different uncond text → different CFG output.
        assert np.abs(np.asarray(out0) - np.asarray(out1)).max() > 1e-6

    def test_sequential_cfg_matches_batched(self, pipe_state):
        # sequential_cfg=True (two b-sized passes) must equal the batched
        # 2b CFG pass exactly — same math, different program shape (the
        # serving-friendly mode on chips where b=1 already saturates MXU).
        pipe, train_state, batch = pipe_state
        seq_pipe = StreamingCTSDPipeline(
            model=pipe.model,
            train_scheduler=pipe.train_scheduler,
            test_scheduler=pipe.test_scheduler,
            inference_config=dict(
                pipe.inference_config, sequential_cfg=True
            ),
            mesh=pipe.mesh,
            sharding_policy="ddp",
        )
        cond_template = {
            "encoder_hidden_states": batch["encoder_hidden_states"],
            "pooled_projections": batch["pooled_projections"],
        }
        s = pipe.reset_streaming(
            (B, T, V, H, W, C), cond_template, jax.random.PRNGKey(5)
        )
        s = pipe.send_frame_condition(s, frame_batch(jax.random.PRNGKey(9)))
        _, out_batched, _ = pipe.step_stream(train_state.params, s)
        _, out_seq, _ = seq_pipe.step_stream(train_state.params, s)
        np.testing.assert_allclose(
            np.asarray(out_seq), np.asarray(out_batched),
            rtol=1e-5, atol=1e-5,
        )

    def test_uncond_text_picked_up_from_frame_batch(self, pipe_state):
        pipe, _, batch = pipe_state
        cond_template = {
            "encoder_hidden_states": batch["encoder_hidden_states"],
        }
        s = pipe.reset_streaming(
            (B, T, V, H, W, C), cond_template, jax.random.PRNGKey(5)
        )
        fb = frame_batch(jax.random.PRNGKey(9))
        fb["uncond_encoder_hidden_states"] = jnp.ones((B, 1, V, 4, 24))
        s = pipe.send_frame_condition(s, fb)
        assert s.uncond_text is not None
        assert "encoder_hidden_states" in s.uncond_text

    def test_text_prompt_interval_holds_text_between_refreshes(self):
        model = DiTCrossviewTemporal(
            patch_size=2, num_layers=1, attention_head_dim=8,
            num_attention_heads=2, in_channels=C, out_channels=C,
            joint_attention_dim=24, caption_projection_dim=16,
            pooled_projection_dim=16, pos_embed_max_size=16, sample_size=8,
            dual_attention_layers=(), enable_crossview=False,
            enable_temporal=False,
        )
        pipe = StreamingCTSDPipeline(
            model=model,
            train_scheduler=FlowMatchEulerScheduler(),
            test_scheduler=FlowMatchEulerScheduler(),
            inference_config={"inference_steps": 6,
                              "text_prompt_interval": 2},
            mesh=make_mesh(MeshSpec(dp=8, fsdp=1)),
            sharding_policy="ddp",
        )
        cond_template = {
            "encoder_hidden_states": jnp.zeros((B, T, V, 4, 24)),
        }
        s = pipe.reset_streaming(
            (B, T, V, H, W, C), cond_template, jax.random.PRNGKey(5)
        )
        # frame 0: refresh (0 % 2 == 0) → new text lands at the tail
        fb0 = frame_batch(jax.random.PRNGKey(1))
        s = pipe.send_frame_condition(s, fb0)
        np.testing.assert_allclose(
            np.asarray(s.conditions["encoder_hidden_states"][:, -1]),
            np.asarray(fb0["encoder_hidden_states"][:, 0]),
        )
        # frame 1: held (1 % 2 != 0) → tail repeats the previous text
        fb1 = frame_batch(jax.random.PRNGKey(2))
        s = pipe.send_frame_condition(s, fb1)
        np.testing.assert_allclose(
            np.asarray(s.conditions["encoder_hidden_states"][:, -1]),
            np.asarray(fb0["encoder_hidden_states"][:, 0]),
        )
        # frame 2: refresh again → new text lands
        fb2 = frame_batch(jax.random.PRNGKey(3))
        s = pipe.send_frame_condition(s, fb2)
        np.testing.assert_allclose(
            np.asarray(s.conditions["encoder_hidden_states"][:, -1]),
            np.asarray(fb2["encoder_hidden_states"][:, 0]),
        )
