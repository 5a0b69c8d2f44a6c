"""Prompt encoding stages with injected tokenizers."""

import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu.models.text_encoders import CLIPTextEncoder, T5TextEncoder
from opendwm_tpu.models.text_stage import (
    CLIPTextStage,
    SD3TextStage,
    WhitespaceTokenizer,
    flatten_descriptions,
)

import pytest

pytestmark = pytest.mark.slow


def make_clip(hidden, proj=None):
    model = CLIPTextEncoder(
        vocab_size=1000, hidden_size=hidden, num_layers=2, num_heads=2,
        act="quick_gelu", eos_token_id=2, projection_dim=proj,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return model, params


class TestTextStage:
    def test_flatten(self):
        desc = [[["a", "b"], ["c", "d"]]]
        assert flatten_descriptions(desc) == ["a", "b", "c", "d"]

    def test_clip_stage(self):
        model, params = make_clip(16)
        stage = CLIPTextStage(
            model, params, WhitespaceTokenizer(), max_length=8
        )
        batch = {"image_description": [[["a car", "a bus"]]]}
        out = stage(batch)
        assert out["encoder_hidden_states"].shape == (1, 1, 2, 8, 16)
        assert out["uncond_encoder_hidden_states"].shape == (1, 1, 2, 8, 16)
        # different prompts → different embeddings
        emb = np.asarray(out["encoder_hidden_states"])
        assert not np.allclose(emb[0, 0, 0], emb[0, 0, 1])

    def test_sd3_stage_with_t5(self):
        clip_l, p_l = make_clip(8, proj=8)
        clip_g, p_g = make_clip(12, proj=12)
        t5 = T5TextEncoder(
            vocab_size=1000, d_model=40, d_kv=4, d_ff=32, num_layers=1,
            num_heads=2,
        )
        p_t5 = t5.init(jax.random.PRNGKey(1), jnp.zeros((1, 6), jnp.int32))
        stage = SD3TextStage(
            clip_l, p_l, WhitespaceTokenizer(),
            clip_g, p_g, WhitespaceTokenizer(),
            t5=t5, t5_params=p_t5, t5_tokenizer=WhitespaceTokenizer(),
            clip_max_length=8, t5_max_length=6, caption_dim=40,
        )
        batch = {"image_description": [[["rainy street"]]]}
        out = stage(batch)
        # tokens: clip (8) + t5 (6) along seq; width = caption_dim
        assert out["encoder_hidden_states"].shape == (1, 1, 1, 14, 40)
        # pooled: concat of both CLIP projections
        assert out["pooled_projections"].shape == (1, 1, 1, 20)
        assert np.isfinite(
            np.asarray(out["encoder_hidden_states"])
        ).all()
