"""Numerical parity of flax text encoders vs HuggingFace torch (CPU oracle).

These are the checkpoint-ingestion anchors: if tiny random HF models convert
and match, full SD checkpoints convert identically (same op semantics, just
bigger shapes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from opendwm_tpu.convert.torch_import import (  # noqa: E402
    convert_clip_text,
    convert_t5_encoder,
)
from opendwm_tpu.models.text_encoders import (  # noqa: E402
    CLIPTextEncoder,
    T5TextEncoder,
)

pytestmark = pytest.mark.slow


class TestCLIPParity:
    @pytest.mark.parametrize("act,proj", [("quick_gelu", None),
                                          ("gelu", 32)])
    def test_matches_hf(self, act, proj):
        cfg = transformers.CLIPTextConfig(
            vocab_size=99, hidden_size=16, intermediate_size=37,
            num_hidden_layers=3, num_attention_heads=4,
            max_position_embeddings=77, hidden_act=act,
            eos_token_id=2, bos_token_id=0, pad_token_id=1,
            projection_dim=proj or 16,
        )
        torch.manual_seed(0)
        if proj:
            hf = transformers.CLIPTextModelWithProjection(cfg).eval()
        else:
            hf = transformers.CLIPTextModel(cfg).eval()

        ids = torch.tensor([[0, 5, 9, 42, 2, 1, 1, 1],
                            [0, 7, 2, 1, 1, 1, 1, 1]])
        with torch.no_grad():
            out = hf(ids, output_hidden_states=True)

        model = CLIPTextEncoder(
            vocab_size=99, hidden_size=16, num_layers=3, num_heads=4,
            intermediate_size=37, act=act, eos_token_id=2,
            projection_dim=proj,
        )
        params = convert_clip_text(
            {k: v.numpy() for k, v in hf.state_dict().items()}
        )
        last, pooled, hidden = model.apply(params, jnp.asarray(ids.numpy()))

        np.testing.assert_allclose(
            np.asarray(last), out.last_hidden_state.numpy(),
            atol=2e-5, rtol=1e-4,
        )
        # Penultimate hidden state (what SD3 consumes).
        np.testing.assert_allclose(
            np.asarray(hidden[-2]), out.hidden_states[-2].numpy(),
            atol=2e-5, rtol=1e-4,
        )
        hf_pooled = (
            out.text_embeds if proj else out.pooler_output
        ).numpy()
        np.testing.assert_allclose(
            np.asarray(pooled), hf_pooled, atol=2e-5, rtol=1e-4
        )


class TestT5Parity:
    def test_matches_hf(self):
        cfg = transformers.T5Config(
            vocab_size=99, d_model=16, d_kv=4, d_ff=37, num_layers=3,
            num_heads=4, feed_forward_proj="gated-gelu", is_encoder_decoder=False,
        )
        torch.manual_seed(0)
        hf = transformers.T5EncoderModel(cfg).eval()
        ids = torch.tensor([[3, 5, 9, 42, 7, 1],
                            [8, 7, 1, 1, 1, 1]])
        with torch.no_grad():
            out = hf(ids).last_hidden_state

        model = T5TextEncoder(
            vocab_size=99, d_model=16, d_kv=4, d_ff=37, num_layers=3,
            num_heads=4,
        )
        params = convert_t5_encoder(
            {k: v.numpy() for k, v in hf.state_dict().items()}
        )
        got = model.apply(params, jnp.asarray(ids.numpy()))
        np.testing.assert_allclose(
            np.asarray(got), out.numpy(), atol=2e-5, rtol=1e-4
        )
