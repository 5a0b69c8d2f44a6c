"""Numeric conversion parity: torch crossview-temporal UNet oracle -> flax.

Closes the round-1 gap "converters never produced a reference-matching
output" for the UNet denoiser (reference
crossview_temporal_unet.py:355-835): a random-init torch oracle with the
exact reference state-dict naming is converted by convert_ctsd_unet and
the flax forward must match the torch forward.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from opendwm_tpu.convert.torch_import import convert_ctsd_unet  # noqa: E402
from opendwm_tpu.models.unet import UNetCrossviewTemporal  # noqa: E402

from torch_oracle_unet import UNetCrossviewTemporalOracle  # noqa: E402

CFG = dict(
    in_channels=8, out_channels=4, block_out_channels=(32, 64),
    layers_per_block=1, num_attention_heads=(2, 4),
    cross_attention_dim=32, addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=24,
)
B, T, V, H, W, CTX = 1, 2, 2, 8, 8, 3


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    m = UNetCrossviewTemporalOracle(**CFG)
    m.eval()
    return m


def make_inputs():
    rng = np.random.default_rng(0)
    return dict(
        sample=rng.standard_normal((B, T, V, H, W, 8), np.float32) * 0.5,
        timestep=rng.uniform(0, 1000, (B, T, V)).astype(np.float32),
        encoder_hidden_states=rng.standard_normal(
            (B, T, V, CTX, 32), np.float32
        ),
        added_time_ids=rng.standard_normal((B, T, V, 3), np.float32),
    )


@pytest.mark.slow
class TestUNetConverterParity:
    def test_forward_matches_torch_oracle(self, oracle):
        sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
        params = convert_ctsd_unet(sd)
        model = UNetCrossviewTemporal(
            **{k: v for k, v in CFG.items() if k != "cross_attention_dim"},
        )
        inp = make_inputs()

        with torch.no_grad():
            t_out = oracle(
                torch.from_numpy(
                    inp["sample"].transpose(0, 1, 2, 5, 3, 4)
                ),
                torch.from_numpy(inp["timestep"]),
                torch.from_numpy(inp["encoder_hidden_states"]),
                torch.from_numpy(inp["added_time_ids"]),
            )
        out = model.apply(
            params,
            sample=jnp.asarray(inp["sample"]),
            timestep=jnp.asarray(inp["timestep"]),
            encoder_hidden_states=jnp.asarray(inp["encoder_hidden_states"]),
            added_time_ids=jnp.asarray(inp["added_time_ids"]),
        )
        np.testing.assert_allclose(
            np.asarray(out),
            t_out.numpy().transpose(0, 1, 2, 4, 5, 3),
            atol=2e-3, rtol=1e-2,
        )

    def test_every_oracle_weight_is_consumed(self, oracle):
        sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
        params = convert_ctsd_unet(sd)
        n_src = sum(v.size for v in sd.values())
        n_dst = sum(p.size for p in jax.tree.leaves(params))
        # converted tree additionally carries zero biases for the torch
        # bias-free attention qkv projections — subtract those.
        n_qkv_bias = sum(
            p.size
            for path, p in jax.tree_util.tree_flatten_with_path(params)[0]
            if "bias" in str(path[-2:]) and any(
                f"/{q}']" in str(path) or f"'{q}'" in str(path)
                for q in ("to_q", "to_k", "to_v")
            )
        )
        assert n_src == n_dst - n_qkv_bias, (n_src, n_dst, n_qkv_bias)
