"""Crossview-temporal UNet: shapes, conditioning, disable flags."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.models.unet import UNetCrossviewTemporal

pytestmark = pytest.mark.slow


B, T, V, H, W = 1, 2, 2, 16, 16


def tiny_unet(**over):
    cfg = dict(
        in_channels=4, out_channels=4,
        block_out_channels=(8, 16, 16),
        layers_per_block=1, transformer_layers_per_block=1,
        num_attention_heads=(2, 2, 2),
        cross_attention_dim=12,
        projection_class_embeddings_input_dim=768,
        enable_crossview=True, enable_temporal=True,
    )
    cfg.update(over)
    return UNetCrossviewTemporal(**cfg)


def make_inputs(key, b=B):
    ks = jax.random.split(key, 3)
    return dict(
        sample=jax.random.normal(ks[0], (b, T, V, H, W, 4)),
        timestep=jnp.full((b, T, V), 500.0),
        encoder_hidden_states=jax.random.normal(ks[1], (b, T, V, 5, 12)),
        added_time_ids=jax.random.normal(ks[2], (b, T, V, 3)),
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_unet()
    inp = make_inputs(jax.random.PRNGKey(1))
    params = model.init(jax.random.PRNGKey(0), **inp)
    return model, params


class TestUNet:
    def test_output_shape(self, model_and_params):
        model, params = model_and_params
        out = model.apply(params, **make_inputs(jax.random.PRNGKey(1)))
        assert out.shape == (B, T, V, H, W, 4)
        assert np.isfinite(np.asarray(out)).all()

    def test_jit(self, model_and_params):
        model, params = model_and_params
        out = jax.jit(lambda p, kw: model.apply(p, **kw))(
            params, make_inputs(jax.random.PRNGKey(2))
        )
        assert out.shape == (B, T, V, H, W, 4)

    def test_disable_flags(self, model_and_params):
        model, params = model_and_params
        inp = make_inputs(jax.random.PRNGKey(3), b=2)
        mixed = jnp.array([True, False])
        out_mixed = model.apply(
            params, **inp, disable_crossview=mixed, disable_temporal=mixed
        )
        out_all = model.apply(
            params, **inp,
            disable_crossview=jnp.array([True, True]),
            disable_temporal=jnp.array([True, True]),
        )
        np.testing.assert_allclose(
            np.asarray(out_mixed)[0], np.asarray(out_all)[0], atol=1e-5
        )
        assert not np.allclose(np.asarray(out_mixed)[1], np.asarray(out_all)[1])

    def test_rowwise_variants(self):
        model = tiny_unet(
            enable_rowwise_crossview=True, enable_rowwise_temporal=True
        )
        inp = make_inputs(jax.random.PRNGKey(4))
        params = model.init(jax.random.PRNGKey(0), **inp)
        out = model.apply(params, **inp)
        assert out.shape == (B, T, V, H, W, 4)

    def test_adapter_conditioning(self):
        model = tiny_unet(
            condition_image_adapter_config=dict(
                in_channels=6, channels=[8, 8, 16, 16],
                is_downblocks=[False, True, True, False],
                num_res_blocks=1, downscale_factor=8,
            )
        )
        inp = make_inputs(jax.random.PRNGKey(5))
        cond = jax.random.uniform(
            jax.random.PRNGKey(6), (B, T, V, H * 8, W * 8, 6)
        )
        params = model.init(
            jax.random.PRNGKey(0), **inp, condition_image_tensor=cond
        )
        out1 = model.apply(params, **inp, condition_image_tensor=cond)
        out2 = model.apply(
            params, **inp, condition_image_tensor=jnp.zeros_like(cond)
        )
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_single_view(self, model_and_params):
        model, params = model_and_params
        inp = make_inputs(jax.random.PRNGKey(7))
        out = model.apply(
            params,
            sample=inp["sample"][:, :, 0],
            timestep=inp["timestep"][:, :, 0],
            encoder_hidden_states=inp["encoder_hidden_states"][:, :, 0],
            added_time_ids=inp["added_time_ids"][:, :, 0],
        )
        assert out.shape == (B, T, H, W, 4)
