"""AutoencoderKL: shapes, scaling semantics, posterior sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.models.autoencoders import AutoencoderKL

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def tiny_vae():
    vae = AutoencoderKL(
        block_out_channels=(8, 16, 16), latent_channels=4,
        use_quant_conv=True,
    )
    x = jnp.zeros((1, 16, 16, 3))
    params = vae.init(jax.random.PRNGKey(0), x)
    return vae, params


class TestVAE:
    def test_encode_decode_shapes(self, tiny_vae):
        vae, params = tiny_vae
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        mean, logvar = vae.apply(params, x, method=vae.encode)
        assert vae.downscale_factor == 4
        assert mean.shape == (2, 4, 4, 4) and logvar.shape == mean.shape
        out = vae.apply(params, mean, method=vae.decode)
        assert out.shape == (2, 16, 16, 3)

    def test_leading_dims_preserved(self, tiny_vae):
        vae, params = tiny_vae
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 2, 16, 16, 3))
        mean, _ = vae.apply(params, x, method=vae.encode)
        assert mean.shape == (2, 3, 2, 4, 4, 4)

    def test_scaled_roundtrip_consistency(self, tiny_vae):
        vae, params = tiny_vae
        vae35 = AutoencoderKL(
            block_out_channels=(8, 16, 16), latent_channels=4,
            use_quant_conv=True, scaling_factor=1.5305, shift_factor=0.0609,
        )
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3))
        lat = vae35.encode_to_scaled(params, x)
        mean, _ = vae.apply(params, x, method=vae.encode)
        np.testing.assert_allclose(
            np.asarray(lat), (np.asarray(mean) - 0.0609) * 1.5305, rtol=1e-5
        )
        dec_a = vae35.decode_from_scaled(params, lat)
        dec_b = vae.apply(params, mean, method=vae.decode)
        np.testing.assert_allclose(
            np.asarray(dec_a), np.asarray(dec_b), atol=1e-4
        )

    def test_posterior_sampling_statistics(self):
        mean = jnp.zeros((1, 4, 4, 2)) + 3.0
        logvar = jnp.zeros((1, 4, 4, 2))
        samples = jnp.stack([
            AutoencoderKL.sample_posterior(
                mean, logvar, jax.random.PRNGKey(i)
            )
            for i in range(200)
        ])
        assert abs(float(samples.mean()) - 3.0) < 0.05
        assert abs(float(samples.std()) - 1.0) < 0.05
