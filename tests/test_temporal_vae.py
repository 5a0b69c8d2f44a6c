"""Causal temporal VAE: compression ratios, causality, multi-view folding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.models.temporal_vae import TemporalAutoencoderKL

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def vae_and_params():
    vae = TemporalAutoencoderKL(
        block_out_channels=(8, 16, 16, 32), latent_channels=4,
        layers_per_block=1,
    )
    video = jnp.zeros((1, 5, 32, 32, 3))  # t = 1 + 4*1
    params = vae.init(jax.random.PRNGKey(0), video, method=vae.encode)
    dec_params = vae.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 2, 4, 4, 4)), method=vae.decode
    )
    params = {"params": {**params["params"], **dec_params["params"]}}
    return vae, params


class TestTemporalVAE:
    def test_compression_ratios(self, vae_and_params):
        vae, params = vae_and_params
        video = jax.random.normal(jax.random.PRNGKey(2), (1, 9, 32, 32, 3))
        mean, logvar = vae.apply(params, video, method=vae.encode)
        # t: 1+4k with k=2 → latent 1+k = 3; spatial /8
        assert mean.shape == (1, 3, 4, 4, 4)
        out = vae.apply(params, mean, method=vae.decode)
        assert out.shape == (1, 9, 32, 32, 3)

    def test_causality(self, vae_and_params):
        """Changing a LATE frame must not affect EARLY latent frames."""
        vae, params = vae_and_params
        video = jax.random.normal(jax.random.PRNGKey(3), (1, 9, 32, 32, 3))
        mean1, _ = vae.apply(params, video, method=vae.encode)
        video2 = video.at[:, -1].add(10.0)  # perturb only the last frame
        mean2, _ = vae.apply(params, video2, method=vae.encode)
        np.testing.assert_allclose(
            np.asarray(mean1[:, 0]), np.asarray(mean2[:, 0]), atol=1e-5
        )
        assert not np.allclose(np.asarray(mean1[:, -1]),
                               np.asarray(mean2[:, -1]))

    def test_multiview_scaled_roundtrip_shapes(self, vae_and_params):
        vae, params = vae_and_params
        videos = jax.random.normal(
            jax.random.PRNGKey(4), (1, 5, 2, 32, 32, 3)
        )  # (b, t, v, H, W, 3)
        lat = vae.encode_to_scaled(params, videos)
        assert lat.shape == (1, 2, 2, 4, 4, 4)  # (b, 1+k, v, h, w, c)
        dec = vae.decode_from_scaled(params, lat)
        assert dec.shape == (1, 5, 2, 32, 32, 3)
