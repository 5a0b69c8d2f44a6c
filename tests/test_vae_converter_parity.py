"""Numeric conversion parity: torch AutoencoderKL oracle -> flax VAE.

Closes the round-1 gap "converters never produced a reference-matching
output" for the image VAE (reference loads diffusers AutoencoderKL at
src/dwm/pipelines/ctsd.py:952-964): a random-init torch oracle with the
exact diffusers state-dict naming is converted by convert_autoencoder_kl
and the flax forward must match the torch forward.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from opendwm_tpu.convert.torch_import import (  # noqa: E402
    convert_autoencoder_kl,
)
from opendwm_tpu.models.autoencoders import AutoencoderKL  # noqa: E402

from torch_oracle_vae import AutoencoderKLOracle  # noqa: E402

CHANS = (32, 64)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    m = AutoencoderKLOracle(chans=CHANS)
    m.eval()
    return m


@pytest.mark.slow
class TestVAEConverterParity:
    def test_forward_matches_torch_oracle(self, oracle):
        sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
        params = convert_autoencoder_kl(sd)
        model = AutoencoderKL(block_out_channels=CHANS, latent_channels=4,
                              use_quant_conv=True)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 16, 16, 3), np.float32) * 0.5

        with torch.no_grad():
            t_recon, t_mean, t_logvar = oracle(
                torch.from_numpy(x.transpose(0, 3, 1, 2))
            )
        recon, mean, logvar = model.apply(params, jnp.asarray(x))

        np.testing.assert_allclose(
            np.asarray(mean),
            t_mean.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(recon),
            t_recon.numpy().transpose(0, 2, 3, 1),
            atol=2e-3, rtol=1e-2,
        )

    def test_every_oracle_weight_is_consumed(self, oracle):
        sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
        params = convert_autoencoder_kl(sd)
        n_src = sum(v.size for v in sd.values())
        n_dst = sum(p.size for p in jax.tree.leaves(params))
        assert n_src == n_dst, (n_src, n_dst)
