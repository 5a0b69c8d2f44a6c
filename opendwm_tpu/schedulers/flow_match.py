"""Flow-matching Euler scheduler with per-frame sigma *indices*.

SD3-style rectified flow: x_sigma = (1-sigma) x0 + sigma eps, model predicts
the velocity (eps - x0). The reference adds ``step_by_indices`` so diffusion
forcing can advance each frame along its own point of the sigma ladder
(src/dwm/schedulers/temporal_independent.py:173-197); here that is a gather,
and the whole denoise loop is a `lax.scan`.

Also carries the training-time logit-normal timestep density used by SD3
(reference src/dwm/pipelines/ctsd.py:1255-1272).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu.config import register


@register(
    "FlowMatchEulerScheduler",
    aliases=(
        "dwm.schedulers.temporal_independent.FlowMatchEulerDiscreteScheduler",
        "diffusers.FlowMatchEulerDiscreteScheduler",
    ),
)
@dataclasses.dataclass(frozen=True)
class FlowMatchEulerScheduler:
    num_train_timesteps: int = 1000
    shift: float = 3.0

    def _shift_sigma(self, sigma):
        return self.shift * sigma / (1 + (self.shift - 1) * sigma)

    @property
    def train_sigmas(self) -> np.ndarray:
        """Descending per-train-timestep sigmas (index 0 = most noised)."""
        ts = np.arange(1, self.num_train_timesteps + 1, dtype=np.float64)[::-1]
        sigmas = ts / self.num_train_timesteps
        return np.asarray(self._shift_sigma(sigmas), dtype=np.float32)

    def inference_sigmas(self, num_inference_steps: int) -> np.ndarray:
        """Sigma ladder for sampling, with the trailing 0 appended.

        Matches diffusers 0.31.0 ``FlowMatchEulerDiscreteScheduler.set_timesteps``
        (pinned by the reference): the linspace runs over the *shifted* train
        endpoints and the shift transform is applied AGAIN to the result —
        i.e. the shift is deliberately double-applied at inference time.
        """
        train = self.train_sigmas.astype(np.float64)
        sigmas = self._shift_sigma(
            np.linspace(train[0], train[-1], num_inference_steps)
        )
        return np.concatenate([sigmas, [0.0]]).astype(np.float32)

    def inference_timesteps(self, num_inference_steps: int) -> np.ndarray:
        return (
            self.inference_sigmas(num_inference_steps)[:-1]
            * self.num_train_timesteps
        )

    # -- training ------------------------------------------------------------

    def sample_train_indices(
        self, key: jax.Array, shape, logit_mean=0.0, logit_std=1.0,
        weighting_scheme: str = "logit_normal",
    ):
        """Draw sigma ladder indices via SD3's logit-normal density."""
        if weighting_scheme == "logit_normal":
            u = jax.nn.sigmoid(
                logit_mean + logit_std * jax.random.normal(key, shape)
            )
        elif weighting_scheme == "uniform":
            u = jax.random.uniform(key, shape)
        else:
            raise ValueError(weighting_scheme)
        idx = (u * self.num_train_timesteps).astype(jnp.int32)
        return jnp.clip(idx, 0, self.num_train_timesteps - 1)

    def sigmas_at(self, indices):
        return jnp.asarray(self.train_sigmas)[indices]

    def timesteps_at(self, indices):
        return self.sigmas_at(indices) * self.num_train_timesteps

    def add_noise(self, original, noise, sigmas):
        while sigmas.ndim < original.ndim:
            sigmas = sigmas[..., None]
        sigmas = sigmas.astype(original.dtype)
        return (1.0 - sigmas) * original + sigmas * noise

    def training_target(self, original, noise):
        return noise - original

    # -- sampling --------------------------------------------------------------

    def step_by_indices(
        self, model_output, step_indices, sample, num_inference_steps: int
    ):
        """Euler update with per-element positions on the inference ladder."""
        sigmas = jnp.asarray(self.inference_sigmas(num_inference_steps))
        idx = jnp.asarray(step_indices)
        while idx.ndim < sample.ndim:
            idx = idx[..., None]
        sigma = sigmas[idx]
        sigma_next = sigmas[idx + 1]
        prev = sample.astype(jnp.float32) + (sigma_next - sigma) * \
            model_output.astype(jnp.float32)
        # Preserve the *sample* dtype: every caller carries the returned
        # latents through a lax.scan, so the carry invariant belongs to
        # `sample` (a bf16 model output must not flip an f32 latent carry).
        return prev.astype(sample.dtype)
