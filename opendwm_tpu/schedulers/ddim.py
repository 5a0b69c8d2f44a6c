"""DDIM sampler accepting per-element timestep tensors.

Full functional re-derivation of the reference's tensor-timestep DDIM step
(src/dwm/schedulers/temporal_independent.py:48-170): diffusion forcing gives
each frame its own timestep, so every table lookup is a gather broadcast over
the sample shape. Deterministic (eta=0) by default; eta>0 takes explicit
noise (functional RNG).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from opendwm_tpu.config import register
from opendwm_tpu.schedulers.ddpm import DDPMScheduler, _expand


@register(
    "DDIMScheduler",
    aliases=(
        "dwm.schedulers.temporal_independent.DDIMScheduler",
        "diffusers.DDIMScheduler",
    ),
)
@dataclasses.dataclass(frozen=True)
class DDIMScheduler(DDPMScheduler):
    set_alpha_to_one: bool = False
    clip_sample: bool = False

    @property
    def final_alpha_cumprod(self):
        return (
            jnp.asarray(1.0, jnp.float32)
            if self.set_alpha_to_one
            else self.alphas_cumprod[0]
        )

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending inference timesteps (leading spacing + offset)."""
        step = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * step).round()[::-1]
        return (ts + self.steps_offset).astype(np.int32)

    def step(
        self,
        model_output,
        timesteps,
        sample,
        num_inference_steps: int,
        eta: float = 0.0,
        noise=None,
    ):
        t = _expand(jnp.asarray(timesteps), sample)
        step_size = self.num_train_timesteps // num_inference_steps
        prev_t = t - step_size

        ac_t = self.alphas_cumprod[t].astype(jnp.float32)
        ac_prev = jnp.where(
            prev_t >= 0,
            self.alphas_cumprod[jnp.maximum(prev_t, 0)].astype(jnp.float32),
            self.final_alpha_cumprod,
        )
        beta_t = 1 - ac_t

        sample32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            x0 = (sample32 - beta_t**0.5 * out32) / ac_t**0.5
            eps = out32
        elif self.prediction_type == "sample":
            x0 = out32
            eps = (sample32 - ac_t**0.5 * x0) / beta_t**0.5
        elif self.prediction_type == "v_prediction":
            x0 = ac_t**0.5 * sample32 - beta_t**0.5 * out32
            eps = ac_t**0.5 * out32 + beta_t**0.5 * sample32
        else:
            raise ValueError(self.prediction_type)

        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)

        variance = (1 - ac_prev) / beta_t * (1 - ac_t / ac_prev)
        std_dev = eta * variance**0.5
        direction = (1 - ac_prev - std_dev**2) ** 0.5 * eps
        prev_sample = ac_prev**0.5 * x0 + direction
        if eta > 0:
            assert noise is not None, "eta > 0 requires explicit noise"
            prev_sample = prev_sample + std_dev * noise.astype(jnp.float32)
        # sample dtype, not model_output dtype: callers carry the result
        # through lax.scan, so the carry invariant belongs to `sample`.
        return prev_sample.astype(sample.dtype)
