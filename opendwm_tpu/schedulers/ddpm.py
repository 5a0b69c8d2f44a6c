"""DDPM noise schedule with per-element (b, t, v) timestep tensors.

The reference extends diffusers' DDPMScheduler so ``add_noise`` /
``get_velocity`` broadcast per-(batch, frame, view) timesteps — required by
diffusion forcing where every frame sits at its own noise level
(reference src/dwm/schedulers/temporal_independent.py:6-45).

Here schedulers are frozen dataclasses of precomputed tables with pure
methods: they close over constants, so `lax.scan` denoising loops compile to
a single fused program with gathers for the per-frame indices.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu.config import register


def make_beta_schedule(
    schedule: str, num_timesteps: int, beta_start: float, beta_end: float
) -> np.ndarray:
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)
    if schedule == "scaled_linear":
        return (
            np.linspace(
                beta_start**0.5, beta_end**0.5, num_timesteps, dtype=np.float64
            )
            ** 2
        )
    if schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = [
            min(1 - alpha_bar((i + 1) / num_timesteps) / alpha_bar(i / num_timesteps), 0.999)
            for i in range(num_timesteps)
        ]
        return np.array(betas, dtype=np.float64)
    raise ValueError(f"Unknown beta schedule {schedule!r}")


def _expand(timesteps: jax.Array, like: jax.Array) -> jax.Array:
    """Right-pad timestep dims so tables gather-broadcast over ``like``."""
    while timesteps.ndim < like.ndim:
        timesteps = timesteps[..., None]
    return timesteps


@register(
    "DDPMScheduler",
    aliases=(
        "dwm.schedulers.temporal_independent.DDPMScheduler",
        "diffusers.DDPMScheduler",
    ),
)
@dataclasses.dataclass(frozen=True)
class DDPMScheduler:
    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    prediction_type: str = "epsilon"  # epsilon | v_prediction | sample
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    variance_type: str = "fixed_small"
    timestep_spacing: str = "leading"
    steps_offset: int = 0

    def __post_init__(self):
        betas = make_beta_schedule(
            self.beta_schedule, self.num_train_timesteps, self.beta_start,
            self.beta_end,
        )
        alphas_cumprod = np.cumprod(1.0 - betas)
        object.__setattr__(
            self, "alphas_cumprod", jnp.asarray(alphas_cumprod, jnp.float32)
        )
        object.__setattr__(self, "betas", jnp.asarray(betas, jnp.float32))

    # -- training ----------------------------------------------------------

    def add_noise(self, original, noise, timesteps):
        t = _expand(timesteps, original)
        ac = self.alphas_cumprod[t].astype(original.dtype)
        return ac**0.5 * original + (1 - ac) ** 0.5 * noise

    def get_velocity(self, sample, noise, timesteps):
        t = _expand(timesteps, sample)
        ac = self.alphas_cumprod[t].astype(sample.dtype)
        return ac**0.5 * noise - (1 - ac) ** 0.5 * sample

    def pred_original(self, model_output, sample, timesteps):
        """Recover x0 from the model output under this prediction type."""
        t = _expand(timesteps, sample)
        ac = self.alphas_cumprod[t].astype(jnp.float32)
        sample = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            return (sample - (1 - ac) ** 0.5 * model_output) / ac**0.5
        if self.prediction_type == "sample":
            return model_output
        if self.prediction_type == "v_prediction":
            return ac**0.5 * sample - (1 - ac) ** 0.5 * model_output
        raise ValueError(self.prediction_type)

    def training_target(self, original, noise, timesteps):
        if self.prediction_type == "epsilon":
            return noise
        if self.prediction_type == "sample":
            return original
        if self.prediction_type == "v_prediction":
            return self.get_velocity(original, noise, timesteps)
        raise ValueError(self.prediction_type)

    # -- ancestral sampling --------------------------------------------------

    def step(self, model_output, timesteps, sample, noise):
        """One ancestral DDPM step at (possibly per-element) ``timesteps``.

        ``noise`` must be supplied (functional RNG); it is masked out at t==0.
        """
        t = _expand(timesteps, sample)
        ac_t = self.alphas_cumprod[t].astype(jnp.float32)
        prev_t = jnp.maximum(t - 1, 0)
        ac_prev = jnp.where(
            t > 0, self.alphas_cumprod[prev_t].astype(jnp.float32), 1.0
        )
        alpha_t = ac_t / ac_prev
        beta_t = 1 - alpha_t

        x0 = self.pred_original(model_output, sample, timesteps)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)

        coef_x0 = ac_prev**0.5 * beta_t / (1 - ac_t)
        coef_xt = alpha_t**0.5 * (1 - ac_prev) / (1 - ac_t)
        mean = coef_x0 * x0 + coef_xt * sample.astype(jnp.float32)

        var = jnp.clip((1 - ac_prev) / (1 - ac_t) * beta_t, 1e-20)
        std = jnp.where(t > 0, var**0.5, 0.0)
        # sample dtype, not model_output dtype: callers carry the result
        # through lax.scan, so the carry invariant belongs to `sample`.
        return (mean + std * noise.astype(jnp.float32)).astype(
            sample.dtype
        )
