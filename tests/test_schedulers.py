"""Scheduler semantics: tensor timesteps, roundtrips, ladder consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    FlowMatchEulerScheduler,
)


class TestDDPM:
    def test_add_noise_per_frame_timesteps(self):
        s = DDPMScheduler(beta_schedule="scaled_linear", beta_start=0.00085,
                          beta_end=0.012)
        x = jnp.ones((2, 3, 2, 4, 4, 1))  # (b, t, v, h, w, c)
        noise = jnp.zeros_like(x)
        t = jnp.array([[[0, 0], [500, 500], [999, 999]]] * 2)  # (b, t, v)
        noisy = s.add_noise(x, noise, t)
        ac = np.asarray(s.alphas_cumprod)
        # Each frame is scaled by its own sqrt(alpha_cumprod).
        np.testing.assert_allclose(
            np.asarray(noisy)[0, :, 0, 0, 0, 0],
            np.sqrt(ac[[0, 500, 999]]),
            rtol=1e-5,
        )

    def test_velocity_roundtrip(self):
        s = DDPMScheduler(prediction_type="v_prediction")
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 3, 8))
        noise = jax.random.normal(jax.random.fold_in(key, 1), (2, 3, 8))
        t = jnp.array([[10, 500, 900]] * 2)
        noisy = s.add_noise(x, noise, t)
        v = s.get_velocity(x, noise, t)
        # x0 reconstruction from v-prediction must invert add_noise.
        x0 = s.pred_original(v, noisy, t)
        np.testing.assert_allclose(np.asarray(x0), np.asarray(x), atol=1e-4)

    def test_ancestral_step_terminal_is_deterministic(self):
        s = DDPMScheduler()
        x = jnp.ones((1, 4))
        eps = jnp.zeros((1, 4))
        out1 = s.step(eps, jnp.array([0]), x, jnp.ones_like(x))
        out2 = s.step(eps, jnp.array([0]), x, -jnp.ones_like(x))
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


class TestDDIM:
    def test_full_denoise_recovers_x0_epsilon(self):
        # If the model perfectly predicts the true noise, DDIM at eta=0 must
        # walk back to x0 (up to float tolerance).
        s = DDIMScheduler(
            beta_schedule="scaled_linear", beta_start=0.00085, beta_end=0.012,
            prediction_type="epsilon", set_alpha_to_one=True,
        )
        key = jax.random.PRNGKey(3)
        x0 = jax.random.normal(key, (1, 8))
        eps = jax.random.normal(jax.random.fold_in(key, 1), (1, 8))
        n_steps = 10
        ts = s.timesteps(n_steps)
        sample = s.add_noise(x0, eps, jnp.asarray(ts[0]))
        for t in ts:
            sample = s.step(eps, jnp.asarray([t]), sample, n_steps)
        np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-3)

    def test_per_frame_timesteps_differ(self):
        s = DDIMScheduler()
        x = jnp.ones((1, 2, 4))
        eps = jnp.zeros((1, 2, 4))
        t = jnp.array([[100, 900]])
        out = s.step(eps, t, x, 10)
        assert not np.allclose(np.asarray(out)[0, 0], np.asarray(out)[0, 1])


class TestFlowMatch:
    def test_sigma_ladder_monotone(self):
        s = FlowMatchEulerScheduler(shift=3.0)
        sig = s.inference_sigmas(28)
        assert sig[0] > sig[-2] > sig[-1] == 0.0
        assert np.all(np.diff(sig) < 0)

    def test_perfect_velocity_one_step_recovers_x0(self):
        s = FlowMatchEulerScheduler(shift=1.0)
        x0 = jnp.arange(8, dtype=jnp.float32).reshape(1, 8)
        noise = jnp.ones_like(x0) * 2.0
        n = 4
        sig = s.inference_sigmas(n)
        sample = (1 - sig[0]) * x0 + sig[0] * noise
        v = noise - x0  # the exact flow-matching velocity
        for i in range(n):
            sample = s.step_by_indices(v, jnp.asarray(i), sample, n)
        np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-5)

    def test_per_frame_indices(self):
        s = FlowMatchEulerScheduler()
        sample = jnp.zeros((1, 3, 4))
        v = jnp.ones_like(sample)
        idx = jnp.array([[0, 1, 2]])
        out = s.step_by_indices(v, idx, sample, 8)
        sig = s.inference_sigmas(8)
        expected = np.stack([(sig[i + 1] - sig[i]) * np.ones(4) for i in range(3)])
        np.testing.assert_allclose(np.asarray(out)[0], expected, rtol=1e-5)

    def test_sigma_ladder_pins_diffusers_0_31_0(self):
        # Hard-coded values from diffusers 0.31.0
        # FlowMatchEulerDiscreteScheduler.set_timesteps (shift=3.0, 1000 train
        # steps): the linspace over shifted train endpoints is shifted AGAIN.
        s = FlowMatchEulerScheduler(shift=3.0, num_train_timesteps=1000)
        np.testing.assert_allclose(
            s.inference_sigmas(5),
            [1.0, 0.9003590941429138, 0.7511211037635803,
             0.5029850602149963, 0.008928571827709675, 0.0],
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            s.inference_sigmas(8),
            [1.0, 0.9475425481796265, 0.8827877640724182,
             0.8008373379707336, 0.6937931180000305, 0.5480455756187439,
             0.33797216415405273, 0.008928571827709675, 0.0],
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            s.inference_timesteps(5),
            [1000.0, 900.3590698242188, 751.12109375,
             502.9850769042969, 8.928571701049805],
            rtol=1e-6,
        )

    def test_logit_normal_sampling_in_range(self):
        s = FlowMatchEulerScheduler()
        idx = s.sample_train_indices(jax.random.PRNGKey(0), (1024,))
        assert int(idx.min()) >= 0 and int(idx.max()) < 1000
        # Logit-normal concentrates mid-ladder.
        assert 300 < float(jnp.mean(idx)) < 700

    def test_add_noise_matches_definition(self):
        s = FlowMatchEulerScheduler()
        x = jnp.ones((2, 2))
        n = jnp.zeros((2, 2))
        out = s.add_noise(x, n, jnp.array([0.25, 0.5]))
        np.testing.assert_allclose(np.asarray(out)[:, 0], [0.75, 0.5], rtol=1e-6)


class TestCarryDtypeInvariant:
    """A bf16 model output must not flip an f32 latent carry.

    Every sampler carries the scheduler's return value through lax.scan
    (ctsd.py, unimlvg.py, ctsd_streaming.py), so step/step_by_indices must
    return `sample.dtype` regardless of model_output.dtype — the streaming
    pipeline hit a scan carry-type error at flagship scale when this broke.
    """

    def test_flow_match_step_by_indices_keeps_sample_dtype(self):
        s = FlowMatchEulerScheduler()
        sample = jnp.ones((2, 3, 4), jnp.float32)
        out = jnp.ones((2, 3, 4), jnp.bfloat16)
        idx = jnp.zeros((2, 3), jnp.int32)
        prev = s.step_by_indices(out, idx, sample, 8)
        assert prev.dtype == jnp.float32

    def test_ddim_step_keeps_sample_dtype(self):
        s = DDIMScheduler()
        sample = jnp.ones((2, 4), jnp.float32)
        out = jnp.ones((2, 4), jnp.bfloat16)
        ts = jnp.full((2,), 100)
        prev = s.step(out, ts, sample, 10)
        assert prev.dtype == jnp.float32

    def test_ddpm_step_keeps_sample_dtype(self):
        s = DDPMScheduler()
        sample = jnp.ones((2, 4), jnp.float32)
        out = jnp.ones((2, 4), jnp.bfloat16)
        ts = jnp.full((2,), 100)
        prev = s.step(out, ts, sample, jnp.zeros_like(sample))
        assert prev.dtype == jnp.float32
