"""Copilot4D ray error metrics."""

import jax.numpy as jnp
import numpy as np

from opendwm_tpu.metrics.ray_metrics import (
    compute_ray_errors,
    spherical_projection,
)


class TestRayMetrics:
    def test_spherical(self):
        pts = jnp.array([[0.0, 5.0, 0.0]])
        az, el, d = spherical_projection(pts)
        assert float(az[0]) == 0 and float(el[0]) == 0 and float(d[0]) == 5

    def test_identical_clouds_zero_error(self):
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(1, 30, (64, 3)))
        origin = jnp.zeros(3)
        l1, absrel, l1_med, absrel_med = compute_ray_errors(
            pts, pts, origin
        )
        assert float(l1) < 1e-4 and float(absrel) < 1e-5
        assert float(l1_med) < 1e-4

    def test_scaled_depth_error(self):
        rng = np.random.default_rng(1)
        gt = jnp.asarray(np.stack([
            rng.uniform(5, 20, 64), rng.uniform(5, 20, 64),
            rng.uniform(-3, 3, 64),  # z stays inside the ±4.5 m eval range
        ], -1))
        pred = gt * 1.05  # same rays, 5% deeper (stays in range after scale)
        l1, absrel, _, absrel_med = compute_ray_errors(
            pred, gt, jnp.zeros(3)
        )
        np.testing.assert_allclose(float(absrel), 0.05, rtol=0.05)
        np.testing.assert_allclose(float(absrel_med), 0.05, rtol=0.05)
