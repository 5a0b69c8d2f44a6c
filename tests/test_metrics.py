"""Metrics: Fréchet core, Chamfer, histograms/MMD/JSD, voxel IoU."""

import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu.metrics import (
    CustomMeanMetric,
    FrechetDistance,
    PointCloudChamfer,
    PointCloudJSD,
    PointCloudMMD,
    VoxelDiff,
    VoxelIoU,
    chamfer_distance,
    frechet_distance,
    point_cloud_to_histogram,
)


class TestFrechet:
    def test_identical_distributions_near_zero(self):
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((500, 16))
        assert abs(frechet_distance(feats, feats.copy())) < 1e-6

    def test_mean_shift_detected(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((500, 8))
        b = rng.standard_normal((500, 8)) + 2.0
        d = frechet_distance(a, b)
        assert 8 * 3 < d < 8 * 5  # ≈ sum of squared mean shifts = 32

    def test_rank_deficient_needs_shrinkage(self):
        """Fewer samples than feature dims (the weights-drill regime,
        VERDICT r4 weak #6): without shrinkage the clamped eigenvalue
        square roots can cancel a real mean gap; with shrinkage the
        distance is strictly positive for distinct distributions and
        still ~zero for identical ones."""
        rng = np.random.default_rng(2)
        a = rng.standard_normal((6, 64))
        b = rng.standard_normal((6, 64)) + 1.0
        m = FrechetDistance(64, shrinkage=1e-3)
        state = m.update(m.init(), jnp.asarray(a), real=True)
        state = m.update(state, jnp.asarray(b), real=False)
        assert m.compute(state) > 1.0  # mean gap alone is 64
        m2 = FrechetDistance(64, shrinkage=1e-3)
        state2 = m2.update(m2.init(), jnp.asarray(a), real=True)
        state2 = m2.update(state2, jnp.asarray(a.copy()), real=False)
        assert abs(m2.compute(state2)) < 1e-6

    def test_streaming_matches_oneshot(self):
        rng = np.random.default_rng(1)
        real = rng.standard_normal((300, 8)).astype(np.float64)
        fake = (rng.standard_normal((200, 8)) * 1.3 + 0.5).astype(np.float64)
        m = FrechetDistance(8)
        state = m.init()
        for chunk in np.split(real, 3):
            state = m.update(state, jnp.asarray(chunk), real=True)
        for chunk in np.split(fake, 2):
            state = m.update(state, jnp.asarray(chunk), real=False)
        streaming = m.compute(state)
        oneshot = frechet_distance(real, fake)
        np.testing.assert_allclose(streaming, oneshot, rtol=1e-6)


class TestChamfer:
    def test_identical_clouds_zero(self):
        pts = jnp.asarray(
            np.random.default_rng(0).uniform(-10, 10, (100, 3))
        )
        assert float(chamfer_distance(pts, pts)) < 1e-4

    def test_known_offset(self):
        a = jnp.zeros((4, 3))
        b = jnp.ones((4, 3)) * jnp.array([3.0, 0.0, 0.0])
        d = chamfer_distance(a, b)
        np.testing.assert_allclose(float(d), 3.0, rtol=1e-5)

    def test_range_clamp_excludes_outliers(self):
        a = jnp.array([[0.0, 0.0, 0.0], [500.0, 0.0, 0.0]])
        b = jnp.array([[1.0, 0.0, 0.0]])
        d = chamfer_distance(a, b)
        np.testing.assert_allclose(float(d), 1.0, rtol=1e-5)

    def test_metric_accumulator(self):
        m = PointCloudChamfer(inner_dist=30)
        a = jnp.zeros((8, 3))
        m.update(a, a)
        m.update(a + 1e8, a)  # fully out of range → masked, mean over none
        vals = m.compute()
        assert np.isfinite(vals)


class TestHistogramMetrics:
    def test_histogram_counts(self):
        pts = jnp.array([[0.0, 0.0, 0.0], [10.0, -10.0, 1.0],
                         [1000.0, 0.0, 0.0]])
        h = point_cloud_to_histogram(pts, field_size=160.0, bins=100)
        assert float(h.sum()) == 2.0  # the out-of-field point is dropped

    def test_mmd_zero_for_identical(self):
        rng = np.random.default_rng(0)
        pts = [jnp.asarray(rng.uniform(-50, 50, (64, 3))) for _ in range(3)]
        m = PointCloudMMD()
        for p in pts:
            m.update(p, p)
        assert abs(m.compute()) < 1e-9

    def test_jsd_zero_for_identical(self):
        rng = np.random.default_rng(0)
        m = PointCloudJSD()
        pts = jnp.asarray(rng.uniform(-50, 50, (128, 3)))
        m.update(pts, pts)
        assert m.compute() < 1e-9
        m2 = PointCloudJSD()
        m2.update(pts, pts + 40.0)
        assert m2.compute() > 0.5


class TestVoxelMetrics:
    def test_iou(self):
        m = VoxelIoU()
        a = np.zeros((4, 4, 4), bool)
        a[:2] = True
        b = np.zeros((4, 4, 4), bool)
        b[1:3] = True
        m.update(a, b)
        np.testing.assert_allclose(m.compute(), 1 / 3, rtol=1e-6)

    def test_diff(self):
        m = VoxelDiff()
        a = np.zeros((2, 2, 2), bool)
        b = np.ones((2, 2, 2), bool)
        m.update(a, b)
        assert m.compute() == 8.0

    def test_mean_metric_ignores_nan(self):
        m = CustomMeanMetric()
        m.update([1.0, 3.0, np.nan])
        assert m.compute() == 2.0
