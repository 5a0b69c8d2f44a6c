"""LiDAR VQ stack: Swin encoder/decoder, quantizer, composite model."""

import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu.models.vq_point_cloud import (
    BasicLayer,
    VectorQuantizer,
    VQDecoder,
    VQEncoder,
    VQPointCloud,
    kmeans_revive,
    soft_l1,
    update_code_stats,
)
from opendwm_tpu.ops.voxelize import Voxelizer
import pytest

pytestmark = pytest.mark.slow


IMG = 32  # tiny BEV grid
ZC = 8


def make_encoder():
    return VQEncoder(
        img_size=IMG, patch_size=8, in_chans=ZC, embed_dim=16, num_heads=2,
        depth=6, codebook_dim=12, window_size=4,
    )


def make_decoder():
    return VQDecoder(
        img_size=IMG, patch_size=8, in_chans=ZC, embed_dim=16, num_heads=2,
        depth=4, codebook_dim=12, window_size=4, density_feats=4,
        density_z_ratio=4,
    )


class TestSwin:
    def test_basic_layer_with_downsample(self):
        layer = BasicLayer(
            depth=2, heads=2, window_size=4, input_resolution=(8, 8),
            downsample=True,
        )
        x = jnp.ones((2, 64, 16))
        params = layer.init(jax.random.PRNGKey(0), x)
        out = layer.apply(params, x)
        assert out.shape == (2, 16, 32)  # 2× spatial down, 2× channels


class TestQuantizer:
    def test_roundtrip_and_losses(self):
        vq = VectorQuantizer(n_e=16, e_dim=4, beta=0.25)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4))
        params = vq.init(jax.random.PRNGKey(1), z)
        z_q, (commit, codebook), idx = vq.apply(params, z)
        assert z_q.shape == z.shape and idx.shape == (2, 5)
        assert float(commit) > 0 and float(codebook) > 0
        # straight-through: gradient wrt z is identity-like (nonzero)
        g = jax.grad(
            lambda zz: jnp.sum(vq.apply(params, zz)[0])
        )(z)
        np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-5)

    def test_quantized_equals_nearest_code(self):
        vq = VectorQuantizer(n_e=4, e_dim=2)
        params = {"params": {"embedding": jnp.array(
            [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [5.0, 5.0]]
        )}}
        z = jnp.array([[0.9, 0.1], [4.0, 4.9]])
        z_q, _, idx = vq.apply(params, z)
        np.testing.assert_array_equal(np.asarray(idx), [1, 3])
        np.testing.assert_allclose(
            np.asarray(z_q), [[1.0, 0.0], [5.0, 5.0]], atol=1e-6
        )

    def test_cosine_mode(self):
        vq = VectorQuantizer(n_e=8, e_dim=4, cosine_similarity=True)
        z = jax.random.normal(jax.random.PRNGKey(0), (3, 4))
        params = vq.init(jax.random.PRNGKey(1), z)
        z_q, _, _ = vq.apply(params, z)
        norms = np.linalg.norm(np.asarray(z_q), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_code_stats(self):
        age = jnp.full((8,), 5.0)
        usage = jnp.zeros((8,))
        idx = jnp.array([[0, 0, 3]])
        age2, usage2 = update_code_stats(idx, age, usage, 8)
        assert float(age2[0]) == 0 and float(age2[3]) == 0
        assert float(age2[1]) == 6
        assert float(usage2[0]) == 2 and float(usage2[3]) == 1

    def test_kmeans_revive(self):
        rng = np.random.default_rng(0)
        codebook = rng.standard_normal((8, 4)).astype(np.float32)
        reservoir = np.concatenate([
            rng.standard_normal((40, 4)) * 0.1 + 5,
            rng.standard_normal((40, 4)) * 0.1 - 5,
        ]).astype(np.float32)
        age = np.full((8,), 1000.0)
        age[:2] = 0  # two live codes
        new = kmeans_revive(codebook, reservoir, age, dead_limit=256)
        assert new.shape == codebook.shape
        # revived codes should move toward the reservoir clusters
        dists = np.abs(np.abs(new).mean(-1) - 5)
        assert (dists < 1.5).sum() >= 4


class TestVQEncoderDecoder:
    def test_shapes(self):
        enc, dec = make_encoder(), make_decoder()
        vox = jnp.zeros((2, ZC, IMG, IMG))
        p_enc = enc.init(jax.random.PRNGKey(0), vox)
        tokens = enc.apply(p_enc, vox)
        assert tokens.shape == (2, (IMG // 8) ** 2, 12)
        p_dec = dec.init(jax.random.PRNGKey(1), tokens)
        density, voxel = dec.apply(p_dec, tokens)
        assert voxel.shape == (2, ZC, IMG, IMG)
        assert density.shape == (2, 4, ZC // 4, IMG, IMG)


class TestVQPointCloud:
    def test_forward_losses(self):
        vox = Voxelizer(
            x_min=-8, x_max=8, y_min=-8, y_max=8, step=0.5,
            z_min=-1, z_max=1, z_step=0.25,
        )
        model = VQPointCloud(
            voxelizer=vox,
            vector_quantizer=VectorQuantizer(n_e=16, e_dim=12),
            lidar_encoder=make_encoder(),
            lidar_decoder=make_decoder(),
            ray_stepsize=0.25, ray_max_steps=64,
        )
        key = jax.random.PRNGKey(0)
        points = jax.random.uniform(
            key, (1, 2, 32, 3), minval=-6, maxval=6
        )
        mask = jnp.ones((1, 2, 32), bool)
        params = model.init(jax.random.PRNGKey(1), points, mask)
        out = model.apply(params, points, mask)
        assert out["voxels"].shape == (1, 2, ZC, IMG, IMG)
        assert out["lidar_voxel"].shape == (1, 2, ZC, IMG, IMG)
        for k in ("depth_loss", "sdf_loss"):
            assert np.isfinite(float(out[k])), k
        assert out["indices"].shape == (2, (IMG // 8) ** 2)

    def test_soft_l1_drops_outliers(self):
        pred = jnp.array([0.0] * 19 + [100.0])
        gt = jnp.zeros((20,))
        assert float(soft_l1(pred, gt)) == 0.0
