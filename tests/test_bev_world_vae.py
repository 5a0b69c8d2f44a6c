"""Joint image+LiDAR BEV world VAE (HoloDrive line)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.models.bev_world_vae import BEVWorldVAE, bilinear_sample
from opendwm_tpu.models.vq_point_cloud import VQDecoder, VQEncoder
from opendwm_tpu.ops.voxelize import Voxelizer

pytestmark = pytest.mark.slow


IMG, ZC, LATENT = 16, 8, 8
B, V = 1, 2


@pytest.fixture(scope="module")
def model_and_inputs():
    vox = Voxelizer(
        x_min=-8, x_max=8, y_min=-8, y_max=8, step=1.0,
        z_min=-1, z_max=1, z_step=0.25,
    )
    model = BEVWorldVAE(
        voxelizer=vox,
        lidar_encoder=VQEncoder(
            img_size=IMG, patch_size=8, in_chans=ZC, embed_dim=8,
            num_heads=2, depth=6, codebook_dim=16, window_size=2,
        ),
        lidar_decoder=VQDecoder(
            img_size=IMG, patch_size=8, in_chans=ZC, embed_dim=8,
            num_heads=2, depth=4, codebook_dim=LATENT, window_size=2,
            density_feats=4,
        ),
        latent_dim=LATENT,
        img_feature_dim=16,
        num_sample_per_pillar=3,
        image_size=(32, 32),
    )
    key = jax.random.PRNGKey(0)
    rot = jnp.asarray([
        [0.0, 0.0, 1.0, 0.0], [-1.0, 0.0, 0.0, 0.0],
        [0.0, -1.0, 0.0, 1.5], [0.0, 0.0, 0.0, 1.0],
    ])
    inputs = dict(
        points=jax.random.uniform(key, (B, 1, 64, 3), minval=-6, maxval=6),
        points_mask=jnp.ones((B, 1, 64), bool),
        images=jax.random.uniform(
            jax.random.fold_in(key, 1), (B, V, 32, 32, 3)
        ),
        camera_transforms=jnp.broadcast_to(rot, (B, V, 4, 4)),
        camera_intrinsics=jnp.broadcast_to(
            jnp.asarray([[20.0, 0, 16], [0, 20, 16], [0, 0, 1]]),
            (B, V, 3, 3),
        ),
        ego_transforms=jnp.broadcast_to(jnp.eye(4), (B, V + 1, 4, 4)),
    )
    return model, inputs


class TestBEVWorldVAE:
    def test_bilinear_sample(self):
        feat = jnp.arange(16.0).reshape(4, 4, 1)
        out = bilinear_sample(feat, jnp.array([[1.5, 1.5]]))
        np.testing.assert_allclose(float(out[0, 0]), (5 + 6 + 9 + 10) / 4)

    def test_forward_shapes_and_losses(self, model_and_inputs):
        model, inputs = model_and_inputs
        params = model.init(jax.random.PRNGKey(1), **inputs)
        out = model.apply(params, **inputs)
        assert out["voxel_logits"].shape == (B, ZC, IMG, IMG)
        assert out["recon_images"].shape == (B, V, 32, 32, 3)
        assert out["mean"].shape == (B, (IMG // 8) ** 2, LATENT)
        assert np.isfinite(float(out["kl_loss"]))
        assert np.isfinite(np.asarray(out["recon_images"])).all()

    def test_image_branch_uses_camera_features(self, model_and_inputs):
        """Changing the images must change the latent (the deformable lift
        pulls camera features into the BEV)."""
        model, inputs = model_and_inputs
        params = model.init(jax.random.PRNGKey(1), **inputs)
        out1 = model.apply(params, **inputs)
        inputs2 = dict(inputs, images=jnp.zeros_like(inputs["images"]))
        out2 = model.apply(params, **inputs2)
        assert not np.allclose(
            np.asarray(out1["mean"]), np.asarray(out2["mean"])
        )

    def test_gradients_flow(self, model_and_inputs):
        model, inputs = model_and_inputs
        params = model.init(jax.random.PRNGKey(1), **inputs)

        def loss(p):
            out = model.apply(p, **inputs)
            return (
                jnp.mean(out["recon_images"] ** 2)
                + jnp.mean(out["voxel_logits"] ** 2)
                + out["kl_loss"]
            )

        g = jax.grad(loss)(params)
        norms = [float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)]
        assert np.isfinite(norms).all()
        assert sum(norms) > 0


class TestPretrainedImgVAE:
    def test_sd_vae_branch_and_param_graft(self, model_and_inputs):
        from opendwm_tpu.models.autoencoders import AutoencoderKL
        from opendwm_tpu.models.bev_world_vae import (
            load_pretrained_img_vae_params,
        )

        base, inputs = model_and_inputs
        vae_cfg = dict(
            block_out_channels=(8, 16), latent_channels=4,
            use_quant_conv=True,
        )
        model = BEVWorldVAE(
            voxelizer=base.voxelizer,
            lidar_encoder=base.lidar_encoder,
            lidar_decoder=base.lidar_decoder,
            latent_dim=LATENT, num_sample_per_pillar=3,
            image_size=(32, 32),
            pretrained_img_vae=vae_cfg,
        )
        params = model.init(jax.random.PRNGKey(1), **inputs)
        assert "img_vae" in params["params"]
        out = model.apply(params, **inputs)
        assert out["recon_images"].shape == (B, V, 32, 32, 3)

        # graft a converted AutoencoderKL's params into the image branch
        vae = AutoencoderKL(**vae_cfg)
        vae_params = vae.init(
            jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3))
        )
        grafted = load_pretrained_img_vae_params(params, vae_params)
        # the image branch must now compute exactly what the VAE computes
        imgs = inputs["images"].reshape(-1, 32, 32, 3)
        want_mean, _ = vae.apply(vae_params, imgs, method=vae.encode)
        got = model.apply(
            grafted, imgs, method=model._encode_images
        )
        np.testing.assert_allclose(
            np.asarray(got[..., :4]), np.asarray(want_mean), atol=1e-6
        )
