"""LiDAR KL-VAE over BEV features (reference src/dwm/models/vae_point_cloud.py).

Same Swin encoder/decoder family as the VQ tokenizer, but with a Gaussian
latent instead of a codebook: encoder emits (mean, logvar) over the token
grid (reference PointCloudEncoder :10-78 + VariationalModel :353-380),
decoder mirrors VQDecoder with the density render grid
(PointCloudDecoder :79-352). Used by the LidarVAE pipeline and as the
continuous autoencoder for LiDAR latent diffusion.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from opendwm_tpu.config import register
from opendwm_tpu.models.vq_point_cloud import VQDecoder, VQEncoder
from opendwm_tpu.ops.voxelize import Voxelizer


@register(
    "VAEPointCloud",
    aliases=(
        "dwm.models.vae_point_cloud.VAEPointCloud",
        "dwm.models.lidar_vae_model.VAEPointCloud",
    ),
)
class VAEPointCloud(nn.Module):
    voxelizer: Voxelizer
    lidar_encoder: VQEncoder  # codebook_dim = 2 * latent_dim (moments)
    lidar_decoder: VQDecoder  # codebook_dim = latent_dim
    latent_dim: int = 64
    bias_init: float = -5.0
    ray_stepsize: float = 0.05
    ray_max_steps: int = 512

    def setup(self):
        self.density_mlp_1 = nn.Dense(32, name="density_mlp_1")
        self.density_mlp_2 = nn.Dense(
            1, bias_init=nn.initializers.constant(self.bias_init),
            name="density_mlp_2",
        )

    def density_mlp(self, feats):
        return self.density_mlp_2(nn.relu(self.density_mlp_1(feats)))[..., 0]

    def encode_lidar(self, points, points_mask):
        voxels = self.voxelizer(points, points_mask)
        feats = self.lidar_encoder(voxels.reshape((-1,) + voxels.shape[2:]))
        mean, logvar = jnp.split(feats, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return voxels, mean, logvar

    @staticmethod
    def sample(mean, logvar, rng):
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype
        )

    @staticmethod
    def kl(mean, logvar):
        return 0.5 * jnp.mean(
            jnp.sum(mean**2 + jnp.exp(logvar) - 1.0 - logvar, axis=-1)
        )

    def decode_lidar(self, latents):
        return self.lidar_decoder(latents)

    def __call__(self, points, points_mask, rng=None, render_rays=True):
        voxels, mean, logvar = self.encode_lidar(points, points_mask)
        z = self.sample(mean, logvar, rng) if rng is not None else mean
        density, voxel_logits = self.lidar_decoder(z)
        b, t = voxels.shape[:2]
        result = {
            "voxels": voxels,
            "lidar_voxel": voxel_logits.reshape(
                (b, t) + voxel_logits.shape[1:]
            ),
            "kl_loss": self.kl(mean, logvar),
            "mean": mean,
            "logvar": logvar,
        }
        if render_rays:
            from opendwm_tpu.ops.dvgo import DVGORenderer

            v = self.voxelizer
            renderer = DVGORenderer(
                xyz_min=(v.x_min, v.y_min, v.z_min),
                xyz_max=(v.x_max, v.y_max, v.z_max),
                stepsize=self.ray_stepsize, max_steps=self.ray_max_steps,
            )
            dens = density
            pts = points[..., :3].reshape(b * t, -1, 3)
            msk = points_mask.reshape(b * t, -1)

            def render_one(grid, rays, m):
                depth, sdf, _ = renderer(
                    self.density_mlp, jnp.zeros_like(rays), rays, grid
                )
                gt = jnp.linalg.norm(rays, axis=-1)
                err = jnp.where(m, jnp.abs(depth - gt), 0.0)
                k = int(err.shape[0] * 0.95)
                return jnp.mean(jax.lax.sort(err)[:k]), sdf

            depth_loss, sdf_loss = jax.vmap(render_one)(dens, pts, msk)
            result["depth_loss"] = jnp.mean(depth_loss)
            result["sdf_loss"] = jnp.mean(sdf_loss)
        return result
