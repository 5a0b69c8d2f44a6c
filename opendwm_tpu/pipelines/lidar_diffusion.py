"""LiDAR latent diffusion pipeline (DiT over frozen BEV tokenizer latents).

Capability parity with reference src/dwm/pipelines/lidar_diffusion.py:
flow-matching (or DDPM) diffusion with the same crossview-temporal DiT
(crossview disabled, temporal on) over frozen VQ/VAE BEV latents; latent
scale/bias normalization (:564-566); zero (or precomputed) text context with
zero pooled projections (:419-437); BEV layout condition images; CTSD-style
reference-frame prediction (:478-549); autoregressive rollout (:813-974).

Reuses the CTSD machinery: the pipeline subclasses CTSDPipeline and swaps
the image VAE for a LiDAR autoencoder adapter (``encode_points`` /
``decode_points``, reference :446-476).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu.config import register
from opendwm_tpu.models.vae_point_cloud import VAEPointCloud
from opendwm_tpu.models.vq_point_cloud import VQPointCloud
from opendwm_tpu.pipelines.ctsd import CTSDPipeline
from opendwm_tpu.pipelines.lidar_maskgit import (
    get_maskgit_conditions,
    gumbel_sigmoid,
)


@register(
    "LidarDiffusionPipeline",
    aliases=("dwm.pipelines.lidar_diffusion.LidarDiffusionPipeline",),
)
class LidarDiffusionPipeline(CTSDPipeline):
    def __init__(
        self,
        model,
        autoencoder,
        train_scheduler,
        test_scheduler,
        common_config: Optional[dict] = None,
        training_config: Optional[dict] = None,
        inference_config: Optional[dict] = None,
        optimizer_config: Optional[dict] = None,
        mesh=None,
        model_type: str = "sd3",
        sharding_policy: Optional[str] = None,
        sharding_min_size: int = 2**16,
    ):
        super().__init__(
            model=model,
            train_scheduler=train_scheduler,
            test_scheduler=test_scheduler,
            common_config=common_config,
            training_config=training_config,
            inference_config=inference_config,
            optimizer_config=optimizer_config,
            mesh=mesh,
            model_type=model_type,
            sharding_policy=sharding_policy,
            sharding_min_size=sharding_min_size,
        )
        self.autoencoder = autoencoder
        self.autoencoder_params = None
        cc = self.common_config
        self.latent_bias = cc.get("latent_bias", 0.0)
        self.latent_scale = cc.get("latent_scale", 1.0)
        self.text_embeddings_dim = cc.get("text_embeddings_dim", 1024)
        self.pooled_dim = cc.get("pooled_text_embeddings_dim", 2048)

    def load_autoencoder_params(self, params):
        self.autoencoder_params = jax.tree.map(jnp.asarray, params)

    # -- latent adapters (reference :446-476) --------------------------------

    def encode_points(self, points, points_mask):
        """points → normalized BEV latents (b, t, 1, h, w, c) + voxels."""
        if isinstance(self.autoencoder, VQPointCloud):
            voxels, z_q, _, _ = self.autoencoder.apply(
                self.autoencoder_params, points, points_mask,
                method=self.autoencoder.encode,
            )
            n, l, c = z_q.shape
            h = w = int(round(l**0.5))
            lat = z_q.reshape(n, h, w, c)
        elif isinstance(self.autoencoder, VAEPointCloud):
            voxels, mean, _ = self.autoencoder.apply(
                self.autoencoder_params, points, points_mask,
                method=self.autoencoder.encode_lidar,
            )
            n, l, c = mean.shape
            h = w = int(round(l**0.5))
            lat = mean.reshape(n, h, w, c)
        else:
            raise ValueError(f"Unknown autoencoder {type(self.autoencoder)}")
        b, t = voxels.shape[:2]
        lat = lat.reshape(b, t, 1, h, w, c)
        lat = (lat - self.latent_bias) * self.latent_scale
        return jax.lax.stop_gradient(lat), voxels

    def decode_points(self, latents, rng):
        """Normalized latents → binary voxels."""
        lat = latents / self.latent_scale + self.latent_bias
        b, t, v, h, w, c = lat.shape
        tokens = lat.reshape(b * t, h * w, c)
        if isinstance(self.autoencoder, VQPointCloud):
            qparams = {
                "params": self.autoencoder_params["params"][
                    "vector_quantizer"
                ]
            }
            code, _, _ = self.autoencoder.vector_quantizer.apply(
                qparams, tokens
            )
            dec = {"params": self.autoencoder_params["params"][
                "lidar_decoder"]}
            _, logits = self.autoencoder.lidar_decoder.apply(dec, code)
        else:
            dec = {"params": self.autoencoder_params["params"][
                "lidar_decoder"]}
            _, logits = self.autoencoder.lidar_decoder.apply(dec, tokens)
        vox = gumbel_sigmoid(rng, logits)
        return vox.reshape((b, t) + vox.shape[1:])

    # -- batch adaptation --------------------------------------------------------

    def prepare_batch(self, batch: dict) -> dict:
        """Tokenize points and synthesize the diffusion conditions the DiT
        expects (zero text context unless precomputed embeddings exist)."""
        latents, voxels = self.encode_points(
            batch["lidar_points"], batch["lidar_points_mask"]
        )
        b, t = latents.shape[:2]
        out = dict(batch)
        out["latents"] = latents
        out["gt_voxels"] = voxels
        if "text_description_embeddings" in batch:
            emb = batch["text_description_embeddings"]
            if emb.ndim == 4:  # (b, t, L, C) → add view dim
                emb = emb[:, :, None]
            out["encoder_hidden_states"] = emb
        else:
            out["encoder_hidden_states"] = jnp.zeros(
                (b, t, 1, 1, self.text_embeddings_dim)
            )
        out["pooled_projections"] = jnp.zeros((b, t, 1, self.pooled_dim))
        ctx = get_maskgit_conditions(batch)
        if ctx is not None:
            # (b*t, H, W, C) → (b, t, 1, H, W, C) layout condition images
            out["3dbox_images"] = None
            out["hdmap_images"] = None
            out["condition_image_tensor_override"] = ctx.reshape(
                (b, t, 1) + ctx.shape[1:]
            )
        return out

    def loss_fn(self, params, batch, rng):
        batch = self.prepare_batch(batch)
        if "condition_image_tensor_override" in batch:
            # route the BEV raster through the CTSD condition path
            batch = dict(batch)
            batch["3dbox_images"] = batch.pop(
                "condition_image_tensor_override"
            )
        return super().loss_fn(params, batch, rng)

    def init_state(self, rng, example_batch):
        batch = self.prepare_batch(example_batch)
        if "condition_image_tensor_override" in batch:
            batch = dict(batch)
            batch["3dbox_images"] = batch.pop(
                "condition_image_tensor_override"
            )
        return super().init_state(rng, batch)

    # -- inference ------------------------------------------------------------------

    def generate(
        self,
        params,
        batch: dict,
        rng: jax.Array,
        image_latents=None,
        reference_frame_count: int = 0,
    ) -> dict:
        prepared = self.prepare_batch(batch)
        if "condition_image_tensor_override" in prepared:
            prepared = dict(prepared)
            prepared["3dbox_images"] = prepared.pop(
                "condition_image_tensor_override"
            )
        k_denoise, k_decode = jax.random.split(rng)
        latents = self.inference_pipeline(
            params, prepared, prepared["latents"].shape, k_denoise,
            image_latents=image_latents,
            reference_frame_count=reference_frame_count,
        )
        pred_voxels = self.decode_points(latents, k_decode)
        return {
            "latents": latents,
            "pred_voxels": pred_voxels,
            "gt_voxels": prepared["gt_voxels"],
        }
