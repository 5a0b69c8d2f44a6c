"""LiDAR latent diffusion: train step + generation over frozen VQ latents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.models.mmdit import DiTCrossviewTemporal
from opendwm_tpu.models.vq_point_cloud import (
    VectorQuantizer,
    VQDecoder,
    VQEncoder,
    VQPointCloud,
)
from opendwm_tpu.ops.voxelize import Voxelizer
from opendwm_tpu.parallel import MeshSpec, make_mesh
from opendwm_tpu.pipelines.lidar_diffusion import LidarDiffusionPipeline
from opendwm_tpu.schedulers import FlowMatchEulerScheduler

pytestmark = pytest.mark.slow


IMG, ZC, E_DIM = 16, 8, 16


@pytest.fixture(scope="module")
def pipe_and_batch():
    vox = Voxelizer(
        x_min=-4, x_max=4, y_min=-4, y_max=4, step=0.5,
        z_min=-1, z_max=1, z_step=0.25,
    )
    vq = VQPointCloud(
        voxelizer=vox,
        vector_quantizer=VectorQuantizer(n_e=16, e_dim=E_DIM),
        lidar_encoder=VQEncoder(
            img_size=IMG, patch_size=8, in_chans=ZC, embed_dim=8,
            num_heads=2, depth=6, codebook_dim=E_DIM, window_size=2,
        ),
        lidar_decoder=VQDecoder(
            img_size=IMG, patch_size=8, in_chans=ZC, embed_dim=8,
            num_heads=2, depth=4, codebook_dim=E_DIM, window_size=2,
            density_feats=4,
        ),
        ray_max_steps=32,
    )
    model = DiTCrossviewTemporal(
        patch_size=1, num_layers=2, attention_head_dim=8,
        num_attention_heads=2, in_channels=E_DIM, out_channels=E_DIM,
        joint_attention_dim=24, caption_projection_dim=16,
        pooled_projection_dim=32, pos_embed_max_size=8, sample_size=2,
        dual_attention_layers=(), enable_crossview=False,
        enable_temporal=True, temporal_attention_type="pointwise",
        temporal_block_layers=(0, 1),
    )
    pipe = LidarDiffusionPipeline(
        model=model, autoencoder=vq,
        train_scheduler=FlowMatchEulerScheduler(shift=1.0),
        test_scheduler=FlowMatchEulerScheduler(shift=1.0),
        common_config={
            "text_embeddings_dim": 24, "pooled_text_embeddings_dim": 32,
            "latent_scale": 2.0, "latent_bias": 0.1,
            "frame_prediction_style": "ctsd",
        },
        training_config={
            "all_reference_visible_ratio": 0.5,
            "reference_latent_count": 1,
        },
        inference_config={"inference_steps": 2, "guidance_scale": 2.0},
        optimizer_config={"lr": 1e-3},
        mesh=make_mesh(MeshSpec(dp=8, fsdp=1)),
        sharding_policy="ddp",
    )
    key = jax.random.PRNGKey(0)
    batch = {
        "lidar_points": jax.random.uniform(
            key, (1, 2, 32, 3), minval=-3, maxval=3
        ),
        "lidar_points_mask": jnp.ones((1, 2, 32), bool),
        "3dbox_bev_images": jax.random.uniform(
            jax.random.fold_in(key, 1), (2, IMG * 8, IMG * 8, 3)
        ),
    }
    vq_params = vq.init(
        jax.random.PRNGKey(1), batch["lidar_points"],
        batch["lidar_points_mask"], render_rays=False,
    )
    pipe.load_autoencoder_params(vq_params)
    return pipe, batch


class TestLidarDiffusion:
    def test_latent_normalization_roundtrip(self, pipe_and_batch):
        pipe, batch = pipe_and_batch
        lat, vox = pipe.encode_points(
            batch["lidar_points"], batch["lidar_points_mask"]
        )
        assert lat.shape == (1, 2, 1, 2, 2, E_DIM)
        assert vox.shape == (1, 2, ZC, IMG, IMG)

    def test_train_step(self, pipe_and_batch):
        pipe, batch = pipe_and_batch
        state = pipe.init_state(jax.random.PRNGKey(2), batch)
        state, metrics = pipe.train_step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["sd_loss"]))

    def test_generate(self, pipe_and_batch):
        pipe, batch = pipe_and_batch
        state = pipe.init_state(jax.random.PRNGKey(2), batch)
        out = pipe.generate(state.params, batch, jax.random.PRNGKey(4))
        assert out["pred_voxels"].shape == out["gt_voxels"].shape
        assert set(np.unique(np.asarray(out["pred_voxels"]))) <= {0.0, 1.0}
