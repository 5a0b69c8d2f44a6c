"""DepthNet branch in the UNet + depth loss in the CTSD pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.models.unet import UNetCrossviewTemporal
from opendwm_tpu.parallel import MeshSpec, make_mesh
from opendwm_tpu.pipelines.ctsd import CTSDPipeline
from opendwm_tpu.pipelines.depth_loss import (
    depth_bin_to_metric,
    make_depth_loss,
)
from opendwm_tpu.schedulers import DDPMScheduler

pytestmark = pytest.mark.slow


B, T, V, H, W = 1, 2, 2, 16, 16
BINS = 8
FRUSTUM = (1.0, 17.0, 2.0)


def camera_batch(key, n_points=32):
    ks = jax.random.split(key, 3)
    intr = jnp.broadcast_to(
        jnp.asarray([[50.0, 0, 32], [0, 50, 24], [0, 0, 1]]),
        (B, T, V, 3, 3),
    )
    # camera 0 at ego origin looking +x (cam z-forward → ego x-forward)
    rot = jnp.asarray([
        [0.0, 0.0, 1.0, 0.0],
        [-1.0, 0.0, 0.0, 0.0],
        [0.0, -1.0, 0.0, 1.5],
        [0.0, 0.0, 0.0, 1.0],
    ])
    cam = jnp.broadcast_to(rot, (B, T, V, 4, 4))
    ego = jnp.broadcast_to(jnp.eye(4), (B, T, V + 1, 4, 4))
    pts = jnp.concatenate([
        jax.random.uniform(ks[0], (B, T, n_points, 1), minval=3, maxval=12),
        jax.random.uniform(ks[1], (B, T, n_points, 2), minval=-2, maxval=2),
    ], -1)  # mostly ahead of the ego in +x
    return {
        "camera_intrinsics": intr,
        "camera_transforms": cam,
        "ego_transforms": ego,
        "image_size": jnp.full((B, T, V, 2), 64.0),
        "lidar_points": pts,
        "lidar_points_mask": jnp.ones((B, T, n_points), bool),
    }


class TestDepthLoss:
    def test_perfect_prediction_low_loss(self):
        batch = camera_batch(jax.random.PRNGKey(0))
        # Build logits that put all mass in the correct bin everywhere is
        # impossible without projecting; instead check: uniform logits give
        # log(BINS) loss, and loss is finite + differentiable.
        feats = jnp.zeros((B, T, V, 8, 8, BINS))
        loss = make_depth_loss(feats, batch, FRUSTUM)
        np.testing.assert_allclose(float(loss), np.log(BINS), rtol=1e-3)
        g = jax.grad(
            lambda f: make_depth_loss(f, batch, FRUSTUM)
        )(feats)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_no_valid_points_zero_loss(self):
        batch = camera_batch(jax.random.PRNGKey(0))
        batch["lidar_points_mask"] = jnp.zeros((B, T, 32), bool)
        feats = jnp.zeros((B, T, V, 8, 8, BINS))
        assert float(make_depth_loss(feats, batch, FRUSTUM)) == 0.0

    def test_bin_to_metric(self):
        feats = jnp.zeros((1, 4, BINS)).at[..., 3].set(10.0)
        metric = depth_bin_to_metric(feats, FRUSTUM)
        np.testing.assert_allclose(np.asarray(metric), 1.0 + 3 * 2.0)


class TestUNetDepthBranch:
    def test_forward_returns_depth_features(self):
        model = UNetCrossviewTemporal(
            in_channels=4, out_channels=4, block_out_channels=(8, 16, 16),
            layers_per_block=1, num_attention_heads=(2, 2, 2),
            cross_attention_dim=12,
            depth_net_config={"mid_channels": 16, "depth_channels": BINS},
            depth_frustum_range=FRUSTUM,
        )
        batch = camera_batch(jax.random.PRNGKey(1))
        inp = dict(
            sample=jax.random.normal(jax.random.PRNGKey(2),
                                     (B, T, V, H, W, 4)),
            timestep=jnp.full((B, T, V), 500.0),
            encoder_hidden_states=jax.random.normal(
                jax.random.PRNGKey(3), (B, T, V, 5, 12)
            ),
            camera_intrinsics=batch["camera_intrinsics"],
            camera_transforms=batch["camera_transforms"],
        )
        params = model.init(jax.random.PRNGKey(0), **inp)
        out, depth = model.apply(params, **inp)
        assert out.shape == (B, T, V, H, W, 4)
        assert depth.shape == (B, T, V, H, W, BINS)

    def test_pipeline_with_depth_loss(self):
        model = UNetCrossviewTemporal(
            in_channels=4, out_channels=4, block_out_channels=(8, 16, 16),
            layers_per_block=1, num_attention_heads=(2, 2, 2),
            cross_attention_dim=12,
            depth_net_config={"mid_channels": 16, "depth_channels": BINS},
            depth_frustum_range=FRUSTUM,
        )
        pipe = CTSDPipeline(
            model=model,
            train_scheduler=DDPMScheduler(prediction_type="v_prediction"),
            test_scheduler=DDPMScheduler(),
            common_config={
                "enable_depth_branch": True,
                "depth_frustum_range": FRUSTUM,
            },
            training_config={"depth_loss_coef": 0.5},
            model_type="unet",
            mesh=make_mesh(MeshSpec(dp=8, fsdp=1)),
            sharding_policy="ddp",
        )
        batch = camera_batch(jax.random.PRNGKey(4))
        batch["latents"] = jax.random.normal(
            jax.random.PRNGKey(5), (B, T, V, H, W, 4)
        )
        batch["encoder_hidden_states"] = jax.random.normal(
            jax.random.PRNGKey(6), (B, T, V, 5, 12)
        )
        state = pipe.init_state(jax.random.PRNGKey(7), batch)
        state, metrics = pipe.train_step(state, batch, jax.random.PRNGKey(8))
        assert "depth_loss" in metrics
        assert np.isfinite(float(metrics["depth_loss"]))
        assert np.isfinite(float(metrics["sd_loss"]))
