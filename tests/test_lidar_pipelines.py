"""LiDAR pipelines: VQVAE trainer, KL-VAE trainer, MaskGIT train+decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.models.maskgit import BidirectionalTransformer
from opendwm_tpu.models.vae_point_cloud import VAEPointCloud
from opendwm_tpu.models.vq_point_cloud import (
    VectorQuantizer,
    VQDecoder,
    VQEncoder,
    VQPointCloud,
)
from opendwm_tpu.ops.voxelize import Voxelizer
from opendwm_tpu.parallel import MeshSpec, make_mesh
from opendwm_tpu.pipelines.lidar_maskgit import (
    MaskGITPipeline,
    gamma_fn,
    random_mask,
)
from opendwm_tpu.pipelines.lidar_vae import LidarVAE
from opendwm_tpu.pipelines.lidar_vqvae import LidarCodebook

pytestmark = pytest.mark.slow


IMG, ZC = 16, 8
N_E, E_DIM = 16, 12


def make_vox():
    return Voxelizer(
        x_min=-4, x_max=4, y_min=-4, y_max=4, step=0.5,
        z_min=-1, z_max=1, z_step=0.25,
    )


def make_vq_model():
    return VQPointCloud(
        voxelizer=make_vox(),
        vector_quantizer=VectorQuantizer(n_e=N_E, e_dim=E_DIM),
        lidar_encoder=VQEncoder(
            img_size=IMG, patch_size=8, in_chans=ZC, embed_dim=8,
            num_heads=2, depth=6, codebook_dim=E_DIM, window_size=2,
        ),
        lidar_decoder=VQDecoder(
            img_size=IMG, patch_size=8, in_chans=ZC, embed_dim=8,
            num_heads=2, depth=4, codebook_dim=E_DIM, window_size=2,
            density_feats=4,
        ),
        ray_stepsize=0.25, ray_max_steps=48,
    )


def make_batch(key, b=1, t=2, n=24):
    return {
        "lidar_points": jax.random.uniform(
            key, (b, t, n, 3), minval=-3, maxval=3
        ),
        "lidar_points_mask": jnp.ones((b, t, n), bool),
        "3dbox_bev_images": jax.random.uniform(
            jax.random.fold_in(key, 1), (b * t, IMG * 8, IMG * 8, 3)
        ),
    }


MESH = dict(mesh=None, sharding_min_size=1 << 60)  # replicate (tiny models)


class TestMasking:
    def test_random_mask_ratio(self):
        m = random_mask(jax.random.PRNGKey(0), (4, 100), 0.25)
        np.testing.assert_array_equal(np.asarray(m.sum(-1)), 25)

    def test_gamma_cosine(self):
        g = gamma_fn("cosine")
        assert float(g(0.0)) == 1.0
        assert abs(float(g(1.0))) < 1e-6


class TestLidarCodebook:
    def test_train_step_and_revival(self):
        pipe = LidarCodebook(
            make_vq_model(),
            training_config={"voxel_loss_coef": 1.0, "emb_loss_coef": 1.0,
                             "depth_loss_coef": 0.1, "sdf_loss_coef": 0.1},
            optimizer_config={"lr": 1e-3},
            mesh=make_mesh(MeshSpec(dp=8, fsdp=1)),
            sharding_policy="ddp",
        )
        batch = make_batch(jax.random.PRNGKey(0))
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        for i in range(2):
            state, metrics = pipe.train_step(
                state, batch, jax.random.PRNGKey(10 + i)
            )
        assert np.isfinite(float(metrics["loss"]))
        assert float(state.code_usage.sum()) > 0
        assert bool(state.reservoir_initialized)
        # Force dead codes → revival replaces the codebook.
        state = state.replace(code_age=jnp.full((N_E,), 9999.0))
        old = np.asarray(
            state.params["params"]["vector_quantizer"]["embedding"]
        ).copy()
        state, revived = pipe.maybe_revive_codebook(state)
        assert revived
        new = np.asarray(
            state.params["params"]["vector_quantizer"]["embedding"]
        )
        assert not np.allclose(old, new)
        assert float(state.code_age.sum()) == 0


class TestLidarVAE:
    def test_train_step(self):
        vae = VAEPointCloud(
            voxelizer=make_vox(),
            lidar_encoder=VQEncoder(
                img_size=IMG, patch_size=8, in_chans=ZC, embed_dim=8,
                num_heads=2, depth=6, codebook_dim=2 * E_DIM, window_size=2,
            ),
            lidar_decoder=VQDecoder(
                img_size=IMG, patch_size=8, in_chans=ZC, embed_dim=8,
                num_heads=2, depth=4, codebook_dim=E_DIM, window_size=2,
                density_feats=4,
            ),
            latent_dim=E_DIM, ray_stepsize=0.25, ray_max_steps=48,
        )
        pipe = LidarVAE(
            vae, optimizer_config={"lr": 1e-3},
            mesh=make_mesh(MeshSpec(dp=8, fsdp=1)), sharding_policy="ddp",
        )
        batch = make_batch(jax.random.PRNGKey(0))
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        state, metrics = pipe.train_step(state, batch, jax.random.PRNGKey(2))
        for k in ("loss", "voxel_loss", "kl_loss", "depth_loss"):
            assert np.isfinite(float(metrics[k])), k


class TestMaskGIT:
    @pytest.fixture(scope="class")
    def setup(self):
        vq = make_vq_model()
        batch = make_batch(jax.random.PRNGKey(0))
        vq_params = vq.init(
            jax.random.PRNGKey(1), batch["lidar_points"],
            batch["lidar_points_mask"], render_rays=False,
        )
        transformer = BidirectionalTransformer(
            n_e=N_E, e_dim=E_DIM, img_size=(IMG // 8, IMG // 8),
            hidden_dim=16, depth=2, num_heads=2, window_size=2,
            enable_temporal=True,
            condition_adapter_config=dict(
                in_channels=3, channels=[16, 16], is_downblocks=[True, False],
                num_res_blocks=1, downscale_factor=32,
            ),
        )
        pipe = MaskGITPipeline(
            vq, transformer,
            common_config={"T": 4},
            training_config={"task_type_ratio": 0.5,
                             "max_reference_frame": 1},
            inference_config={"sample_steps": 4,
                              "do_classifier_free_guidance": True,
                              "guidance_scale": 2.0},
            optimizer_config={"lr": 1e-3},
            mesh=make_mesh(MeshSpec(dp=8, fsdp=1)),
            sharding_policy="ddp",
            blank_code=[0],
        )
        pipe.load_vq_params(vq_params)
        return pipe, batch

    def test_train_step(self, setup):
        pipe, batch = setup
        state = pipe.init_state(jax.random.PRNGKey(2), batch)
        losses = []
        for i in range(4):
            state, m = pipe.train_step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(m["ce_loss"]))
        assert np.isfinite(losses).all()
        assert 0 <= float(m["acc_0"]) <= 1

    def test_inference_generation_and_prediction(self, setup):
        pipe, batch = setup
        state = pipe.init_state(jax.random.PRNGKey(2), batch)
        for task in ("generation", "prediction"):
            out = pipe.inference_pipeline(
                state.params, batch, jax.random.PRNGKey(3), task_type=task,
                num_reference_frame=1,
            )
            assert out["pred_voxels"].shape == out["gt_voxels"].shape
            assert set(np.unique(np.asarray(out["pred_voxels"]))) <= {0.0, 1.0}
            # all positions decided after the final step
            assert (np.asarray(out["pred_indices"]) >= 0).all()

    def test_autoregressive_rollout(self, setup, tmp_path):
        # Reference autoregressive_inference_pipeline (lidar_maskgit.py:863):
        # decode window, carry last `ref` frames' sampled codes forward.
        pipe, _ = setup
        key = jax.random.PRNGKey(0)
        total = 4  # window tw=2, ref=1 → 3 windows
        batch = {
            "lidar_points": jax.random.uniform(
                key, (1, total, 24, 3), minval=-3, maxval=3
            ),
            "lidar_points_mask": jnp.ones((1, total, 24), bool),
            "3dbox_bev_images": jax.random.uniform(
                jax.random.fold_in(key, 1), (1 * total, IMG * 8, IMG * 8, 3)
            ),
        }
        state = pipe.init_state(jax.random.PRNGKey(2), make_batch(key))
        out = pipe.autoregressive_inference_pipeline(
            state.params, batch, jax.random.PRNGKey(3),
            num_reference_frame=1, window_frames=2,
        )
        assert out["pred_voxels"].shape == out["gt_voxels"].shape
        assert out["pred_voxels"].shape[1] == total
        assert (np.asarray(out["pred_indices"]) >= 0).all()
        # Window 0 reference frame is the GT tokenization (pinned).
        _, _, gt_idx = pipe.tokenize(
            batch["lidar_points"], batch["lidar_points_mask"]
        )
        gt_idx = np.asarray(gt_idx).reshape(1, total, -1)
        np.testing.assert_array_equal(
            np.asarray(out["pred_indices"])[:, 0], gt_idx[:, 0]
        )

        # save_results exports preview PNG + point bins.
        pipe.inference_config["save_pred_results"] = True
        written = pipe.save_results(out, batch, str(tmp_path))
        pipe.inference_config.pop("save_pred_results")
        assert any(p.endswith(".png") for p in written)
        bins = [p for p in written if p.endswith(".bin")]
        assert len(bins) == total  # one dump per frame
        raw = np.frombuffer(open(bins[0], "rb").read(), np.float32)
        assert raw.size % 5 == 0  # nuScenes 5-column layout
