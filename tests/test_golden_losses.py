"""Golden first-step losses on fixed seeds (silent-numerics-drift guard).

Each pipeline builds the same tiny model + batch from PRNGKey(0) and
asserts the first train-step loss against a recorded value. The virtual
8-device CPU mesh (conftest) makes these deterministic; a drift beyond
rtol means some numeric path changed — inspect before re-pinning.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ~260 s total: full-suite numerics gate

GOLDEN = {
    # pinned on the virtual 8-device CPU mesh, jax in this image
    "ctsd_sd3": 1.7017796039581299,
    "lidar_vqvae": 3.5653464794158936,
    "lidar_vae": 2.6817328929901123,
    "maskgit": 2.7305986881256104,
    "unimlvg_pred": 1.1626403331756592,
    "lidar_diffusion": 0.06897011399269104,
    "streaming_step": 0.8440236449241638,
}


def _check(name, value):
    value = float(value)
    assert np.isfinite(value)
    if GOLDEN[name] is None:  # pragma: no cover - pin helper
        pytest.fail(f"pin GOLDEN[{name!r}] = {value!r}")
    np.testing.assert_allclose(value, GOLDEN[name], rtol=2e-3)


class TestGoldenLosses:
    def test_ctsd_sd3_first_loss(self):
        from test_ctsd_pipeline import make_batch, make_pipeline

        pipe = make_pipeline()
        batch = make_batch(jax.random.PRNGKey(0), b=8)
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        _, metrics = pipe.train_step(state, batch, jax.random.PRNGKey(2))
        _check("ctsd_sd3", metrics["sd_loss"])

    def test_lidar_vqvae_first_loss(self):
        from test_lidar_pipelines import (
            MESH,
            make_batch,
            make_vq_model,
        )
        from opendwm_tpu.pipelines.lidar_vqvae import LidarCodebook

        pipe = LidarCodebook(make_vq_model(), **MESH)
        batch = make_batch(jax.random.PRNGKey(0))
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        _, metrics = pipe.train_step(state, batch, jax.random.PRNGKey(2))
        _check("lidar_vqvae", metrics["loss"])

    def test_lidar_vae_first_loss(self):
        from test_lidar_pipelines import MESH, make_batch, make_vox
        from opendwm_tpu.models.vae_point_cloud import VAEPointCloud
        from opendwm_tpu.models.vq_point_cloud import VQDecoder, VQEncoder
        from opendwm_tpu.pipelines.lidar_vae import LidarVAE

        model = VAEPointCloud(
            voxelizer=make_vox(),
            lidar_encoder=VQEncoder(
                img_size=16, patch_size=8, in_chans=8, embed_dim=8,
                num_heads=2, depth=6, codebook_dim=8, window_size=2,
            ),
            lidar_decoder=VQDecoder(
                img_size=16, patch_size=8, in_chans=8, embed_dim=8,
                num_heads=2, depth=4, codebook_dim=4, window_size=2,
                density_feats=4,
            ),
            latent_dim=4, ray_stepsize=0.25, ray_max_steps=48,
        )
        pipe = LidarVAE(model, **MESH)
        batch = make_batch(jax.random.PRNGKey(0))
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        _, metrics = pipe.train_step(state, batch, jax.random.PRNGKey(2))
        _check("lidar_vae", metrics["loss"])

    def test_maskgit_first_loss(self):
        from test_lidar_pipelines import (
            MESH,
            make_batch,
            make_vq_model,
        )
        from opendwm_tpu.models.maskgit import BidirectionalTransformer
        from opendwm_tpu.pipelines.lidar_maskgit import MaskGITPipeline

        vq = make_vq_model()
        model = BidirectionalTransformer(
            n_e=16, e_dim=12, img_size=(2, 2), hidden_dim=16, depth=2,
            num_heads=2, window_size=2,
        )
        pipe = MaskGITPipeline(vq, model, **MESH)
        batch = make_batch(jax.random.PRNGKey(0))
        vq_params = vq.init(
            jax.random.PRNGKey(3), batch["lidar_points"],
            batch["lidar_points_mask"],
        )
        pipe.load_vq_params(vq_params)
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        _, metrics = pipe.train_step(state, batch, jax.random.PRNGKey(2))
        _check("maskgit", metrics["ce_loss"])

    def test_unimlvg_first_loss(self):
        from test_unimlvg_maskgwm import make_batch, make_pipe

        pipe = make_pipe("pred")
        batch = make_batch(jax.random.PRNGKey(0), b=8)
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        _, metrics = pipe.train_step(state, batch, jax.random.PRNGKey(2))
        _check("unimlvg_pred", metrics["sd_loss"])

    def test_lidar_diffusion_first_loss(self):
        import test_lidar_diffusion as tld

        pipe, batch = tld.pipe_and_batch.__wrapped__()
        state = pipe.init_state(jax.random.PRNGKey(1), batch)
        _, metrics = pipe.train_step(state, batch, jax.random.PRNGKey(2))
        _check("lidar_diffusion", metrics["sd_loss"])

    def test_streaming_step_golden(self):
        # Streaming emits latents, not a loss: pin the mean |output| of one
        # FIFO step on fixed seeds (drift guard for the CFG/queue path).
        import numpy as np
        from test_streaming import B, C, H, T, V, W, frame_batch, pipe_state

        pipe, train_state, batch = pipe_state.__wrapped__()
        cond_template = {
            "encoder_hidden_states": batch["encoder_hidden_states"],
            "pooled_projections": batch["pooled_projections"],
        }
        s = pipe.reset_streaming(
            (B, T, V, H, W, C), cond_template, jax.random.PRNGKey(5)
        )
        s = pipe.send_frame_condition(s, frame_batch(jax.random.PRNGKey(9)))
        _, out, _ = pipe.step_stream(train_state.params, s)
        _check("streaming_step", float(np.mean(np.abs(np.asarray(out)))))
