"""int8 W8A8 serving path (ops/quant.py, layers.QDense).

The reference has no quantized-serving story; this is a TPU-native
extension (v5e int8 MXU runs 2x bf16 peak). These tests pin the scheme's
accuracy on CPU: per-channel weight + per-token activation symmetric int8
must track the float path closely on real activation scales.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.models.mmdit import DiTCrossviewTemporal
from opendwm_tpu.ops.quant import (
    int8_matmul,
    quantize_param_tree,
    quantize_weight,
)

from test_mmdit import TINY, make_inputs


class TestInt8Matmul:
    def test_tracks_float_matmul(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (64, 256)) * 2.0
        w = jax.random.normal(jax.random.PRNGKey(1), (256, 128)) * 0.05
        wq, ws = quantize_weight(w)
        y = int8_matmul(x, wq, ws, jnp.float32)
        ref = x @ w
        cos = np.sum(np.asarray(y) * np.asarray(ref)) / (
            np.linalg.norm(y) * np.linalg.norm(ref)
        )
        assert cos > 0.999, cos
        rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        assert rel < 0.02, rel

    def test_weight_quant_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
        wq, ws = quantize_weight(w)
        assert wq.dtype == jnp.int8
        back = np.asarray(wq, np.float32) * np.asarray(ws)
        rel = np.linalg.norm(back - np.asarray(w)) / np.linalg.norm(w)
        assert rel < 0.01, rel


@pytest.mark.slow
class TestQuantizedDiT:
    def test_int8_model_tracks_float(self):
        fmodel = DiTCrossviewTemporal(**TINY)
        qmodel = DiTCrossviewTemporal(**TINY, quantization="int8")
        inp = make_inputs(jax.random.PRNGKey(1))
        fparams = fmodel.init(jax.random.PRNGKey(0), **inp)
        qshapes = jax.eval_shape(qmodel.init, jax.random.PRNGKey(0), **inp)
        qparams = quantize_param_tree(fparams, qshapes)
        # structure matches what the quantized model expects
        jax.tree.map(
            lambda a, b: None,
            jax.tree.structure(qparams),
            jax.tree.structure(qshapes),
        )
        fout = fmodel.apply(fparams, **inp)
        qout = qmodel.apply(qparams, **inp)
        f = np.asarray(fout, np.float32).ravel()
        q = np.asarray(qout, np.float32).ravel()
        cos = float(f @ q / (np.linalg.norm(f) * np.linalg.norm(q)))
        assert np.isfinite(q).all()
        assert cos > 0.995, cos


@pytest.mark.slow
class TestQuantizedVAE:
    def test_int8_decode_tracks_float(self):
        from opendwm_tpu.models.autoencoders import AutoencoderKL

        fvae = AutoencoderKL(block_out_channels=(32, 64), latent_channels=4)
        qvae = AutoencoderKL(block_out_channels=(32, 64), latent_channels=4,
                             quantization="int8")
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3)) * 0.5
        fparams = fvae.init(jax.random.PRNGKey(0), x)
        qshapes = jax.eval_shape(qvae.init, jax.random.PRNGKey(0), x)
        qparams = quantize_param_tree(fparams, qshapes)
        frec, fmean, _ = fvae.apply(fparams, x)
        qrec, qmean, _ = qvae.apply(qparams, x)
        f = np.asarray(frec, np.float32).ravel()
        q = np.asarray(qrec, np.float32).ravel()
        cos = float(f @ q / (np.linalg.norm(f) * np.linalg.norm(q) + 1e-9))
        assert np.isfinite(q).all()
        assert cos > 0.99, cos


@pytest.mark.slow
class TestQuantizedUNet:
    def test_int8_unet_tracks_float(self):
        from opendwm_tpu.models.unet import UNetCrossviewTemporal

        cfg = dict(
            in_channels=8, out_channels=4, block_out_channels=(32, 64),
            layers_per_block=1, num_attention_heads=(2, 4),
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=24,
        )
        fm = UNetCrossviewTemporal(**cfg)
        qm = UNetCrossviewTemporal(**cfg, quantization="int8")
        rng = np.random.default_rng(0)
        inp = dict(
            sample=jnp.asarray(
                rng.standard_normal((1, 2, 2, 8, 8, 8), np.float32)
            ) * 0.5,
            timestep=jnp.full((1, 2, 2), 500.0),
            encoder_hidden_states=jnp.asarray(
                rng.standard_normal((1, 2, 2, 3, 1024), np.float32)
            ),
            added_time_ids=jnp.zeros((1, 2, 2, 3)),
        )
        fparams = fm.init(jax.random.PRNGKey(0), **inp)
        qshapes = jax.eval_shape(qm.init, jax.random.PRNGKey(0), **inp)
        qparams = quantize_param_tree(fparams, qshapes)
        fout = fm.apply(fparams, **inp)
        qout = qm.apply(qparams, **inp)
        f = np.asarray(fout, np.float32).ravel()
        q = np.asarray(qout, np.float32).ravel()
        cos = float(f @ q / (np.linalg.norm(f) * np.linalg.norm(q) + 1e-9))
        assert np.isfinite(q).all()
        assert cos > 0.99, cos


@pytest.mark.slow
class TestQuantizeCheckpointCLI:
    def test_config_driven_quantize(self, tmp_path):
        """convert.quantize: float ckpt -> int8 tree via the model config."""
        from opendwm_tpu.convert.quantize import quantize_checkpoint
        from opendwm_tpu.models.mmdit import DiTCrossviewTemporal

        cfg = {
            "_class_name":
                "dwm.models.crossview_temporal_dit"
                ".DiTCrossviewTemporalConditionModel",
            **{k: (list(v) if isinstance(v, tuple) else v)
               for k, v in TINY.items()},
        }
        fmodel = DiTCrossviewTemporal(**TINY)
        inp = make_inputs(jax.random.PRNGKey(1))
        fparams = fmodel.init(jax.random.PRNGKey(0), **inp)
        shape = inp["sample"].shape
        qtree = quantize_checkpoint(cfg, fparams, shape)
        qmodel = DiTCrossviewTemporal(**TINY, quantization="int8")
        qout = qmodel.apply(qtree, **inp)
        fout = fmodel.apply(fparams, **inp)
        f = np.asarray(fout, np.float32).ravel()
        q = np.asarray(qout, np.float32).ravel()
        cos = float(f @ q / (np.linalg.norm(f) * np.linalg.norm(q) + 1e-9))
        assert cos > 0.995, cos
