"""Foundation tests: config runtime, mesh, sharding, attention op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from opendwm_tpu import config as cfg
from opendwm_tpu.ops.attention import dot_product_attention
from opendwm_tpu.parallel import (
    MeshSpec,
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)
from opendwm_tpu.parallel.mesh import mesh_for_policy


# ---------------------------------------------------------------------------
# config runtime
# ---------------------------------------------------------------------------

class TestConfigRuntime:
    def test_create_instance_from_config_nested(self):
        @cfg.register("tests.Inner")
        class Inner:
            def __init__(self, x):
                self.x = x

        @cfg.register("tests.Outer")
        class Outer:
            def __init__(self, inner, items, flag=False):
                self.inner, self.items, self.flag = inner, items, flag

        obj = cfg.create_instance_from_config(
            {
                "_class_name": "tests.Outer",
                "inner": {"_class_name": "tests.Inner", "x": 3},
                "items": [1, {"_class_name": "tests.Inner", "x": 4}],
            },
            flag=True,  # top-level kwargs injection
        )
        assert obj.inner.x == 3
        assert obj.items[0] == 1 and obj.items[1].x == 4
        assert obj.flag is True

    def test_get_class_special_form(self):
        out = cfg.create_instance_from_config(
            {"_class_name": "get_class", "class_name": "jnp.bfloat16"}
        )
        assert out is jnp.bfloat16

    def test_reference_alias_maps_to_tpu_equivalent(self):
        # Reference dtype names resolve to jnp equivalents.
        assert cfg.get_class("torch.bfloat16") is jnp.bfloat16

    def test_unregistered_dwm_path_raises(self):
        with pytest.raises(KeyError):
            cfg.get_class("dwm.nonexistent.Thing")

    def test_arbitrary_import_blocked(self):
        with pytest.raises(KeyError):
            cfg.get_class("os.system")

    def test_global_state(self):
        cfg.global_state["k"] = 42
        assert (
            cfg.create_instance_from_config(
                {"_class_name": "get_state", "key": "k"}
            )
            == 42
        )


# ---------------------------------------------------------------------------
# mesh + sharding
# ---------------------------------------------------------------------------

class TestMesh:
    def test_mesh_spec_resolve(self):
        assert MeshSpec(dp=2, fsdp=-1, tp=1).resolve(8) == (2, 4, 1)
        assert MeshSpec(dp=1, fsdp=8).resolve(8) == (1, 8, 1)
        with pytest.raises(ValueError):
            MeshSpec(dp=3, fsdp=-1).resolve(8)

    def test_policy_meshes(self):
        assert mesh_for_policy("ddp").shape == {"dp": 8, "fsdp": 1, "tp": 1}
        assert mesh_for_policy("fsdp").shape == {"dp": 1, "fsdp": 8, "tp": 1}
        hsdp = mesh_for_policy("hsdp").shape
        assert hsdp["dp"] * hsdp["fsdp"] == 8 and hsdp["fsdp"] > 1

    def test_fsdp_param_sharding_shards_largest_axis(self):
        mesh = make_mesh(MeshSpec(dp=1, fsdp=8, tp=1))
        params = {
            "w": np.zeros((512, 1024), np.float32),
            "b": np.zeros((1024,), np.float32),  # too small → replicated
        }
        sh = param_shardings(params, mesh, "fsdp")
        assert sh["w"].spec == P(None, "fsdp")
        assert sh["b"].spec == P()

    def test_ddp_replicates(self):
        mesh = make_mesh(MeshSpec(dp=8, fsdp=1))
        params = {"w": np.zeros((512, 1024), np.float32)}
        sh = param_shardings(params, mesh, "ddp")
        assert sh["w"].spec == P()

    def test_shard_params_and_batch_roundtrip(self):
        mesh = make_mesh(MeshSpec(dp=2, fsdp=4))
        params = {"w": np.arange(8 * 1024 * 16, dtype=np.float32).reshape(8, 1024, 16)}
        shp = shard_params(params, mesh, "fsdp")
        np.testing.assert_array_equal(np.asarray(shp["w"]), params["w"])
        batch = {"x": np.ones((16, 3), np.float32), "s": np.float32(2.0)}
        shb = shard_batch(batch, mesh)
        assert shb["x"].sharding.spec == P(("dp", "fsdp"))
        np.testing.assert_array_equal(np.asarray(shb["x"]), batch["x"])


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

class TestAttention:
    def _naive(self, q, k, v, bias=None):
        scale = 1.0 / np.sqrt(q.shape[-1])
        logits = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(jnp.asarray(logits), -1)
        return np.einsum("bhqk,bkhd->bqhd", np.asarray(probs), v)

    def test_matches_naive(self):
        rng = np.random.default_rng(0)
        q = rng.standard_normal((2, 16, 4, 8), dtype=np.float32)
        k = rng.standard_normal((2, 24, 4, 8), dtype=np.float32)
        v = rng.standard_normal((2, 24, 4, 8), dtype=np.float32)
        out = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        np.testing.assert_allclose(
            np.asarray(out), self._naive(q, k, v), rtol=1e-5, atol=1e-5
        )

    def test_bias_masking(self):
        rng = np.random.default_rng(1)
        q = rng.standard_normal((1, 4, 2, 8), dtype=np.float32)
        k = rng.standard_normal((1, 6, 2, 8), dtype=np.float32)
        v = rng.standard_normal((1, 6, 2, 8), dtype=np.float32)
        bias = np.zeros((1, 1, 4, 6), np.float32)
        bias[..., 3:] = -1e9  # mask the last 3 keys
        out = dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias)
        )
        ref = self._naive(q, k[:, :3], v[:, :3])
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    def test_tiny_seq_path_matches_naive_with_bias(self):
        # the VPU tiny-sequence formulation (used on TPU for seq<=16, e.g.
        # the 4-token Swin windows) must agree with the einsum math,
        # including an additive (1-or-b, h, q, k) bias
        from opendwm_tpu.ops.attention import _tiny_seq_attention

        rng = np.random.default_rng(3)
        q = rng.standard_normal((6, 4, 2, 8), dtype=np.float32)
        k = rng.standard_normal((6, 4, 2, 8), dtype=np.float32)
        v = rng.standard_normal((6, 4, 2, 8), dtype=np.float32)
        for bias in (
            None,
            rng.standard_normal((1, 2, 4, 4), dtype=np.float32),
            rng.standard_normal((6, 2, 4, 4), dtype=np.float32),
        ):
            out = _tiny_seq_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                1.0 / np.sqrt(8),
                None if bias is None else jnp.asarray(bias),
            )
            np.testing.assert_allclose(
                np.asarray(out), self._naive(q, k, v, bias),
                rtol=1e-5, atol=1e-5,
            )

    def test_causal(self):
        rng = np.random.default_rng(2)
        q = rng.standard_normal((1, 5, 1, 4), dtype=np.float32)
        out = dot_product_attention(
            jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), is_causal=True
        )
        # First position attends only to itself.
        np.testing.assert_allclose(
            np.asarray(out)[0, 0], q[0, 0], rtol=1e-5, atol=1e-5
        )
