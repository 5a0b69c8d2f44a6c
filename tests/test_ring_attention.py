"""Ring attention vs single-device attention (exactness across the mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.ops.attention import dot_product_attention
from opendwm_tpu.ops.ring_attention import ring_attention_sharded
from opendwm_tpu.parallel import MeshSpec, make_mesh

pytestmark = pytest.mark.slow



class TestRingAttention:
    @pytest.mark.parametrize("tp", [2, 4, 8])
    def test_matches_full_attention(self, tp):
        mesh = make_mesh(MeshSpec(dp=8 // tp, fsdp=1, tp=tp))
        key = jax.random.PRNGKey(0)
        b, s, h, d = 2, 64, 4, 16
        q = jax.random.normal(key, (b, s, h, d))
        k = jax.random.normal(jax.random.fold_in(key, 1), (b, s, h, d))
        v = jax.random.normal(jax.random.fold_in(key, 2), (b, s, h, d))
        ref = dot_product_attention(q, k, v)
        out = ring_attention_sharded(q, k, v, mesh, axis="tp")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_jit_and_grad(self):
        mesh = make_mesh(MeshSpec(dp=1, fsdp=1, tp=8))
        key = jax.random.PRNGKey(3)
        b, s, h, d = 1, 32, 2, 8
        q = jax.random.normal(key, (b, s, h, d))

        def loss(q):
            out = ring_attention_sharded(q, q, q, mesh, axis="tp")
            return jnp.sum(out**2)

        g = jax.jit(jax.grad(loss))(q)
        assert np.isfinite(np.asarray(g)).all()

        def loss_ref(q):
            return jnp.sum(dot_product_attention(q, q, q) ** 2)

        g_ref = jax.grad(loss_ref)(q)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), atol=5e-4, rtol=1e-3
        )
