"""GPipe pipeline parallelism: exactness vs sequential (parallel/pipeline.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from opendwm_tpu.parallel.pipeline import pipeline_apply, stack_stage_params

pytestmark = pytest.mark.slow



def block(params, h, *conds):
    out = jnp.tanh(h @ params["w"] + params["b"])
    for c in conds:
        out = out + c
    return out


def make_stages(n, d, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "w": jnp.asarray(rng.standard_normal((d, d)) * 0.3, jnp.float32),
            "b": jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32),
        }
        for _ in range(n)
    ]


def sequential(stages, x, conds=()):
    h = x
    for p in stages:
        h = block(p, h, *conds)
    return h


@pytest.fixture(scope="module")
def pp_mesh():
    devs = jax.devices()[:4]
    return Mesh(np.asarray(devs).reshape(4), ("pp",))


class TestPipelineParallel:
    def test_exact_forward(self, pp_mesh):
        d, batch, m = 16, 24, 8
        stages = make_stages(4, d)
        stacked = stack_stage_params(stages)
        stacked = jax.device_put(
            stacked, NamedSharding(pp_mesh, P("pp"))
        )
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((batch, d)),
            jnp.float32,
        )
        got = pipeline_apply(
            block, stacked, x, pp_mesh, microbatches=m
        )
        want = sequential(stages, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_exact_with_conditioning(self, pp_mesh):
        d, batch, m = 8, 16, 4
        stages = make_stages(4, d, seed=3)
        stacked = stack_stage_params(stages)
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((batch, d)),
            jnp.float32,
        )
        cond = jnp.asarray(
            np.random.default_rng(4).standard_normal((batch, d)) * 0.05,
            jnp.float32,
        )
        got = pipeline_apply(
            block, stacked, x, pp_mesh, microbatches=m, conds=(cond,)
        )
        want = sequential(stages, x, (cond,))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_exact_gradients(self, pp_mesh):
        d, batch, m = 8, 16, 4
        stages = make_stages(4, d, seed=7)
        stacked = stack_stage_params(stages)
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((batch, d)),
            jnp.float32,
        )

        def loss_pp(params, x):
            return jnp.sum(
                pipeline_apply(block, params, x, pp_mesh, microbatches=m)
                ** 2
            )

        def loss_seq(params, x):
            h = x
            for i in range(4):
                p = jax.tree.map(lambda a: a[i], params)
                h = block(p, h)
            return jnp.sum(h**2)

        g_pp = jax.grad(loss_pp)(stacked, x)
        g_seq = jax.grad(loss_seq)(stacked, x)
        for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_eight_stage_mesh(self):
        devs = jax.devices()
        mesh = Mesh(np.asarray(devs).reshape(len(devs)), ("pp",))
        d, batch = 8, 16
        stages = make_stages(len(devs), d, seed=9)
        stacked = stack_stage_params(stages)
        x = jnp.ones((batch, d), jnp.float32) * 0.1
        got = pipeline_apply(
            block, stacked, x, mesh, microbatches=8
        )
        want = sequential(stages, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_batch_not_divisible_raises(self, pp_mesh):
        stages = make_stages(4, 8)
        stacked = stack_stage_params(stages)
        x = jnp.ones((10, 8))
        with pytest.raises(ValueError):
            pipeline_apply(block, stacked, x, pp_mesh, microbatches=4)

    def test_composes_with_dp_axis(self):
        devs = jax.devices()
        mesh = Mesh(np.asarray(devs).reshape(2, 4), ("dp", "pp"))
        d, batch = 8, 16
        stages = make_stages(4, d, seed=11)
        stacked = stack_stage_params(stages)
        x = jnp.asarray(
            np.random.default_rng(6).standard_normal((batch, d)),
            jnp.float32,
        )
        got = pipeline_apply(block, stacked, x, mesh, microbatches=4)
        want = sequential(stages, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )
