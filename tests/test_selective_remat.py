"""Selective block remat (remat_block_layers) is numerically a no-op.

Remat changes WHERE activations come from in the backward (saved vs
recomputed), never the math: gradients under full remat, selective remat
(odd joint blocks only), and no remat must agree to float tolerance.
This pins the round-5 `remat_block_layers` knob (bench.py
BENCH_TRAIN_REMAT=half) against silently changing the train step.

Reference trains with torch.utils.checkpoint on every block
(src/dwm/models/crossview_temporal_dit.py gradient_checkpointing); the
selective middle ground has no reference counterpart.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.models.mmdit import DiTCrossviewTemporal

from test_mmdit import TINY, make_inputs

pytestmark = pytest.mark.slow


def _grads(remat_cfg):
    model = DiTCrossviewTemporal(**TINY, **remat_cfg)
    inputs = make_inputs(jax.random.PRNGKey(1))
    params = model.init(jax.random.PRNGKey(0), **inputs)
    target = jax.random.normal(
        jax.random.PRNGKey(2), inputs["sample"].shape)

    def loss_fn(p):
        pred = model.apply(p, **inputs)
        return jnp.mean((pred - target) ** 2)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    return float(loss), grads


def test_selective_remat_matches_full_and_none():
    loss_none, g_none = _grads(dict(gradient_checkpointing=False))
    loss_full, g_full = _grads(dict(gradient_checkpointing=True))
    loss_half, g_half = _grads(dict(
        gradient_checkpointing=True,
        remat_block_layers=(1, 3),
    ))
    assert np.isclose(loss_none, loss_full, rtol=1e-5)
    assert np.isclose(loss_none, loss_half, rtol=1e-5)

    flat_none = jax.tree_util.tree_leaves(g_none)
    for name, g in (("full", g_full), ("half", g_half)):
        flat = jax.tree_util.tree_leaves(g)
        assert len(flat) == len(flat_none)
        for a, b in zip(flat_none, flat):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
                err_msg=f"grad mismatch under remat={name}")


def test_remat_block_layers_out_of_range_is_inert():
    # listing layers that don't exist simply remats nothing
    loss_a, _ = _grads(dict(gradient_checkpointing=True,
                            remat_block_layers=()))
    loss_b, _ = _grads(dict(gradient_checkpointing=False))
    assert np.isclose(loss_a, loss_b, rtol=1e-5)
