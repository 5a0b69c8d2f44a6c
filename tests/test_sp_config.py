"""The sequence-parallel config's model is exact under a real tp mesh.

Drives configs/experimental/ctsd_35_sp_tp_synthetic.json: the flagship
architecture with ``sequence_parallel_axis="tp"`` (exact online-softmax ring
joint attention, ops/ring_attention.py — working where the reference's
enable_sequence_parallelism flag is dead, mask_layers.py:113 there) run
under shard_map over tp=2 must equal the plain single-device forward.
"""

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from opendwm_tpu.config import create_instance_from_config
from opendwm_tpu.parallel.mesh import MeshSpec, make_mesh

CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "configs", "experimental",
    "ctsd_35_sp_tp_synthetic.json",
)

pytestmark = pytest.mark.slow


def _inputs(rng, model_cfg):
    b, t, v, h, w = 1, 2, 2, 8, 8
    ks = jax.random.split(rng, 5)
    return {
        "sample": jax.random.normal(
            ks[0], (b, t, v, h, w, model_cfg["in_channels"])),
        "timestep": jax.random.uniform(
            ks[1], (b, t, v), minval=0.0, maxval=1000.0),
        "encoder_hidden_states": jax.random.normal(
            ks[2], (b, t, v, 4, model_cfg["joint_attention_dim"])),
        "pooled_projections": jax.random.normal(
            ks[3], (b, t, v, model_cfg["pooled_projection_dim"])),
    }


def test_sp_config_matches_plain_forward():
    with open(CONFIG) as f:
        cfg = json.load(f)
    model_cfg = cfg["pipeline"]["model"]
    assert model_cfg["sequence_parallel_axis"] == "tp"

    sp_model = create_instance_from_config(model_cfg)
    plain = sp_model.clone(sequence_parallel_axis=None)

    inputs = _inputs(jax.random.PRNGKey(0), model_cfg)
    params = plain.init(jax.random.PRNGKey(1), **inputs)
    want = plain.apply(params, **inputs)

    mesh = make_mesh(MeshSpec(dp=1, fsdp=1, tp=2), jax.devices()[:2])
    names = tuple(sorted(inputs))

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params),) + (P(),) * len(names),
        out_specs=P(),
        check_vma=False,
    )
    def sp_fwd(p, *vals):
        return sp_model.apply(p, **dict(zip(names, vals)))

    got = sp_fwd(params, *(inputs[k] for k in names))
    err = float(jnp.max(jnp.abs(got - want)))
    assert err < 1e-4, err
    assert np.isfinite(np.asarray(got, np.float32)).all()
