"""LiDAR VQVAE trainer (reference src/dwm/pipelines/lidar_vqvae.py).

Losses (reference train_step :163-260): voxel BCE (stabilized), DVGO depth
soft-L1, free-space SDF, and the VQ (commit, codebook) pair, weighted by
config. Codebook health: in-jit age/usage updates + reservoir sampling; the
k-means dead-code revival runs as an explicit host step between train steps
(``maybe_revive_codebook``) mirroring the reference's all-gather → rank-0
scipy kmeans2 → broadcast (vq_point_cloud.py:85-174).
"""

from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from opendwm_tpu.config import register
from opendwm_tpu.models.vq_point_cloud import (
    kmeans_revive,
    update_code_stats,
)
from opendwm_tpu.parallel import mesh as mesh_lib
from opendwm_tpu.parallel import sharding as sharding_lib
from opendwm_tpu.pipelines import optim


@flax.struct.dataclass
class VQTrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    code_age: jax.Array
    code_usage: jax.Array
    reservoir: jax.Array
    reservoir_initialized: jax.Array


def stable_bce_with_logits(logits, targets):
    """Numerically-stable BCE (reference lidar_vae.py:38-47)."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


@register(
    "LidarCodebook", aliases=("dwm.pipelines.lidar_vqvae.LidarCodebook",)
)
class LidarCodebook:
    def __init__(
        self,
        vq_point_cloud,
        common_config: Optional[dict] = None,
        training_config: Optional[dict] = None,
        optimizer_config: Optional[dict] = None,
        lr_scheduler_config: Optional[dict] = None,
        mesh=None,
        sharding_policy: str = "ddp",
        sharding_min_size: int = sharding_lib.MIN_SHARD_SIZE,
    ):
        self.model = vq_point_cloud
        self.common_config = common_config or {}
        self.training_config = training_config or {}
        self.mesh = mesh or mesh_lib.make_mesh()
        self.policy = sharding_policy
        self.sharding_min_size = sharding_min_size
        self.tx = optim.build_optimizer(
            optimizer_config, self.training_config, lr_scheduler_config
        )
        self._jit_cache: dict = {}

    def init_state(self, rng, example_batch) -> VQTrainState:
        params = self.model.init(
            rng, example_batch["lidar_points"],
            example_batch["lidar_points_mask"],
        )
        n_e = self.model.vector_quantizer.n_e
        e_dim = self.model.vector_quantizer.e_dim
        state = VQTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params["params"]),
            code_age=jnp.full((n_e,), 10000.0),
            code_usage=jnp.zeros((n_e,)),
            reservoir=jnp.zeros((n_e * 10, e_dim)),
            reservoir_initialized=jnp.zeros((), bool),
        )
        shardings = self.state_shardings(state)
        return jax.tree.map(jax.device_put, state, shardings)

    def state_shardings(self, state):
        rep = sharding_lib.replicated(self.mesh)
        return VQTrainState(
            step=rep,
            params=sharding_lib.param_shardings(
                state.params, self.mesh, self.policy, self.sharding_min_size
            ),
            opt_state=sharding_lib.param_shardings(
                state.opt_state, self.mesh, self.policy,
                self.sharding_min_size,
            ),
            code_age=rep, code_usage=rep, reservoir=rep,
            reservoir_initialized=rep,
        )

    def loss_fn(self, params, batch, rng):
        tc = self.training_config
        out = self.model.apply(
            params, batch["lidar_points"], batch["lidar_points_mask"]
        )
        voxel_loss = stable_bce_with_logits(
            out["lidar_voxel"].astype(jnp.float32),
            out["voxels"].astype(jnp.float32),
        ) * tc.get("voxel_loss_coef", 1.0)
        commit, codebook = out["emb_loss"]
        emb_loss = (commit + codebook) * tc.get("emb_loss_coef", 1.0)
        depth_loss = out["depth_loss"] * tc.get("depth_loss_coef", 1.0)
        sdf_loss = out["sdf_loss"] * tc.get("sdf_loss_coef", 1.0)
        loss = voxel_loss + emb_loss + depth_loss + sdf_loss
        metrics = {
            "loss": loss, "voxel_loss": voxel_loss, "emb_loss": emb_loss,
            "depth_loss": depth_loss, "sdf_loss": sdf_loss,
        }
        # features for reservoir sampling + code stats
        _, z_q, _, idx = self.model.apply(
            params, batch["lidar_points"], batch["lidar_points_mask"],
            method=self.model.encode,
        )
        return loss, (metrics, jax.lax.stop_gradient(z_q), idx)

    def _train_step_impl(self, state: VQTrainState, batch, rng):
        (loss, (metrics, feats, idx)), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True
        )(state.params, batch, rng)
        updates, new_opt = self.tx.update(
            grads["params"], state.opt_state, state.params["params"]
        )
        new_params = {
            "params": optax.apply_updates(state.params["params"], updates)
        }
        n_e = self.model.vector_quantizer.n_e
        age, usage = update_code_stats(
            idx, state.code_age, state.code_usage, n_e
        )
        # reservoir: replace 1% (or fill fully on first update)
        flat = feats.reshape(-1, feats.shape[-1])
        res = state.reservoir
        k_res = jax.random.fold_in(rng, 17)
        take = jax.random.choice(
            k_res, flat.shape[0], (res.shape[0] // 100,), replace=False
        )
        rolled = jnp.concatenate(
            [res[res.shape[0] // 100:], flat[take]], axis=0
        )
        fill_take = jax.random.choice(
            jax.random.fold_in(rng, 23), flat.shape[0], (res.shape[0],),
            replace=True,
        )
        res = jnp.where(
            state.reservoir_initialized, rolled, flat[fill_take]
        )
        new_state = VQTrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt,
            code_age=age, code_usage=usage, reservoir=res,
            reservoir_initialized=jnp.ones((), bool),
        )
        return new_state, metrics

    def train_step(self, state, batch, rng):
        if "train" not in self._jit_cache:
            self._jit_cache["train"] = jax.jit(
                self._train_step_impl, donate_argnums=(0,),
                out_shardings=(self.state_shardings(state), None),
            )
        return self._jit_cache["train"](state, batch, rng)

    def maybe_revive_codebook(self, state: VQTrainState, seed: int = 0):
        """Host-side k-means dead-code revival when >3% of codes are dead
        (reference update_reservoir :108-117)."""
        vq = self.model.vector_quantizer
        age = np.asarray(state.code_age)
        dead_frac = (age >= vq.dead_limit).sum() / vq.n_e
        if dead_frac <= 0.03:
            return state, False
        params = flax.core.unfreeze(state.params) if hasattr(
            flax.core, "unfreeze") else state.params
        codebook = np.asarray(
            params["params"]["vector_quantizer"]["embedding"]
        )
        new_codebook = kmeans_revive(
            codebook, np.asarray(state.reservoir), age, vq.dead_limit, seed
        )
        params["params"]["vector_quantizer"]["embedding"] = jnp.asarray(
            new_codebook
        )
        state = state.replace(
            params=params,
            code_age=jnp.zeros_like(state.code_age),
            code_usage=jnp.zeros_like(state.code_usage),
        )
        return state, True
