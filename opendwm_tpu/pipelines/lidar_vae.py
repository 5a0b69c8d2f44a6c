"""LiDAR KL-VAE trainer (reference src/dwm/pipelines/lidar_vae.py).

Losses (reference train_step :216-280): stabilized voxel BCE + weighted KL +
DVGO depth/SDF render losses; the reference's NaN-loss guard (:244-248)
becomes a jnp.where that zeroes non-finite step losses.
"""

from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from opendwm_tpu.config import register
from opendwm_tpu.parallel import mesh as mesh_lib
from opendwm_tpu.parallel import sharding as sharding_lib
from opendwm_tpu.pipelines import optim
from opendwm_tpu.pipelines.ctsd import TrainState
from opendwm_tpu.pipelines.lidar_vqvae import stable_bce_with_logits


@register("LidarVAE", aliases=("dwm.pipelines.lidar_vae.LidarVAE",))
class LidarVAE:
    def __init__(
        self,
        vae_point_cloud=None,
        lidar_vae=None,  # reference config key (configs/lidar/lidar_vae_*)
        common_config: Optional[dict] = None,
        training_config: Optional[dict] = None,
        optimizer_config: Optional[dict] = None,
        lr_scheduler_config: Optional[dict] = None,
        mesh=None,
        sharding_policy: str = "ddp",
        sharding_min_size: int = sharding_lib.MIN_SHARD_SIZE,
    ):
        self.model = vae_point_cloud if vae_point_cloud is not None \
            else lidar_vae
        assert self.model is not None, "vae_point_cloud (or lidar_vae) required"
        self.common_config = common_config or {}
        self.training_config = training_config or {}
        self.mesh = mesh or mesh_lib.make_mesh()
        self.policy = sharding_policy
        self.sharding_min_size = sharding_min_size
        self.tx = optim.build_optimizer(
            optimizer_config, self.training_config, lr_scheduler_config
        )
        self._jit_cache: dict = {}

    def init_state(self, rng, example_batch) -> TrainState:
        params = self.model.init(
            rng, example_batch["lidar_points"],
            example_batch["lidar_points_mask"],
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=self.tx.init(params["params"]),
        )
        shardings = self.state_shardings(state)
        return jax.tree.map(jax.device_put, state, shardings)

    def state_shardings(self, state):
        return TrainState(
            step=sharding_lib.replicated(self.mesh),
            params=sharding_lib.param_shardings(
                state.params, self.mesh, self.policy, self.sharding_min_size
            ),
            opt_state=sharding_lib.param_shardings(
                state.opt_state, self.mesh, self.policy,
                self.sharding_min_size,
            ),
        )

    def loss_fn(self, params, batch, rng):
        tc = self.training_config
        out = self.model.apply(
            params, batch["lidar_points"], batch["lidar_points_mask"],
            rng=rng,
        )
        voxel_loss = stable_bce_with_logits(
            out["lidar_voxel"].astype(jnp.float32),
            out["voxels"].astype(jnp.float32),
        ) * tc.get("voxel_loss_coef", 1.0)
        kl_loss = out["kl_loss"] * tc.get("kl_loss_coef", 1e-6)
        depth_loss = out["depth_loss"] * tc.get("depth_loss_coef", 1.0)
        sdf_loss = out["sdf_loss"] * tc.get("sdf_loss_coef", 1.0)
        loss = voxel_loss + kl_loss + depth_loss + sdf_loss
        # NaN guard (reference :244-248): zero the step instead of crashing.
        loss = jnp.where(jnp.isfinite(loss), loss, 0.0)
        return loss, {
            "loss": loss, "voxel_loss": voxel_loss, "kl_loss": kl_loss,
            "depth_loss": depth_loss, "sdf_loss": sdf_loss,
        }

    def _train_step_impl(self, state, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True
        )(state.params, batch, rng)
        grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
        )
        updates, new_opt = self.tx.update(
            grads["params"], state.opt_state, state.params["params"]
        )
        new_params = {
            "params": optax.apply_updates(state.params["params"], updates)
        }
        return (
            TrainState(step=state.step + 1, params=new_params,
                       opt_state=new_opt),
            metrics,
        )

    def train_step(self, state, batch, rng):
        if "train" not in self._jit_cache:
            self._jit_cache["train"] = jax.jit(
                self._train_step_impl, donate_argnums=(0,),
                out_shardings=(self.state_shardings(state), None),
            )
        return self._jit_cache["train"](state, batch, rng)
