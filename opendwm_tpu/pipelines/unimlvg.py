"""UniMLVG pipeline (stand-alone SD3 DiT multi-view long-video generation).

Capability parity with reference src/dwm/pipelines/unimlvg.py: flow-matching
training with output preconditioning (:578-646), autoregressive input styles
``sd`` / ``svd`` (context latents + mask channel concat) / ``vista`` (random
visible prefix, weighted) / ``pred`` (reference-timestep masking)
(gen_ar_input :508-576, fill_svd_mask :495), explicit view modeling through
the same DiT, and a 3-stage training recipe driven purely by config.

Built on the CTSD pipeline base; the deltas live in the latent/timestep
construction and loss masking.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from opendwm_tpu.config import register
from opendwm_tpu.pipelines.ctsd import CTSDPipeline, get_conditions


def fill_svd_mask(num_init_frames: int, latent: jax.Array):
    """Zero all but the first ``num_init_frames`` and emit the per-frame
    visibility mask channel (reference :495-507). latent: (b,t,v,h,w,c)."""
    t_idx = jnp.arange(latent.shape[1])[None, :, None, None, None, None]
    visible = t_idx < num_init_frames
    ori = jnp.where(visible, latent, 0.0)
    mask = jnp.broadcast_to(
        visible, latent.shape[:-1] + (1,)
    ).astype(latent.dtype)
    # mask only where the visible context is non-empty
    nonzero = (
        jnp.sum(jnp.abs(ori), axis=tuple(range(1, ori.ndim)), keepdims=True)
        > 0
    )
    return ori, mask * nonzero.astype(latent.dtype)


@register("Unimlvg", aliases=("dwm.pipelines.unimlvg.Unimlvg",))
class UnimlvgPipeline(CTSDPipeline):
    """CTSD base + UniMLVG's autoregressive input construction."""

    def gen_ar_input(
        self,
        rng: jax.Array,
        noise_input: jax.Array,
        latent: jax.Array,
        timesteps: jax.Array,
        infer: bool,
        cxt_condition_mask: Optional[jax.Array] = None,
        first_autoregressive: bool = False,
    ):
        cc = self.common_config
        style = cc.get("ar_input_type")
        if style is None or style == "sd":
            return noise_input, timesteps, None

        if style == "svd":
            lat = latent
            if cxt_condition_mask is not None:
                lat = jnp.where(
                    cxt_condition_mask.reshape(
                        (-1,) + (1,) * (lat.ndim - 1)
                    ),
                    lat, 0.0,
                )
            ori, mask = fill_svd_mask(
                cc["ar_input_cfg"]["num_init_frames"], lat
            )
            return (
                jnp.concatenate([noise_input, ori, mask], axis=-1),
                timesteps, None,
            )

        if style == "vista":
            max_frames = 4
            probs = jnp.asarray([2.0**i for i in range(max_frames)])
            probs = probs / probs.sum()
            k = jax.random.choice(rng, max_frames, p=probs)
            t_idx = jnp.arange(latent.shape[1])[
                None, :, None, None, None, None
            ]
            visible = t_idx < k
            ori = jnp.where(visible, latent, 0.0)
            mask = jnp.broadcast_to(
                visible, latent.shape[:-1] + (1,)
            ).astype(latent.dtype)
            return (
                jnp.concatenate([noise_input, ori, mask], axis=-1),
                timesteps, None,
            )

        if style == "pred":
            b, t, v = noise_input.shape[:3]
            visible_frames = cc.get("visible_frame", 1)
            base = (
                jnp.arange(t)[None, :, None] < visible_frames
            ).astype(jnp.float32)
            base = jnp.broadcast_to(base, (b, t, v))
            if not infer:
                k1, k2 = jax.random.split(rng)
                r = jax.random.uniform(k1, (b, 1, 1))
                ratio_vg = self.training_config.get("video_gen_ratio", 0.0)
                ratio_ip = self.training_config.get("image_pred_ratio", 0.0)
                drop_views = (
                    jax.random.uniform(k2, (b, t, v)) < 0.5
                ).astype(jnp.float32)
                mask = jnp.where(
                    r < ratio_vg,
                    0.0,
                    jnp.where(
                        r < ratio_vg + ratio_ip, base * (1 - drop_views),
                        base,
                    ),
                )
            elif self.inference_config.get("disable_reference", False) and \
                    first_autoregressive:
                mask = jnp.zeros_like(base)
            else:
                mask = base
            ref_t = cc.get("reference_timesteps", 0.0)
            new_timesteps = mask * ref_t + (1 - mask) * timesteps
            mask6 = mask[..., None, None, None]
            new_input = mask6 * latent + (1 - mask6) * noise_input
            return new_input, new_timesteps, mask6
        raise NotImplementedError(style)

    def init_state(self, rng, example_batch):
        latent = example_batch["latents"]
        b, t, v = latent.shape[:3]
        k_init, k_ar = jax.random.split(rng)
        conds = get_conditions(example_batch, self.common_config)
        timesteps = jnp.zeros((b, t, v))
        model_input, timesteps, _ = self.gen_ar_input(
            k_ar, latent, latent, timesteps, infer=False
        )
        params = self.model.init(
            k_init, sample=model_input, timestep=timesteps, **conds
        )
        from opendwm_tpu.pipelines.ctsd import TrainState

        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=self.tx.init(params["params"]),
        )
        return self.shard_state(state)

    def loss_fn(self, params, batch, rng):
        latent = batch["latents"]
        b, t, v = latent.shape[:3]
        tc = self.training_config
        precondition = tc.get("precondition_outputs", True)
        k_noise, k_time, k_text, k_box, k_map, k_cxt, k_ar = (
            jax.random.split(rng, 7)
        )
        noise = jax.random.normal(k_noise, latent.shape, latent.dtype)
        indices = self.train_scheduler.sample_train_indices(k_time, (b,))
        sigmas = self.train_scheduler.sigmas_at(indices)
        timesteps = self.train_scheduler.timesteps_at(indices)
        sigmas6 = sigmas.reshape(b, 1, 1, 1, 1, 1)
        noisy = sigmas6 * noise + (1 - sigmas6) * latent
        timesteps = jnp.broadcast_to(timesteps[:, None, None], (b, t, v))

        masks = {
            "text_condition_mask": (
                jax.random.uniform(k_text, (b,))
                < tc.get("text_prompt_condition_ratio", 1.0)
            ),
            "box_condition_mask": (
                jax.random.uniform(k_box, (b,))
                < tc.get("3dbox_condition_ratio", 1.0)
            ),
            "hdmap_condition_mask": (
                jax.random.uniform(k_map, (b,))
                < tc.get("hdmap_condition_ratio", 1.0)
            ),
        }
        conds = get_conditions(batch, self.common_config, **masks)

        cxt_mask = (
            jax.random.uniform(k_cxt, (b,))
            < tc.get("cxt_condition_ratio", 1.0)
        )
        model_input, timesteps, ar_mask = self.gen_ar_input(
            k_ar, noisy, latent, timesteps, infer=False,
            cxt_condition_mask=cxt_mask,
        )

        pred = self.model.apply(
            {"params": params}, sample=model_input, timestep=timesteps,
            **conds,
        )
        if precondition:
            pred_out = pred * (-sigmas6) + noisy
            target = latent
        else:
            pred_out = pred
            target = noise - latent

        if self.common_config.get("ar_input_type") == "pred" and \
                ar_mask is not None:
            pred_out = pred_out * (1 - ar_mask)
            target = target * (1 - ar_mask)

        loss = jnp.mean(
            (pred_out.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        )
        return loss, {"sd_loss": loss}  # reference key (ctsd.py:1368)

    def inference_pipeline(
        self,
        params,
        batch: dict,
        latent_shape: tuple,
        rng: jax.Array,
        image_latents: Optional[jax.Array] = None,
        reference_frame_count: int = 0,
        first_autoregressive: bool = True,
    ) -> jax.Array:
        """Flow-matching sampler with ar_input construction each step."""
        ic = self.inference_config
        n_steps = ic["inference_steps"]
        guidance_scale = ic.get("guidance_scale", 1.0)
        do_cfg = "guidance_scale" in ic
        b, t, v = latent_shape[:3]
        sched = self.test_scheduler
        ts_table = jnp.asarray(sched.inference_timesteps(n_steps))
        conds = get_conditions(
            batch, self.common_config, do_classifier_free_guidance=do_cfg
        )
        context_latent = (
            image_latents
            if image_latents is not None
            else jnp.zeros(latent_shape)
        )
        rng, k_init = jax.random.split(rng)
        latents0 = jax.random.normal(k_init, latent_shape, jnp.float32)

        def body(carry, i):
            latents, key = carry
            key, k_ar = jax.random.split(key)
            timesteps = jnp.full((b, t, v), ts_table[i])
            model_input, ts_in, _ = self.gen_ar_input(
                k_ar, latents, context_latent, timesteps, infer=True,
                first_autoregressive=first_autoregressive,
            )
            if do_cfg:
                model_input = jnp.concatenate([model_input, model_input], 0)
                ts_in = jnp.concatenate([ts_in, ts_in], 0)
            pred = self.model.apply(
                params, sample=model_input, timestep=ts_in, **conds
            )
            if do_cfg:
                uncond, cond = jnp.split(pred, 2, 0)
                pred = uncond + guidance_scale * (cond - uncond)
            latents = sched.step_by_indices(
                pred, jnp.full((b, t, v), i), latents, n_steps
            )
            return (latents, key), ()

        (latents, _), _ = jax.lax.scan(
            body, (latents0, rng), jnp.arange(n_steps)
        )
        return latents
