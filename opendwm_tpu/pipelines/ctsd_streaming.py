"""Streaming CTSD: frame-in/frame-out FIFO diffusion for interactive use.

Capability parity with reference ``StreamingCrossviewTemporalSD``
(src/dwm/pipelines/ctsd.py:2010-2277): a sliding window of latents sits at
staggered noise levels (diffusion forcing); each incoming frame condition
triggers ``steps_per_inference`` denoise iterations of the whole queue,
completing exactly the oldest frame, which pops as output while fresh noise
joins at the tail. Warmup accumulates a full window of conditions first
(reference :2163-2191), then the steady-state loop is constant latency
(:2193-2219).

TPU design: streaming state is an explicit pytree (latents + condition
queue + counters); `step_stream` is one jitted scan over steps_per_inference
iterations; queue shifts are jnp.roll + index writes — no host round trips
inside the loop.
"""

from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp

from opendwm_tpu.config import register
from opendwm_tpu.pipelines.ctsd import CTSDPipeline, get_conditions


@flax.struct.dataclass
class StreamingState:
    latents: jax.Array            # (b, T, v, h, w, c)
    conditions: Any               # pytree with (b, T, v, ...) leaves
    frames_received: jax.Array    # () int32
    rng: jax.Array
    # Unconditional text embeddings for CFG (single-frame (b, 1, v, ...)
    # leaves, broadcast over the queue at guidance time). None → zeros.
    uncond_text: Any = None


_TEXT_KEYS = ("encoder_hidden_states", "pooled_projections")


@register(
    "StreamingCTSDPipeline",
    aliases=("dwm.pipelines.ctsd.StreamingCrossviewTemporalSD",),
)
class StreamingCTSDPipeline(CTSDPipeline):
    """CTSD base + FIFO streaming protocol.

    Required inference_config: ``inference_steps`` divisible by the window
    length (reference assert ctsd.py:2037).
    """

    def steps_per_inference(self, window: int) -> int:
        n = self.inference_config["inference_steps"]
        assert n % window == 0, (
            f"inference_steps {n} must divide by window {window}"
        )
        return n // window

    def reset_streaming(
        self, latent_shape: tuple, cond_template: dict, rng: jax.Array,
        uncond_text: Optional[dict] = None,
    ) -> StreamingState:
        """Fresh queue: all-noise latents, zeroed condition slots
        (reference reset_streaming :2012-2035)."""
        k_noise, k_state = jax.random.split(rng)
        latents = jax.random.normal(k_noise, latent_shape, jnp.float32)
        conds = jax.tree.map(jnp.zeros_like, cond_template)
        return StreamingState(
            latents=latents,
            conditions=conds,
            frames_received=jnp.zeros((), jnp.int32),
            rng=k_state,
            uncond_text=uncond_text,
        )

    def send_frame_condition(
        self, state: StreamingState, frame_batch: dict
    ) -> StreamingState:
        """Push one frame's conditions into the queue (slot = tail).

        frame_batch carries single-frame (b, 1, v, ...) condition tensors
        with the same keys as the training batch. Text conditions refresh
        only every ``text_prompt_interval`` frames (reference refreshes
        the encoded prompt at an interval, ctsd.py:2105-2148); in between,
        the previous frame's text is carried forward.
        """
        frame_conds = get_conditions(frame_batch, self.common_config)
        interval = int(
            self.inference_config.get("text_prompt_interval", 1)
        )

        def push(queue, new):
            if new is None or not hasattr(queue, "ndim") or queue.ndim < 2:
                return queue
            rolled = jnp.roll(queue, -1, axis=1)
            return rolled.at[:, -1].set(
                new[:, 0] if new.ndim == queue.ndim else new
            )

        refresh = (
            jnp.ones((), bool) if interval <= 1
            else state.frames_received % interval == 0
        )
        new_conds = {}
        for key, q in state.conditions.items():
            new = frame_conds.get(key)
            pushed = push(q, new)
            if (
                key in _TEXT_KEYS and interval > 1
                and new is not None and hasattr(q, "ndim") and q.ndim >= 2
            ):
                # Carry the previous tail text forward between refreshes.
                held = push(q, q[:, -1:])
                pushed = jnp.where(refresh, pushed, held)
            new_conds[key] = pushed

        uncond_text = state.uncond_text
        new_uncond = {
            k: frame_batch[f"uncond_{k}"]
            for k in _TEXT_KEYS if f"uncond_{k}" in frame_batch
        }
        if new_uncond:
            uncond_text = dict(uncond_text or {}, **new_uncond)
        return state.replace(
            conditions=new_conds,
            frames_received=state.frames_received + 1,
            uncond_text=uncond_text,
        )

    def step_stream(self, params, state: StreamingState):
        """Advance the queue by one frame's worth of denoise steps and emit
        the completed (oldest) frame's latent.

        Returns (new_state, output_latent (b, v, h, w, c), ready: bool array)
        — ``ready`` is False during warmup (fewer conditions than window).
        """
        b, T, v = state.latents.shape[:3]
        spi = self.steps_per_inference(T)
        n_steps = self.inference_config["inference_steps"]
        sched = self.test_scheduler
        ts_table = jnp.asarray(sched.inference_timesteps(n_steps))
        guidance = self.inference_config.get("guidance_scale", 1.0)
        do_cfg = "guidance_scale" in self.inference_config
        # sequential_cfg: run the two CFG branches as two b-sized passes
        # instead of one 2b-sized pass. Exact same math; on a single v5e
        # b=1 already saturates the MXU and the 2b program both compiles
        # far slower and runs no faster (measured in bench.py --e2e), so
        # serving configs set this.
        sequential = bool(self.inference_config.get("sequential_cfg", False))

        conds = dict(state.conditions)
        uncond_conds = None
        if do_cfg:
            # Per-key unconditional branch, mirroring the reference's
            # get_conditions(do_classifier_free_guidance=True) — zeros for
            # fps/camera ids would be out-of-distribution
            # (reference ctsd.py:310-349,186-253):
            #   * layout images → uncondition_image_color fill
            #   * added_time_ids → passthrough, action ids set to -1000
            #   * text → provided uncond embeddings (else zeros)
            #   * camera geometry → passthrough
            uncond_color = self.common_config.get(
                "uncondition_image_color", 0.0
            )
            added_mode = self.common_config.get("added_time_ids")
            uncond_text = state.uncond_text or {}
            cfg_conds = {}
            uncond_conds = {}
            for k, q in conds.items():
                if not hasattr(q, "ndim"):
                    cfg_conds[k] = q
                    uncond_conds[k] = q
                    continue
                if k == "condition_image_tensor":
                    uncond = jnp.full_like(q, uncond_color)
                elif k == "added_time_ids":
                    if added_mode == "fps_camera_transforms_action":
                        uncond = jnp.concatenate(
                            [q[..., :-2],
                             jnp.full_like(q[..., -2:], -1000.0)], -1
                        )
                    else:
                        uncond = q
                elif k in _TEXT_KEYS:
                    u = uncond_text.get(k)
                    uncond = (
                        jnp.broadcast_to(u.astype(q.dtype), q.shape)
                        if u is not None else jnp.zeros_like(q)
                    )
                else:
                    uncond = q
                uncond_conds[k] = uncond
                if not sequential:
                    cfg_conds[k] = jnp.concatenate([uncond, q], 0)
            if not sequential:
                conds = cfg_conds
                uncond_conds = None
        # disable flags sized for the (possibly doubled) batch
        bb = 2 * b if (do_cfg and not sequential) else b
        for d in (conds,) + ((uncond_conds,) if uncond_conds else ()):
            d["disable_crossview"] = jnp.zeros((bb,), bool)
            d["disable_temporal"] = jnp.zeros((bb,), bool)

        rng, k_new = jax.random.split(state.rng)

        def body(latents, s):
            # frame j sits at ladder position (T-1-j)*spi + s
            pos = (T - 1 - jnp.arange(T)) * spi + s
            step_indices = jnp.broadcast_to(pos[None, :, None], (b, T, v))
            timesteps = ts_table[jnp.clip(step_indices, 0, n_steps - 1)]
            model_input = latents
            if do_cfg and sequential:
                uncond = self.model.apply(
                    params, sample=model_input, timestep=timesteps,
                    **uncond_conds,
                )
                cond = self.model.apply(
                    params, sample=model_input, timestep=timesteps, **conds
                )
                pred = uncond + guidance * (cond - uncond)
            else:
                if do_cfg:
                    model_input = jnp.concatenate(
                        [model_input, model_input], 0
                    )
                    ts_in = jnp.concatenate([timesteps, timesteps], 0)
                else:
                    ts_in = timesteps
                pred = self.model.apply(
                    params, sample=model_input, timestep=ts_in, **conds
                )
                if do_cfg:
                    uncond, cond = jnp.split(pred, 2, 0)
                    pred = uncond + guidance * (cond - uncond)
            latents = sched.step_by_indices(
                pred, step_indices, latents, n_steps
            )
            return latents, ()

        latents, _ = jax.lax.scan(
            body, state.latents, jnp.arange(spi)
        )
        output = latents[:, 0]
        fresh = jax.random.normal(
            k_new, (b, 1) + state.latents.shape[2:], state.latents.dtype
        )
        latents = jnp.concatenate([latents[:, 1:], fresh], axis=1)
        ready = state.frames_received >= T
        return (
            state.replace(latents=latents, rng=rng),
            output,
            ready,
        )

    def receive_frame(self, params, state: StreamingState):
        """send_frame_condition → receive_frame cadence of the reference
        streaming CLI (streaming.py:98-141): one queue step per tick."""
        return self.step_stream(params, state)
