"""LiDAR MaskGIT pipeline (Copilot4D-style masked token modeling).

Capability parity with reference src/dwm/pipelines/lidar_maskgit.py:
- training (:527-640): frozen VQVAE tokenize → task sampling
  (generation/prediction) → cosine-schedule random masking
  (random_masking :330, mutlitask_mask_code :410) → CE on masked positions
  with label smoothing 0.1 + accuracy.
- inference (:1023-1155): T-step iterative unmasking with categorical
  sampling, blank-code suppression for the first 10 steps, CFG, and
  gumbel-noised confidence re-masking on the cosine schedule; decode to
  voxel logits → gumbel-sigmoid binarization → points.

TPU redesign: masking is a rank-threshold over per-token noise (traced mask
ratio — no dynamic shapes); the iterative decode is one `lax.scan`; the
train step is pure/jitted with the VQ tokenizer params closed over as
frozen constants; blank-code suppression is a static index list baked into
the scan.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from opendwm_tpu.config import register
from opendwm_tpu.parallel import mesh as mesh_lib
from opendwm_tpu.parallel import sharding as sharding_lib
from opendwm_tpu.pipelines import optim
from opendwm_tpu.pipelines.ctsd import TrainState


def gamma_fn(mode: str = "cosine"):
    if mode == "linear":
        return lambda r: 1 - r
    if mode == "cosine":
        return lambda r: jnp.cos(r * math.pi / 2)
    if mode == "square":
        return lambda r: 1 - r**2
    if mode == "cubic":
        return lambda r: 1 - r**3
    raise NotImplementedError(mode)


def random_mask(rng, shape, mask_ratio):
    """Boolean mask (True = masked) with ~mask_ratio of positions masked,
    chosen by per-token noise ranks (reference random_masking :330-357,
    reformulated rank-threshold so the ratio may be a traced scalar)."""
    n, l = shape
    noise = jax.random.uniform(rng, (n, l))
    ranks = jnp.argsort(jnp.argsort(noise, axis=1), axis=1)
    len_keep = jnp.floor(l * (1.0 - mask_ratio)).astype(jnp.int32)
    return ranks >= len_keep


def gumbel_sigmoid(rng, logits, hard: bool = True, tau: float = 1.0):
    """Binary gumbel relaxation of voxel logits (reference functional.py)."""
    g1 = -jnp.log(-jnp.log(jax.random.uniform(rng, logits.shape) + 1e-20))
    g2 = -jnp.log(
        -jnp.log(
            jax.random.uniform(jax.random.fold_in(rng, 1), logits.shape)
            + 1e-20
        )
    )
    soft = jax.nn.sigmoid((logits + g1 - g2) / tau)
    if hard:
        return (soft > 0.5).astype(logits.dtype)
    return soft


def get_maskgit_conditions(
    batch: dict,
    *,
    box_condition_mask=None,
    hdmap_condition_mask=None,
    do_classifier_free_guidance: bool = False,
    uncond_color: float = 0.0,
):
    """BEV layout raster context (reference get_maskgit_conditions :408-470):
    concat of 3dbox/hdmap BEV images, with per-sample dropout and CFG
    duplication. Returns None when no layout is present."""
    images = []
    for key, mask in (
        ("3dbox_bev_images", box_condition_mask),
        ("hdmap_bev_images", hdmap_condition_mask),
    ):
        if key in batch and batch[key] is not None:
            img = batch[key]
            if mask is not None:
                img = jnp.where(
                    mask.reshape((-1,) + (1,) * (img.ndim - 1)), img,
                    uncond_color,
                )
            images.append(img)
    if not images:
        return None
    ctx = jnp.concatenate(images, -1)
    if do_classifier_free_guidance:
        ctx = jnp.concatenate([jnp.full_like(ctx, uncond_color), ctx], 0)
    return ctx


@register(
    "MaskGITPipeline", aliases=("dwm.pipelines.lidar_maskgit.MaskGITPipeline",)
)
class MaskGITPipeline:
    """Train/inference driver. ``vq_params`` are the frozen tokenizer params
    (trained by LidarCodebook); only the bidirectional transformer trains."""

    def __init__(
        self,
        vq_point_cloud,
        bi_directional_transformer,
        common_config: Optional[dict] = None,
        training_config: Optional[dict] = None,
        inference_config: Optional[dict] = None,
        optimizer_config: Optional[dict] = None,
        lr_scheduler_config: Optional[dict] = None,
        mesh=None,
        sharding_policy: Optional[str] = None,
        sharding_min_size: int = sharding_lib.MIN_SHARD_SIZE,
        blank_code: Optional[Sequence[int]] = None,
    ):
        self.vq = vq_point_cloud
        self.model = bi_directional_transformer
        self.common_config = common_config or {}
        self.training_config = training_config or {}
        self.inference_config = inference_config or {}
        self.mesh = mesh or mesh_lib.make_mesh()
        self.policy = sharding_policy or self.common_config.get(
            "distribution_framework", "ddp"
        )
        self.sharding_min_size = sharding_min_size
        self.blank_code = tuple(blank_code) if blank_code else ()
        self.gamma = gamma_fn(self.common_config.get("gamma_mode", "cosine"))
        self.tx = optim.build_optimizer(
            optimizer_config, self.training_config, lr_scheduler_config
        )
        self.vq_params = None  # set via load_vq_params
        self._jit_cache: dict = {}

    # -- setup -----------------------------------------------------------------

    def load_vq_params(self, vq_params):
        # device arrays: restored orbax trees are host numpy, which cannot
        # be indexed by tracers inside the jitted train step
        self.vq_params = jax.tree.map(jnp.asarray, vq_params)

    def tokenize(self, points, points_mask):
        """Frozen VQ tokenize: returns (code (N,L,D), indices (N,L))."""
        voxels, z_q, _, idx = self.vq.apply(
            self.vq_params, points, points_mask, method=self.vq.encode
        )
        return voxels, z_q, idx.reshape(z_q.shape[0], -1)

    def init_state(self, rng, example_batch) -> TrainState:
        points = example_batch["lidar_points"]
        mask = example_batch["lidar_points_mask"]
        b, t = points.shape[:2]
        _, code, idx = self.tokenize(points, mask)
        ctx = get_maskgit_conditions(example_batch)
        params = self.model.init(
            rng, code, idx, context=ctx, batch_size=b, num_frames=t
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

    # -- training ---------------------------------------------------------------

    def loss_fn(self, params, batch, rng):
        tc = self.training_config
        points = batch["lidar_points"]
        pmask = batch["lidar_points_mask"]
        b, t = points.shape[:2]
        k_task, k_ratio, k_mask, k_ref, k_box, k_map, k_pert = (
            jax.random.split(rng, 7)
        )

        _, code, idx = self.tokenize(points, pmask)
        code = jax.lax.stop_gradient(code)
        idx = jax.lax.stop_gradient(idx)
        n, l = idx.shape

        # task selection: generation vs prediction (reference :560-576)
        is_prediction = (
            jax.random.uniform(k_task, ()) < tc.get("task_type_ratio", 0.0)
        )
        mask_ratio = self.gamma(jax.random.uniform(k_ratio, ()))
        base_mask = random_mask(k_mask, (n, l), mask_ratio)

        max_ref = min(t, tc.get("max_reference_frame", 3))
        n_ref = jax.random.randint(k_ref, (b,), 1, max_ref + 1)
        frame_idx = jnp.broadcast_to(
            jnp.arange(t)[None, :], (b, t)
        )
        future = (frame_idx >= n_ref[:, None]).reshape(n)[:, None]
        pred_mask = base_mask & future

        mask = jnp.where(is_prediction, pred_mask, base_mask)
        x_indices = jnp.where(mask, -1, idx)

        box_mask = (
            jax.random.uniform(k_box, (b,))
            < tc.get("3dbox_condition_ratio", 1.0)
        )
        map_mask = (
            jax.random.uniform(k_map, (b,))
            < tc.get("hdmap_condition_ratio", 1.0)
        )
        ctx = get_maskgit_conditions(
            batch, box_condition_mask=box_mask, hdmap_condition_mask=map_mask
        )

        logits = self.model.apply(
            params, code, x_indices, context=ctx, batch_size=b,
            num_frames=t, perturb_rng=k_pert,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        n_cls = logits.shape[-1]
        smooth = 0.1
        onehot = jax.nn.one_hot(idx, n_cls)
        target = onehot * (1 - smooth) + smooth / n_cls
        ce = -jnp.sum(target * logp, -1)
        maskf = mask.astype(jnp.float32)
        loss = jnp.sum(ce * maskf) / (jnp.sum(maskf) + 1e-5)
        acc = jnp.sum(
            (jnp.argmax(logits, -1) == idx) * maskf
        ) / (jnp.sum(maskf) + 1e-5)
        return loss, {"ce_loss": loss, "acc_0": acc}

    def _train_step_impl(self, state, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True
        )(state.params, batch, rng)
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

    # -- inference ---------------------------------------------------------------

    def _lookup_codes(self, ids):
        quantizer = self.vq.vector_quantizer
        vq_codes_params = self.vq_params["params"]["vector_quantizer"]
        return quantizer.apply(
            {"params": vq_codes_params}, ids, method=quantizer.lookup
        )

    def _iterative_decode(
        self, params, code_dtype, init_idx, ctx, rng, b, t
    ):
        """T-step iterative unmasking over one window (reference
        lidar_maskgit.py:1023-1155 inner loop, shared by the single-window
        and autoregressive paths). ``init_idx`` (n, l) carries -1 at masked
        positions; known positions are pinned for the whole schedule.
        Returns (x_final, idx_final)."""
        ic = self.inference_config
        T = ic.get("sample_steps", self.common_config.get("T", 20))
        use_blank = ic.get("use_blank_code", True) and len(self.blank_code)
        use_maskgit = ic.get("use_maskgit", False)
        do_cfg = ic.get("do_classifier_free_guidance", False)
        guidance = ic.get("guidance_scale", 3.0)
        choice_temperature = 2.0

        num_unknown = jnp.sum(init_idx == -1, -1)
        mask_token = params["params"]["mask_token"]
        blank = jnp.asarray(self.blank_code, jnp.int32) if use_blank else None

        def body(carry, step):
            x, code_idx, key = carry
            key, k_sample, k_gumbel = jax.random.split(key, 3)
            x_in = jnp.concatenate([x, x], 0) if do_cfg else x
            idx_in = jnp.concatenate([code_idx, code_idx], 0) if do_cfg \
                else code_idx
            logits = self.model.apply(
                params, x_in, idx_in, context=ctx, batch_size=2 * b if do_cfg
                else b, num_frames=t,
            ).astype(jnp.float32)
            if use_blank:
                suppress = jnp.zeros(logits.shape[-1]).at[blank].set(-10000.0)
                logits = jnp.where(step < 10, logits + suppress, logits)
            if do_cfg:
                uncond, cond = jnp.split(logits, 2, 0)
                logits = uncond + guidance * (cond - uncond)

            sample_ids = jax.random.categorical(k_sample, logits)
            prob = jnp.take_along_axis(
                jax.nn.softmax(logits, -1), sample_ids[..., None], -1
            )[..., 0]
            known = code_idx != -1
            sample_ids = jnp.where(known, code_idx, sample_ids)
            prob = jnp.where(known, 1e10, prob)

            ratio = (step + 1.0) / T
            mask_ratio = self.gamma(ratio)
            mask_len = jnp.clip(
                jnp.minimum(
                    (num_unknown * mask_ratio).astype(jnp.int32),
                    num_unknown - 1,
                ),
                1,
            )

            conf = jnp.log(jnp.clip(prob, 1e-20))
            if not use_maskgit:
                g = jax.random.uniform(k_gumbel, prob.shape)
                gumbels = -jnp.log(-jnp.log(jnp.clip(g, 1e-20)))
                conf = conf + choice_temperature * (1.0 - ratio) * gumbels

            cutoff = jnp.take_along_axis(
                jnp.sort(conf, -1), mask_len[:, None], -1
            )
            # Positions known at window start (reference frames / pinned
            # tokens) are never re-masked — the reference zeroes the mask on
            # reference rows (lidar_maskgit.py:986 mask[reference_frame_mask]
            # = False); without this, fully-known rows would still re-mask
            # one token through the mask_len >= 1 clamp.
            remask = (conf < cutoff) & (init_idx == -1)

            # pin the carry dtype: the codebook may be stored in a
            # different dtype than the tokenized codes (e.g. bf16 params
            # under f32 compute), and a dtype flip in the scan carry
            # fails to trace
            new_x = self._lookup_codes(sample_ids).astype(code_dtype)
            is_last = step == T - 1
            new_code_idx = jnp.where(
                ~is_last & remask, -1, sample_ids
            )
            new_x = jnp.where(
                (~is_last & remask)[..., None],
                mask_token.astype(code_dtype),
                new_x,
            )
            return (new_x, new_code_idx, key), ()

        x0 = jnp.where(
            (init_idx == -1)[..., None],
            mask_token.astype(code_dtype),
            self._lookup_codes(jnp.maximum(init_idx, 0)).astype(code_dtype),
        )
        (x_final, idx_final, _), _ = jax.lax.scan(
            body, (x0, init_idx, rng), jnp.arange(T)
        )
        return x_final, idx_final

    def inference_pipeline(
        self,
        params,
        batch: dict,
        rng: jax.Array,
        task_type: str = "generation",
        num_reference_frame: int = 3,
    ) -> dict:
        """Iterative unmasking decode. Returns dict with gt/pred/vq voxels
        (binary) and code indices."""
        do_cfg = self.inference_config.get(
            "do_classifier_free_guidance", False
        )
        points = batch["lidar_points"]
        pmask = batch["lidar_points_mask"]
        b, t = points.shape[:2]
        voxels, code, code_indices = self.tokenize(points, pmask)
        n, l = code_indices.shape

        if task_type == "prediction":
            frame_idx = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
            is_ref = (frame_idx < num_reference_frame).reshape(n)[:, None]
            init_idx = jnp.where(
                is_ref, code_indices, -jnp.ones_like(code_indices)
            )
        else:
            init_idx = -jnp.ones_like(code_indices)

        ctx = get_maskgit_conditions(
            batch, do_classifier_free_guidance=do_cfg
        )
        x_final, idx_final = self._iterative_decode(
            params, code.dtype, init_idx, ctx, rng, b, t
        )

        dec_params = {"params": self.vq_params["params"]["lidar_decoder"]}
        _, pred_logits = self.vq.lidar_decoder.apply(dec_params, x_final)
        return self._finish_inference(
            rng, dec_params, pred_logits, code, voxels, idx_final, b, t,
            task_type,
        )

    def autoregressive_inference_pipeline(
        self,
        params,
        batch: dict,
        rng: jax.Array,
        num_reference_frame: Optional[int] = None,
        window_frames: Optional[int] = None,
        use_ground_truth_as_reference: bool = True,
    ) -> dict:
        """Long-horizon temporal rollout (reference lidar_maskgit.py:863-1021
        ``autoregressive_inference_pipeline``): decode a window of
        ``window_frames``, slide forward carrying the last
        ``num_reference_frame`` frames' sampled codes as the next window's
        pinned reference tokens. BEV layout context is re-sliced per window
        by absolute frame range (tail windows pad by repeating the last
        frame, reference :925-931).

        Returns dict with pred_voxels/gt_voxels (b, total_t, D, H, W),
        pred_points + masks, and pred_indices.
        """
        ic, cc, tc = (
            self.inference_config, self.common_config, self.training_config
        )
        ref = num_reference_frame or cc.get("max_reference_frame", 3)
        tw = window_frames or tc.get("num_training_frames", 8)
        do_cfg = ic.get("do_classifier_free_guidance", False)

        points = batch["lidar_points"]
        pmask = batch["lidar_points_mask"]
        b, total = points.shape[:2]
        assert tw > ref, (tw, ref)
        n_windows = max(1, -(-(total - ref) // (tw - ref)))

        gt_voxels, _, all_indices = self.tokenize(points, pmask)
        l = all_indices.shape[-1]
        all_indices = all_indices.reshape(b, total, l)

        def window_conditions(start: int, end: int):
            wb = {}
            for key in ("3dbox_bev_images", "hdmap_bev_images"):
                if key in batch and batch[key] is not None:
                    x = batch[key]
                    if x.ndim == 4:  # flattened (b*total, H, W, C)
                        x = x.reshape((b, total) + x.shape[1:])
                    x = x[:, start:end]
                    if end - start < tw:
                        pad = jnp.repeat(
                            x[:, -1:], tw - (end - start), axis=1
                        )
                        x = jnp.concatenate([x, pad], 1)
                    wb[key] = x.reshape((b * tw,) + x.shape[2:])
            return get_maskgit_conditions(
                wb, do_classifier_free_guidance=do_cfg,
                uncond_color=cc.get("uncondition_image_color", 0.0),
            )

        frame_row = jnp.arange(tw)[None, :, None]  # (1, tw, 1)
        is_ref_row = jnp.broadcast_to(
            frame_row < ref, (b, tw, l)
        ).reshape(b * tw, l)

        if use_ground_truth_as_reference:
            ref_ids = all_indices[:, :ref]  # (b, ref, l)
        else:
            ref_ids = None

        mask_dtype = jnp.float32
        outputs_vox = []
        outputs_idx = []
        for w in range(n_windows):
            rng, k_win = jax.random.split(rng)
            start = w * (tw - ref)
            end = min(start + tw, total)
            ctx = window_conditions(start, end)

            if ref_ids is None:
                init_idx = -jnp.ones((b * tw, l), jnp.int32)
            else:
                padded = jnp.concatenate(
                    [ref_ids,
                     -jnp.ones((b, tw - ref, l), ref_ids.dtype)], axis=1
                ).reshape(b * tw, l)
                init_idx = jnp.where(is_ref_row, padded, -1)

            x_final, idx_final = self._iterative_decode(
                params, mask_dtype, init_idx, ctx, k_win, b, tw
            )

            dec_params = {
                "params": self.vq_params["params"]["lidar_decoder"]
            }
            _, logits = self.vq.lidar_decoder.apply(dec_params, x_final)
            rng, k_vox = jax.random.split(rng)
            vox = gumbel_sigmoid(k_vox, logits)
            vox = vox.reshape((b, tw) + vox.shape[1:])
            ids = idx_final.reshape(b, tw, l)

            crop = 0 if w == 0 else ref
            outputs_vox.append(vox[:, crop:])
            outputs_idx.append(ids[:, crop:])
            # next window's reference = this window's tail samples
            ref_ids = ids[:, -ref:]

        pred_voxels = jnp.concatenate(outputs_vox, 1)[:, :total]
        pred_indices = jnp.concatenate(outputs_idx, 1)[:, :total]
        from opendwm_tpu.ops.voxelize import voxels_to_points

        pred_points, pred_points_mask = voxels_to_points(
            pred_voxels, self.vq.voxelizer
        )
        return {
            "gt_voxels": gt_voxels,
            "pred_voxels": pred_voxels,
            "pred_indices": pred_indices,
            "pred_points": pred_points,
            "pred_points_mask": pred_points_mask,
            "task_type": "autoregressive_prediction",
        }

    def save_results(
        self,
        results: dict,
        batch: dict,
        output_path: str,
        suffix: str = "0",
    ) -> list:
        """Export generation results (reference save_results :714-860):
        BEV preview PNGs per sequence, optional predicted / GT point dumps
        as float32 ``.bin`` files padded to 5 columns (nuScenes LiDAR
        layout). Paths derive from ``batch['sample_data']`` filenames when
        present, else ``{batch}_{frame}.bin`` indices."""
        import os

        from opendwm_tpu.utils.preview import (
            make_lidar_bev_preview,
            save_tensor_to_image,
        )

        ic = self.inference_config
        written = []
        gt = np.asarray(results["gt_voxels"])
        pred = np.asarray(results["pred_voxels"])
        b, t = pred.shape[:2]

        def frame_name(bi, ti, ext):
            sd = batch.get("sample_data")
            if sd is not None:
                try:
                    name = sd[bi][ti]["filename"]
                    name = os.path.basename(
                        name[0] if isinstance(name, list) else name
                    )
                    return os.path.splitext(name)[0] + ext
                except (KeyError, IndexError, TypeError):
                    pass
            return f"{bi:02d}_{ti:03d}{ext}"

        if ic.get("save_preview", True):
            out_dir = os.path.join(output_path, f"pred_voxel_{suffix}_preview")
            os.makedirs(out_dir, exist_ok=True)
            for bi in range(b):
                # (t, H, 2W, 3): GT | prediction per frame, frames stacked
                # vertically into one PNG per sequence.
                frames = make_lidar_bev_preview([gt[bi], pred[bi]])
                grid = frames.reshape(-1, *frames.shape[2:])
                path = os.path.join(out_dir, frame_name(bi, 0, ".png"))
                save_tensor_to_image(path, grid)
                written.append(path)

        def dump_points(key_pts, key_mask, dirname):
            pts = np.asarray(results[key_pts])
            msk = np.asarray(results[key_mask])
            out_dir = os.path.join(output_path, dirname)
            os.makedirs(out_dir, exist_ok=True)
            for bi in range(b):
                for ti in range(t):
                    p = pts[bi, ti][msk[bi, ti]]
                    padded = np.concatenate(
                        [p.astype(np.float32),
                         np.zeros((p.shape[0], 2), np.float32)], axis=-1
                    )
                    path = os.path.join(out_dir, frame_name(bi, ti, ".bin"))
                    with open(path, "wb") as f:
                        f.write(padded.tobytes())
                    written.append(path)

        if ic.get("save_pred_results", False):
            dump_points(
                "pred_points", "pred_points_mask",
                f"pred_voxel_{suffix}_samples",
            )
        if ic.get("save_gt_results", False) and "gt_voxels" in results:
            from opendwm_tpu.ops.voxelize import voxels_to_points

            gp, gm = voxels_to_points(
                jnp.asarray(gt), self.vq.voxelizer
            )
            results = dict(results, gt_points=gp, gt_points_mask=gm)
            dump_points("gt_points", "gt_points_mask", f"gt_{suffix}_samples")
        return written

    def evaluate_pipeline(
        self,
        params,
        batches,
        rng: jax.Array,
        global_step: int = 0,
        metrics: Optional[dict] = None,
        logger=None,
        task_type: str = "generation",
        num_reference_frame: int = 3,
    ) -> dict:
        """Generate per validation batch and compute voxel IoU/diff +
        Chamfer over occupied-voxel centers (reference evaluate_pipeline
        :1157-1198)."""
        from opendwm_tpu.metrics import (
            PointCloudChamfer,
            VoxelDiff,
            VoxelIoU,
        )
        from opendwm_tpu.ops.voxelize import voxels_to_points

        metrics = metrics or {
            "voxel_iou": VoxelIoU(),
            "voxel_diff": VoxelDiff(),
            "chamfer": PointCloudChamfer(),
        }
        for i, batch in enumerate(batches):
            out = self.inference_pipeline(
                params, batch, jax.random.fold_in(rng, i),
                task_type=task_type,
                num_reference_frame=num_reference_frame,
            )
            gt, pred = out["gt_voxels"], out["pred_voxels"]
            for name, m in metrics.items():
                if name.startswith("voxel"):
                    m.update(gt > 0.5, pred > 0.5)
                elif name.startswith("chamfer"):
                    vox = self.vq.voxelizer
                    b, t = gt.shape[:2]
                    for bi in range(b):
                        for ti in range(t):
                            gp, gm = voxels_to_points(gt[bi, ti], vox)
                            pp, pm = voxels_to_points(pred[bi, ti], vox)
                            m.update(pp, gp, pm, gm)
        results = {}
        for name, m in metrics.items():
            results[f"evaluation/{name}"] = m.compute()
            m.reset()
        if logger is not None:
            logger.log(global_step, results)
        return results

    def _finish_inference(
        self, rng, dec_params, pred_logits, code, voxels, idx_final, b, t,
        task_type,
    ):
        _, vq_logits = self.vq.lidar_decoder.apply(dec_params, code)
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 99))
        pred_vox = gumbel_sigmoid(k1, pred_logits)
        vq_vox = gumbel_sigmoid(k2, vq_logits)
        return {
            "gt_voxels": voxels.reshape((b, t) + voxels.shape[2:]),
            "pred_voxels": pred_vox.reshape((b, t) + pred_vox.shape[1:]),
            "vq_voxels": vq_vox.reshape((b, t) + vq_vox.shape[1:]),
            "pred_indices": idx_final.reshape(b, t, -1),
            "task_type": task_type,
        }
