"""Voxel occupancy metrics (reference src/dwm/metrics/voxel_metrics.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from opendwm_tpu.config import register


@register("VoxelIoU", aliases=("dwm.metrics.voxel_metrics.VoxelIoU",))
class VoxelIoU:
    def __init__(self):
        self.values: list[float] = []

    def update(self, gt_voxel, pred_voxel):
        gt = jnp.asarray(gt_voxel, bool)
        pred = jnp.asarray(pred_voxel, bool)
        if gt.ndim == 3:
            gt, pred = gt[None], pred[None]
        inter = jnp.sum(gt & pred, axis=(-3, -2, -1))
        union = jnp.sum(gt | pred, axis=(-3, -2, -1))
        for i, u in zip(np.asarray(inter).reshape(-1),
                        np.asarray(union).reshape(-1)):
            self.values.append(float(i) / float(u) if u > 0 else float("nan"))

    def compute(self) -> float:
        vals = np.asarray(self.values)
        finite = np.isfinite(vals)
        return float(np.nan_to_num(vals, nan=0.0).sum() / finite.sum())

    def reset(self):
        self.values.clear()


@register("VoxelDiff", aliases=("dwm.metrics.voxel_metrics.VoxelDiff",))
class VoxelDiff:
    def __init__(self):
        self.values: list[float] = []

    def update(self, gt_voxel, pred_voxel):
        gt = jnp.asarray(gt_voxel, bool)
        pred = jnp.asarray(pred_voxel, bool)
        if gt.ndim == 3:
            gt, pred = gt[None], pred[None]
        diff = jnp.sum(gt ^ pred, axis=(-3, -2, -1))
        self.values.extend(float(x) for x in np.asarray(diff).reshape(-1))

    def compute(self) -> float:
        return float(np.mean(self.values))

    def reset(self):
        self.values.clear()
