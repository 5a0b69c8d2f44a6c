"""Copilot4D ray-based point-cloud errors.

Reference src/dwm/utils/metrics_copilot4d.py:246-322: every ground-truth
LiDAR ray (azimuth, elevation from the sensor origin) is matched to the
angularly-nearest predicted return; the predicted depth is re-projected
along the gt ray, clamped to the evaluation range, and compared — yielding
mean/median L1 and absolute-relative depth errors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def spherical_projection(points: jax.Array):
    """(N, 3) → (azimuth, elevation, range) (reference :246-252)."""
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    d = jnp.sqrt(x * x + y * y + z * z)
    azimuth = jnp.arctan2(x, y)
    elevation = jnp.arctan2(z, y)
    return azimuth, elevation, d


def compute_ray_errors(
    pred: jax.Array,
    gt: jax.Array,
    origin: jax.Array,
    pred_mask=None,
    gt_mask=None,
    pc_range=(-70.0, -70.0, -4.5, 70.0, 70.0, 4.5),
):
    """Returns (l1_mean, absrel_mean, l1_median, absrel_median)."""
    if pred_mask is None:
        pred_mask = jnp.ones(pred.shape[0], bool)
    if gt_mask is None:
        gt_mask = jnp.ones(gt.shape[0], bool)

    pred_n = pred - origin
    gt_n = gt - origin
    th_p, ph_p, d_p = spherical_projection(pred_n)
    th_g, ph_g, d_g = spherical_projection(gt_n)
    pred_valid = pred_mask & (d_p > 1e-2)
    gt_valid = gt_mask & (d_g > 1e-2)

    # nearest predicted ray per gt ray in (azimuth, elevation) space
    ps = jnp.stack([th_p, ph_p], -1)
    gs = jnp.stack([th_g, ph_g], -1)
    d2 = (
        jnp.sum(gs**2, -1, keepdims=True)
        - 2 * gs @ ps.T
        + jnp.sum(ps**2, -1)[None]
    )
    d2 = jnp.where(pred_valid[None], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=-1)

    unit = gt_n / jnp.maximum(d_g[:, None], 1e-9)
    interp = origin + d_p[idx][:, None] * unit

    lo = jnp.asarray(pc_range[:3])
    hi = jnp.asarray(pc_range[3:])
    in_range = jnp.all((gt >= lo) & (gt <= hi), -1)
    valid = gt_valid & in_range & (d_g > 0.01)

    eucl = jnp.linalg.norm(gt - interp, axis=-1)
    absrel = eucl / jnp.maximum(d_g, 1e-9)
    count = jnp.maximum(jnp.sum(gt_valid), 1)

    l1_mean = jnp.sum(jnp.where(valid, eucl, 0.0)) / count
    absrel_mean = jnp.sum(jnp.where(valid, absrel, 0.0)) / count
    big = jnp.where(valid, eucl, jnp.nan)
    l1_median = jnp.nanmedian(big)
    absrel_median = jnp.nanmedian(jnp.where(valid, absrel, jnp.nan))
    return l1_mean, absrel_mean, l1_median, absrel_median
