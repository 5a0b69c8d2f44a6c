"""Monocular depth supervision for the joint image+LiDAR line (HoloDrive).

Reference ``make_depth_loss`` (src/dwm/pipelines/ctsd.py:466-616): LiDAR
points are projected into every camera frustum with normalized intrinsics,
binned along the frustum depth range, and supervise the DepthNet's per-pixel
depth-bin logits with cross entropy at the projected pixels.

TPU redesign: points arrive padded + masked (static N), so the whole
projection/gather/CE runs as one vectorized computation over (b, t, v, N) —
the reference's per-view Python loops, count limits, and point bundles exist
to bound ragged GPU work and disappear here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalized_intrinsics(camera_intrinsics, image_size):
    """Scale pixel intrinsics to the unit image square (reference
    dwm.functional.normalize_intrinsic_transform)."""
    k = camera_intrinsics
    w = image_size[..., 0]
    h = image_size[..., 1]
    scale = jnp.stack([
        1.0 / w, jnp.ones_like(w), 1.0 / w,
        jnp.ones_like(h), 1.0 / h, 1.0 / h,
        jnp.ones_like(w), jnp.ones_like(w), jnp.ones_like(w),
    ], -1).reshape(w.shape + (3, 3))
    # elementwise row scaling of [fx 0 cx; 0 fy cy; 0 0 1]
    return k * scale


def make_depth_loss(
    depth_features: jax.Array,   # (b, t, v, Hf, Wf, bins)
    batch: dict,
    depth_frustum_range: tuple,  # (min_depth, max_depth, interval)
    depth_loss_coef: float = 1.0,
):
    b, t, v, hf, wf, bins = depth_features.shape
    points = batch["lidar_points"][..., :3]          # (b, t, N, 3)
    pmask = batch["lidar_points_mask"]               # (b, t, N)
    n = points.shape[2]

    k_norm = normalized_intrinsics(
        batch["camera_intrinsics"], batch["image_size"]
    )  # (b, t, v, 3, 3)
    k_h = jnp.zeros((b, t, v, 4, 4)).at[..., :3, :3].set(k_norm)
    k_h = k_h.at[..., 3, 3].set(1.0)

    ego = batch["ego_transforms"]                    # (b, t, sensors, 4, 4)
    cam = batch["camera_transforms"]                 # (b, t, v, 4, 4)
    lidar = batch.get("lidar_transforms")
    if lidar is None:
        lidar = jnp.broadcast_to(jnp.eye(4), (b, t, 1, 4, 4))
    cam_world = ego[:, :, 1:] @ cam
    lidar_world = ego[:, :, :1] @ lidar
    camera_from_lidar = jnp.linalg.solve(cam_world, lidar_world)
    frustum_from_lidar = k_h @ camera_from_lidar     # (b, t, v, 4, 4)

    pts_h = jnp.concatenate(
        [points, jnp.ones(points.shape[:-1] + (1,))], -1
    )  # (b, t, N, 4)
    proj = jnp.einsum(
        "btvij,btnj->btvni", frustum_from_lidar, pts_h
    )  # (b, t, v, N, 4)
    z = proj[..., 2]
    uv = proj[..., :2] / jnp.where(jnp.abs(z[..., None]) < 1e-6, 1e-6,
                                   z[..., None])
    min_d, max_d, interval = depth_frustum_range
    fd = jnp.round((z - min_d) / interval).astype(jnp.int32)

    valid = (
        pmask[:, :, None, :]
        & (z > 1e-3)
        & (uv[..., 0] > 0) & (uv[..., 0] < 1)
        & (uv[..., 1] > 0) & (uv[..., 1] < 1)
        & (fd >= 0) & (fd < bins)
    )

    # nearest-pixel gather of the depth logits at the projected coords
    px = jnp.clip((uv[..., 0] * wf).astype(jnp.int32), 0, wf - 1)
    py = jnp.clip((uv[..., 1] * hf).astype(jnp.int32), 0, hf - 1)
    flat_feats = depth_features.reshape(b * t * v, hf * wf, bins)
    flat_idx = (py * wf + px).reshape(b * t * v, n)
    logits = jnp.take_along_axis(
        flat_feats, flat_idx[..., None], axis=1
    ).reshape(b, t, v, n, bins)

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    ce = -jnp.take_along_axis(
        logp, jnp.clip(fd, 0, bins - 1)[..., None], -1
    )[..., 0]
    validf = valid.astype(jnp.float32)
    loss = jnp.sum(ce * validf) / jnp.maximum(jnp.sum(validf), 1.0)
    return depth_loss_coef * loss


def depth_bin_to_metric(depth_features, depth_frustum_range):
    """argmax bin → metric depth map (reference
    enum_depth_preds_and_targets head)."""
    min_d, _, interval = depth_frustum_range
    idx = jnp.argmax(depth_features, axis=-1).astype(jnp.float32)
    return min_d + idx * interval
