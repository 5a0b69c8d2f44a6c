"""LiDAR frame transforms (reference src/dwm/utils/lidar.py:5-41)."""

from __future__ import annotations

import jax.numpy as jnp


def transform_points(points, transform):
    """Apply a 4x4 transform to (..., N, 3) points."""
    rot = transform[..., :3, :3]
    trans = transform[..., :3, 3]
    return points @ jnp.swapaxes(rot, -1, -2) + trans[..., None, :]


def preprocess_points(points, lidar_transforms=None):
    """LiDAR-frame points → ego frame using per-frame lidar_transforms
    ((..., 4, 4)); identity when no calibration is given (reference :5-17)."""
    if lidar_transforms is None:
        return points
    return transform_points(points, lidar_transforms)


def postprocess_points(points, lidar_transforms=None):
    """Ego-frame → LiDAR frame (inverse of preprocess, reference :20-28)."""
    if lidar_transforms is None:
        return points
    inv = jnp.linalg.inv(lidar_transforms)
    return transform_points(points, inv)
