"""Ray/render helpers (reference src/dwm/utils/render.py:36-221)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opendwm_tpu.models.mmdit import get_rays  # noqa: F401  (re-export)


def project_points_to_image(
    points: jax.Array,            # (..., N, 3) world/ego points
    camera_intrinsics: jax.Array,  # (..., 3, 3)
    camera_from_world: jax.Array,  # (..., 4, 4)
):
    """Points → pixel coords + depth + in-front mask (the lidar→camera
    projection used by the multi-modal VAE, reference render.py:120-180)."""
    pts_h = jnp.concatenate(
        [points, jnp.ones(points.shape[:-1] + (1,))], -1
    )
    cam = jnp.einsum("...ij,...nj->...ni", camera_from_world, pts_h)[..., :3]
    z = cam[..., 2]
    uvw = jnp.einsum("...ij,...nj->...ni", camera_intrinsics, cam)
    uv = uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-6)
    return uv, z, z > 1e-3


def rays_for_pixels(
    camera_intrinsics: jax.Array,  # (3, 3)
    camera_to_world: jax.Array,    # (4, 4)
    pixels: jax.Array,             # (N, 2)
):
    """Per-pixel world-space rays (origin, unit direction)."""
    ones = jnp.ones((pixels.shape[0], 1))
    pix_h = jnp.concatenate([pixels + 0.5, ones], -1)
    dirs = (jnp.linalg.inv(camera_intrinsics) @ pix_h.T)
    world_dirs = camera_to_world[:3, :3] @ dirs
    world_dirs = world_dirs / jnp.linalg.norm(
        world_dirs, axis=0, keepdims=True
    )
    origin = camera_to_world[:3, 3]
    return origin, world_dirs.T
