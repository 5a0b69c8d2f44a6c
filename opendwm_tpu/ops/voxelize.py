"""Point-cloud voxelization (LiDAR → binary BEV occupancy grid).

Reference: src/dwm/models/voxelizer.py — per-sweep floor-index scatter into a
(D, H, W) grid. The reference consumes ragged per-frame point lists; XLA
needs static shapes, so the canonical TPU batch carries points padded to a
fixed N with a validity mask (the host data plane pads; see datasets).

The scatter is a single `zeros.at[flat_idx].max(valid)` — one fused XLA
scatter per batch, no Python loops.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from opendwm_tpu.config import register


@register("Voxelizer", aliases=("dwm.models.voxelizer.Voxelizer",))
@dataclasses.dataclass(frozen=True)
class Voxelizer:
    x_min: float
    x_max: float
    y_min: float
    y_max: float
    step: float
    z_min: float
    z_max: float
    z_step: float

    @property
    def width(self) -> int:
        return round((self.x_max - self.x_min) / self.step)

    @property
    def height(self) -> int:
        return round((self.y_max - self.y_min) / self.step)

    @property
    def depth(self) -> int:
        return round((self.z_max - self.z_min) / self.z_step)

    @property
    def grid_shape(self) -> tuple[int, int, int]:
        return (self.depth, self.height, self.width)

    def __call__(self, points: jax.Array, mask: jax.Array) -> jax.Array:
        """points: (..., N, 3+) xyz[+extras]; mask: (..., N) valid flags.
        Returns (..., D, H, W) float32 occupancy."""
        lead = points.shape[:-2]
        pts = points.reshape((-1,) + points.shape[-2:])
        msk = mask.reshape(-1, mask.shape[-1])

        iw = jnp.floor((pts[..., 0] - self.x_min) / self.step).astype(jnp.int32)
        ih = jnp.floor((pts[..., 1] - self.y_min) / self.step).astype(jnp.int32)
        id_ = jnp.floor(
            (pts[..., 2] - self.z_min) / self.z_step
        ).astype(jnp.int32)

        d, h, w = self.grid_shape
        valid = (
            msk.astype(bool)
            & (iw >= 0) & (iw < w)
            & (ih >= 0) & (ih < h)
            & (id_ >= 0) & (id_ < d)
        )
        flat = jnp.where(valid, (id_ * h + ih) * w + iw, d * h * w)

        def scatter_one(idx, val):
            grid = jnp.zeros((d * h * w + 1,), jnp.float32)
            grid = grid.at[idx].max(val)
            return grid[:-1].reshape(d, h, w)

        out = jax.vmap(scatter_one)(flat, valid.astype(jnp.float32))
        return out.reshape(lead + (d, h, w))

    def voxel_coordinates(self, downsample_scale: int = 1) -> jax.Array:
        """World xyz of voxel centers, shaped (D, H, W, 3) (reference
        get_voxel_coordinates)."""
        xs = jnp.arange(
            self.x_min, self.x_max, self.step / downsample_scale
        ) + self.step / 2
        ys = jnp.arange(
            self.y_min, self.y_max, self.step / downsample_scale
        ) + self.step / 2
        zs = jnp.arange(
            self.z_min, self.z_max, self.z_step / downsample_scale
        ) + self.z_step / 2
        zg, yg, xg = jnp.meshgrid(zs, ys, xs, indexing="ij")
        return jnp.stack([xg, yg, zg], axis=-1)


def voxels_to_points(voxels: jax.Array, voxelizer: Voxelizer):
    """Occupied-voxel centers as padded points + mask (reference
    utils/lidar.py:31 voxel→point conversion; static-shape variant returns
    every voxel center with its occupancy as the mask)."""
    coords = voxelizer.voxel_coordinates()
    flat_coords = coords.reshape(-1, 3)
    lead = voxels.shape[:-3]
    occ = voxels.reshape(lead + (-1,))
    pts = jnp.broadcast_to(flat_coords, lead + flat_coords.shape)
    return pts, occ > 0.5
