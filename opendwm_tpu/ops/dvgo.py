"""Differentiable DVGO-style ray rendering, TPU-native.

The reference JIT-compiles DirectVoxGO CUDA kernels (ray sampling, raw→alpha,
alpha→weight exclusive-cumprod compositing; see
src/dwm/models/base_vq_models/dvgo_utils.py:15-214) to render expected depth
along LiDAR rays through a BEV density grid, for the depth/SDF losses of the
LiDAR tokenizers (vq_point_cloud.py:1016-1066).

TPU redesign: rays are marched with a STATIC step count over the grid AABB —
(rays, steps) becomes a dense 2-D problem. Per-point trilinear grid queries
are gathers; alpha compositing is an exclusive cumprod along the step axis
(`jnp.cumprod` — XLA lowers to a log-depth scan); everything is batched,
masked, and differentiable by construction, replacing the three hand-written
CUDA autograd Functions with ~40 lines of jnp.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _corner_fracs(grid_shape, xyz, xyz_min, xyz_max):
    """Base corner indices + interpolation fractions, align_corners=True.

    The floor index is clipped to ``size-2`` so the +1 corner is always
    in-range: for in-range coordinates this is numerically identical to
    clipping both corners independently (at fx == size-1 the fraction
    becomes exactly 1, selecting the last voxel), and out-of-range points
    are masked by the caller's ``inside`` test anyway.
    """
    d, h, w = grid_shape
    xyz_min = jnp.asarray(xyz_min, jnp.float32)
    xyz_max = jnp.asarray(xyz_max, jnp.float32)
    norm = (xyz - xyz_min) / (xyz_max - xyz_min)  # 0..1
    # align_corners=True: 0 → index 0, 1 → index size-1.
    fx = norm[..., 0] * (w - 1)
    fy = norm[..., 1] * (h - 1)
    fz = norm[..., 2] * (d - 1)
    x0 = jnp.clip(jnp.floor(fx), 0, max(w - 2, 0)).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(fy), 0, max(h - 2, 0)).astype(jnp.int32)
    z0 = jnp.clip(jnp.floor(fz), 0, max(d - 2, 0)).astype(jnp.int32)
    tx = jnp.clip(fx - x0, 0.0, 1.0)[..., None]
    ty = jnp.clip(fy - y0, 0.0, 1.0)[..., None]
    tz = jnp.clip(fz - z0, 0.0, 1.0)[..., None]
    return (z0, y0, x0), (tz, ty, tx)


def trilinear_grid_query(
    grid: jax.Array, xyz: jax.Array, xyz_min, xyz_max,
    mode: str = "block",
) -> jax.Array:
    """Sample ``grid`` (C, D, H, W) at world points (..., 3) with
    align_corners=True semantics (reference dvgo_utils.grid_query:41-53).

    grid axes are (z, y, x) like the reference; xyz is world (x, y, z).

    mode="corner8": eight advanced-index gathers (one per cell corner).
    mode="block": ONE ``lax.gather`` fetching the 2x2x2xC corner block per
    point — same values, an eighth of the gather dispatches; measured
    faster on TPU where the render is gather-bound (perf/exp_lidar.py).
    """
    c, d, h, w = grid.shape
    (z0, y0, x0), (tz, ty, tx) = _corner_fracs((d, h, w), xyz, xyz_min,
                                               xyz_max)
    gf = grid.transpose(1, 2, 3, 0)  # (D, H, W, C), channel-last gathers

    if mode == "block" and min(d, h, w) < 2:
        mode = "corner8"  # slice size 2 needs every spatial dim >= 2

    if mode == "block":
        batch_shape = x0.shape
        starts = jnp.stack(
            [z0.reshape(-1), y0.reshape(-1), x0.reshape(-1)], axis=-1
        )
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3, 4),
            collapsed_slice_dims=(),
            start_index_map=(0, 1, 2),
        )
        blk = jax.lax.gather(
            gf, starts, dnums, slice_sizes=(2, 2, 2, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (P, 2, 2, 2, C) — [z, y, x] corner offsets
        blk = blk.reshape(batch_shape + (2, 2, 2, c))
        cz = blk[..., 0, :, :, :] * (1 - tz[..., None, None]) \
            + blk[..., 1, :, :, :] * tz[..., None, None]
        cy = cz[..., 0, :, :] * (1 - ty[..., None]) \
            + cz[..., 1, :, :] * ty[..., None]
        return cy[..., 0, :] * (1 - tx) + cy[..., 1, :] * tx

    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    z1 = jnp.minimum(z0 + 1, d - 1)

    def g(zi, yi, xi):
        return gf[zi, yi, xi]

    c000, c001 = g(z0, y0, x0), g(z0, y0, x1)
    c010, c011 = g(z0, y1, x0), g(z0, y1, x1)
    c100, c101 = g(z1, y0, x0), g(z1, y0, x1)
    c110, c111 = g(z1, y1, x0), g(z1, y1, x1)
    c00 = c000 * (1 - tx) + c001 * tx
    c01 = c010 * (1 - tx) + c011 * tx
    c10 = c100 * (1 - tx) + c101 * tx
    c11 = c110 * (1 - tx) + c111 * tx
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    out = c0 * (1 - tz) + c1 * tz
    return out


def ray_aabb(rays_o, unit_d, xyz_min, xyz_max):
    """Entry/exit distances of rays with an axis-aligned box (slab method)."""
    inv = 1.0 / jnp.where(jnp.abs(unit_d) < 1e-9, 1e-9, unit_d)
    t0 = (xyz_min - rays_o) * inv
    t1 = (xyz_max - rays_o) * inv
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return jnp.maximum(t_near, 0.0), t_far


def alphas_to_weights(alpha: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Volume-rendering weights from per-step alphas (last axis = steps).

    weights_i = alpha_i * prod_{j<i} (1 - alpha_j); also returns the final
    transmittance (reference Alphas2Weights, dvgo_utils.py:196-214).
    """
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    exclusive = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1
    )
    return alpha * exclusive, trans[..., -1]


def raw_to_alpha(density, shift: float, interval: float):
    """alpha = 1 - exp(-softplus(density + shift) * interval)
    (reference Raw2Alpha, dvgo_utils.py:169-193)."""
    return 1.0 - jnp.exp(-jax.nn.softplus(density + shift) * interval)


@dataclasses.dataclass(frozen=True)
class DVGORenderer:
    """Fixed-step-count ray renderer over a feature grid.

    Args mirror dvgo_render (dvgo_utils.py:56-166): an ``mlp`` maps grid
    features to an alpha logit (sigmoid applied here); rays_o is usually 0
    (LiDAR origin) and rays_d are the *unnormalized* returns, so |rays_d| is
    the ground-truth depth for the free-space (SDF) loss.
    """

    xyz_min: tuple
    xyz_max: tuple
    stepsize: float
    max_steps: int
    near: float = 0.0
    query_mode: str = "block"  # see trilinear_grid_query

    def __call__(
        self,
        mlp: Callable,
        rays_o: jax.Array,
        rays_d: jax.Array,
        grid: jax.Array,
        feat_render: bool = False,
        offsets: Optional[jax.Array] = None,
    ):
        """rays_o/rays_d: (N, 3); grid: (C, D, H, W).

        Returns (output, loss_sdf, alphainv_last):
          output: expected depth (N,) — or feature map (N, C) if
          ``feat_render``;
          loss_sdf: mean over rays of Σ weights² before the LiDAR return;
          alphainv_last: final transmittance per ray (N,).
        """
        n = rays_o.shape[0]
        xyz_min = jnp.asarray(self.xyz_min, jnp.float32)
        xyz_max = jnp.asarray(self.xyz_max, jnp.float32)
        norm_d = jnp.linalg.norm(rays_d, axis=-1)
        unit_d = rays_d / jnp.maximum(norm_d[..., None], 1e-9)

        t_near, t_far = ray_aabb(rays_o, unit_d, xyz_min, xyz_max)
        s = jnp.arange(self.max_steps, dtype=jnp.float32)
        t = t_near[:, None] + s[None, :] * self.stepsize  # (N, S)
        pts = rays_o[:, None, :] + unit_d[:, None, :] * t[..., None]
        if offsets is not None:
            pts = pts + offsets

        inside = (
            (t <= t_far[:, None])
            & jnp.all(pts > xyz_min, -1)
            & jnp.all(pts < xyz_max, -1)
        )

        feats = trilinear_grid_query(
            grid, pts, xyz_min, xyz_max, mode=self.query_mode
        )  # (N, S, C)
        alpha = jax.nn.sigmoid(mlp(feats))
        alpha = alpha.reshape(n, self.max_steps)
        alpha = jnp.where(inside, alpha, 0.0)

        weights, alphainv_last = alphas_to_weights(alpha)

        # free-space loss: weight mass before the ground-truth return.
        # Without offsets, |pts - rays_o| is exactly the march distance t
        # (unit direction) — skip the (N, S, 3) norm.
        if offsets is None:
            dist_from_origin = t
        else:
            dist_from_origin = jnp.linalg.norm(
                pts - rays_o[:, None, :], axis=-1
            )
        before_return = (norm_d[:, None] - dist_from_origin) > self.near
        loss_sdf = jnp.mean(
            jnp.sum(jnp.where(before_return, weights**2, 0.0), axis=-1)
        )

        if feat_render:
            output = jnp.einsum("ns,nsc->nc", weights, feats)
        else:
            step_depth = s[None, :] * self.stepsize
            output = jnp.sum(weights * step_depth, axis=-1)
        return output, loss_sdf, alphainv_last
