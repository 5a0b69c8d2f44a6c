"""Voxelizer + DVGO renderer semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu.ops.dvgo import (
    DVGORenderer,
    alphas_to_weights,
    raw_to_alpha,
    trilinear_grid_query,
)
from opendwm_tpu.ops.voxelize import Voxelizer, voxels_to_points


def make_vox():
    return Voxelizer(
        x_min=-4.0, x_max=4.0, y_min=-4.0, y_max=4.0, step=1.0,
        z_min=-1.0, z_max=1.0, z_step=0.5,
    )


class TestVoxelizer:
    def test_grid_shape(self):
        v = make_vox()
        assert v.grid_shape == (4, 8, 8)

    def test_single_point_lands_in_cell(self):
        v = make_vox()
        pts = jnp.array([[[0.5, -3.5, 0.75]]])  # x, y, z
        mask = jnp.ones((1, 1), bool)
        grid = v(pts, mask)
        assert grid.shape == (1, 4, 8, 8)
        # x=0.5 → col 4; y=-3.5 → row 0; z=0.75 → depth 3
        assert grid[0, 3, 0, 4] == 1.0
        assert float(grid.sum()) == 1.0

    def test_out_of_bounds_and_masked_ignored(self):
        v = make_vox()
        pts = jnp.array([[[10.0, 0.0, 0.0], [0.0, 0.0, 0.0]]])
        mask = jnp.array([[True, False]])
        grid = v(pts, mask)
        assert float(grid.sum()) == 0.0

    def test_batch_time_dims(self):
        v = make_vox()
        pts = jnp.zeros((2, 3, 5, 3))
        mask = jnp.ones((2, 3, 5), bool)
        grid = v(pts, mask)
        assert grid.shape == (2, 3, 4, 8, 8)
        # all 5 points in the same cell → occupancy still 1 (max scatter)
        assert float(grid.max()) == 1.0
        assert float(grid.sum()) == 6.0

    def test_voxels_to_points_roundtrip(self):
        v = make_vox()
        pts = jnp.array([[[0.5, -3.5, 0.75]]])
        grid = v(pts, jnp.ones((1, 1), bool))
        coords, occ = voxels_to_points(grid, v)
        sel = np.asarray(coords[0])[np.asarray(occ[0])]
        np.testing.assert_allclose(sel, [[0.5, -3.5, 0.75]], atol=0.51)


class TestDVGO:
    def test_alphas_to_weights_matches_definition(self):
        alpha = jnp.array([[0.5, 0.5, 0.5]])
        w, last = alphas_to_weights(alpha)
        np.testing.assert_allclose(
            np.asarray(w[0]), [0.5, 0.25, 0.125], atol=1e-6
        )
        np.testing.assert_allclose(float(last[0]), 0.125, atol=1e-6)

    def test_raw_to_alpha_range(self):
        a = raw_to_alpha(jnp.array([-100.0, 0.0, 100.0]), 0.0, 0.5)
        assert 0 <= float(a[0]) < 1e-6
        assert float(a[2]) > 0.99

    def test_trilinear_center_value(self):
        grid = jnp.zeros((1, 2, 2, 2))
        grid = grid.at[0, 1, 1, 1].set(8.0)
        # midpoint interpolates to 1/8 of the corner value
        out = trilinear_grid_query(
            grid, jnp.array([[0.5, 0.5, 0.5]]), (0, 0, 0), (1, 1, 1)
        )
        np.testing.assert_allclose(np.asarray(out), [[1.0]], atol=1e-5)

    def test_depth_render_finds_occupied_voxel(self):
        # A dense wall at x≈2 in an empty grid: rays along +x should render
        # expected depth ≈ 2.
        d, h, w = 8, 16, 16
        grid = jnp.full((1, d, h, w), -20.0)
        wall_idx = int(round((2.0 - (-4.0)) / 8.0 * (w - 1)))
        grid = grid.at[:, :, :, wall_idx].set(20.0)

        renderer = DVGORenderer(
            xyz_min=(-4, -4, -1), xyz_max=(4, 4, 1),
            stepsize=0.1, max_steps=120,
        )
        rays_o = jnp.zeros((4, 3))
        rays_d = jnp.array([[3.0, 0.0, 0.0]] * 4)  # returns at x=3
        depth, loss_sdf, alphainv = renderer(
            lambda f: f[..., 0], rays_o, rays_d, grid
        )
        # Origin at x=0; wall voxel col 11 maps (align_corners) to
        # x = -4 + 11/15*8 ≈ 1.87, with the interpolated sigmoid turning on
        # about half a voxel earlier → expected depth ≈ 1.6-1.9.
        assert 1.4 < float(depth[0]) < 2.0
        # Ray passes free space before the wall → transmittance collapses.
        assert float(alphainv[0]) < 1e-3
        assert np.isfinite(float(loss_sdf))

    def test_block_gather_matches_corner8(self):
        # The single-gather 2x2x2 block query must equal the 8-gather
        # path for in-range points (out-of-range points are masked by the
        # renderer's ``inside`` test, so only in-range equality matters).
        rng = np.random.default_rng(0)
        grid = jnp.asarray(rng.standard_normal((5, 4, 6, 7)), jnp.float32)
        pts = jnp.asarray(
            rng.uniform(-1.0, 1.0, (3, 11, 3)), jnp.float32
        )
        a = trilinear_grid_query(grid, pts, (-1, -1, -1), (1, 1, 1),
                                 mode="corner8")
        b = trilinear_grid_query(grid, pts, (-1, -1, -1), (1, 1, 1),
                                 mode="block")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    def test_render_query_modes_agree(self):
        rng = np.random.default_rng(1)
        grid = jnp.asarray(rng.standard_normal((1, 4, 8, 8)), jnp.float32)
        rays_o = jnp.zeros((8, 3))
        rays_d = jnp.asarray(rng.uniform(-3, 3, (8, 3)), jnp.float32)
        kw = dict(xyz_min=(-4, -4, -1), xyz_max=(4, 4, 1),
                  stepsize=0.2, max_steps=50)
        d1, s1, a1 = DVGORenderer(**kw, query_mode="corner8")(
            lambda f: f[..., 0], rays_o, rays_d, grid)
        d2, s2, a2 = DVGORenderer(**kw, query_mode="block")(
            lambda f: f[..., 0], rays_o, rays_d, grid)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(s1), float(s2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=1e-5, atol=1e-5)

    def test_differentiable(self):
        grid = jnp.zeros((1, 4, 8, 8))
        renderer = DVGORenderer(
            xyz_min=(-4, -4, -1), xyz_max=(4, 4, 1),
            stepsize=0.2, max_steps=50,
        )
        rays_o = jnp.zeros((2, 3))
        rays_d = jnp.array([[2.0, 0.5, 0.0], [1.0, -1.0, 0.2]])

        def loss(g):
            depth, sdf, _ = renderer(lambda f: f[..., 0], rays_o, rays_d, g)
            return jnp.sum(depth) + sdf

        g = jax.grad(loss)(grid)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0
