"""Box geometry, category styling, and trajectory-camera math."""

import numpy as np
import pytest

from opendwm_tpu.utils.lidar_visualizer_utils import (
    Box,
    box_in_range,
    boxes_to_render,
    camera_path_from_trajectory,
    category_color,
    densify_polyline,
    filter_points_in_range,
    interpolate_poses,
    quaternion_yaw,
    render_trajectory,
    transform_matrix,
)

YAW90 = (np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4))  # +90° about z


class TestTransforms:
    def test_transform_matrix_roundtrip(self):
        fwd = transform_matrix((1.0, 2.0, 3.0), YAW90)
        inv = transform_matrix((1.0, 2.0, 3.0), YAW90, inverse=True)
        np.testing.assert_allclose(fwd @ inv, np.eye(4), atol=1e-12)

    def test_quaternion_yaw(self):
        assert quaternion_yaw(YAW90) == pytest.approx(np.pi / 2)
        assert quaternion_yaw((1, 0, 0, 0)) == pytest.approx(0.0)


class TestBox:
    def test_corners_extent_and_order(self):
        box = Box((10.0, 0.0, 1.0), (2.0, 4.0, 1.5))  # w=2 l=4 h=1.5
        c = box.corners()
        assert c.shape == (3, 8)
        np.testing.assert_allclose(c[0].max() - c[0].min(), 4.0)
        np.testing.assert_allclose(c[1].max() - c[1].min(), 2.0)
        np.testing.assert_allclose(c[2].max() - c[2].min(), 1.5)
        np.testing.assert_allclose(c.mean(1), box.center)
        # first four corners are the front (+x) face
        np.testing.assert_allclose(c[0, :4], 12.0)

    def test_bottom_corners_lowest(self):
        box = Box((0, 0, 2.0), (2, 2, 2))
        bottom = box.bottom_corners()
        np.testing.assert_allclose(bottom[2], 1.0)

    def test_rotate_then_translate(self):
        box = Box((1.0, 0.0, 0.0), (1, 2, 1))
        box.rotate(YAW90)
        np.testing.assert_allclose(
            box.center, [0.0, 1.0, 0.0], atol=1e-12
        )
        assert quaternion_yaw(box.orientation) == pytest.approx(np.pi / 2)
        box.translate((1.0, 1.0, 0.0))
        np.testing.assert_allclose(box.center, [1.0, 2.0, 0.0], atol=1e-12)

    def test_yawed_corners(self):
        box = Box((0.0, 0.0, 0.0), (2.0, 4.0, 1.0), orientation=YAW90)
        c = box.corners()
        # length axis now along y
        np.testing.assert_allclose(c[1].max() - c[1].min(), 4.0, atol=1e-12)
        np.testing.assert_allclose(c[0].max() - c[0].min(), 2.0, atol=1e-12)


class TestStyling:
    def test_longest_prefix_wins(self):
        assert category_color("vehicle.car") == (0, 158, 255)
        assert category_color("vehicle.emergency.police") == (0, 120, 255)
        assert category_color("human.pedestrian.adult") == (0, 230, 120)
        assert category_color(None) == (255, 0, 255)
        assert category_color("unknown.thing") == (255, 0, 255)

    def test_boxes_to_render(self):
        items = boxes_to_render([
            Box((0, 0, 0), (1, 1, 1), name="vehicle.car"),
            Box((5, 0, 0), (1, 1, 1), name="animal"),
        ])
        assert len(items) == 2
        corners, color = items[0]
        assert corners.shape == (8, 3)
        assert color == (0, 158, 255)
        assert items[1][1] == (160, 230, 60)


class TestMapLines:
    def test_densify_spacing(self):
        poly = np.array([[0.0, 0.0], [10.0, 0.0]])
        dense = densify_polyline(poly, points_per_meter=2.0)
        assert len(dense) == 21
        np.testing.assert_allclose(np.diff(dense[:, 0]), 0.5)

    def test_filters(self):
        pts = np.array([[0, 0, 0], [100, 0, 0], [0, -100, 0]], float)
        kept = filter_points_in_range(pts, -50, 50, -50, 50)
        assert len(kept) == 1
        assert box_in_range(Box((0, 0, 0), (1, 1, 1)), -1, 1, -1, 1)
        assert not box_in_range(Box((9, 0, 0), (1, 1, 1)), -1, 1, -1, 1)


class TestTrajectory:
    POSES = [
        {"translation": (0.0, 0.0, 0.0), "rotation": (1.0, 0, 0, 0)},
        {"translation": (10.0, 0.0, 0.0), "rotation": YAW90},
    ]

    def test_interpolate_poses(self):
        path = interpolate_poses(self.POSES, steps_between=1)
        assert len(path) == 3
        mid = path[1]
        np.testing.assert_allclose(mid["translation"], [5.0, 0.0, 0.0])
        assert quaternion_yaw(mid["rotation"]) == pytest.approx(np.pi / 4)

    def test_camera_path_follows_yaw(self):
        path = camera_path_from_trajectory(
            self.POSES, eye_offset=(-20.0, 0.0, 12.0),
            look_ahead=(10.0, 0.0, 0.0),
        )
        (eye0, center0), (eye1, center1) = path
        np.testing.assert_allclose(eye0, [-20.0, 0.0, 12.0])
        np.testing.assert_allclose(center0, [10.0, 0.0, 0.0])
        # at the second pose the ego faces +y: the eye sits behind (-y)
        np.testing.assert_allclose(eye1, [10.0, -20.0, 12.0], atol=1e-9)
        np.testing.assert_allclose(center1, [10.0, 10.0, 0.0], atol=1e-9)

    def test_render_trajectory_frames(self):
        rng = np.random.default_rng(0)
        frames = [
            rng.uniform(-5, 5, (200, 3)).astype(np.float32)
            for _ in range(2)
        ]
        boxes = [[Box((0, 0, 0), (2, 4, 1.5), name="vehicle.car")]] * 2
        imgs = render_trajectory(
            frames, self.POSES, boxes_per_frame=boxes,
            width=160, height=90,
        )
        assert len(imgs) == 2
        arr0 = np.array(imgs[0])
        assert arr0.shape == (90, 160, 3)
        # something was drawn (not the plain white background)
        assert (arr0 < 250).any()
