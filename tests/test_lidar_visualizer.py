"""LiDAR visualizers: BEV raster + perspective z-ordered point renderer."""

import numpy as np

from opendwm_tpu.utils.lidar_visualizer import (
    BEVRenderer,
    PerspectiveRenderer,
    render_sequence,
)


class TestBEVRenderer:
    def test_point_lands_at_expected_pixel(self):
        r = BEVRenderer(image_size=100, meters=100.0)
        img = r.render(
            points=np.array([[10.0, 0.0, 0.0]]), height_colormap=False,
            point_color=(255, 0, 0),
        )
        arr = np.asarray(img)
        ys, xs = np.nonzero(arr[..., 0] == 255)
        assert list(xs) == [60] and list(ys) == [50]  # x fwd → right


class TestPerspectiveRenderer:
    def test_center_point_projects_to_image_center(self):
        r = PerspectiveRenderer(
            width=200, height=100, eye=(-10, 0, 0), center=(10, 0, 0),
        )
        img = r.render(
            points=np.array([[10.0, 0.0, 0.0]]), height_colormap=False,
            point_color=(255, 0, 0),
        )
        arr = np.asarray(img)
        ys, xs = np.nonzero(arr[..., 0] == 255)
        # the look-at target sits on the optical axis
        assert abs(xs.mean() - 100) <= 1 and abs(ys.mean() - 50) <= 1

    def test_nearer_point_occludes(self):
        # two points on the SAME camera ray (eye → look-at target): the
        # nearer one (higher z → redder colormap) must win the pixel.
        eye = np.array([-10.0, 0.0, 3.0])
        near = np.array([0.0, 0.0, 1.5])
        far = eye + 2 * (near - eye)  # (10, 0, 0) == look-at target
        r = PerspectiveRenderer(
            width=64, height=64, eye=tuple(eye), center=tuple(far),
        )
        for order in ([near, far], [far, near]):
            arr = np.asarray(r.render(points=np.stack(order)))
            center = arr[32, 32]
            # near z=1.5 → t=0.75 → red≈191; far z=0 → red≈127
            assert abs(int(center[0]) - 191) <= 2

    def test_points_behind_camera_culled(self):
        r = PerspectiveRenderer(width=64, height=64, eye=(0, 0, 0),
                                center=(10, 0, 0))
        arr = np.asarray(
            r.render(points=np.array([[-5.0, 0.0, 0.0]]),
                     height_colormap=False, point_color=(255, 0, 0))
        )
        red_only = (arr[..., 0] == 255) & (arr[..., 1] == 0)
        assert red_only.sum() == 0

    def test_boxes_and_lines_draw(self):
        r = PerspectiveRenderer(width=128, height=96)
        c = np.array([
            [x, y, z]
            for x in (8, 12) for y in (-1, 1) for z in (0, 1.5)
        ])
        img = r.render(
            boxes=[(c, (0, 200, 0))],
            lines=[(np.array([[5, -2, 0], [15, -2, 0]]), (0, 0, 200))],
        )
        arr = np.asarray(img)
        assert (arr[..., 1] == 200).sum() > 0
        assert (arr[..., 2] == 200).sum() > 0

    def test_render_sequence_perspective(self):
        frames = [np.random.rand(50, 3) * 10 for _ in range(2)]
        imgs = render_sequence(frames, perspective=True, width=64, height=48)
        assert len(imgs) == 2 and imgs[0].size == (64, 48)


class TestVisualizeLidarCLI:
    def test_cli_renders_dataset(self, tmp_path):
        import json

        from opendwm_tpu.tools.visualize_lidar import create_parser, main

        cfg = {
            "dataset": {
                "_class_name": "SyntheticLidarDataset",
                "size": 2, "sequence_length": 2, "point_count": 32,
                "pc_range": 6.0, "bev_size": 64,
            }
        }
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps(cfg))
        args = create_parser().parse_args([
            "-c", str(p), "-o", str(tmp_path / "out"),
            "--max-items", "1", "--gif", "--image-size", "64",
        ])
        written = main(args)
        names = [w.split("/")[-1] for w in written]
        assert "0000_000.png" in names and "0000.gif" in names
