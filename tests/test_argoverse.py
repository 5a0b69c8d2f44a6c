"""Argoverse 2 dataset over a synthetic feather/JSON fixture."""

import json

import numpy as np
import pytest

pyarrow = pytest.importorskip("pyarrow")
import pyarrow.feather  # noqa: E402

fsspec = pytest.importorskip("fsspec")
from PIL import Image  # noqa: E402

from opendwm_tpu.datasets.argoverse import MotionDataset  # noqa: E402


def write_feather(path, table: dict):
    pyarrow.feather.write_feather(pyarrow.table(table), str(path))


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    root = tmp_path_factory.mktemp("av2")
    scene = "sensor/val/scene001"
    cam = "cameras/ring_front_center"
    ts = [1_000_000_000 * i for i in range(3)]
    for t in ts:
        d = root / scene / "sensors" / cam
        d.mkdir(parents=True, exist_ok=True)
        Image.new("RGB", (64, 48), (50, 50, 50)).save(d / f"{t}.jpg")
        ld = root / scene / "sensors" / "lidar"
        ld.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(t % 97)
        write_feather(ld / f"{t}.feather", {
            "x": rng.uniform(-20, 20, 64),
            "y": rng.uniform(-20, 20, 64),
            "z": rng.uniform(-2, 2, 64),
        })
    cal = root / scene / "calibration"
    cal.mkdir(parents=True)
    write_feather(cal / "egovehicle_SE3_sensor.feather", {
        "sensor_name": ["lidar", "ring_front_center"],
        "qw": [1.0, 1.0], "qx": [0.0, 0.0], "qy": [0.0, 0.0],
        "qz": [0.0, 0.0],
        "tx_m": [0.0, 1.5], "ty_m": [0.0, 0.0], "tz_m": [1.8, 1.4],
    })
    write_feather(cal / "intrinsics.feather", {
        "sensor_name": ["ring_front_center"],
        "fx_px": [50.0], "fy_px": [50.0], "cx_px": [32.0], "cy_px": [24.0],
        "width_px": [64], "height_px": [48],
    })
    write_feather(root / scene / "city_SE3_egovehicle.feather", {
        "timestamp_ns": ts,
        "qw": [1.0] * 3, "qx": [0.0] * 3, "qy": [0.0] * 3, "qz": [0.0] * 3,
        "tx_m": [5.0 * i for i in range(3)], "ty_m": [0.0] * 3,
        "tz_m": [0.0] * 3,
    })
    write_feather(root / scene / "annotations.feather", {
        "timestamp_ns": ts,
        "category": ["REGULAR_VEHICLE"] * 3,
        "length_m": [4.0] * 3, "width_m": [2.0] * 3, "height_m": [1.5] * 3,
        "qw": [1.0] * 3, "qx": [0.0] * 3, "qy": [0.0] * 3, "qz": [0.0] * 3,
        "tx_m": [10.0] * 3, "ty_m": [0.0] * 3, "tz_m": [0.5] * 3,
    })
    md = root / scene / "map"
    md.mkdir(parents=True)
    (md / "log_map_archive_scene001.json").write_text(json.dumps({
        "lane_segments": {
            "1": {
                "left_lane_boundary": [
                    {"x": 0, "y": -2, "z": 0}, {"x": 50, "y": -2, "z": 0}
                ],
                "right_lane_boundary": [
                    {"x": 0, "y": 2, "z": 0}, {"x": 50, "y": 2, "z": 0}
                ],
            }
        },
        "pedestrian_crossings": {},
        "drivable_areas": {},
    }))
    return root


class TestArgoverse:
    def test_full_item(self, root):
        fs = fsspec.filesystem("dir", path=str(root))
        ds = MotionDataset(
            fs, sequence_length=2, fps_stride_tuples=[(0, 1)],
            sensor_channels=["lidar", "cameras/ring_front_center"],
            enable_camera_transforms=True, enable_ego_transforms=True,
            _3dbox_image_settings={"pen_width": 2},
            hdmap_image_settings={"pen_width": 2},
            max_point_count=128,
        )
        assert len(ds) == 2
        item = ds[0]
        assert len(item["images"]) == 2 and len(item["images"][0]) == 1
        assert item["lidar_points"].shape == (2, 128, 3)
        assert item["lidar_points_mask"][0].sum() == 64
        assert item["camera_transforms"].shape == (2, 1, 4, 4)
        # camera z-forward = ego x-forward after sensor-frame conversion
        cam = item["camera_transforms"][0, 0]
        np.testing.assert_allclose(cam[:3, 2], [1, 0, 0], atol=1e-6)
        assert item["ego_transforms"].shape == (2, 2, 4, 4)
        np.testing.assert_allclose(
            item["ego_transforms"][1, 0, 0, 3]
            - item["ego_transforms"][0, 0, 0, 3],
            5.0,
        )
        box = np.asarray(item["3dbox_images"][0][0])
        assert (box[..., 2] > 0).sum() > 0  # vehicle drawn in blue
        hd = np.asarray(item["hdmap_images"][0][0])
        assert (hd[..., 1] > 0).sum() > 0  # lane drawn in green

    def test_bev_rasters(self, root):
        fs = fsspec.filesystem("dir", path=str(root))
        ds = MotionDataset(
            fs, sequence_length=1, fps_stride_tuples=[(0, 1)],
            sensor_channels=["lidar"],
            _3dbox_bev_settings={"image_size": [640, 640]},
            hdmap_bev_settings={"image_size": [640, 640]},
            max_point_count=128,
        )
        item = ds[0]
        box = np.asarray(item["3dbox_bev_images"][0])
        assert box.shape == (640, 640, 3)
        ys, xs = np.nonzero(box.any(-1))
        # vehicle at ego (10, 0) → pixel (6.4*10+320, 320) = (384, 320)
        assert abs(xs.mean() - 384) < 20 and abs(ys.mean() - 320) < 20
        hd = np.asarray(item["hdmap_bev_images"][0])
        ys, xs = np.nonzero(hd.any(-1))
        # lanes along ego +x at y=±2 → rows 320∓12.8, columns ≥ 320
        assert hd.any(-1).sum() > 0 and xs.min() >= 318
        rows = set(np.unique(ys))
        assert rows & {306, 307, 308} and rows & {332, 333, 334}
