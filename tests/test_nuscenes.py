"""nuScenes dataset over a synthetic miniature table set."""

import json

import numpy as np
import pytest

fsspec = pytest.importorskip("fsspec")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from opendwm_tpu.datasets.nuscenes import MotionDataset  # noqa: E402


def make_fixture(root):
    """One scene, 3 keyframe samples, 2 cameras + 1 lidar."""
    d = root / "v1.0-mini"
    d.mkdir()
    (root / "sweeps").mkdir()

    sensors = [
        {"token": "s_cf", "channel": "CAM_FRONT", "modality": "camera"},
        {"token": "s_cb", "channel": "CAM_BACK", "modality": "camera"},
        {"token": "s_l", "channel": "LIDAR_TOP", "modality": "lidar"},
    ]
    # Front-camera rotation (camera z-forward → ego x-forward): the standard
    # nuScenes CAM_FRONT extrinsic quaternion.
    cam_rot = [0.5, -0.5, 0.5, -0.5]
    calibrated = [
        {
            "token": f"cs_{s['token']}", "sensor_token": s["token"],
            "rotation": (
                cam_rot if s["modality"] == "camera" else [1, 0, 0, 0]
            ),
            "translation": [0, 0, 1.5],
            "camera_intrinsic": (
                [[50, 0, 32], [0, 50, 24], [0, 0, 1]]
                if s["modality"] == "camera" else []
            ),
        }
        for s in sensors
    ]
    n_samples = 3
    samples, sample_data, ego_poses, annotations = [], [], [], []
    for i in range(n_samples):
        token = f"sample_{i}"
        samples.append({
            "token": token, "scene_token": "scene_0",
            "next": f"sample_{i+1}" if i + 1 < n_samples else "",
            "timestamp": 1_000_000 * i,
        })
        ego_poses.append({
            "token": f"ego_{i}", "rotation": [1, 0, 0, 0],
            "translation": [i * 5.0, 0, 0], "timestamp": 1_000_000 * i,
        })
        for s in sensors:
            is_cam = s["modality"] == "camera"
            fname = (
                f"sweeps/{s['channel']}_{i}.jpg"
                if is_cam else f"sweeps/{s['channel']}_{i}.bin"
            )
            sample_data.append({
                "token": f"sd_{s['token']}_{i}",
                "sample_token": token,
                "calibrated_sensor_token": f"cs_{s['token']}",
                "ego_pose_token": f"ego_{i}",
                "timestamp": 1_000_000 * i + (10 if is_cam else 0),
                "is_key_frame": True,
                "filename": fname,
                "width": 64 if is_cam else 0,
                "height": 48 if is_cam else 0,
            })
            if is_cam:
                Image.new("RGB", (64, 48), (i * 40, 0, 0)).save(root / fname)
            else:
                pts = np.random.default_rng(i).uniform(
                    -10, 10, (100, 5)
                ).astype(np.float32)
                (root / fname).write_bytes(pts.tobytes())
        annotations.append({
            "token": f"ann_{i}", "sample_token": token,
            "instance_token": "inst_0",
            "rotation": [1, 0, 0, 0], "translation": [i * 5.0 + 10, 0, 1],
            "size": [2.0, 4.0, 1.5],
        })

    tables = {
        "sensor": sensors,
        "calibrated_sensor": calibrated,
        "ego_pose": ego_poses,
        "sample": samples,
        "sample_data": sample_data,
        "sample_annotation": annotations,
        "instance": [{"token": "inst_0", "category_token": "cat_car"}],
        "category": [{"token": "cat_car", "name": "vehicle.car"}],
        "log": [{"token": "log_0", "location": "somewhere"}],
        "map": [],
        "scene": [{
            "token": "scene_0", "name": "scene-0001",
            "first_sample_token": "sample_0", "log_token": "log_0",
            "description": "a synthetic scene",
        }],
    }
    for name, rows in tables.items():
        (d / f"{name}.json").write_text(json.dumps(rows))
    return root


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    return make_fixture(tmp_path_factory.mktemp("nusc"))


class TestNuScenes:
    def test_full_item(self, dataset_root):
        fs = fsspec.filesystem("dir", path=str(dataset_root))
        ds = MotionDataset(
            fs, "v1.0-mini", sequence_length=2,
            fps_stride_tuples=[(0, 1)],
            sensor_channels=["LIDAR_TOP", "CAM_FRONT", "CAM_BACK"],
            enable_scene_description=True,
            enable_camera_transforms=True,
            enable_ego_transforms=True,
            _3dbox_image_settings={},
            max_point_count=128,
        )
        assert len(ds) == 2  # 3 frames, seq len 2, stride 1
        item = ds[0]
        assert item["fps"] == 0
        assert len(item["images"]) == 2 and len(item["images"][0]) == 2
        assert item["lidar_points"].shape == (2, 128, 3)
        assert item["lidar_points_mask"][0].sum() == 100
        assert item["camera_transforms"].shape == (2, 2, 4, 4)
        assert item["camera_intrinsics"].shape == (2, 2, 3, 3)
        assert item["image_size"].shape == (2, 2, 2)
        assert item["ego_transforms"].shape == (2, 3, 4, 4)
        assert item["scene_description"] == "a synthetic scene"
        # ego moves 5 m between frames
        np.testing.assert_allclose(
            item["ego_transforms"][1, 0, 0, 3]
            - item["ego_transforms"][0, 0, 0, 3],
            5.0,
        )

    def test_time_keyed_captions(self, dataset_root, tmp_path):
        """DriveMLM caption files keyed "{scene}|{channel}|{time}" with a
        nearest-time lookup (reference nuscenes.py:797-806)."""
        caps, times = {}, {}
        for ch in ("CAM_FRONT", "CAM_BACK"):
            sc = f"scene_0|{ch}"
            times[sc] = [1_000_000 * i for i in range(3)]
            for i in range(3):
                caps[f"{sc}|{1_000_000 * i}"] = {
                    "image_description": f"{ch.lower()} frame {i}"
                }
        (tmp_path / "caps.json").write_text(json.dumps(caps))
        (tmp_path / "times.json").write_text(json.dumps(times))
        fs = fsspec.filesystem("dir", path=str(dataset_root))
        ds = MotionDataset(
            fs, "v1.0-mini", sequence_length=2,
            fps_stride_tuples=[(0, 1)],
            sensor_channels=["CAM_FRONT", "CAM_BACK"],
            image_description_settings={
                "path": str(tmp_path / "caps.json"),
                "time_list_dict_path": str(tmp_path / "times.json"),
                "selected_keys": ["image_description"],
            },
        )
        item = ds[0]
        # camera timestamps are 1e6*i + 10 → nearest listed time is 1e6*i
        assert item["image_description"][0][0] == "cam_front frame 0"
        assert item["image_description"][1][1] == "cam_back frame 1"

    def test_3dbox_raster_nonempty(self, dataset_root):
        fs = fsspec.filesystem("dir", path=str(dataset_root))
        ds = MotionDataset(
            fs, "v1.0-mini", sequence_length=1,
            fps_stride_tuples=[(0, 1)],
            sensor_channels=["CAM_FRONT"],
            _3dbox_image_settings={"pen_width": 2},
        )
        item = ds[0]
        img = np.asarray(item["3dbox_images"][0][0])
        assert img.shape == (48, 64, 3)
        # The box ahead of the ego must draw blue (vehicle.car) pixels.
        assert (img[..., 2] > 0).sum() > 0

    def test_split_filtering(self, dataset_root):
        fs = fsspec.filesystem("dir", path=str(dataset_root))
        # scene-0001 is in the official train split → kept
        ds = MotionDataset(
            fs, "v1.0-mini", sequence_length=1,
            fps_stride_tuples=[(0, 1)], split="train",
            sensor_channels=["CAM_FRONT"],
        )
        assert len(ds) == 3
        # ... and absent from val → empty
        ds_val = MotionDataset(
            fs, "v1.0-mini", sequence_length=1,
            fps_stride_tuples=[(0, 1)], split="val",
            sensor_channels=["CAM_FRONT"],
        )
        assert len(ds_val) == 0

    def test_fps_timestamp_mode(self, dataset_root):
        fs = fsspec.filesystem("dir", path=str(dataset_root))
        ds = MotionDataset(
            fs, "v1.0-mini", sequence_length=2,
            fps_stride_tuples=[(1, 1)],  # 1 fps, 1 s stride
            sensor_channels=["CAM_FRONT"],
        )
        assert len(ds) >= 1
        item = ds[0]
        # timestamps 1 s apart (pts are in ms)
        assert abs((item["pts"][1, 0] - item["pts"][0, 0]) - 1000) < 1


class TestForegroundRegion:
    def test_mask_nonempty(self, dataset_root):
        import fsspec

        fs = fsspec.filesystem("dir", path=str(dataset_root))
        ds = MotionDataset(
            fs, "v1.0-mini", sequence_length=1,
            fps_stride_tuples=[(0, 1)], sensor_channels=["CAM_FRONT"],
            foreground_region_image_settings={},
        )
        item = ds[0]
        mask = np.asarray(item["foreground_region_images"][0][0])
        assert mask.shape == (48, 64)
        assert (mask == 255).sum() > 0  # the car fills a region
        assert (mask == 0).sum() > 0
