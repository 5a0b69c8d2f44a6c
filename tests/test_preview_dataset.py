"""Preview dataset package replay."""

import json

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from opendwm_tpu.datasets.preview import (  # noqa: E402
    PreviewDataset,
    drop_vehicle_color,
)


@pytest.fixture(scope="module")
def package(tmp_path_factory):
    root = tmp_path_factory.mktemp("pkg")
    (root / "CAM_FRONT" / "3dbox").mkdir(parents=True)
    samples = []
    for i in range(4):
        Image.new("RGB", (32, 32), (0, 0, 200)).save(
            root / "CAM_FRONT" / "3dbox" / f"{i}.png"
        )
        samples.append({
            "timestamp": i * 0.5,
            "views": {
                "CAM_FRONT": {
                    "description": f"a red car at frame {i}",
                    "3dbox": f"CAM_FRONT/3dbox/{i}.png",
                    "camera_intrinsic": [[50, 0, 16], [0, 50, 16], [0, 0, 1]],
                    "camera_transform": np.eye(4).tolist(),
                }
            },
        })
    (root / "data.json").write_text(json.dumps({"samples": samples}))
    return root


class TestPreviewDataset:
    def test_item(self, package):
        ds = PreviewDataset(
            str(package / "data.json"), sequence_length=2,
            fps_stride_tuples=[(0, 1)], sensor_channels=["CAM_FRONT"],
            use_hdmap=False, image_size=(32, 32),
        )
        assert len(ds) == 3
        item = ds[0]
        assert item["3dbox_images"].shape == (2, 1, 32, 32, 3)
        assert item["3dbox_images"].max() > 0.5
        assert item["camera_intrinsics"].shape == (2, 1, 3, 3)
        assert item["image_description"][0][0] == "a red car at frame 0"

    def test_fps_mode(self, package):
        ds = PreviewDataset(
            str(package / "data.json"), sequence_length=2,
            fps_stride_tuples=[(2, 0.5)], sensor_channels=["CAM_FRONT"],
            use_hdmap=False, use_3dbox=False, image_size=(32, 32),
        )
        assert len(ds) >= 1

    def test_drop_vehicle_color(self):
        assert drop_vehicle_color("a red car drives") == "a car drives"
        assert drop_vehicle_color("the dark SUV stops") == "the SUV stops"
        assert drop_vehicle_color("a red house") == "a red house"
