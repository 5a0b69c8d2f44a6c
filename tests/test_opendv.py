"""OpenDV dataset: frame-dir decode, gray fallback, fake conditions."""

import json

import numpy as np
import pytest

fsspec = pytest.importorskip("fsspec")
from PIL import Image  # noqa: E402

from opendwm_tpu.datasets.opendv import MotionDataset  # noqa: E402


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    root = tmp_path_factory.mktemp("opendv")
    vid = root / "vid001"
    vid.mkdir()
    for i in range(40):
        Image.new("RGB", (64, 36), (i * 5 % 255, 0, 0)).save(
            vid / f"{i:06d}.jpg"
        )
    meta = [{
        "videoid": "vid001", "path": "vid001.mp4", "length": 4.0,
        "fps": 10, "split": "Train", "start_discard": 0, "end_discard": 0,
    }]
    (root / "meta.json").write_text(json.dumps(meta))
    return root


class TestOpenDV:
    def test_items_and_decode(self, root):
        fs = fsspec.filesystem("dir", path=str(root))
        ds = MotionDataset(
            fs, str(root / "meta.json"), sequence_length=3,
            fps_stride_tuples=[(5, 0.5)], split="Train",
            shuffle_seed=None, enable_fake_camera_transforms=True,
            enable_fake_3dbox_images=True, image_size=(64, 36),
        )
        assert len(ds) > 0
        item = ds[0]
        assert len(item["images"]) == 3
        img = np.asarray(item["images"][1][0])
        assert img.shape == (36, 64, 3)
        # decoded from frame dir, not gray fallback
        assert not (img == 128).all()
        assert item["camera_transforms"].shape == (3, 1, 4, 4)
        assert item["3dbox_images"][0][0].size == (64, 36)
        # fps=5 over a 10fps source: frame index advances by 2
        a = np.asarray(item["images"][0][0])[0, 0, 0]
        b = np.asarray(item["images"][1][0])[0, 0, 0]
        assert a != b

    def test_gray_fallback_on_missing_frames(self, root):
        fs = fsspec.filesystem("dir", path=str(root))
        meta = [{
            "videoid": "missing", "path": "missing.mp4", "length": 2.0,
            "fps": 10, "split": "Train",
        }]
        (root / "meta2.json").write_text(json.dumps(meta))
        ds = MotionDataset(
            fs, str(root / "meta2.json"), sequence_length=2,
            fps_stride_tuples=[(5, 1.0)], shuffle_seed=None,
            image_size=(32, 32),
        )
        item = ds[0]
        img = np.asarray(item["images"][0][0])
        assert (img == 128).all()  # gray stub, no crash

    def test_mini_batch_view_dim(self, root):
        fs = fsspec.filesystem("dir", path=str(root))
        ds = MotionDataset(
            fs, str(root / "meta.json"), sequence_length=2,
            fps_stride_tuples=[(5, 1.0)], mini_batch=3, shuffle_seed=None,
            image_size=(32, 32),
        )
        item = ds[0]
        assert len(item["images"][0]) == 3
