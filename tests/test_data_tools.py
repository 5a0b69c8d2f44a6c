"""Offline data tools: prepare_opendv caption keys, preview-format export
round-trip through PreviewDataset."""

import json

import numpy as np

from opendwm_tpu.tools.export_nusc_2_preview_format import export_item
from opendwm_tpu.tools.prepare_opendv import (
    build_descriptions,
    caption_key,
    load_annotations,
)


class TestPrepareOpenDV:
    def test_caption_key_matches_reference_formula(self):
        # frame 120 at 10 fps with 90 s discarded → (12 + 90) / 0.001
        assert caption_key("abc", "120.jpg", 90.0) == "abc.102000"

    def test_build_descriptions_joins_metas(self):
        metas = {"vid1": {"videoid": "vid1", "start_discard": 0.0}}
        annos = [
            {"folder": "x/vid1", "first_frame": "0.jpg",
             "blip": "a road", "cmd": "go"},
            {"folder": "x/unknown", "first_frame": "0.jpg",
             "blip": "skip", "cmd": ""},
        ]
        out = build_descriptions(annos, metas)
        assert out == {
            "vid1.0": {"image_description": "a road", "action": "go"}
        }

    def test_load_annotations_jsonl(self, tmp_path):
        p = tmp_path / "a.jsonl"
        p.write_text('{"folder": "f/v", "first_frame": "0.jpg"}\n\n')
        assert load_annotations(str(p))[0]["folder"] == "f/v"


class TestExportPreviewFormat:
    def test_round_trip_through_preview_dataset(self, tmp_path):
        t, v, h, w = 3, 2, 16, 24
        rng = np.random.default_rng(0)
        item = {
            "fps": np.float32(2.0),
            "pts": np.zeros((t, v), np.float32),
            "images": rng.uniform(0, 1, (t, v, h, w, 3)).astype(np.float32),
            "3dbox_images": rng.uniform(0, 1, (t, v, h, w, 3)).astype(
                np.float32
            ),
            "hdmap_images": rng.uniform(0, 1, (t, v, h, w, 3)).astype(
                np.float32
            ),
            "camera_intrinsics": np.broadcast_to(
                np.eye(3, dtype=np.float32) * 500, (t, v, 3, 3)
            ),
            "camera_transforms": np.broadcast_to(
                np.eye(4, dtype=np.float32), (t, v, 4, 4)
            ),
            "ego_transforms": np.broadcast_to(
                np.eye(4, dtype=np.float32), (t, 1, 4, 4)
            ),
            "image_description": [
                [f"frame {i} view {j}" for j in range(v)] for i in range(t)
            ],
        }
        channels = ["CAM_FRONT", "CAM_BACK"]
        pkg = export_item(item, str(tmp_path / "scene0"), channels, 1)

        data = json.load(open(tmp_path / "scene0" / "data.json"))
        assert len(data["samples"]) == t
        s0 = data["samples"][0]["views"]["CAM_FRONT"]
        assert s0["rgb"]  # reference frame keeps pixels
        assert "rgb" not in data["samples"][2]["views"]["CAM_FRONT"]
        assert s0["description"] == "frame 0 view 0"

        from opendwm_tpu.datasets.preview import PreviewDataset

        ds = PreviewDataset(
            json_file=str(tmp_path / "scene0" / "data.json"),
            sequence_length=2, fps_stride_tuples=[[0, 1]],
            sensor_channels=channels, image_size=(w, h),
        )
        assert len(ds) >= 1
        out = ds[0]
        assert out["3dbox_images"].shape == (2, v, h, w, 3)
        # Rasters survive the PNG round trip.
        np.testing.assert_allclose(
            out["3dbox_images"][0, 0], item["3dbox_images"][0, 0],
            atol=2 / 255,
        )
        assert out["image_description"][0][0] == "frame 0 view 0"
