"""Waymo Perception motion dataset (TFRecord-backed).

Reference src/dwm/datasets/waymo.py (774 LoC) reads Frame protos through the
waymo-open-dataset package with an offline random-access offset index.
That package is not in this image; this implementation decodes Frames with
the schema-less wire parser (datasets/tfrecord.py) and the Frame field map
below (waymo-open-dataset dataset.proto field numbers). Images and the
canonical camera/ego transforms are fully supported; laser returns are
range-image encoded in the source protos (decompression requires the range
image utils) and are NOT decoded — LiDAR keys come from
``stub_key_data_dict`` like the reference's cross-dataset stubs.

Status: structurally complete, validated on synthetic protos; run
``tools/dataset_make_info_json`` to build the offset index for real shards.
"""

from __future__ import annotations

import json
import struct
from typing import Optional

import numpy as np

from opendwm_tpu.config import register
from opendwm_tpu.datasets import tfrecord as tfr
from opendwm_tpu.datasets.common import add_stub_key_data

try:
    from PIL import Image
    import io

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False

# dataset.proto Frame fields
F_CONTEXT = 1
F_TIMESTAMP_MICROS = 2
F_POSE = 3
F_IMAGES = 4
# CameraImage fields
CI_NAME = 1
CI_IMAGE = 2
# Transform fields
TF_MATRIX = 1  # packed doubles, row-major 4x4
# Context fields
CTX_NAME = 1
CTX_CAMERA_CALIBRATIONS = 2
# CameraCalibration fields
CC_NAME = 1
CC_INTRINSIC = 2  # packed doubles [f_u, f_v, c_u, c_v, k1..]
CC_EXTRINSIC = 3  # Transform
CC_WIDTH = 4
CC_HEIGHT = 5

CAMERA_NAMES = {
    1: "FRONT", 2: "FRONT_LEFT", 3: "FRONT_RIGHT", 4: "SIDE_LEFT",
    5: "SIDE_RIGHT",
}
# Waymo camera frame: +x forward. Convert to the canonical camera frame
# (+z forward) like the Argoverse adapter.
CAM_FROM_SENSOR = np.array(
    [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], np.float64
)


def _decode_transform(raw: bytes) -> np.ndarray:
    fields = tfr.parse_protobuf(raw)
    mat = tfr.decode_packed_doubles(fields[TF_MATRIX][0])
    return np.asarray(mat, np.float64).reshape(4, 4)


@register("WaymoDataset", aliases=("dwm.datasets.waymo.MotionDataset",))
class MotionDataset:
    def __init__(
        self,
        fs,
        info_dict_path: str,
        sequence_length: int,
        fps_stride_tuples: list,
        sensor_channels: list = ("FRONT",),
        enable_camera_transforms: bool = False,
        enable_ego_transforms: bool = False,
        stub_key_data_dict: Optional[dict] = None,
    ):
        self.fs = fs
        self.sequence_length = sequence_length
        self.sensor_channels = list(sensor_channels)
        self.enable_camera_transforms = enable_camera_transforms
        self.enable_ego_transforms = enable_ego_transforms
        self.stub_key_data_dict = stub_key_data_dict

        with open(info_dict_path) as f:
            # {shard_filename: [record offsets]}
            self.info = json.load(f)

        self.items = []
        for shard, offsets in self.info.items():
            for fps, stride in fps_stride_tuples:
                # Waymo frames are 10 Hz; index stride derived from fps.
                step = max(1, int(round(10 / fps))) if fps > 0 else 1
                span = (sequence_length - 1) * step + 1
                for start in range(
                    0, len(offsets) - span + 1, max(1, int(stride))
                ):
                    self.items.append({
                        "shard": shard,
                        "offsets": offsets[start: start + span: step],
                        "fps": fps if fps > 0 else 10,
                    })

    def __len__(self):
        return len(self.items)

    def _read_frame(self, shard: str, offset: int) -> dict:
        with self.fs.open(shard, "rb") as f:
            payload = tfr.read_tfrecord_at(f, offset)
        return tfr.parse_protobuf(payload)

    def __getitem__(self, index: int) -> dict:
        item = self.items[index]
        frames = [
            self._read_frame(item["shard"], off) for off in item["offsets"]
        ]
        t = len(frames)
        v = len(self.sensor_channels)
        name_to_id = {n: i for i, n in CAMERA_NAMES.items()}

        result: dict = {"fps": np.float32(item["fps"])}
        result["pts"] = np.asarray(
            [
                [frame.get(F_TIMESTAMP_MICROS, [0])[0] / 1000.0] * v
                for frame in frames
            ],
            np.float32,
        )

        images = []
        for frame in frames:
            by_name = {}
            for raw in frame.get(F_IMAGES, []):
                ci = tfr.parse_protobuf(raw)
                cam_id = ci.get(CI_NAME, [0])[0]
                by_name[CAMERA_NAMES.get(cam_id)] = ci.get(CI_IMAGE, [b""])[0]
            row = []
            for ch in self.sensor_channels:
                data = by_name.get(ch)
                if data and _HAS_PIL:
                    img = Image.open(io.BytesIO(data)).convert("RGB")
                    img.load()
                    row.append(img)
                else:
                    row.append(Image.new("RGB", (64, 48), (128, 128, 128)))
            images.append(row)
        result["images"] = images

        if self.enable_camera_transforms or self.enable_ego_transforms:
            ctx = tfr.parse_protobuf(frames[0][F_CONTEXT][0])
            calibrations = {}
            for raw in ctx.get(CTX_CAMERA_CALIBRATIONS, []):
                cc = tfr.parse_protobuf(raw)
                cam_id = cc.get(CC_NAME, [0])[0]
                intr = tfr.decode_packed_doubles(cc[CC_INTRINSIC][0])
                calibrations[CAMERA_NAMES.get(cam_id)] = {
                    "intrinsic": np.asarray([
                        [intr[0], 0, intr[2]], [0, intr[1], intr[3]],
                        [0, 0, 1],
                    ]),
                    "extrinsic": _decode_transform(cc[CC_EXTRINSIC][0]),
                    "size": [
                        cc.get(CC_WIDTH, [0])[0], cc.get(CC_HEIGHT, [0])[0]
                    ],
                }

        if self.enable_camera_transforms:
            ct, ci_list, sizes = [], [], []
            for _ in frames:
                ct.append([]), ci_list.append([]), sizes.append([])
                for ch in self.sensor_channels:
                    cal = calibrations.get(ch)
                    if cal is None:
                        ct[-1].append(np.eye(4))
                        ci_list[-1].append(np.eye(3))
                        sizes[-1].append([0.0, 0.0])
                        continue
                    ct[-1].append(
                        cal["extrinsic"] @ np.linalg.inv(CAM_FROM_SENSOR)
                    )
                    ci_list[-1].append(cal["intrinsic"])
                    sizes[-1].append([float(s) for s in cal["size"]])
            result["camera_transforms"] = np.asarray(ct, np.float32)
            result["camera_intrinsics"] = np.asarray(ci_list, np.float32)
            result["image_size"] = np.asarray(sizes, np.float32)

        if self.enable_ego_transforms:
            et = []
            for frame in frames:
                pose = (
                    _decode_transform(frame[F_POSE][0])
                    if F_POSE in frame else np.eye(4)
                )
                et.append(np.stack([pose] * max(v, 1)))
            result["ego_transforms"] = np.asarray(et, np.float32)

        add_stub_key_data(self.stub_key_data_dict, result)
        return result
