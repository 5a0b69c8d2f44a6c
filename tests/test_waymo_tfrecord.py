"""TFRecord framing, protobuf wire parsing, Waymo dataset over synthetic
Frame protos."""

import io
import json
import struct
import zlib

import numpy as np
import pytest

fsspec = pytest.importorskip("fsspec")
from PIL import Image  # noqa: E402

from opendwm_tpu.datasets import tfrecord as tfr  # noqa: E402
from opendwm_tpu.datasets.waymo import (  # noqa: E402
    CAM_FROM_SENSOR,
    MotionDataset,
)


def jpeg_bytes(color):
    buf = io.BytesIO()
    Image.new("RGB", (32, 24), color).save(buf, "JPEG")
    return buf.getvalue()


def packed_doubles(values):
    return struct.pack(f"<{len(values)}d", *values)


def packed_floats(values):
    return struct.pack(f"<{len(values)}f", *values)


def matrix_float_compressed(arr):
    arr = np.asarray(arr, np.float32)
    dims = b"".join(tfr.encode_varint(d) for d in arr.shape)
    mf = (
        tfr.encode_field(1, packed_floats(list(arr.reshape(-1))))
        + tfr.encode_field(2, tfr.encode_field(1, dims))
    )
    return zlib.compress(mf)


def make_range_image():
    # 1 beam x 4 azimuth columns, channel 0 = range
    ri = np.zeros((1, 4, 2), np.float32)
    ri[0, 3, 0] = 10.0  # azimuth -0.75*pi
    ri[0, 1, 0] = 5.0   # azimuth +0.25*pi
    return ri


def make_frame(ts, color, with_lidar=False):
    # Transform {matrix: packed doubles}
    pose = tfr.encode_field(1, packed_doubles(list(np.eye(4).reshape(-1))))
    intr = tfr.encode_field(2, packed_doubles([50, 50, 16, 12]))
    extr_mat = np.eye(4)
    extr_mat[0, 3] = 1.5
    extr = tfr.encode_field(
        3, tfr.encode_field(1, packed_doubles(list(extr_mat.reshape(-1))))
    )
    calib = (
        tfr.encode_field(1, 1)  # name = FRONT
        + intr + extr
        + tfr.encode_field(4, 32) + tfr.encode_field(5, 24)
    )
    context = tfr.encode_field(2, calib)
    image = tfr.encode_field(1, 1) + tfr.encode_field(2, jpeg_bytes(color))
    frame = (
        tfr.encode_field(1, context)
        + tfr.encode_field(2, ts)
        + tfr.encode_field(3, pose)
        + tfr.encode_field(4, image)
    )
    if with_lidar:
        laser_extr = tfr.encode_field(
            5,
            tfr.encode_field(1, packed_doubles(list(np.eye(4).reshape(-1)))),
        )
        laser_calib = (
            tfr.encode_field(1, 1)  # name = TOP
            + tfr.encode_field(3, 0.0)  # beam_inclination_min
            + tfr.encode_field(4, 0.0)  # beam_inclination_max
            + laser_extr
        )
        # splice laser calibration into the existing context message
        frame = frame.replace(
            tfr.encode_field(1, context),
            tfr.encode_field(1, context + tfr.encode_field(3, laser_calib)),
        )
        ri = tfr.encode_field(2, matrix_float_compressed(make_range_image()))
        laser = tfr.encode_field(1, 1) + tfr.encode_field(2, ri)
        box = (
            tfr.encode_field(1, 10.0) + tfr.encode_field(2, 0.0)
            + tfr.encode_field(3, 0.5) + tfr.encode_field(4, 2.0)  # width
            + tfr.encode_field(5, 4.0) + tfr.encode_field(6, 1.5)  # len, h
            + tfr.encode_field(7, 0.0)  # heading
        )
        label = tfr.encode_field(1, box) + tfr.encode_field(3, 1)  # VEHICLE
        frame += tfr.encode_field(5, laser) + tfr.encode_field(6, label)
    return frame


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    root = tmp_path_factory.mktemp("waymo")
    payloads = [
        make_frame(1000 * i, (10 * i, 0, 0), with_lidar=True)
        for i in range(5)
    ]
    path = root / "segment-000.tfrecord"
    with open(path, "wb") as f:
        tfr.write_tfrecord(f, payloads)
    with open(path, "rb") as f:
        offsets = tfr.make_tfrecord_index(f)
    (root / "info.json").write_text(
        json.dumps({"segment-000.tfrecord": offsets})
    )
    return root


class TestTfrecord:
    def test_roundtrip(self, shard):
        with open(shard / "segment-000.tfrecord", "rb") as f:
            records = list(tfr.iterate_tfrecord(f))
        assert len(records) == 5
        with open(shard / "segment-000.tfrecord", "rb") as f:
            payload = tfr.read_tfrecord_at(f, records[2][0])
        assert payload == records[2][1]

    def test_wire_parse(self):
        msg = (
            tfr.encode_field(1, 42)
            + tfr.encode_field(2, b"hello")
            + tfr.encode_field(2, b"world")
            + tfr.encode_field(3, 1.5)
        )
        fields = tfr.parse_protobuf(msg)
        assert fields[1] == [42]
        assert fields[2] == [b"hello", b"world"]
        assert tfr.decode_double(fields[3][0]) == 1.5


class TestWaymo:
    def test_items(self, shard):
        fs = fsspec.filesystem("dir", path=str(shard))
        ds = MotionDataset(
            fs, str(shard / "info.json"), sequence_length=2,
            fps_stride_tuples=[(10, 1)], sensor_channels=["FRONT"],
            enable_camera_transforms=True, enable_ego_transforms=True,
        )
        assert len(ds) == 4
        item = ds[0]
        img = np.asarray(item["images"][1][0])
        assert img.shape == (24, 32, 3)
        assert img[..., 0].mean() > 5  # decoded JPEG, not gray stub
        np.testing.assert_allclose(
            item["camera_intrinsics"][0, 0],
            [[50, 0, 16], [0, 50, 12], [0, 0, 1]],
        )
        # extrinsic (x fwd) folded into canonical camera frame (z fwd)
        cam = item["camera_transforms"][0, 0]
        np.testing.assert_allclose(cam[:3, 2], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(cam[0, 3], 1.5)
        assert item["ego_transforms"].shape == (2, 1, 4, 4)

    def test_lidar_range_image_decode(self, shard):
        fs = fsspec.filesystem("dir", path=str(shard))
        ds = MotionDataset(
            fs, str(shard / "info.json"), sequence_length=1,
            fps_stride_tuples=[(10, 1)],
            sensor_channels=["LIDAR_TOP"], max_point_count=16,
        )
        item = ds[0]
        pts = item["lidar_points"][0][np.asarray(item["lidar_points_mask"][0])]
        assert pts.shape == (2, 3)
        # identity extrinsic, single beam at inclination 0: ranges land at
        # azimuths ±(2k+1)/4·pi per the pixel-center column sweep
        by_range = {round(float(np.linalg.norm(p))): p for p in pts}
        np.testing.assert_allclose(
            by_range[10], 10 * np.array(
                [np.cos(-0.75 * np.pi), np.sin(-0.75 * np.pi), 0.0]
            ), atol=1e-4,
        )
        np.testing.assert_allclose(
            by_range[5], 5 * np.array(
                [np.cos(0.25 * np.pi), np.sin(0.25 * np.pi), 0.0]
            ), atol=1e-4,
        )

    def test_laser_label_rasters(self, shard):
        fs = fsspec.filesystem("dir", path=str(shard))
        ds = MotionDataset(
            fs, str(shard / "info.json"), sequence_length=1,
            fps_stride_tuples=[(10, 1)],
            sensor_channels=["CAM_FRONT"],
            _3dbox_image_settings={"pen_width": 2},
            _3dbox_bev_settings={"image_size": [640, 640]},
        )
        item = ds[0]
        cam_box = np.asarray(item["3dbox_images"][0][0])
        assert (cam_box[..., 2] > 0).sum() > 0  # vehicle ahead drawn blue
        bev = np.asarray(item["3dbox_bev_images"][0])
        ys, xs = np.nonzero(bev.any(-1))
        # vehicle at (10, 0) -> pixel (6.4*10+320, 320)
        assert abs(xs.mean() - 384) < 20 and abs(ys.mean() - 320) < 20
