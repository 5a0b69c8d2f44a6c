"""KITTI-360 dataset over a synthetic fixture (bins + poses + bbox xml)."""

import numpy as np
import pytest

fsspec = pytest.importorskip("fsspec")

from opendwm_tpu.datasets.kitti360 import (  # noqa: E402
    MotionDataset,
    interpolate_pose,
    mat_to_quat,
    quat_slerp,
)


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    for drive in ("2013_05_28_drive_0000_sync", "2013_05_28_drive_0004_sync"):
        d = root / "data_3d_raw" / drive / "velodyne_points" / "data"
        d.mkdir(parents=True)
        for i in range(4):
            pts = np.random.default_rng(i).uniform(
                -20, 20, (50, 4)
            ).astype(np.float32)
            (d / f"{i:010d}.bin").write_bytes(pts.tobytes())
        pd = root / "data_poses" / drive
        pd.mkdir(parents=True)
        # poses only at frames 0 and 3 → 1, 2 need interpolation
        rows = []
        for fid, x in ((0, 0.0), (3, 30.0)):
            pose = np.eye(4)[:3]
            pose[0, 3] = x
            rows.append(f"{fid} " + " ".join(str(v) for v in pose.reshape(-1)))
        (pd / "poses.txt").write_text("\n".join(rows))
        bd = root / "data_3d_bboxes" / "train"
        bd.mkdir(parents=True, exist_ok=True)
        (bd / f"{drive}.xml").write_text(
            """<opencv_storage>
            <object>
              <transform><data>
                1 0 0 5  0 1 0 0  0 0 1 1  0 0 0 1
              </data></transform>
              <semanticId>26</semanticId>
              <timestamp>-1</timestamp>
            </object>
            </opencv_storage>"""
        )
    return root


class TestPoseMath:
    def test_quat_roundtrip(self):
        from opendwm_tpu.datasets.common import quaternion_to_matrix

        rng = np.random.default_rng(0)
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        r = quaternion_to_matrix(q)
        q2 = mat_to_quat(r)
        assert np.allclose(q, q2, atol=1e-6) or np.allclose(q, -q2, atol=1e-6)

    def test_slerp_endpoints(self):
        q1 = np.array([1.0, 0, 0, 0])
        q2 = np.array([np.sqrt(0.5), 0, 0, np.sqrt(0.5)])
        np.testing.assert_allclose(quat_slerp(q1, q2, 0.0), q1, atol=1e-7)
        np.testing.assert_allclose(quat_slerp(q1, q2, 1.0), q2, atol=1e-7)

    def test_interpolation_count_and_translation(self):
        p1, p2 = np.eye(4), np.eye(4)
        p2[:3, 3] = [3, 0, 0]
        mids = interpolate_pose(p1, p2, 3)
        assert len(mids) == 2
        np.testing.assert_allclose(mids[0][:3, 3], [1, 0, 0], atol=1e-6)


class TestKitti360:
    def test_item_and_split(self, root):
        fs = fsspec.filesystem("dir", path=str(root))
        ds = MotionDataset(
            fs, sequence_length=2, fps_stride_tuples=[(0, 1)],
            enable_ego_transforms=True,
            _3dbox_bev_settings={
                "bev_size": [64, 64], "pen_width": 1,
                "bev_from_ego_transform": [
                    [3.2, 0, 0, 32], [0, -3.2, 0, 32],
                    [0, 0, -3.2, 0], [0, 0, 0, 1],
                ],
            },
            max_point_count=64,
        )
        assert len(ds) == 6  # 2 drives × 3 segments
        item = ds[0]
        assert item["lidar_points"].shape == (2, 64, 3)
        assert item["lidar_points_mask"].sum() == 100
        assert item["ego_transforms"].shape == (2, 1, 4, 4)
        bev = np.asarray(item["3dbox_bev_images"][0])
        assert bev.shape == (64, 64, 3)
        assert (bev[..., 2] > 0).sum() > 0  # car box drawn in blue

        val = MotionDataset(
            fs, sequence_length=2, fps_stride_tuples=[(0, 1)], split="val",
        )
        assert len(val) == 3  # only drive 0000

    def test_pose_interpolation_used(self, root):
        fs = fsspec.filesystem("dir", path=str(root))
        ds = MotionDataset(
            fs, sequence_length=4, fps_stride_tuples=[(0, 1)],
            enable_ego_transforms=True,
        )
        item = ds[0]
        xs = item["ego_transforms"][:, 0, 0, 3]
        np.testing.assert_allclose(xs, [0, 10, 20, 30], atol=1e-4)
