"""Dataset common layer + bucket sampler."""

import numpy as np
import pytest

from opendwm_tpu.datasets.common import (
    CollateFnIgnoring,
    ConcatMotionDataset,
    DatasetAdapter,
    add_stub_key_data,
    align_image_description_crossview,
    get_transform,
    make_image_description_string,
    make_intrinsic_matrix,
    pad_points,
    project_line,
    quaternion_to_matrix,
)
from opendwm_tpu.utils.sampler import VariableVideoBatchSampler


class FakeDataset:
    def __init__(self, n=20):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"index": i, "x": np.full((2, 2), float(i))}


class TestGeometry:
    def test_identity_quaternion(self):
        np.testing.assert_allclose(
            quaternion_to_matrix([1, 0, 0, 0]), np.eye(3), atol=1e-12
        )

    def test_90deg_yaw(self):
        s = np.sqrt(0.5)
        r = quaternion_to_matrix([s, 0, 0, s])  # 90° about z
        np.testing.assert_allclose(r @ [1, 0, 0], [0, 1, 0], atol=1e-7)

    def test_get_transform(self):
        t = get_transform([1, 0, 0, 0], [1, 2, 3])
        np.testing.assert_allclose(t[:3, 3], [1, 2, 3])

    def test_intrinsics(self):
        k = make_intrinsic_matrix([500, 501], [320, 240])
        assert k[0, 0] == 500 and k[1, 2] == 240 and k[2, 2] == 1

    def test_project_line_clipping(self):
        a = np.array([0.0, 0.0, -1.0])
        b = np.array([0.0, 0.0, 1.0])
        xy = project_line(a, b)
        assert xy is not None  # clipped at near plane
        assert project_line(a, np.array([0, 0, -2.0])) is None


class TestCaption:
    def test_align_crossview(self):
        caps = [{"w": "rain"}, {"w": "rain"}, {"w": "sun"}]
        out = align_image_description_crossview(caps, {"align_keys": ["w"]})
        assert all(c["w"] == "rain" for c in out)

    def test_description_string(self):
        rng = np.random.RandomState(0)
        cap = {"time": "day", "weather": "sunny"}
        s = make_image_description_string(
            cap, {"selected_keys": ["time", "weather"]}, rng
        )
        assert s == "day. sunny"

    def test_drop_rates(self):
        rng = np.random.RandomState(0)
        cap = {"time": "day", "weather": "sunny"}
        s = make_image_description_string(
            cap,
            {"selected_keys": ["time", "weather"],
             "drop_rates": {"weather": 1.0}},
            rng,
        )
        assert s == "day"


class TestAdapters:
    def test_dataset_adapter_transform_and_bucket_index(self):
        ds = DatasetAdapter(
            FakeDataset(),
            transform_list=[
                {"old_key": "x", "new_key": "y",
                 "transform": lambda v: v * 2}
            ],
            pop_list=["x"],
        )
        item = ds[3]
        assert "x" not in item and item["y"][0, 0] == 6.0
        item = ds["4-8-256-448"]
        assert item["_bucket"] == {
            "sequence_length": 8, "height": 256, "width": 448
        }

    def test_concat_ratio(self):
        a, b = FakeDataset(10), FakeDataset(20)
        ds = ConcatMotionDataset([a, b], [0.5, 1.0])
        assert len(ds) == 25
        assert ds[0]["index"] == 0
        assert ds[5]["index"] == 0  # second dataset starts at offset 5

    def test_collate(self):
        fn = CollateFnIgnoring(keys=["caption"])
        out = fn([
            {"x": np.ones((2,)), "caption": "a", "n": 1},
            {"x": np.zeros((2,)), "caption": "b", "n": 2},
        ])
        assert out["x"].shape == (2, 2)
        assert out["caption"] == ["a", "b"]
        np.testing.assert_array_equal(out["n"], [1, 2])

    def test_stub_keys(self):
        result = {"a": 1}
        add_stub_key_data(
            {"b": ("tensor", (2, 3), 0.5), "c": ("value", "x")}, result
        )
        assert result["b"].shape == (2, 3) and result["b"][0, 0] == 0.5
        assert result["c"] == "x"

    def test_pad_points(self):
        pts = [np.ones((5, 4)), np.zeros((12, 3))]
        out, mask = pad_points(pts, 8)
        assert out.shape == (2, 8, 3) and mask.shape == (2, 8)
        assert mask[0].sum() == 5 and mask[1].sum() == 8


class TestBucketSampler:
    def test_yields_encoded_indices_and_covers_dataset(self):
        ds = FakeDataset(40)
        sampler = VariableVideoBatchSampler(
            ds,
            {"256x448": [1.0, [[8, 2, 0.5], [16, 1, 0.5]]]},
            num_replicas=2, rank=0, seed=0,
        )
        batches = list(sampler)
        assert len(batches) > 0
        for micro in batches:
            parts = micro[0].split("-")
            assert parts[1] in ("8", "16")
            assert parts[2] == "256" and parts[3] == "448"
            # batch size matches the bucket's configured bs
            assert len(micro) in (1, 2)

    def test_resume_state_dict(self):
        ds = FakeDataset(40)
        kw = dict(num_replicas=1, rank=0, seed=0, shuffle=True)
        s1 = VariableVideoBatchSampler(
            ds, {"128x128": [1.0, [[4, 2, 1.0]]]}, **kw
        )
        all_batches = list(s1)
        s2 = VariableVideoBatchSampler(
            ds, {"128x128": [1.0, [[4, 2, 1.0]]]}, **kw
        )
        s2.load_state_dict(s2.state_dict(num_steps=3))
        resumed = list(s2)
        assert resumed == all_batches[3:]
