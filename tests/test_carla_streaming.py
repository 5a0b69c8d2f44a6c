"""Carla streaming adapter over a fake simulator client."""

import math
import types

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")

from opendwm_tpu.datasets.carla_streaming import (  # noqa: E402
    StreamingDataAdapter,
    carla_transform_to_matrix,
    extract_opendrive_lines,
    intrinsics_from_fov,
    weather_to_prompt,
)


def obj(**kw):
    return types.SimpleNamespace(**kw)


def make_transform(x=0.0, y=0.0, z=0.0, yaw=0.0, pitch=0.0, roll=0.0):
    return obj(
        location=obj(x=x, y=y, z=z),
        rotation=obj(yaw=yaw, pitch=pitch, roll=roll),
    )


XODR = """<OpenDRIVE>
  <road id="1"><planView>
    <geometry x="0" y="0" hdg="0" length="100"/>
  </planView></road>
  <road id="2"><planView>
    <geometry x="0" y="5" hdg="0" length="50"><arc curvature="0.01"/></geometry>
  </planView></road>
</OpenDRIVE>"""


class FakeWorld:
    def __init__(self):
        self.ticks = 0
        self._weather = obj(
            sun_altitude_angle=45.0, precipitation=0.0, fog_density=0.0,
            cloudiness=10.0,
        )
        ego = obj(
            attributes={"role_name": "hero"}, type_id="vehicle.ego",
            get_transform=lambda: make_transform(0, 0, 0),
        )
        cam = obj(
            attributes={"role_name": "CAM_FRONT"},
            type_id="sensor.camera.rgb",
            get_transform=lambda: make_transform(1.5, 0, 1.6),
        )
        car = obj(
            attributes={}, type_id="vehicle.tesla.model3",
            get_transform=lambda: make_transform(12, 0, 0.75),
            bounding_box=obj(extent=obj(x=2.2, y=0.9, z=0.75)),
        )
        self._actors = [ego, cam, car]

    def tick(self):
        self.ticks += 1

    def get_weather(self):
        return self._weather

    def get_actors(self):
        return self._actors

    def get_map(self):
        return obj(to_opendrive=lambda: XODR)

    def get_settings(self):
        return obj(fixed_delta_seconds=0.1)


class FakeClient:
    def __init__(self):
        self.world = FakeWorld()

    def get_world(self):
        return self.world


class TestCarlaAdapter:
    def test_weather_prompt(self):
        w = obj(sun_altitude_angle=-30, precipitation=60, fog_density=0,
                cloudiness=0)
        assert weather_to_prompt(w, "city.") == "night. rainy. city."

    def test_opendrive_lines(self):
        lines = extract_opendrive_lines(XODR)
        assert len(lines) == 2
        assert lines[0][0] == (0.0, 0.0)
        assert lines[0][-1] == (100.0, 0.0)
        assert len(lines[1]) == 17  # sampled arc

    def test_transform_matrix_yaw(self):
        m = carla_transform_to_matrix(make_transform(1, 2, 3, yaw=90))
        # UE4 yaw 90° (left-handed) → right-handed: forward → -y
        np.testing.assert_allclose(m[:3, 3], [1, -2, 3], atol=1e-9)
        np.testing.assert_allclose(m[:3, 0], [0, -1, 0], atol=1e-9)

    def test_query_data_canonical_batch(self):
        adapter = StreamingDataAdapter(
            FakeClient(), sensor_channels=["CAM_FRONT"],
            image_size=(64, 48), _3dbox_image_settings={"pen_width": 2},
            hdmap_image_settings={"pen_width": 1},
        )
        item = adapter.query_data()
        assert adapter.world.ticks == 1
        assert item["camera_transforms"].shape == (1, 1, 1, 4, 4)
        assert item["camera_intrinsics"].shape == (1, 1, 1, 3, 3)
        np.testing.assert_allclose(
            item["camera_intrinsics"][0, 0, 0],
            intrinsics_from_fov(64, 48, 90.0),
        )
        assert item["image_description"][0][0][0].startswith(
            "daytime. clear sky."
        )
        box = item["3dbox_images"]
        assert box.shape == (1, 1, 1, 48, 64, 3)
        assert (box[..., 2] > 0).sum() > 0  # the car ahead draws blue
        hd = item["hdmap_images"]
        assert (hd[..., 1] > 0).sum() > 0  # road lines draw green
