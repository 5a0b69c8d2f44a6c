"""Carla tools: camera conversion math + scene setup over a fake client."""

import json
import os
import math
import random

import numpy as np

from opendwm_tpu.tools.carla_control import expand_schedule
from opendwm_tpu.tools.make_carla_cameras import (
    convert_camera,
    horizontal_fov_degrees,
    main as cameras_main,
)


class TestMakeCarlaCameras:
    def test_fov_symmetric(self):
        intr = [[100, 0, 320], [0, 100, 240], [0, 0, 1]]
        fov = horizontal_fov_degrees(intr, 640)
        assert np.isclose(fov, 2 * math.degrees(math.atan(320 / 100)))

    def test_fov_asymmetric_principal_point(self):
        intr = [[100, 0, 200], [0, 100, 240], [0, 0, 1]]
        fov = horizontal_fov_degrees(intr, 640)
        want = math.degrees(math.atan(2.0) + math.atan(4.4))
        assert np.isclose(fov, want)

    def test_front_camera_identity_rotation(self):
        # canonical front camera: z forward = ego +x, y down = ego -z.
        transform = [
            [0, 0, 1, 1.5], [-1, 0, 0, 0], [0, -1, 0, 1.6], [0, 0, 0, 1],
        ]
        out = convert_camera("CAM_FRONT", {
            "transform": transform,
            "intrinsic": [[100, 0, 320], [0, 100, 240], [0, 0, 1]],
            "image_size": [640, 480],
        })
        rot = out["spawn_transform"]["rotation"]
        np.testing.assert_allclose(rot, [0, 0, 0], atol=1e-6)
        # rear-axle shift: center-ego x 1.5 → carla x 0.0; z stays 1.6
        loc = out["spawn_transform"]["location"]
        np.testing.assert_allclose(loc, [0.0, 0.0, 1.6], atol=1e-6)

    def test_left_camera_yaw(self):
        # camera looking to ego +y (left): in carla's LH frame that is a
        # -90 degree yaw.
        transform = [
            [-1, 0, 0, 0], [0, 0, 1, 0.5], [0, -1, 0, 1.6], [0, 0, 0, 1],
        ]
        out = convert_camera("CAM_LEFT", {
            "transform": transform,
            "intrinsic": [[100, 0, 320], [0, 100, 240], [0, 0, 1]],
            "image_size": [640, 480],
        })
        pitch, yaw, roll = out["spawn_transform"]["rotation"]
        assert np.isclose(abs(yaw), 90.0, atol=1e-6)
        np.testing.assert_allclose([pitch, roll], [0, 0], atol=1e-6)

    def test_cli_roundtrip(self, tmp_path):
        src = {
            "CAM_FRONT": {
                "transform": [
                    [0, 0, 1, 1.5], [-1, 0, 0, 0], [0, -1, 0, 1.6],
                    [0, 0, 0, 1],
                ],
                "intrinsic": [[100, 0, 320], [0, 100, 240], [0, 0, 1]],
                "image_size": [640, 480],
            }
        }
        (tmp_path / "in.json").write_text(json.dumps(src))
        cameras_main([
            "-i", str(tmp_path / "in.json"), "-o", str(tmp_path / "out.json")
        ])
        out = json.loads((tmp_path / "out.json").read_text())
        assert out["CAM_FRONT"]["attributes"]["role_name"] == "CAM_FRONT"
        assert float(out["CAM_FRONT"]["attributes"]["fov"]) > 100


class FakeBlueprint:
    def __init__(self, bid):
        self.id = bid
        self.attrs = {}

    def set_attribute(self, k, v):
        self.attrs[k] = v


class FakeLibrary:
    def __init__(self, ids):
        self.bps = [FakeBlueprint(i) for i in ids]

    def filter(self, pattern):
        key = pattern.strip("*")
        return [b for b in self.bps if key in b.id]

    def find(self, bid):
        return next(b for b in self.bps if b.id == bid)


class FakeActor:
    def __init__(self, bp, transform, parent):
        self.type_id = bp.id
        self.attributes = dict(bp.attrs)
        self.transform = transform
        self.parent = parent
        self.id = 42
        self.autopilot = False

    def set_autopilot(self, value):
        self.autopilot = value


class FakeWorld:
    def __init__(self):
        self.spawned = []

    def try_spawn_actor(self, bp, transform, attach_to=None):
        actor = FakeActor(bp, transform, attach_to)
        self.spawned.append(actor)
        return actor

    def get_random_location_from_navigation(self):
        return "nav-location"


class FakeCarlaModule:
    class Transform:
        def __init__(self, location=None, rotation=None):
            self.location = location
            self.rotation = rotation

    class Location:
        def __init__(self, *xyz):
            self.xyz = xyz

    class Rotation:
        def __init__(self, *pyr):
            self.pyr = pyr


class TestSceneSetup:
    def test_make_actor_with_children(self):
        from opendwm_tpu.tools.carla_simulation import make_actor

        world = FakeWorld()
        lib = FakeLibrary(
            ["vehicle.lincoln.mkz", "sensor.camera.rgb"]
        )
        cfg = {
            "pattern": "vehicle.*",
            "attributes": {"role_name": "autopilot"},
            "spawn_index": 0,
            "child_configs": [
                {
                    "id": "sensor.camera.rgb",
                    "attributes": {"role_name": "CAM_FRONT"},
                    "spawn_transform": {"location": [1.5, 0, 1.6]},
                }
            ],
        }
        actor, sm, children = make_actor(
            world, lib, ["spawn0"], cfg, random.Random(0), FakeCarlaModule
        )
        assert actor.autopilot is True
        assert sm is None
        (child, _, _), = children
        assert child.parent is actor
        assert child.attributes["role_name"] == "CAM_FRONT"

    def test_spawn_from_navigation(self):
        from opendwm_tpu.tools.carla_simulation import spawn_transform_for

        t = spawn_transform_for(
            FakeWorld(), [], {"spawn_from_navigation": True},
            FakeCarlaModule,
        )
        assert t.location == "nav-location"


class TestControlSchedule:
    def test_expand(self):
        flat = expand_schedule([
            {"throttle": 0.5, "ticks": 3},
            {"brake": 1.0},
        ])
        assert len(flat) == 4
        assert flat[0] == {"throttle": 0.5}
        assert flat[-1] == {"brake": 1.0}


class TestSteeringControl:
    def _config(self):
        from opendwm_tpu.tools.carla_control_from_steering import (
            parse_arg_joystick_axis_config,
        )

        return {
            "steer": parse_arg_joystick_axis_config("0,-1,1,0"),
            "throttle": parse_arg_joystick_axis_config("5,0,1,0"),
            "brake": parse_arg_joystick_axis_config("1,0,1,0"),
        }

    def test_axis_mapping_and_clamp(self):
        from opendwm_tpu.tools.carla_control_from_steering import (
            joystick_value_to_carla,
        )

        cfg = self._config()
        assert joystick_value_to_carla(cfg, "steer", 0.0) == 0.0
        assert joystick_value_to_carla(cfg, "steer", -1.0) == -1.0
        assert joystick_value_to_carla(cfg, "steer", 2.0) == 1.0  # clamp
        assert joystick_value_to_carla(cfg, "throttle", 0.5) == 0.5

    def test_controller_applies_control_and_toggles(self):
        from opendwm_tpu.tools.carla_control_from_steering import (
            AUTOPILOT_BUTTON,
            REVERSE_BUTTON,
            SteeringController,
        )

        class FakeJoystick:
            axes = {0: 0.5, 5: 0.8, 1: 0.0}

            def get_axis(self, i):
                return self.axes[i]

        class FakeControl:
            pass

        class FakeVehicle:
            def __init__(self):
                self.controls = []
                self.autopilot = None

            def apply_control(self, c):
                self.controls.append(c)

            def set_autopilot(self, value):
                self.autopilot = value

        vehicle = FakeVehicle()
        ctrl = SteeringController(
            FakeJoystick(), self._config(), vehicle, FakeControl
        )
        state = ctrl.poll()
        assert state["steer"] == 0.5 and state["throttle"] == 0.8
        assert vehicle.controls[-1].steer == 0.5
        assert vehicle.controls[-1].reverse is False

        ctrl.on_button_up(REVERSE_BUTTON)
        ctrl.poll()
        assert vehicle.controls[-1].reverse is True

        ctrl.on_button_up(AUTOPILOT_BUTTON)
        assert vehicle.autopilot is True
        n = len(vehicle.controls)
        ctrl.poll()  # autopilot on → no manual control applied
        assert len(vehicle.controls) == n


class TestTown10SimConfigs:
    """The generated Town10 sim configs drive a full fake-client scene."""

    ROOT = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "experimental", "simulation")

    def test_generator_matches_committed_configs(self, tmp_path,
                                                 monkeypatch):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "make_town10", os.path.join(self.ROOT,
                                        "make_town10_sim_configs.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        for views in (3, 6):
            with open(os.path.join(
                    self.ROOT,
                    f"carla_simulation_town10_nusc_{views}views.json")) as f:
                committed = json.load(f)
            assert committed == mod.build(views)

    def test_scene_spawns_over_fake_client(self, monkeypatch):
        import sys

        import opendwm_tpu.utils.carla_state_machines  # noqa: F401
        from opendwm_tpu.tools.carla_simulation import make_actor

        # BevSpectator does ``import carla`` at construction.
        monkeypatch.setitem(sys.modules, "carla", FakeCarlaModule)

        class FakeSpectator:
            def set_transform(self, t):
                pass

        class FakeSceneWorld(FakeWorld):
            def get_spectator(self):
                return FakeSpectator()

        world = FakeSceneWorld()

        def get_world(actor_self=None):
            return world

        FakeActor.get_world = get_world

        with open(os.path.join(
                self.ROOT,
                "carla_simulation_town10_nusc_6views.json")) as f:
            cfg = json.load(f)
        lib = FakeLibrary([
            "vehicle.lincoln.mkz_2017", "sensor.camera.rgb",
            "sensor.camera.semantic_segmentation", "vehicle.audi.a2",
            "vehicle.tesla.model3", "vehicle.nissan.micra",
            "vehicle.mercedes.coupe", "walker.pedestrian.0001",
            "controller.ai.walker",
        ])
        spawn_points = [f"sp{i}" for i in range(120)]
        actors = [
            make_actor(world, lib, spawn_points, a, random.Random(0),
                       FakeCarlaModule)
            for a in cfg["actor_configs"]
        ]
        assert len(actors) == 14
        hero, hero_sm, cams = actors[0]
        assert hero.attributes["role_name"] == "hero"
        assert hero_sm is not None  # BevSpectator constructed
        assert len(cams) == 12  # 6 views x (rgb + semseg)
        roles = {c.attributes["role_name"] for c, _, _ in cams}
        assert roles == {
            "CAM_FRONT", "CAM_FRONT_LEFT", "CAM_FRONT_RIGHT",
            "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT",
        }
        # every traffic vehicle autopilots; walkers carry AI controllers
        for veh, _, _ in (a for a in actors[1:10]):
            assert veh.autopilot is True
        for _, _, kids in actors[10:]:
            (ctl, ctl_sm, _), = kids
            assert ctl_sm is not None  # ClassicPedestrian
