"""Generate the Town10 Carla simulation configs (3- and 6-view nuScenes rig).

Counterpart of the reference's carla_simulation_town10_nusc_{3,6}views.json
(configs/experimental/simulation/ there): a hero vehicle carrying the
nuScenes camera rig (RGB + semantic-segmentation pairs), background traffic
on fixed spawn points, and AI pedestrians — consumed by
``opendwm_tpu.tools.carla_simulation`` and streamed into the live generation
pipeline via ``datasets/carla_streaming.py``.

The camera spawn transforms/FOVs are the nuScenes calibrated rig converted
to Carla's left-handed x-forward frame (the same conversion
``opendwm_tpu.tools.make_carla_cameras`` implements); they are data
constants, kept here in one table.

    python configs/experimental/simulation/make_town10_sim_configs.py
"""

import json
import os

# role_name, horizontal fov (deg), [x, y, z] m, [pitch, yaw, roll] deg
NUSC_RIG = [
    ("CAM_FRONT_LEFT", 64.294,
     [0.02387798, -0.4946313, 1.509328], [-0.01956288, -55.16078, 0.1844642]),
    ("CAM_FRONT", 65.105,
     [0.2220057, 0.004754533, 1.494913], [0.4832067, -0.5878978, 0.7057124]),
    ("CAM_FRONT_RIGHT", 64.951,
     [0.08082566, 0.4990787, 1.517494], [0.9428741, 57.575, 0.2075008]),
    ("CAM_BACK_RIGHT", 64.843,
     [-0.4851219, 0.4805682, 1.562395], [0.9096567, 110.7891, 0.6515776]),
    ("CAM_BACK", 89.306,
     [-1.471674, -0.003451368, 1.579103], [-0.959956, -179.8612, -0.2268726]),
    ("CAM_BACK_LEFT", 64.958,
     [-0.464309, -0.484795, 1.59097], [0.4965155, -108.5951, -0.8008391]),
]

# (blueprint pattern, Town10 spawn-point index) for background traffic
TRAFFIC = [
    ("vehicle.audi.*", 0), ("vehicle.tesla.*", 51), ("vehicle.tesla.*", 52),
    ("vehicle.nissan.*", 99), ("vehicle.audi.*", 102),
    ("vehicle.mercedes.*", 79), ("vehicle.tesla.*", 108),
    ("vehicle.mercedes.*", 53), ("vehicle.nissan.*", 94),
]

WALKER_SPAWNS = [[-69, 36, 1], [-52, 36, 1], [-32, 4, 1], [-49, 25, 1]]


def camera_pair(name, fov, location, rotation):
    """RGB + semantic-segmentation sensors at the same mount."""
    out = []
    for sensor in ("sensor.camera.rgb", "sensor.camera.semantic_segmentation"):
        out.append({
            "id": sensor,
            "attributes": {
                "image_size_x": "640",
                "image_size_y": "360",
                "fov": f"{fov}",
                "role_name": name,
            },
            "spawn_transform": {"location": location, "rotation": rotation},
            "report_actor_id": True,
        })
    return out


def build(views: int) -> dict:
    rig = NUSC_RIG[:3] if views == 3 else NUSC_RIG
    hero = {
        "id": "vehicle.lincoln.mkz_2017",
        "attributes": {"role_name": "hero"},
        "spawn_index": 1,
        "state_machine": "dwm.utils.carla_actor_state_machines.BevSpectator",
        "report_actor_id": True,
        "child_configs": [
            cam for entry in rig for cam in camera_pair(*entry)
        ],
    }
    traffic = [
        {
            "pattern": pattern,
            "spawn_index": index,
            "attributes": {"role_name": "autopilot"},
        }
        for pattern, index in TRAFFIC
    ]
    walkers = [
        {
            "pattern": "walker.pedestrian.*",
            "attributes": {"is_invincible": "false", "speed": "1.7"},
            "spawn_transform": {"location": loc},
            "child_configs": [{
                "id": "controller.ai.walker",
                "spawn_transform": {},
                "state_machine":
                    "dwm.utils.carla_actor_state_machines.ClassicPedestrian",
            }],
        }
        for loc in WALKER_SPAWNS
    ]
    return {
        "world_settings": {
            "synchronous_mode": True,
            "fixed_delta_seconds": 0.1,
        },
        "traffic_manager_settings": {
            "set_global_distance_to_leading_vehicle": 20,
        },
        "total_steps": 65536,
        "seed": 0,
        "actor_configs": [hero] + traffic + walkers,
    }


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    for views in (3, 6):
        path = os.path.join(
            here, f"carla_simulation_town10_nusc_{views}views.json")
        with open(path, "w") as f:
            json.dump(build(views), f, indent=1)
            f.write("\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
