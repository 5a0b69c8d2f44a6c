"""Convert canonical camera parameters to Carla spawn configs.

Capability parity with reference src/dwm/utils/make_carla_cameras.py:
takes the canonical (right-handed, z-forward OpenCV) camera intrinsics +
camera→ego transforms (e.g. exported from nuScenes via
tools/export_nuscenes.py) and emits Carla actor configs — left-handed
x-forward spawn transforms plus a horizontal FOV derived from the
intrinsic matrix (asymmetric principal point handled by summing the two
half-angles).

Pure numpy — runs without the carla package, so the conversion itself is
unit-testable here.

    python -m opendwm_tpu.tools.make_carla_cameras -i cams.json -o carla.json
"""

from __future__ import annotations

import argparse
import json
import math

import numpy as np

# canonical camera (x-right, y-down, z-forward) expressed in the Carla-style
# x-forward frame (x-front, y-left, z-up)
CANONICAL_FROM_XFWD = np.array(
    [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], np.float64
)
LH_FROM_RH = np.diag([1.0, -1.0, 1.0, 1.0])
# Carla ego origin sits at the rear axle; canonical ego at vehicle center.
REAR_EGO_FROM_CENTER_EGO = np.array([-1.5, 0.0, 0.0])


def horizontal_fov_degrees(intrinsic, image_width: float) -> float:
    """Full horizontal FOV; asymmetric cx adds the two half angles."""
    fx, cx = intrinsic[0][0], intrinsic[0][2]
    return math.degrees(
        math.atan(cx / fx) + math.atan((image_width - cx) / fx)
    )


def matrix_to_carla_rotation(rot: np.ndarray) -> list:
    """3x3 left-handed rotation → Carla [pitch, yaw, roll] degrees.

    Carla applies yaw (about z), then pitch (about y), then roll (about x),
    in its left-handed frame.
    """
    # R = Rz(yaw) @ Ry(pitch) @ Rx(roll) in the LH frame with Carla's sign
    # conventions; invert by standard zyx extraction.
    pitch = math.asin(max(-1.0, min(1.0, -rot[2, 0])))
    if abs(rot[2, 0]) < 1.0 - 1e-9:
        yaw = math.atan2(rot[1, 0], rot[0, 0])
        roll = math.atan2(rot[2, 1], rot[2, 2])
    else:  # gimbal lock
        yaw = math.atan2(-rot[0, 1], rot[1, 1])
        roll = 0.0
    return [
        math.degrees(-pitch), math.degrees(yaw), math.degrees(-roll)
    ]


def convert_camera(name: str, entry: dict) -> dict:
    transform = np.asarray(entry["transform"], np.float64)
    carla_t = (
        LH_FROM_RH @ transform @ CANONICAL_FROM_XFWD @ LH_FROM_RH
    )
    location = carla_t[:3, 3] + REAR_EGO_FROM_CENTER_EGO
    return {
        "attributes": {
            "fov": str(
                horizontal_fov_degrees(
                    entry["intrinsic"], entry["image_size"][0]
                )
            ),
            "role_name": name,
            "image_size_x": str(int(entry["image_size"][0])),
            "image_size_y": str(int(entry["image_size"][1])),
        },
        "spawn_transform": {
            "location": [float(x) for x in location],
            "rotation": matrix_to_carla_rotation(carla_t[:3, :3]),
        },
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--input-path", required=True)
    parser.add_argument("-o", "--output-path", required=True)
    args = parser.parse_args(argv)
    with open(args.input_path, encoding="utf-8") as f:
        config = json.load(f)
    result = {k: convert_camera(k, v) for k, v in config.items()}
    with open(args.output_path, "w", encoding="utf-8") as f:
        json.dump(result, f, indent=4)
    print(f"wrote {len(result)} cameras to {args.output_path}")


if __name__ == "__main__":
    main()
