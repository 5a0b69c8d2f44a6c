"""Drive the Carla hero vehicle from a scripted control schedule.

The reference ships two interactive controllers (a tkinter keyboard panel,
src/dwm/utils/carla_control.py, and a steering-log replayer,
src/dwm/utils/carla_control_from_steering.py). This headless equivalent
replays a JSON schedule of per-tick vehicle controls — the form used when
pairing the simulator with the streaming generation pipeline on a remote
TPU host where no display exists:

    [{"throttle": 0.5, "steer": 0.0, "brake": 0.0, "ticks": 40}, ...]

    python -m opendwm_tpu.tools.carla_control -c schedule.json --role hero
"""

from __future__ import annotations

import argparse
import json


def expand_schedule(schedule: list) -> list:
    """[{..., ticks: N}, ...] -> flat per-tick control dicts."""
    out = []
    for entry in schedule:
        n = int(entry.get("ticks", 1))
        ctrl = {k: v for k, v in entry.items() if k != "ticks"}
        out.extend([ctrl] * n)
    return out


def find_vehicle(world, role: str):
    for actor in world.get_actors().filter("vehicle.*"):
        if actor.attributes.get("role_name") == role:
            return actor
    raise LookupError(f"no vehicle with role_name={role!r}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config-path", required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("-p", "--port", default=2000, type=int)
    parser.add_argument("--role", default="hero")
    parser.add_argument("--client-timeout", default=10.0, type=float)
    args = parser.parse_args(argv)
    try:
        import carla
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "the carla Python package is required; see tools/carla_simulation"
        ) from e
    with open(args.config_path, encoding="utf-8") as f:
        schedule = expand_schedule(json.load(f))
    client = carla.Client(args.host, args.port, 1)
    client.set_timeout(args.client_timeout)
    world = client.get_world()
    vehicle = find_vehicle(world, args.role)
    vehicle.set_autopilot(False)
    for ctrl in schedule:
        world.wait_for_tick()
        vehicle.apply_control(carla.VehicleControl(**ctrl))
    print(f"applied {len(schedule)} controls to {args.role}")


if __name__ == "__main__":
    main()
