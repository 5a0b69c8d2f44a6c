"""Config-driven Carla scene setup + tick loop.

Capability parity with reference src/dwm/utils/carla_simulation.py: read a
simulation JSON (world settings, traffic-manager settings, actor configs
with blueprint pattern/id selection, spawn index / navigation / explicit
transform, nested child actors such as cameras, and optional per-actor
state machines resolved through the registry), spawn everything, then run
the tick loop. Pairs with the streaming adapter
(datasets/carla_streaming.py) feeding the live generation pipeline.

Requires a reachable Carla simulator + the carla Python package (absent
from this image — the module degrades to a clear error at run time; the
pure-config logic is factored for testing with a fake client).

    python -m opendwm_tpu.tools.carla_simulation -c sim.json --host ... -p 2000
"""

from __future__ import annotations

import argparse
import json
import random
import time

from opendwm_tpu.config import get_class


def pick_blueprint(library, actor_config: dict, rng: random.Random):
    if "pattern" in actor_config:
        candidates = library.filter(actor_config["pattern"])
        if "matched_index" in actor_config:
            return candidates[actor_config["matched_index"]]
        return rng.choice(candidates)
    return library.find(actor_config["id"])


def spawn_transform_for(world, spawn_points, actor_config: dict, carla):
    if "spawn_index" in actor_config:
        return spawn_points[actor_config["spawn_index"] % len(spawn_points)]
    if "spawn_from_navigation" in actor_config:
        location = world.get_random_location_from_navigation()
        return carla.Transform(location, carla.Rotation(0, 0, 0))
    st = actor_config.get("spawn_transform", {})
    return carla.Transform(
        carla.Location(*st.get("location", [0, 0, 0])),
        carla.Rotation(*st.get("rotation", [0, 0, 0])),
    )


def make_actor(
    world, library, spawn_points, actor_config: dict,
    rng: random.Random, carla, attach_to=None,
):
    """Spawn one actor (+ children); returns (actor, state_machine, kids)."""
    bp = pick_blueprint(library, actor_config, rng)
    for key, value in actor_config.get("attributes", {}).items():
        bp.set_attribute(key, value)
    transform = spawn_transform_for(world, spawn_points, actor_config, carla)
    actor = world.try_spawn_actor(bp, transform, attach_to)
    if actor is None:
        print(f"warning: failed to spawn {bp.id}")
        return None, None, None
    if actor.attributes.get("role_name") == "autopilot":
        actor.set_autopilot(True)
    if actor_config.get("report_actor_id"):
        print(f"{actor_config.get('id', bp.id)}: {actor.id}")

    state_machine = None
    if "state_machine" in actor_config:
        state_machine = get_class(actor_config["state_machine"])(
            actor, **actor_config.get("state_machine_args", {})
        )
    children = [
        make_actor(
            world, library, spawn_points, child, rng, carla, attach_to=actor
        )
        for child in actor_config.get("child_configs", [])
    ] or None
    return actor, state_machine, children


def update_actors(actors: list):
    for _, state_machine, children in actors:
        if state_machine is not None:
            state_machine.update()
        if children:
            update_actors(children)


def run(config: dict, args, carla):
    rng = random.Random(config.get("seed"))
    client = carla.Client(args.host, args.port, 1)
    client.set_timeout(args.client_timeout)
    world = client.get_world()
    traffic_manager = client.get_trafficmanager(args.traffic_port)
    master = config.get("master", False)
    if master:
        traffic_manager.set_synchronous_mode(True)
    if "world_settings" in config:
        settings = world.get_settings()
        for key, value in config["world_settings"].items():
            setattr(settings, key, value)
        world.apply_settings(settings)
    for key, value in config.get("traffic_manager_settings", {}).items():
        getattr(traffic_manager, key)(value)

    # register our state machines for bare-name configs
    import opendwm_tpu.utils.carla_state_machines  # noqa: F401

    actors = [
        make_actor(
            world, world.get_blueprint_library(),
            world.get_map().get_spawn_points(), cfg, rng, carla,
        )
        for cfg in config["actor_configs"]
    ]
    step, total = 0, config.get("total_steps", -1)
    while total == -1 or step < total:
        if args.step_sleep > 0:
            time.sleep(args.step_sleep)
        if master:
            world.tick()
        else:
            world.wait_for_tick()
        update_actors(actors)
        step += 1


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config-path", required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("-p", "--port", default=2000, type=int)
    parser.add_argument("-tp", "--traffic-port", default=8000, type=int)
    parser.add_argument("--client-timeout", default=10.0, type=float)
    parser.add_argument("--step-sleep", default=0.0, type=float)
    args = parser.parse_args(argv)
    try:
        import carla
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "the carla Python package is required for live simulation; "
            "install it alongside a reachable Carla server"
        ) from e
    with open(args.config_path, encoding="utf-8") as f:
        config = json.load(f)
    run(config, args, carla)


if __name__ == "__main__":
    main()
