"""Steering-wheel / joystick control client for a Carla hero vehicle.

Capability parity with reference src/dwm/utils/carla_control_from_steering.py
(1-310): joystick axes (steer/throttle/brake, configurable id/range/default)
map to ``carla.VehicleControl`` at 10 Hz, button 1 toggles reverse, button 3
toggles autopilot. The reference renders a tkinter dashboard; this client is
headless-first (terminal status line) so it runs over SSH next to the
streaming pipeline — the mapping/state logic is identical and unit-tested.

    python -m opendwm_tpu.tools.carla_control_from_steering \
        --host 127.0.0.1 -p 2000 \
        --steer-axis-id-min-max-default 0,-1,1,0
"""

from __future__ import annotations

import argparse
import time

CARLA_AXIS_RANGE = {
    "steer": [-1.0, 1.0],
    "throttle": [0.0, 1.0],
    "brake": [0.0, 1.0],
}

AUTOPILOT_BUTTON = 3
REVERSE_BUTTON = 1


def joystick_value_to_carla(joystick_config, key, joystick_value):
    """Linear remap from the joystick axis range to the Carla control range,
    clamped (reference SteeringControlPanel.joystick_value_to_carla)."""
    a = joystick_config[key]["range"]
    b = CARLA_AXIS_RANGE[key]
    value = (joystick_value - a[0]) / (a[1] - a[0]) * (b[1] - b[0]) + b[0]
    return min(max(b[0], value), b[1])


def parse_arg_joystick_axis_config(arg: str) -> dict:
    """``id,min,max,default`` → axis config (reference :252-259)."""
    id_str, min_str, max_str, default_str = arg.split(",")
    return {
        "id": int(id_str),
        "range": [float(min_str), float(max_str)],
        "default": float(default_str),
    }


class SteeringController:
    """Joystick → vehicle control state machine.

    ``joystick`` needs ``get_axis(id)``; ``vehicle`` needs
    ``apply_control(control)`` / ``set_autopilot(bool)``; ``make_control``
    builds the control object (carla.VehicleControl in production, any
    attribute bag in tests). Button events come in via :meth:`on_button_up`.
    """

    def __init__(self, joystick, joystick_config, vehicle, make_control):
        self.joystick = joystick
        self.config = joystick_config
        self.vehicle = vehicle
        self.make_control = make_control
        self.reverse = False
        self.is_auto = False
        self.axis_state = {
            k: joystick_value_to_carla(joystick_config, k, v["default"])
            for k, v in joystick_config.items()
        }

    def on_button_up(self, button: int):
        if button == AUTOPILOT_BUTTON:
            self.is_auto = not self.is_auto
            if self.vehicle is not None:
                self.vehicle.set_autopilot(self.is_auto)
        elif button == REVERSE_BUTTON:
            self.reverse = not self.reverse

    def poll(self):
        """Read axes and, unless autopiloting, apply the control."""
        for key, cfg in self.config.items():
            self.axis_state[key] = joystick_value_to_carla(
                self.config, key, self.joystick.get_axis(cfg["id"])
            )
        if self.vehicle is not None and not self.is_auto:
            control = self.make_control()
            for key, value in self.axis_state.items():
                setattr(control, key, value)
            control.reverse = self.reverse
            self.vehicle.apply_control(control)
        return dict(self.axis_state, reverse=self.reverse,
                    autopilot=self.is_auto)


def create_parser():
    parser = argparse.ArgumentParser(description="Carla control client")
    parser.add_argument("--host", default="127.0.0.1", type=str)
    parser.add_argument("-p", "--port", default=2000, type=int)
    parser.add_argument("--client-timeout", default=10.0, type=float)
    parser.add_argument(
        "--steer-axis-id-min-max-default", default="0,-1,1,0", type=str)
    parser.add_argument(
        "--throttle-axis-id-min-max-default", default="5,0,1,0", type=str)
    parser.add_argument(
        "--brake-axis-id-min-max-default", default="1,0,1,0", type=str)
    parser.add_argument("--rate-hz", default=10.0, type=float)
    return parser


def main(args=None):
    args = args or create_parser().parse_args()
    import carla  # requires the carla package + a reachable simulator
    import pygame

    joystick_config = {
        "steer": parse_arg_joystick_axis_config(
            args.steer_axis_id_min_max_default),
        "throttle": parse_arg_joystick_axis_config(
            args.throttle_axis_id_min_max_default),
        "brake": parse_arg_joystick_axis_config(
            args.brake_axis_id_min_max_default),
    }

    client = carla.Client(args.host, args.port, 1)
    client.set_timeout(args.client_timeout)
    world = client.get_world()
    world.wait_for_tick()
    hero_vehicle, = [
        actor for actor in world.get_actors()
        if actor.type_id.startswith("vehicle")
        and actor.attributes.get("role_name") == "hero"
    ]
    print(f"Hero vehicle: {hero_vehicle.id}")

    pygame.init()
    pygame.joystick.init()
    assert pygame.joystick.get_count() >= 1
    joystick = pygame.joystick.Joystick(0)
    joystick.init()

    controller = SteeringController(
        joystick, joystick_config, hero_vehicle, carla.VehicleControl
    )
    period = 1.0 / args.rate_hz
    try:
        while True:
            for event in pygame.event.get():
                if event.type == pygame.JOYBUTTONUP:
                    controller.on_button_up(event.button)
            state = controller.poll()
            print(
                "\rsteer {steer:+.2f} throttle {throttle:.2f} "
                "brake {brake:.2f} rev {reverse} auto {autopilot} ".format(
                    **state
                ),
                end="", flush=True,
            )
            time.sleep(period)
    except KeyboardInterrupt:
        pass
    finally:
        pygame.joystick.quit()


if __name__ == "__main__":
    main()
