"""Per-actor behavior state machines for the Carla scene driver.

Capability parity with reference src/dwm/utils/carla_actor_state_machines.py:
small update()-per-tick controllers attached to spawned actors via the
``state_machine`` key of an actor config (resolved through the registry,
so configs may also name custom classes).

Requires a live ``carla`` client only at update() time — construction
takes the already-spawned actor.
"""

from __future__ import annotations

from opendwm_tpu.config import register


@register(aliases=(
    "dwm.utils.carla_actor_state_machines.ClassicPedestrian",
))
class ClassicPedestrian:
    """Walker AI controller: pick a navigation destination, walk, repeat."""

    def __init__(self, controller):
        self.controller = controller
        self.started = False

    def update(self):
        if not self.started:
            world = self.controller.get_world()
            destination = world.get_random_location_from_navigation()
            self.controller.start()
            self.controller.go_to_location(destination)
            self.controller.set_max_speed(
                float(self.controller.parent.attributes["speed"])
            )
            self.started = True


@register(aliases=(
    "dwm.utils.carla_actor_state_machines.BevSpectator",
))
class BevSpectator:
    """Keep the simulator spectator in a bird's-eye pose over the hero."""

    def __init__(self, actor, height: float = 50.0):
        import carla

        self.carla = carla
        self.hero = actor
        self.height = height
        self.spectator = actor.get_world().get_spectator()

    def update(self):
        t = self.hero.get_transform()
        self.spectator.set_transform(
            self.carla.Transform(
                t.location + self.carla.Location(z=self.height),
                self.carla.Rotation(pitch=-90.0),
            )
        )
