"""Device mesh construction.

The reference's distributed trio (DDP / FSDP / HSDP over NCCL,
reference src/dwm/pipelines/ctsd.py:1050-1082 and
configs/ctsd/multi_datasets/ctsd_35_tirda_bm_nwao.json:43-50) collapses on TPU
into a single declarative 3-axis mesh:

    ("dp", "fsdp", "tp")

- DDP      == mesh (dp=N, fsdp=1, tp=1): params replicated, batch sharded.
- FSDP     == mesh (dp=1, fsdp=N, tp=1): params sharded over "fsdp";
              XLA inserts all-gather on use, reduce-scatter on grads.
- HSDP     == mesh (dp=A, fsdp=B): the reference's 2-D device_mesh [4, 8] —
              "dp" typically rides DCN (between pods / hosts) and "fsdp" rides
              ICI, matching the reference's shard-within-node intent.
- TP       == "tp" axis for tensor parallelism of attention heads / MLP
              (not present in the reference; first-class here).

Sequence parallelism reuses the "tp" axis (ring attention over ICI).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import numpy as np
from jax.sharding import Mesh

from opendwm_tpu.config import register

AXIS_DP = "dp"
AXIS_FSDP = "fsdp"
AXIS_TP = "tp"
AXIS_PP = "pp"
AXES = (AXIS_DP, AXIS_FSDP, AXIS_TP)


@register("MeshSpec", aliases=("torch.distributed.device_mesh.init_device_mesh",))
@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh shape; -1 on at most one axis means "all remaining"."""

    dp: int = 1
    fsdp: int = -1
    tp: int = 1
    pp: int = 1  # pipeline stages (parallel/pipeline.py); axis added when >1

    def resolve(self, n_devices: int) -> tuple[int, ...]:
        dims = [self.dp, self.fsdp, self.tp] + (
            [self.pp] if self.pp != 1 else []
        )
        unknown = [i for i, d in enumerate(dims) if d == -1]
        if len(unknown) > 1:
            raise ValueError("At most one mesh axis may be -1.")
        known = math.prod(d for d in dims if d != -1)
        if unknown:
            if n_devices % known != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes {known}."
                )
            dims[unknown[0]] = n_devices // known
        if math.prod(dims) != n_devices:
            raise ValueError(
                f"Mesh {tuple(dims)} does not cover {n_devices} devices."
            )
        return tuple(dims)


def make_mesh(spec: MeshSpec | None = None, devices=None) -> Mesh:
    """Build a 3-axis Mesh over the given (default: all) devices.

    Axis order is (dp, fsdp, tp) from outermost to innermost so that the
    innermost axes land on the tightest ICI neighborhoods in the default
    device order (the fleet's DCN/ICI split then matches dp=DCN, fsdp/tp=ICI,
    mirroring the reference's HSDP mesh_shape [4, 8] semantics).
    """
    if devices is None:
        devices = jax.devices()
    spec = spec or MeshSpec()
    shape = spec.resolve(len(devices))
    axes = AXES + ((AXIS_PP,) if len(shape) == 4 else ())
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)


def mesh_for_policy(policy: str, devices=None) -> Mesh:
    """Mesh presets named after the reference's distribution_framework values."""
    n = len(devices or jax.devices())
    if policy == "ddp":
        spec = MeshSpec(dp=-1, fsdp=1, tp=1)
    elif policy == "fsdp":
        spec = MeshSpec(dp=1, fsdp=-1, tp=1)
    elif policy == "hsdp":
        # Reference flagship uses [4, 8]; generically: split devices into
        # sqrt-balanced (dp, fsdp) with fsdp the larger power of two.
        f = 1
        while f * f <= n:
            f *= 2
        f = min(f, n)
        while n % f:
            f //= 2
        spec = MeshSpec(dp=n // f, fsdp=f, tp=1)
    else:
        raise ValueError(f"Unknown mesh policy {policy!r}.")
    return make_mesh(spec, devices)
