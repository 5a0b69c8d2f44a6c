"""Config → object-graph runtime.

The reference drives *everything* from a single JSON tree whose nodes carry a
``_class_name`` key that is reflected into a live object
(``dwm.common.create_instance_from_config``, reference src/dwm/common.py:154-179).
We keep the exact JSON semantics (so reference configs remain readable into this
framework) but replace blind ``importlib`` reflection with a **registry** of
typed factories: class paths are first looked up in the registry (which also
maps ``dwm.*`` reference names onto their TPU-native equivalents), and only
``opendwm_tpu.*`` / stdlib paths may fall back to import reflection.  This keeps
config-driven instantiation while removing the arbitrary-import hazard.

Also hosts ``global_state`` (reference src/dwm/common.py:182-186): a process
dictionary that config nodes reference by key — used for shared filesystem
handles and the device mesh.
"""

from __future__ import annotations

import importlib
import json
from typing import Any, Callable

# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, Callable] = {}

# Reference (`dwm.*`) class paths → registry names of our equivalents. Filled
# in by `register(..., aliases=[...])` calls across the package.
_ALIASES: dict[str, str] = {}

_ALLOWED_IMPORT_PREFIXES = (
    "opendwm_tpu.",
    "jax.",
    "jax.numpy.",
    "optax.",
    "numpy.",
    # the reference's storage presets name fsspec classes directly
    # (configs/fs/local.json there)
    "fsspec.",
)


def register(name: str | None = None, aliases: tuple[str, ...] = ()):
    """Class/function decorator adding the object to the config registry."""

    def wrap(obj):
        key = name or f"{obj.__module__}.{obj.__qualname__}"
        _REGISTRY[key] = obj
        # Short name too, when unambiguous.
        short = obj.__qualname__
        _REGISTRY.setdefault(short, obj)
        for a in aliases:
            _ALIASES[a] = key
        return obj

    return wrap


def register_alias(reference_name: str, target: str) -> None:
    _ALIASES[reference_name] = target


# Reference module path → the opendwm_tpu module whose import registers the
# TPU-native equivalents. Allows configs to be resolved without eagerly
# importing the whole package.
_LAZY_MODULES: dict = {  # values: module path or tuple of module paths
    "dwm.models.crossview_temporal_dit": "opendwm_tpu.models.mmdit",
    "dwm.models.crossview_temporal": "opendwm_tpu.models.layers",
    "dwm.models.crossview_temporal_unet": "opendwm_tpu.models.unet",
    "dwm.models.adapters": "opendwm_tpu.models.adapters",
    "dwm.models.depth_net": "opendwm_tpu.models.depth_net",
    "dwm.models.mask_layers": "opendwm_tpu.models.mask_layers",
    "dwm.models.maskgit_model": "opendwm_tpu.models.maskgit",
    "dwm.models.vq_point_cloud": "opendwm_tpu.models.vq_point_cloud",
    "dwm.models.vae_point_cloud": "opendwm_tpu.models.vae_point_cloud",
    "dwm.models.voxelizer": "opendwm_tpu.ops.voxelize",
    "dwm.schedulers.temporal_independent": "opendwm_tpu.schedulers",
    "diffusers": "opendwm_tpu.schedulers",
    "torch.optim.lr_scheduler": "opendwm_tpu.pipelines.optim",
    # ctsd.py registers CrossviewTemporalSD; the streaming subclass lives in
    # its own module but shares the reference's dwm.pipelines.ctsd path.
    "dwm.pipelines.ctsd": (
        "opendwm_tpu.pipelines.ctsd",
        "opendwm_tpu.pipelines.ctsd_streaming",
    ),
    "dwm.pipelines.unimlvg": "opendwm_tpu.pipelines.unimlvg",
    "dwm.pipelines.lidar_vqvae": "opendwm_tpu.pipelines.lidar_vqvae",
    "dwm.pipelines.lidar_vae": "opendwm_tpu.pipelines.lidar_vae",
    "dwm.pipelines.lidar_maskgit": "opendwm_tpu.pipelines.lidar_maskgit",
    "dwm.pipelines.lidar_diffusion": "opendwm_tpu.pipelines.lidar_diffusion",
    "dwm.metrics": "opendwm_tpu.metrics",
    "dwm.datasets.common": "opendwm_tpu.datasets.common",
    "dwm.datasets.nuscenes": "opendwm_tpu.datasets.nuscenes",
    "dwm.datasets.waymo": "opendwm_tpu.datasets.waymo",
    "dwm.datasets.argoverse": "opendwm_tpu.datasets.argoverse",
    "dwm.datasets.kitti360": "opendwm_tpu.datasets.kitti360",
    "dwm.datasets.opendv": "opendwm_tpu.datasets.opendv",
    "dwm.datasets.preview": "opendwm_tpu.datasets.preview",
    "dwm.utils.sampler": "opendwm_tpu.utils.sampler",
    "dwm.fs": "opendwm_tpu.fs",
}


def _lazy_import_for(class_name: str) -> bool:
    """Import the opendwm_tpu module registering ``class_name``, if mapped."""
    parts = class_name.split(".")
    for depth in range(len(parts), 0, -1):
        prefix = ".".join(parts[:depth])
        target = _LAZY_MODULES.get(prefix)
        if target is not None:
            targets = (target,) if isinstance(target, str) else target
            try:
                for mod in targets:
                    importlib.import_module(mod)
                return True
            except ImportError:
                return False
    return False


# Modules whose import registers the framework's own canonical names; pulled
# in once when a bare (dot-free) name misses the registry.
_CORE_MODULES = (
    "opendwm_tpu.schedulers",
    "opendwm_tpu.models.mmdit",
    "opendwm_tpu.models.unet",
    "opendwm_tpu.models.adapters",
    "opendwm_tpu.models.autoencoders",
    "opendwm_tpu.models.text_encoders",
    "opendwm_tpu.models.vq_point_cloud",
    "opendwm_tpu.models.vae_point_cloud",
    "opendwm_tpu.models.maskgit",
    "opendwm_tpu.models.depth_net",
    "opendwm_tpu.pipelines.ctsd",
    "opendwm_tpu.pipelines.ctsd_streaming",
    "opendwm_tpu.pipelines.unimlvg",
    "opendwm_tpu.pipelines.lidar_vqvae",
    "opendwm_tpu.pipelines.lidar_vae",
    "opendwm_tpu.pipelines.lidar_maskgit",
    "opendwm_tpu.pipelines.lidar_diffusion",
    "opendwm_tpu.datasets.common",
    "opendwm_tpu.datasets.synthetic",
    "opendwm_tpu.datasets.nuscenes",
    "opendwm_tpu.fs.dirfs",
    "opendwm_tpu.fs.czip",
    "opendwm_tpu.fs.ctar",
    "opendwm_tpu.fs.s3fs",
    "opendwm_tpu.metrics",
    "opendwm_tpu.utils.sampler",
    "opendwm_tpu.parallel",
    "opendwm_tpu.ops.voxelize",
)
_core_loaded = False


def _load_core_modules():
    global _core_loaded
    if not _core_loaded:
        _core_loaded = True
        for m in _CORE_MODULES:
            try:
                importlib.import_module(m)
            except ImportError:
                pass


def get_class(class_name: str):
    """Resolve a class path to a callable (registry first, then imports)."""
    if class_name in _REGISTRY:
        return _REGISTRY[class_name]
    if class_name in _ALIASES:
        return get_class(_ALIASES[class_name])
    if "." not in class_name:
        _load_core_modules()
        if class_name in _REGISTRY:
            return _REGISTRY[class_name]
    if _lazy_import_for(class_name) and (
        class_name in _REGISTRY or class_name in _ALIASES
    ):
        return get_class(_ALIASES.get(class_name, class_name))
    if class_name.startswith("dwm."):
        # Reference path with no registered TPU equivalent yet.
        raise KeyError(
            f"Reference class {class_name!r} has no registered TPU-native "
            "equivalent. Add one with opendwm_tpu.config.register()."
        )
    if "." in class_name:
        if not class_name.startswith(_ALLOWED_IMPORT_PREFIXES):
            raise KeyError(
                f"{class_name!r} is not registered and import reflection is "
                f"only allowed for {_ALLOWED_IMPORT_PREFIXES}."
            )
        module_name, _, attr = class_name.rpartition(".")
        module = importlib.import_module(module_name)
        return getattr(module, attr)
    raise KeyError(f"Failed to find class {class_name!r}.")


def create_instance(class_name: str, **kwargs):
    return get_class(class_name)(**kwargs)


def create_instance_from_config(_config: Any, level: int = 0, **kwargs):
    """Recursively reflect a JSON config node into live objects.

    Mirrors the semantics of reference src/dwm/common.py:154-172 exactly:
    a dict with ``_class_name`` instantiates (the special form ``get_class``
    returns the class itself); other dicts/lists recurse; scalars pass through.
    Extra ``kwargs`` are injected into the *top-level* instantiation only.
    """
    if isinstance(_config, dict):
        if "_class_name" in _config:
            args = instantiate_config(_config, level)
            if level == 0:
                args.update(kwargs)
            if _config["_class_name"] == "get_class":
                return get_class(**args)
            return create_instance(_config["_class_name"], **args)
        return instantiate_config(_config, level)
    if isinstance(_config, list):
        return [create_instance_from_config(i, level + 1) for i in _config]
    return _config


def instantiate_config(_config: dict, level: int = 0) -> dict:
    return {
        k: create_instance_from_config(v, level + 1)
        for k, v in _config.items()
        if k != "_class_name"
    }


def load_config(path: str) -> dict:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# Global state (shared instances across config nodes)
# ---------------------------------------------------------------------------

global_state: dict[str, Any] = {}


@register("get_state", aliases=("dwm.common.get_state",))
def get_state(key: str):
    return global_state[key]


# Convenience registrations so configs can name dtypes the JAX way.
def _register_builtins():
    import jax.numpy as jnp

    for n in ("bfloat16", "float32", "float16", "int32", "int8"):
        _REGISTRY[f"jnp.{n}"] = getattr(jnp, n)
        _ALIASES[f"torch.{n}"] = f"jnp.{n}"
    _ALIASES["torch.float"] = "jnp.float32"
    _ALIASES["torch.half"] = "jnp.float16"


_register_builtins()
