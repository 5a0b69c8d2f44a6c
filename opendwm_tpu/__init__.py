"""opendwm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for autonomous
driving world models, with the capabilities of SenseTime-FVG/OpenDWM.

Layer map (mirrors the capability surface documented in SURVEY.md):

- :mod:`opendwm_tpu.config`      — JSON config → object-graph runtime (registry based).
- :mod:`opendwm_tpu.parallel`    — device mesh + declarative sharding (DDP/FSDP/HSDP/TP).
- :mod:`opendwm_tpu.ops`         — Pallas/XLA kernels: attention, voxelize, ray render.
- :mod:`opendwm_tpu.models`      — denoisers (crossview-temporal UNet & MMDiT), VAEs,
                                   LiDAR tokenizers, MaskGIT, adapters.
- :mod:`opendwm_tpu.schedulers`  — diffusion schedulers with per-(b,t,v) timesteps.
- :mod:`opendwm_tpu.pipelines`   — train/eval/preview pipelines (CTSD, LiDAR families).
- :mod:`opendwm_tpu.datasets`    — host-side sharded data plane (nuScenes, ...).
- :mod:`opendwm_tpu.metrics`     — FID/FVD/Chamfer/IoU with mesh-reduced states.
"""

__version__ = "0.1.0"
