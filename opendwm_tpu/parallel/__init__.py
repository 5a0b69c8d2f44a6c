from opendwm_tpu.parallel.mesh import MeshSpec, make_mesh  # noqa: F401
from opendwm_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_shardings,
    replicated,
    shard_batch,
    shard_params,
)
