from opendwm_tpu.schedulers.ddpm import DDPMScheduler  # noqa: F401
from opendwm_tpu.schedulers.ddim import DDIMScheduler  # noqa: F401
from opendwm_tpu.schedulers.flow_match import (  # noqa: F401
    FlowMatchEulerScheduler,
)
