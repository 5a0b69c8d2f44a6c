from opendwm_tpu.metrics.frechet import (  # noqa: F401
    FrechetDistance,
    frechet_distance,
)
from opendwm_tpu.metrics.pc_metrics import (  # noqa: F401
    PointCloudChamfer,
    PointCloudJSD,
    PointCloudMMD,
    chamfer_distance,
    point_cloud_to_histogram,
)
from opendwm_tpu.metrics.voxel_metrics import VoxelDiff, VoxelIoU  # noqa: F401
from opendwm_tpu.metrics.general import CustomMeanMetric  # noqa: F401
