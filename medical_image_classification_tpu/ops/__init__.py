from medical_image_classification_tpu.ops.cross_scan import (
    cross_scan,
    cross_merge,
    cross_merge_stack,
    cross_scan_time_major,
    cross_merge_time_major,
    cross_merge_stack_time_major,
    efficient_scan,
    efficient_merge,
)
from medical_image_classification_tpu.ops.ss2d import (
    ss2d_core_mamba1,
    ss2d_core_ssd,
    rmsnorm_gated,
)

__all__ = [
    "cross_scan", "cross_merge", "cross_merge_stack",
    "cross_scan_time_major", "cross_merge_time_major",
    "cross_merge_stack_time_major",
    "efficient_scan", "efficient_merge",
    "ss2d_core_mamba1", "ss2d_core_ssd", "rmsnorm_gated",
]
