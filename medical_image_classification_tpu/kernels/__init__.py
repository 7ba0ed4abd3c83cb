from medical_image_classification_tpu.kernels.selective_scan import (
    selective_scan,
    selective_scan_seq,
    selective_scan_xla,
    selective_state_update,
)
from medical_image_classification_tpu.kernels.ssd import ssd_chunked, ssd_seq_ref

__all__ = [
    "selective_scan",
    "selective_scan_seq",
    "selective_scan_xla",
    "selective_state_update",
    "ssd_chunked",
    "ssd_seq_ref",
]
