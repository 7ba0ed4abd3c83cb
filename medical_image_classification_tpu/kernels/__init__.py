from medical_image_classification_tpu.kernels.selective_scan import (
    selective_scan,
    selective_scan_seq,
    selective_scan_xla,
    selective_state_update,
)
from medical_image_classification_tpu.kernels.ssd import ssd_chunked, ssd_seq_ref
from medical_image_classification_tpu.kernels.stl_mixer_pallas import (
    stl_mixer,
    stl_mixer_supported,
)
from medical_image_classification_tpu.kernels.stf_zgate_pallas import (
    stf_zgate,
    stf_zgate_supported,
)

__all__ = [
    "selective_scan",
    "selective_scan_seq",
    "selective_scan_xla",
    "selective_state_update",
    "ssd_chunked",
    "ssd_seq_ref",
    "stl_mixer",
    "stl_mixer_supported",
    "stf_zgate",
    "stf_zgate_supported",
]
