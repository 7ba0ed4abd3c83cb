from medical_image_classification_tpu.data.image_folder import (
    scan_image_folder,
    dump_class_indices,
    normalize_batch,
)
from medical_image_classification_tpu.data.loader import (
    BatchLoader,
    SyntheticLoader,
)
from medical_image_classification_tpu.data.fusion_dataset import (
    scan_fusion_pairs,
    FusionLoader,
    rgb_to_ycrcb,
    ycrcb_to_rgb,
    recombine_fused_y,
)
