from medical_image_classification_tpu.evaluate.metrics import (
    classification_metrics,
    confusion_matrix,
    roc_auc_ovr,
    count_parameters,
    metrics_to_csv,
)
from medical_image_classification_tpu.evaluate.gradcam import (
    grad_cam,
    overlay_heatmap,
)
