from medical_image_classification_tpu.models.vssm import VSSM, VSSLayer, SSConvBlock
from medical_image_classification_tpu.models.registry import (
    available_models,
    create_model,
)

__all__ = ["VSSM", "VSSLayer", "SSConvBlock", "available_models", "create_model"]
