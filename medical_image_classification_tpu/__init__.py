"""TPU-native medical-image-classification framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
leaf-down/Medical_image_classification (PyTorch/CUDA): Mamba/VSSM vision
state-space classifiers (MedMamba, MedSSD/CNN-Mamba, ST-SSD), KAN heads,
CrossMamba dual-branch fusion, training/eval/Grad-CAM tooling, and
mesh-parallel (DP/TP/SP) execution.
"""

__version__ = "0.1.0"
