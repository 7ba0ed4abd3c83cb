"""ImageFolder-equivalent dataset: deterministic class scan + fast decode.

TPU-native replacement for the reference's torchvision pipeline
(`/root/reference/train.py:18-38`): same directory contract
(root/class_x/img.jpg), same class→index mapping rule (sorted class names),
same `class_indices.json` emission.  Decoding uses OpenCV (libjpeg-turbo)
on host threads; geometric augmentation happens at decode time per-image,
normalization happens on-device inside the jitted step (it fuses for free).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp")


@dataclass
class ImageFolder:
    root: str
    samples: List[Tuple[str, int]]
    classes: List[str]

    @property
    def class_to_idx(self):
        return {c: i for i, c in enumerate(self.classes)}

    def __len__(self):
        return len(self.samples)


def scan_image_folder(root: str) -> ImageFolder:
    """Deterministic scan: classes sorted by name (torchvision contract)."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    if not classes:
        raise FileNotFoundError(f"no class directories under {root}")
    samples: List[Tuple[str, int]] = []
    for idx, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for dirpath, _, files in sorted(os.walk(cdir)):
            for f in sorted(files):
                if f.lower().endswith(IMG_EXTENSIONS):
                    samples.append((os.path.join(dirpath, f), idx))
    if not samples:
        raise FileNotFoundError(f"no images under {root}")
    return ImageFolder(root=root, samples=samples, classes=classes)


def dump_class_indices(ds: ImageFolder, path: str = "class_indices.json"):
    """Reference emits {index: class_name} (`train.py:33-38`)."""
    mapping = {str(i): c for i, c in enumerate(ds.classes)}
    with open(path, "w") as f:
        json.dump(mapping, f, indent=4)
    return mapping


def _decode(path: str, grayscale_to_rgb: bool = True) -> np.ndarray:
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)  # BGR, 3ch (gray replicated)
    if img is None:  # fall back to PIL for exotic formats
        from PIL import Image
        img = np.asarray(Image.open(path).convert("RGB"))[:, :, ::-1]
    return img[:, :, ::-1]  # -> RGB


def load_train_image(path: str, size: int, rng: np.random.Generator,
                     scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)) -> np.ndarray:
    """Grayscale→3ch + RandomResizedCrop(size) + HFlip (`train.py:19-23`).

    Crop params follow torchvision's RandomResizedCrop sampling; resize is
    bilinear.  Returns uint8 HWC RGB.
    """
    import cv2
    img = _decode(path)
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = area * rng.uniform(*scale)
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        ar = np.exp(log_r)
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            i = rng.integers(0, h - ch + 1)
            j = rng.integers(0, w - cw + 1)
            crop = img[i:i + ch, j:j + cw]
            break
    else:  # fallback: center crop
        s = min(h, w)
        i, j = (h - s) // 2, (w - s) // 2
        crop = img[i:i + s, j:j + s]
    out = cv2.resize(crop, (size, size), interpolation=cv2.INTER_LINEAR)
    if rng.random() < 0.5:
        out = out[:, ::-1]
    return np.ascontiguousarray(out)


def load_eval_image(path: str, size: int) -> np.ndarray:
    """Resize(size, size) eval path (`train.py:24-27`). Returns uint8 HWC."""
    import cv2
    img = _decode(path)
    return cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)


def normalize_batch(x, mean: float = 0.5, std: float = 0.5):
    """uint8 [B,H,W,3] -> float, Normalize(0.5, 0.5) (`train.py:22`).
    Runs on device inside jit (fuses into the first conv)."""
    import jax.numpy as jnp
    return (x.astype(jnp.float32) / 255.0 - mean) / std
