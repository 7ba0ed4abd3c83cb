"""CT/MRI fusion-pair dataset + RGB/YCrCb color tools.

Rebuilds `/root/reference/CrossMamba/FusionMamba/TaskFusion_dataset.py:20-102`
(recursive pair collection, grayscale read, bicubic 256², [0,1], repeat to
3ch) and the color-space scripts `RGB2Y.py` / `YtoRGB.py` /
`changesizeandY2RGB` (fused-Y + original-CbCr recombination).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from medical_image_classification_tpu.data.image_folder import IMG_EXTENSIONS


def _collect(root: str) -> List[str]:
    out = []
    for dirpath, _, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.lower().endswith(IMG_EXTENSIONS):
                out.append(os.path.join(dirpath, f))
    return out


@dataclass
class FusionPairs:
    """Paired modality dataset: root/{dir_a}/x.png <-> root/{dir_b}/x.png."""
    a_paths: List[str]
    b_paths: List[str]

    def __len__(self):
        return len(self.a_paths)


def scan_fusion_pairs(root: str, dir_a: str = "CT", dir_b: str = "MRI",
                      length: Optional[int] = None) -> FusionPairs:
    a = _collect(os.path.join(root, dir_a))
    b = _collect(os.path.join(root, dir_b))
    if not a or not b:
        raise FileNotFoundError(f"no pairs under {root}/{dir_a}|{dir_b}")
    n = min(len(a), len(b))
    if length is not None:
        n = min(n, length)            # pair-count truncation (`:63-70`)
    return FusionPairs(a[:n], b[:n])


def load_fusion_image(path: str, size: int = 256,
                      channels: int = 1) -> np.ndarray:
    """Grayscale read, bicubic resize, [0,1] float, HWC (`:75-102`)."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_CUBIC)
    img = img.astype(np.float32) / 255.0
    img = img[..., None]
    if channels == 3:
        img = np.repeat(img, 3, axis=-1)
    return img


class FusionLoader:
    def __init__(self, pairs: FusionPairs, batch_size: int, size: int = 256,
                 channels: int = 3, shuffle: bool = True, seed: int = 0):
        self.pairs, self.batch_size = pairs, batch_size
        self.size, self.channels = size, channels
        self.shuffle, self.seed = shuffle, seed

    def steps_per_epoch(self):
        return len(self.pairs) // self.batch_size

    def epoch(self, epoch: int = 0) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = np.arange(len(self.pairs))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(idx)
        for b in range(self.steps_per_epoch()):
            sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
            xa = np.stack([load_fusion_image(self.pairs.a_paths[i], self.size,
                                             self.channels) for i in sel])
            xb = np.stack([load_fusion_image(self.pairs.b_paths[i], self.size,
                                             self.channels) for i in sel])
            yield xa, xb


# --- color-space tools (T12) ------------------------------------------------

def rgb_to_ycrcb(rgb: np.ndarray):
    """float [0,1] HWC RGB -> (Y, Cr, Cb) each [0,1] (`RGB2Y.py:10-33`)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cr = (r - y) * 0.713 + 0.5
    cb = (b - y) * 0.564 + 0.5
    return y, cr, cb


def ycrcb_to_rgb(y: np.ndarray, cr: np.ndarray, cb: np.ndarray):
    """Inverse transform (`YtoRGB.py`)."""
    r = y + 1.403 * (cr - 0.5)
    g = y - 0.714 * (cr - 0.5) - 0.344 * (cb - 0.5)
    b = y + 1.773 * (cb - 0.5)
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 1.0)


def recombine_fused_y(fused_y: np.ndarray, original_rgb: np.ndarray,
                      size: Optional[int] = None) -> np.ndarray:
    """Replace the Y channel of an RGB image with a fused Y
    (`changesizeandY2RGB` pipeline): resize fused_y to the original, keep
    the original CrCb."""
    import cv2
    h, w = original_rgb.shape[:2]
    fy = cv2.resize(fused_y, (w, h), interpolation=cv2.INTER_CUBIC)
    _, cr, cb = rgb_to_ycrcb(original_rgb)
    return ycrcb_to_rgb(fy, cr, cb)
