"""Grad-CAM via jax gradients on stage-activation perturbations.

TPU rebuild of `/root/reference/cam.py:9-181`: instead of forward/backward
hooks, the VSSM stages expose zero-valued `perturb` variables whose
gradients equal the gradients of the loss w.r.t. the stage activations.
CAM_l = minmax(ReLU(GAP_spatial(dL/dA_l) · A_l)), resized to the input and
averaged over the targeted stages — the same weighting the reference
computes (`cam.py:86-133`).

Note: the reference driver calls cam under ``torch.no_grad()``
(`cam.py:282-283`), which silently zeroes the hooks — a known bug we fix
rather than copy (SURVEY §7 hard-parts).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_classification_tpu.data.image_folder import normalize_batch


def grad_cam(model, variables, images_u8, targets=None,
             stages: Optional[Sequence[str]] = None,
             image_size: Optional[int] = None) -> np.ndarray:
    """Compute Grad-CAM heatmaps.

    images_u8: [B, H, W, 3] uint8.  targets: [B] int labels or None
    (argmax).  Returns float32 [B, H, W] heatmaps in [0, 1].
    """
    imgs = normalize_batch(jnp.asarray(images_u8))
    B, H, W, _ = imgs.shape

    # 1. forward with intermediates to get activation shapes/values
    logits, inter = model.apply(variables, imgs, train=False,
                                mutable=["intermediates"])
    if targets is None:
        targets = jnp.argmax(logits, axis=-1)
    acts = {name: v["stage_out"][0]
            for name, v in inter["intermediates"].items()}
    if stages is None:
        stages = sorted(acts)

    # 2. zero perturbations matching each targeted stage; grad w.r.t. them
    perturbs = {name: {"stage_perturb": jnp.zeros_like(acts[name])}
                for name in stages}

    def score(p):
        out = model.apply({**variables, "perturbations": p}, imgs, train=False)
        # sum of target-class logits (`cam.py:80-84`)
        return jnp.sum(out[jnp.arange(B), targets])

    grads = jax.grad(score)(perturbs)

    # 3. per-stage CAM: weights = spatial-GAP(grad); cam = ReLU(sum_c w*A)
    cams = []
    for name in stages:
        a = acts[name]                                  # [B, h, w, c]
        g = grads[name]["stage_perturb"]
        wgt = jnp.mean(g, axis=(1, 2), keepdims=True)   # [B, 1, 1, c]
        cam = jax.nn.relu(jnp.sum(wgt * a, axis=-1))    # [B, h, w]
        cam = jax.image.resize(cam, (B, H, W), method="bilinear")
        # per-image min-max scale (`cam.py:107-114`)
        mn = cam.min(axis=(1, 2), keepdims=True)
        mx = cam.max(axis=(1, 2), keepdims=True)
        cams.append((cam - mn) / jnp.maximum(mx - mn, 1e-7))
    out = jnp.mean(jnp.stack(cams), axis=0)
    # final min-max over the aggregate (`cam.py:116-133`)
    mn = out.min(axis=(1, 2), keepdims=True)
    mx = out.max(axis=(1, 2), keepdims=True)
    return np.asarray((out - mn) / jnp.maximum(mx - mn, 1e-7))


def overlay_heatmap(image_u8: np.ndarray, cam: np.ndarray,
                    alpha: float = 0.4) -> np.ndarray:
    """Blend a [H,W] cam onto an RGB uint8 image (reference `cam.py:184-209`)."""
    import cv2
    heat = cv2.applyColorMap((cam * 255).astype(np.uint8), cv2.COLORMAP_JET)
    heat = heat[:, :, ::-1]                              # BGR -> RGB
    out = (1 - alpha) * image_u8.astype(np.float32) + alpha * heat
    return np.clip(out, 0, 255).astype(np.uint8)
