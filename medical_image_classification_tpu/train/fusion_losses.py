"""Image-fusion losses: SSIM, MS-SSIM, Sobel gradient, and the composite
Fusionloss, all in pure jnp (fuse into the train step under jit).

Rebuild of `/root/reference/CrossMamba/FusionMamba/loss.py`:
  Fusionloss = 10 * msssim_term + 10 * MSE(max(Y, ir), gen)
             + 1 * L1(max(SobelY, SobelIR) - SobelGen)
with the same Gaussian-window SSIM (VALID padding, no window padding), the
same 5-level MS-SSIM weights, and the same `normalize=True` (+1)/2 guard.
All images NHWC, single channel, values in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _gaussian_1d(window_size: int = 11, sigma: float = 1.5):
    x = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _filter2d(img, win1d):
    """Depthwise VALID Gaussian blur of NHWC img.

    The outer-product window is SEPARABLE: two 1-D convs (2w taps) instead
    of one w x w conv (w^2 taps) — the reference's torch F.conv2d pays the
    dense window (`loss.py:38-44`); mathematically identical here, and the
    2-D 11x11 depthwise conv was ~15 ms/step of the fusion train step on
    v5e (6 filters x 5 MS-SSIM levels x fwd+bwd, measured r2 trace).
    """
    c = img.shape[-1]
    kh = jnp.tile(win1d[:, None, None, None], (1, 1, 1, c))   # [w, 1, 1, c]
    kv = jnp.tile(win1d[None, :, None, None], (1, 1, 1, c))   # [1, w, 1, c]
    out = lax.conv_general_dilated(
        img, kh, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return lax.conv_general_dilated(
        out, kv, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def ssim(img1, img2, window_size: int = 11, val_range: float = None,
         full: bool = False):
    """Gaussian-window SSIM, VALID padding (reference `loss.py:31-83`)."""
    if val_range is None:
        L = 1.0
    else:
        L = val_range
    h, w = img1.shape[1], img1.shape[2]
    ws = min(window_size, h, w)
    window = _gaussian_1d(ws)
    mu1 = _filter2d(img1, window)
    mu2 = _filter2d(img2, window)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = _filter2d(img1 * img1, window) - mu1_sq
    s2 = _filter2d(img2 * img2, window) - mu2_sq
    s12 = _filter2d(img1 * img2, window) - mu12
    C1 = (0.01 * L) ** 2
    C2 = (0.03 * L) ** 2
    v1 = 2.0 * s12 + C2
    v2 = s1 + s2 + C2
    cs = jnp.mean(v1 / v2)
    ssim_map = ((2 * mu12 + C1) * v1) / ((mu1_sq + mu2_sq + C1) * v2)
    ret = jnp.mean(ssim_map)
    if full:
        return ret, cs
    return ret


def msssim(img1, img2, window_size: int = 11, normalize: bool = True):
    """5-level MS-SSIM with the reference weights (`loss.py:84-110`)."""
    weights = jnp.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
    mssim, mcs = [], []
    for _ in range(5):
        sim, cs = ssim(img1, img2, window_size, full=True)
        mssim.append(sim)
        mcs.append(cs)
        img1 = lax.reduce_window(img1, 0.0, lax.add, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID") / 4.0
        img2 = lax.reduce_window(img2, 0.0, lax.add, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID") / 4.0
    mssim = jnp.stack(mssim)
    mcs = jnp.stack(mcs)
    if normalize:
        mssim = (mssim + 1) / 2
        mcs = (mcs + 1) / 2
    pow1 = mcs ** weights
    pow2 = mssim ** weights
    # NB: the reference computes prod(pow1[:-1] * pow2[-1]) — the broadcast
    # multiplies the last-level SSIM into all four cs terms, i.e. raises it
    # to the 4th power vs. the standard prod(pow1[:-1]) * pow2[-1]
    # (`loss.py:109`).  Replicated for loss parity.
    return jnp.prod(pow1[:-1] * pow2[-1])


def sobel_grad(img):
    """|sobel_x| + |sobel_y| on NHWC single-channel (`loss.py:143-159`)."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = jnp.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32)

    def conv(k):
        kk = k[:, :, None, None]
        return lax.conv_general_dilated(
            img, kk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    return jnp.abs(conv(kx)) + jnp.abs(conv(ky))


def rgb_to_y(x):
    """ITU-R BT.601 luma from NHWC RGB (`loss.py:168-170`)."""
    return (0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3])


def fusion_loss(image_vis, image_ir, generate_img, w_ssim: float = 10.0,
                w_in: float = 10.0, w_grad: float = 1.0):
    """Composite fusion loss (`loss.py:172-205`). NHWC inputs in [0,1].

    Returns (total, loss_in, ssim_term, loss_grad).
    """
    image_y = image_vis[..., :1]
    if image_ir.shape[-1] != 1:
        image_ir = image_ir[..., :1]
    if generate_img.shape[-1] == 3:
        gen_y = rgb_to_y(generate_img)
    else:
        gen_y = generate_img
    image_y = jnp.clip(image_y, 0, 1)
    image_ir = jnp.clip(image_ir, 0, 1)
    gen_y = jnp.clip(gen_y, 0, 1)

    x_in_max = jnp.maximum(image_y, image_ir)
    ssim_term = (0.5 * (1 - msssim(gen_y, image_y, normalize=True)) +
                 0.5 * (1 - msssim(gen_y, image_ir, normalize=True)))
    loss_in = jnp.mean((x_in_max - gen_y) ** 2)
    y_g = sobel_grad(image_y)
    ir_g = sobel_grad(image_ir)
    gen_g = sobel_grad(gen_y)
    loss_grad = jnp.mean(jnp.abs(jnp.maximum(y_g, ir_g) - gen_g))
    total = w_ssim * ssim_term + w_in * loss_in + w_grad * loss_grad
    return total, loss_in, ssim_term, loss_grad


# --- segmentation losses from the reference utils (`utils.py:259-370`) -----

def bce_loss(logits, targets):
    logp = jax.nn.log_sigmoid(logits)
    lognp = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(targets * logp + (1 - targets) * lognp)


def dice_loss(logits, targets, smooth: float = 1.0):
    probs = jax.nn.sigmoid(logits)
    inter = jnp.sum(probs * targets)
    return 1 - (2 * inter + smooth) / (jnp.sum(probs) + jnp.sum(targets)
                                       + smooth)


def ce_dice_loss(logits, targets, w_bce: float = 0.5, w_dice: float = 0.5):
    return w_bce * bce_loss(logits, targets) + w_dice * dice_loss(logits, targets)
