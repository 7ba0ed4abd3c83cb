#!/usr/bin/env python
"""A/B the depthwise 3x3 conv lowering: XLA grouped convolution vs an
explicit 9-shift multiply-add formulation.

Every SS2D/SS2DSSD block carries a depthwise d_conv x d_conv conv
(`MedMamba.py:320-328`, `CNN_Mamba.py:448-455`).  XLA lowers
feature_group_count=C convs through the convolution emitter; a depthwise
3x3 is really 9 shifted elementwise FMAs (VPU) whose weight-grad is 9
per-channel reductions — this benchmark measures whether hand-rolling that
beats the emitter at the model's shapes (fwd + bwd, bf16 and fp32).

Usage: python scripts/dwconv_bench.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_classification_tpu.utils.timing import chained_device_time


def dw_xla(x, k, b):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def dw_shift(x, k, b):
    # k: [3, 3, 1, C]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    out = b
    for dy in range(3):
        for dx in range(3):
            out = out + xp[:, dy:dy + H, dx:dx + W, :] * k[dy, dx, 0]
    return out


def main():
    rng = np.random.RandomState(0)
    for (B, H, W, C), dt in [((8, 56, 56, 400), jnp.bfloat16),
                             ((32, 56, 56, 192), jnp.bfloat16),
                             ((32, 28, 28, 384), jnp.bfloat16),
                             ((2, 64, 64, 416), jnp.float32)]:
        x = jnp.asarray(rng.randn(B, H, W, C), dt)
        k = jnp.asarray(rng.randn(3, 3, 1, C) * 0.1, dt)
        b = jnp.asarray(rng.randn(C) * 0.1, dt)

        for name, fn in [("xla  ", dw_xla), ("shift", dw_shift)]:
            def fwdbwd(carry, fn=fn):
                xx, kk, bb = carry
                def loss(xx, kk, bb):
                    return jnp.sum(jnp.square(fn(xx, kk, bb))).astype(jnp.float32)
                g = jax.grad(loss, argnums=(0, 1, 2))(xx, kk, bb)
                return (xx + 0 * g[0], kk + 0 * g[1], bb + 0 * g[2])

            t = chained_device_time(fwdbwd, (x, k, b), iters=30)
            print(f"{B}x{H}x{W}x{C} {np.dtype(dt).name:8s} {name}: "
                  f"{t * 1e3:7.3f} ms fwd+bwd")
        # parity
        ya = dw_xla(x.astype(jnp.float32), k.astype(jnp.float32),
                    b.astype(jnp.float32))
        yb = dw_shift(x.astype(jnp.float32), k.astype(jnp.float32),
                      b.astype(jnp.float32))
        err = float(jnp.max(jnp.abs(ya - yb)))
        print(f"  parity max abs err: {err:.2e}")


if __name__ == "__main__":
    main()
