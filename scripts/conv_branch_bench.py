#!/usr/bin/env python
"""A/B conv-branch lowering variants at MedMamba stage shapes.

The r4-end trace puts 10.7 ms/step of medmamba b32 in the convolution
bucket, with the stage-0/1 ConvBranch chains (48/96 channels) running at
37.5%/75% MXU lane utilization: an NHWC conv keeps Cout on the lane dim,
and Cout=48 fills 48/128 lanes (`models/common.py::ConvBranch`,
`/root/reference/MedMamba.py:517-528`).

Variants timed here (fwd + bwd, chained on-device):
  nhwc    — the current nn.Conv NHWC chain (baseline)
  nchw    — same convs via lax with NCHW dimension numbers (XLA may pick a
            channels-major lowering that puts SPATIAL on the lanes)
  cmajor  — explicit channel-major im2col chain: x held [C, B*H*W]; each
            conv is dot_general([Cout, 9C] @ [9C, BHW]) so the lane dim is
            spatial (full 128) and Cout sits on sublanes (48 = 6 groups of
            8, no pad); BN/ReLU stay elementwise in the same layout; one
            transpose in / one out per chain.
Run:  python scripts/conv_branch_bench.py [--stage 0] [--batch 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

STAGES = {0: (56, 48), 1: (28, 96), 2: (14, 192), 3: (7, 384)}


def make_params(c, key, dtype):
    ks = jax.random.split(key, 8)
    p = {
        "w1": jax.random.normal(ks[0], (3, 3, c, c), dtype) * 0.05,
        "w2": jax.random.normal(ks[1], (3, 3, c, c), dtype) * 0.05,
        "w3": jax.random.normal(ks[2], (1, 1, c, c), dtype) * 0.05,
        "b1": jnp.zeros((c,), dtype), "b2": jnp.zeros((c,), dtype),
        "b3": jnp.zeros((c,), dtype),
    }
    for i in range(4):
        p[f"g{i}"] = jnp.ones((c,), dtype)
        p[f"be{i}"] = jnp.zeros((c,), dtype)
    return p


def bn_train(x, g, b, axes):
    mu = jnp.mean(x.astype(jnp.float32), axes, keepdims=True)
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axes,
                   keepdims=True) - jnp.square(mu)
    inv = lax.rsqrt(var + 1e-5)
    shape = [1] * x.ndim
    # g/b broadcast along the channel axis (the one NOT in `axes`)
    ch_axis = [a for a in range(x.ndim) if a not in axes][0]
    shape[ch_axis] = x.shape[ch_axis]
    y = (x.astype(jnp.float32) - mu) * inv
    return (y * g.astype(jnp.float32).reshape(shape)
            + b.astype(jnp.float32).reshape(shape)).astype(x.dtype)


def chain_nhwc(p, x):
    dn = lax.conv_dimension_numbers(x.shape, p["w1"].shape,
                                    ("NHWC", "HWIO", "NHWC"))
    x = bn_train(x, p["g0"], p["be0"], (0, 1, 2))
    x = lax.conv_general_dilated(x, p["w1"], (1, 1), "SAME",
                                 dimension_numbers=dn) + p["b1"]
    x = jax.nn.relu(bn_train(x, p["g1"], p["be1"], (0, 1, 2)))
    x = lax.conv_general_dilated(x, p["w2"], (1, 1), "SAME",
                                 dimension_numbers=dn) + p["b2"]
    x = jax.nn.relu(bn_train(x, p["g2"], p["be2"], (0, 1, 2)))
    dn1 = lax.conv_dimension_numbers(x.shape, p["w3"].shape,
                                     ("NHWC", "HWIO", "NHWC"))
    x = lax.conv_general_dilated(x, p["w3"], (1, 1), "SAME",
                                 dimension_numbers=dn1) + p["b3"]
    return jax.nn.relu(x)


def chain_nchw(p, x):
    x = jnp.transpose(x, (0, 3, 1, 2))
    def conv(x, w, b):
        wt = jnp.transpose(w, (3, 2, 0, 1))              # HWIO -> OIHW
        dn = lax.conv_dimension_numbers(x.shape, wt.shape,
                                        ("NCHW", "OIHW", "NCHW"))
        return (lax.conv_general_dilated(x, wt, (1, 1), "SAME",
                                         dimension_numbers=dn)
                + b[None, :, None, None])
    x = bn_train(x, p["g0"], p["be0"], (0, 2, 3))
    x = conv(x, p["w1"], p["b1"])
    x = jax.nn.relu(bn_train(x, p["g1"], p["be1"], (0, 2, 3)))
    x = conv(x, p["w2"], p["b2"])
    x = jax.nn.relu(bn_train(x, p["g2"], p["be2"], (0, 2, 3)))
    x = conv(x, p["w3"], p["b3"])
    return jnp.transpose(jax.nn.relu(x), (0, 2, 3, 1))


def chain_cmajor(p, x):
    """x [B,H,W,C] -> held as [C, B, H, W]; convs as [Cout, 9C]@[9C, BHW]."""
    B, H, W, C = x.shape
    xc = jnp.transpose(x, (3, 0, 1, 2))                 # [C, B, H, W]

    def conv3(xc, w, b):
        # pad spatial, then 9 shifted views stacked on a new major axis
        xp = jnp.pad(xc, ((0, 0), (0, 0), (1, 1), (1, 1)))
        pats = [xp[:, :, i:i + H, j:j + W]
                for i in range(3) for j in range(3)]    # 9 x [C,B,H,W]
        pat = jnp.stack(pats, axis=0).reshape(9 * C, B * H * W)
        wf = jnp.transpose(w, (0, 1, 2, 3)).reshape(9 * C, C)  # [(ki kj ci), co]
        y = lax.dot_general(wf.T, pat, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        return (y.astype(xc.dtype) + b[:, None]).reshape(C, B, H, W)

    def conv1(xc, w, b):
        wf = w.reshape(C, C)                             # [ci, co]
        y = lax.dot_general(wf.T, xc.reshape(C, B * H * W),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        return (y.astype(xc.dtype) + b[:, None]).reshape(C, B, H, W)

    xc = bn_train(xc, p["g0"], p["be0"], (1, 2, 3))
    xc = conv3(xc, p["w1"], p["b1"])
    xc = jax.nn.relu(bn_train(xc, p["g1"], p["be1"], (1, 2, 3)))
    xc = conv3(xc, p["w2"], p["b2"])
    xc = jax.nn.relu(bn_train(xc, p["g2"], p["be2"], (1, 2, 3)))
    xc = conv1(xc, p["w3"], p["b3"])
    return jnp.transpose(jax.nn.relu(xc), (1, 2, 3, 0))


CHAINS = {"nhwc": chain_nhwc, "nchw": chain_nchw, "cmajor": chain_cmajor}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--variants", default="nhwc,cmajor,nchw")
    args = ap.parse_args()

    from medical_image_classification_tpu.utils.timing import (
        chained_device_time)

    hw, c = STAGES[args.stage]
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (args.batch, hw, hw, c), dtype)
    p = make_params(c, key, dtype)

    # numeric cross-check first (fwd, vs nhwc)
    ref = None
    for name in args.variants.split(","):
        y = jax.jit(CHAINS[name])(p, x)
        if ref is None:
            ref = y
        else:
            rel = (jnp.linalg.norm((y - ref).astype(jnp.float32))
                   / jnp.linalg.norm(ref.astype(jnp.float32)))
            print(f"{name}: fwd rel-vs-nhwc {float(rel):.2e}")

    for name in args.variants.split(","):
        fn = CHAINS[name]

        def train_carry(carry, fn=fn):
            pp, xx = carry

            def loss(pp):
                return jnp.sum(fn(pp, xx).astype(jnp.float32))

            g = jax.grad(loss)(pp)
            pp2 = jax.tree_util.tree_map(lambda a, b: a - 1e-6 *
                                         b.astype(a.dtype), pp, g)
            return (pp2, xx)

        t = chained_device_time(train_carry, (p, x), iters=args.iters)
        print(f"stage{args.stage} b{args.batch} {name}: "
              f"fwd+bwd {t * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
