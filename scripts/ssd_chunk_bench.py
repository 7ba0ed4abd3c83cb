#!/usr/bin/env python
"""Microbench: SSD chunk-size / fused-kernel-window strategy at the real
model stage shapes.  Explores chunk sizes outside the current fused-kernel
gate (monkeypatching the window + VMEM budget) to find whether stages that
today fall back to the XLA path (e.g. MedSSD stage 1: L=784 single-chunk)
would be faster on the fused kernel at a pad-free divisor (784 = 2 x 392).

Usage: python scripts/ssd_chunk_bench.py [--case medssd1 ...] [--iters 8]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_classification_tpu.utils.timing import chained_device_time

# (B, L, H, P, N): MedSSD b16 stages 0/1, ST-SSD b8 stages 0/1
CASES = {
    "medssd0": dict(B=16, L=3136, H=8, P=64, N=512),
    "medssd1": dict(B=16, L=784, H=16, P=64, N=512),
    "medssd2": dict(B=16, L=196, H=32, P=64, N=512),
    "st0": dict(B=8, L=3136, H=8, P=64, N=64),
    "st1": dict(B=8, L=784, H=16, P=64, N=64),
}

# chunk candidates per case: None = adaptive default
CHUNKS = {
    "medssd0": [None, 112, 224, 392, 448],
    "medssd1": [None, 112, 196, 392],
    "medssd2": [None, 98, 196],
    "st0": [None, 112, 224, 392, 448],
    "st1": [None, 112, 196, 392],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", action="append", default=None)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--widen", action="store_true",
                   help="widen the fused-kernel gate to l in [96, 512]")
    args = p.parse_args()
    cases = args.case or list(CASES)

    from medical_image_classification_tpu.kernels import ssd as ssd_mod
    from medical_image_classification_tpu.kernels import (
        ssd_fused_pallas as sfp,
        ssd_ydiag_pallas as syp,
    )
    if args.widen:
        sfp._MIN_L, sfp._MAX_L = 96, 512
        syp._VMEM_BUDGET = int(24 * 1024 * 1024)

    for case in cases:
        cfg = CASES[case]
        B, L, H, P, N = (cfg[k] for k in "BLHPN")
        rng = np.random.RandomState(0)
        dt_ = jnp.bfloat16
        x = jnp.asarray(0.5 * rng.randn(B, L, H, P), dt_)
        dt = jnp.asarray(rng.rand(B, L, H), jnp.float32)
        A = jnp.asarray(-np.exp(rng.randn(H) * 0.3), jnp.float32)
        Bm = jnp.asarray(0.3 * rng.randn(B, L, 1, N), dt_)
        Cm = jnp.asarray(0.3 * rng.randn(B, L, 1, N), dt_)
        D = jnp.asarray(rng.randn(H, P), jnp.float32)

        for c in CHUNKS[case]:
            kw = (dict(adaptive_chunk=True, chunk_size=256) if c is None
                  else dict(adaptive_chunk=False, chunk_size=c))
            fn = functools.partial(ssd_mod.ssd_chunked, dt_softplus=True,
                                   D=D, **kw)

            def fwd_carry(x_):
                y = fn(x_, dt, A, Bm, Cm)
                return x_ + (0.0 * jnp.sum(y)).astype(x_.dtype)

            def loss(x_):
                return jnp.sum(fn(x_, dt, A, Bm, Cm).astype(jnp.float32)
                               ** 2)

            def fb_carry(x_):
                g = jax.grad(loss)(x_)
                return x_ + (0.0 * jnp.sum(g)).astype(x_.dtype)

            label = "adaptive" if c is None else f"c={c}"
            try:
                tf = chained_device_time(fwd_carry, x, iters=args.iters)
                tb = chained_device_time(fb_carry, x, iters=args.iters)
                print(f"{case:8s} {label:9s} fwd {tf*1e3:7.2f} ms"
                      f"   fwd+bwd {tb*1e3:7.2f} ms", flush=True)
            except Exception as e:
                print(f"{case:8s} {label:9s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
