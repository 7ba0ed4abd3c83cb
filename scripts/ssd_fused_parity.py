#!/usr/bin/env python
"""On-device parity + timing for the fused SSD Pallas kernel (v2 flat
layout): compares ssd_chunked with the fused kernel forced ON vs OFF at
the MedSSD / ST-SSD stage shapes — fwd values and input grads — then
times both.  Run on the real chip (tests cover interpret mode; this
catches Mosaic-compile / layout issues the interpreter can't).
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_classification_tpu.kernels import ssd as ssd_mod
from medical_image_classification_tpu.utils.timing import chained_device_time

CASES = {
    "medssd0": dict(B=16, L=3136, H=8, P=64, N=512),
    "medssd1": dict(B=16, L=784, H=16, P=64, N=512),   # 4 x 196 fused (r3)
    "medssd2": dict(B=16, L=196, H=32, P=64, N=512),
    "st0": dict(B=8, L=3136, H=8, P=64, N=64),
}


def rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30))


def main():
    for case, cfg in CASES.items():
        B, L, H, P, N = (cfg[k] for k in "BLHPN")
        rng = np.random.RandomState(0)
        x = jnp.asarray(0.5 * rng.randn(B, L, H, P), jnp.bfloat16)
        dt = jnp.asarray(rng.rand(B, L, H), jnp.float32)
        A = jnp.asarray(-np.exp(rng.randn(H) * 0.3), jnp.float32)
        Bm = jnp.asarray(0.3 * rng.randn(B, L, 1, N), jnp.bfloat16)
        Cm = jnp.asarray(0.3 * rng.randn(B, L, 1, N), jnp.bfloat16)
        D = jnp.asarray(rng.randn(H, P), jnp.float32)
        fn = functools.partial(ssd_mod.ssd_chunked, dt_softplus=True, D=D,
                               adaptive_chunk=True, chunk_size=256)

        def loss(x_, dt_):
            return jnp.sum(fn(x_, dt_, A, Bm, Cm).astype(jnp.float32) ** 2)

        outs = {}
        for fused in (True, False):
            ssd_mod._USE_SSD_FUSED = fused
            y = jax.jit(fn)(x, dt, A, Bm, Cm)
            gx, gdt = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, dt)
            outs[fused] = (np.asarray(y, np.float32), np.asarray(gx,
                           np.float32), np.asarray(gdt, np.float32))
        ey = rel(outs[True][0], outs[False][0])
        egx = rel(outs[True][1], outs[False][1])
        egdt = rel(outs[True][2], outs[False][2])
        ok = ey < 2e-2 and egx < 2e-2 and egdt < 2e-2
        print(f"{case:8s} parity y={ey:.2e} gx={egx:.2e} gdt={egdt:.2e}"
              f"  {'OK' if ok else 'FAIL'}", flush=True)

        for fused in (True, False):
            ssd_mod._USE_SSD_FUSED = fused

            def fb_carry(x_):
                g = jax.grad(loss)(x_, dt)
                return x_ + (0.0 * jnp.sum(g)).astype(x_.dtype)

            tb = chained_device_time(fb_carry, x, iters=8)
            print(f"{case:8s} fused={fused}  fwd+bwd {tb*1e3:7.2f} ms",
                  flush=True)
        ssd_mod._USE_SSD_FUSED = True


if __name__ == "__main__":
    main()
