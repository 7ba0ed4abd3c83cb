#!/usr/bin/env python
"""Microbenchmark: fused ST-SSD kernels (stl_mixer, stf_zgate) vs the XLA
formulation they replace, at the ST-SSD production shapes (batch 8, four
directions folded into BB for STL).

Usage: python scripts/st_kernel_bench.py [--stage 0|1|all] [--iters N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_classification_tpu.utils.timing import chained_device_time

# ST-SSD stage shapes at batch 8 (BB = B*K = 32 for STL; B = 8 for the gate)
STAGES = {
    "0": dict(B=8, L=3136, P=3136, C=256),
    "1": dict(B=8, L=784, P=784, C=512),
}


def bench(fn, args, iters):
    x0, rest = args[0], args[1:]

    def carry(x):
        out = fn(x, *rest)
        return x + (0.0 * out).astype(x.dtype)

    return chained_device_time(carry, x0, iters=iters)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="all")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    args = p.parse_args()
    dt = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[args.dtype]

    from medical_image_classification_tpu.kernels import stl_mixer_pallas as smp
    from medical_image_classification_tpu.kernels import stf_zgate_pallas as szp

    for st in (STAGES.keys() if args.stage == "all" else [args.stage]):
        cfg = STAGES[st]
        B, L, P, C = (cfg[k] for k in "BLPC")
        BB = 4 * B
        rng = np.random.RandomState(0)
        w = jnp.asarray(0.5 * rng.randn(BB, L, C), dt)
        u1 = jnp.asarray(0.05 * rng.randn(C, P), dt)
        u2 = jnp.asarray(0.05 * rng.randn(C, C), dt)
        pooledT = jnp.asarray(0.5 * rng.randn(B, P, C), dt)
        lz = jnp.asarray(0.05 * rng.randn(C, P), dt)
        U = jnp.asarray(0.5 * rng.randn(B, P, C), dt)

        def stl_ref(w, u1, u2):
            A = jax.nn.softmax((w @ u1).astype(jnp.float32),
                               -1).astype(w.dtype)
            return jnp.einsum("blp,blc->bpc", A, w @ u2)

        def z_ref(pooledT, lz, U):
            Z = jax.nn.sigmoid(pooledT @ lz)
            return jnp.einsum("bpq,bqc->bpc", Z, U.astype(Z.dtype))

        for name, fn, ins in [("stl_pallas", smp.stl_mixer, (w, u1, u2)),
                              ("stl_xla", stl_ref, (w, u1, u2)),
                              ("zgate_pallas", szp.stf_zgate,
                               (pooledT, lz, U)),
                              ("zgate_xla", z_ref, (pooledT, lz, U))]:
            fwd = jax.jit(lambda *a, f=fn: jnp.sum(f(*a).astype(jnp.float32)))

            def fwd_bwd(*a, f=fn):
                l, g = jax.value_and_grad(
                    lambda *b: jnp.sum(f(*b).astype(jnp.float32)),
                    argnums=tuple(range(len(a))))(*a)
                return l + sum(jnp.sum(x.astype(jnp.float32)) for x in g)

            tf = bench(fwd, ins, args.iters)
            tb = bench(jax.jit(fwd_bwd), ins, args.iters)
            print(f"stage{st} {name:14s} fwd {tf*1e3:7.2f} ms   "
                  f"fwd+bwd {tb*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
