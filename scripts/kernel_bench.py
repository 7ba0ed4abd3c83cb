#!/usr/bin/env python
"""Microbenchmark for the selective-scan Pallas kernels on the real chip.

Times fwd and fwd+bwd at the production shapes (MedMamba-T stages) using the
chained-device-time harness (see utils/timing.py for why plain
block_until_ready loops mis-measure through the axon relay).

Usage: python scripts/kernel_bench.py [--stage all|0|1|2|3] [--iters N]
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

# MedMamba-T SS2D shapes per stage at batch 32 (G = B*K = 128)
STAGES = {
    "0": dict(G=128, L=3136, Dm=96, N=16),
    "1": dict(G=128, L=784, Dm=192, N=16),
    "2": dict(G=128, L=196, Dm=384, N=16),
    "3": dict(G=128, L=49, Dm=768, N=16),
}


def make_inputs(G, L, Dm, N, dtype=jnp.bfloat16, K=4):
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(G, L, Dm), dtype)
    delta = jnp.asarray(0.1 * rng.randn(G, L, Dm), dtype)
    A = jnp.asarray(-np.abs(rng.randn(K, Dm, N)) - 0.5, jnp.float32)
    B = jnp.asarray(rng.randn(G, L, N), dtype)
    C = jnp.asarray(rng.randn(G, L, N), dtype)
    D = jnp.asarray(rng.randn(K, Dm), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(K, Dm), jnp.float32)
    return u, delta, A, B, C, D, bias


def bench_impl(name, fn, args, iters):
    """fn: (u, *rest) -> scalar.  The carry is u itself so every loop
    iteration's inputs depend on the previous iteration's output (otherwise
    XLA hoists the loop-invariant computation out of the fori_loop)."""
    u0, rest = args[0], args[1:]

    def carry(u):
        out = fn(u, *rest)
        return u + (0.0 * out).astype(u.dtype)

    t = chained_device_time(carry, u0, iters=iters)
    return t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="0")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--impl", default="pallas",
                   help="comma list: pallas (current dispatch)")
    p.add_argument("--t-cap", type=int, default=None)
    p.add_argument("--vmem-budget-mb", type=int, default=None)
    p.add_argument("--calibrate", action="store_true",
                   help="run the no-scan elementwise floor kernel instead")
    args = p.parse_args()

    if args.t_cap or args.vmem_budget_mb:
        from medical_image_classification_tpu.kernels import (
            selective_scan_pallas as sp)
        if args.t_cap:
            sp._T_CAP = args.t_cap
        if args.vmem_budget_mb:
            sp._VMEM_BUDGET = args.vmem_budget_mb * 1024 * 1024
        print(f"# T_CAP={sp._T_CAP} VMEM_BUDGET={sp._VMEM_BUDGET>>20}MB")

    stages = STAGES.keys() if args.stage == "all" else [args.stage]
    for st in stages:
        cfg = STAGES[st]
        if args.calibrate:
            calib_kernel_bench(cfg, args.iters)
            continue
        ins = make_inputs(**cfg)
        u, delta, A, B, C, D, bias = ins

        from medical_image_classification_tpu.kernels.selective_scan_pallas \
            import selective_scan_pallas_folded

        def fwd_only(u, delta, A, B, C, D, bias):
            y = selective_scan_pallas_folded(u, delta, A, B, C, D, bias)
            return jnp.sum(y.astype(jnp.float32))

        def fwd_bwd(u, delta, A, B, C, D, bias):
            def loss(u, delta, B, C):
                y = selective_scan_pallas_folded(u, delta, A, B, C, D, bias)
                return jnp.sum(y.astype(jnp.float32))
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                u, delta, B, C)
            return l + sum(jnp.sum(g.astype(jnp.float32)) for g in grads)

        tf = bench_impl("fwd", jax.jit(fwd_only), ins, args.iters)
        print(f"stage{st} G={cfg['G']} L={cfg['L']} Dm={cfg['Dm']}: "
              f"fwd {tf*1e3:.2f} ms", flush=True)
        tb = bench_impl("fwd+bwd", jax.jit(fwd_bwd), ins, args.iters)
        print(f"stage{st} G={cfg['G']} L={cfg['L']} Dm={cfg['Dm']}: "
              f"fwd+bwd {tb*1e3:.2f} ms   bwd~{(tb-tf)*1e3:.2f} ms",
              flush=True)


def calib_kernel_bench(stage_cfg, iters):
    """Floor calibration: same grid/blocks as the fwd scan kernel, but the
    body does only the irreducible per-element work (exp + 4 muls + N-sum),
    no scan.  The gap fwd_scan - this = cost of the scan machinery."""
    import functools
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from medical_image_classification_tpu.kernels import (
        selective_scan_pallas as sp)

    G, L, Dm, N = (stage_cfg[k] for k in ("G", "L", "Dm", "N"))
    K = 4
    T, Dt = sp._choose_tiles(L, Dm, N)
    u, delta, A, B, C, D, bias = make_inputs(G, L, Dm, N)
    At = jnp.swapaxes(A, 1, 2)
    pad = (-L) % T
    Lp = L + pad

    cdt = jnp.bfloat16 if os.environ.get("CALIB_BF16") else jnp.float32

    def kern(u_ref, dt_ref, A_ref, B_ref, C_ref, y_ref):
        uf = u_ref[0].astype(cdt)
        dt = jax.nn.softplus(dt_ref[0].astype(cdt))
        Av = A_ref[0].astype(cdt)
        Bv = B_ref[0].astype(cdt)
        Cv = C_ref[0].astype(cdt)
        a = jnp.exp(dt[:, None, :] * Av[None])
        b = (dt * uf)[:, None, :] * Bv[:, :, None]
        y = jnp.sum((Cv[:, :, None] * (a * b)).astype(jnp.float32), axis=1)
        y_ref[0] = y.astype(y_ref.dtype)

    nD = Dm // Dt

    def run(u, delta, B, C):
        if pad:
            z = ((0, 0), (0, pad), (0, 0))
            u, delta, B, C = (jnp.pad(t, z) for t in (u, delta, B, C))
        return pl.pallas_call(
            kern,
            grid=(G * nD, Lp // T),
            in_specs=[
                pl.BlockSpec((1, T, Dt), lambda i, l: (i // nD, l, i % nD),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, Dt), lambda i, l: (i // nD, l, i % nD),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, Dt), lambda i, l: ((i // nD) % K, 0, i % nD),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, N), lambda i, l: (i // nD, l, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, N), lambda i, l: (i // nD, l, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, Dt),
                                   lambda i, l: (i // nD, l, i % nD),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, Lp, Dm), u.dtype),
        )(u, delta, At, B, C)

    def fn(u_, delta_, B_, C_):
        return jnp.sum(run(u_, delta_, B_, C_).astype(jnp.float32))

    t = bench_impl("calib", jax.jit(fn), (u, delta, B, C), iters)
    print(f"calib T={T} Dt={Dt}: {t*1e3:.2f} ms")

if __name__ == "__main__":
    main()
