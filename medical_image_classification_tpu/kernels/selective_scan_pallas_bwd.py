"""Pallas TPU selective-scan backward kernel.

TPU-native equivalent of the reference CUDA backward
(`/root/reference/CrossMamba/FusionMamba/selective_scan/selective_scan_bwd_kernel.cuh`),
designed as two scans instead of atomics (SURVEY §7 hard-parts):

  * the forward saves each chunk's INCOMING state (tiny: [G, nChunks, N, D]);
  * the backward walks chunks in reverse, recomputes the in-chunk states with
    the same doubling scan, runs a REVERSE doubling scan for the adjoint
    g_t = C_t dy_t + a_{t+1} g_{t+1}, and forms all input/parameter gradients
    as full-tile VPU expressions;
  * per-(sequence) parameter-gradient partials (dA, dΔbias, dD) accumulate in
    VMEM scratch across the chunk walk and are reduced over sequences by XLA
    afterwards — no atomics anywhere.

Grid = (sequence, L-chunk [reversed], D-tile).  dB/dC accumulate across the
innermost D-tile steps directly in the output block (canonical pallas
revisit-accumulate pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_INTERPRET = False


def _doubling_scan(a, b, T):
    """Inclusive Hillis-Steele scan along axis 0 of [T, N, D] pairs."""
    off = 1
    while off < T:
        ones = jnp.ones_like(a[:off])
        zeros = jnp.zeros_like(b[:off])
        a_sh = jnp.concatenate([ones, a[:-off]], axis=0)
        b_sh = jnp.concatenate([zeros, b[:-off]], axis=0)
        b = a * b_sh + b
        a = a * a_sh
        off *= 2
    return a, b


def _bwd_kernel(u_ref, dt_ref, A_ref, B_ref, C_ref, bias_ref, Dskip_ref,
                xin_ref, dy_ref,
                du_ref, ddelta_ref, dB_ref, dC_ref, dA_ref, dbias_ref, dD_ref,
                g_carry, dA_acc, dbias_acc, dD_acc,
                *, T: int, nT: int, nD: int, Dt: int):
    lidx = pl.program_id(1)          # 0 .. nT-1, walking chunks in REVERSE
    dtile = pl.program_id(2)
    first = lidx == 0                # processing the LAST chunk
    last = lidx == nT - 1            # processing chunk 0

    @pl.when(first)
    def _():
        g_carry[...] = jnp.zeros_like(g_carry)
        dA_acc[...] = jnp.zeros_like(dA_acc)
        dbias_acc[...] = jnp.zeros_like(dbias_acc)
        dD_acc[...] = jnp.zeros_like(dD_acc)

    u = u_ref[0].astype(jnp.float32)                       # [T, Dt]
    dt_raw = dt_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    dt = jax.nn.softplus(dt_raw)
    sig = jax.nn.sigmoid(dt_raw)
    A = A_ref[0].astype(jnp.float32)                       # [N, Dt]
    Bv = B_ref[0].astype(jnp.float32)                      # [T, N]
    Cv = C_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)                     # [T, Dt]
    x_in = xin_ref[0, 0].astype(jnp.float32)               # [N, Dt]

    # --- recompute in-chunk states (same as fwd) ---
    a = jnp.exp(dt[:, None, :] * A[None])                  # [T, N, Dt]
    dBu = (dt * u)[:, None, :] * Bv[:, :, None]
    a_cum, x_local = _doubling_scan(a, dBu, T)
    x = x_local + a_cum * x_in[None]
    x_prev = jnp.concatenate([x_in[None], x[:-1]], axis=0)

    # --- reverse adjoint scan: g_t = C_t dy_t + a_{t+1} g_{t+1} ---
    # Suffix doubling scan (no array reversal — Mosaic has no `rev`):
    # with â_t = a_{t+1} (â_{T-1} = 1), g_t = d_scan_t + â_scan_t * carry,
    # carry = a_first * g_first of the LATER chunk (processed previously).
    d_acc = Cv[:, :, None] * dy[:, None, :]                # [T, N, Dt]
    ones1 = jnp.ones_like(a[:1])
    a_hat = jnp.concatenate([a[1:], ones1], axis=0)        # â
    off = 1
    while off < T:
        a_sh = jnp.concatenate([a_hat[off:], jnp.ones_like(a_hat[:off])],
                               axis=0)
        d_sh = jnp.concatenate([d_acc[off:], jnp.zeros_like(d_acc[:off])],
                               axis=0)
        d_acc = d_acc + a_hat * d_sh
        a_hat = a_hat * a_sh
        off *= 2
    carry_slice = g_carry[dtile]
    g = d_acc + a_hat * carry_slice[None]                  # [T, N, Dt]
    # next (earlier) chunk's carry: a_first * g_first of THIS chunk
    g_carry[dtile] = a[0] * g[0]

    # --- gradients ---
    gB = jnp.sum(g * Bv[:, :, None], axis=1)               # [T, Dt]
    du = dt * gB + Dskip_ref[0].astype(jnp.float32) * dy
    g_ax = g * a * x_prev                                  # [T, N, Dt]
    ddt = jnp.sum(g_ax * A[None], axis=1) + gB * u
    ddelta = sig * ddt
    du_ref[0] = du
    ddelta_ref[0] = ddelta

    dB_blk = jnp.sum(g * (dt * u)[:, None, :], axis=2)     # [T, N]
    dC_blk = jnp.sum(dy[:, None, :] * x, axis=2)           # [T, N]

    @pl.when(dtile == 0)
    def _():
        dB_ref[0] = dB_blk
        dC_ref[0] = dC_blk

    @pl.when(dtile != 0)
    def _():
        dB_ref[0] += dB_blk
        dC_ref[0] += dC_blk

    dA_acc[dtile] += jnp.sum(g_ax * dt[:, None, :], axis=0)
    dbias_acc[dtile, 0] += jnp.sum(ddelta, axis=0)
    dD_acc[dtile, 0] += jnp.sum(dy * u, axis=0)

    # flush per-sequence param partials on the final (chunk 0) pass
    dA_ref[0] = dA_acc[dtile]
    dbias_ref[0, 0] = dbias_acc[dtile, 0]
    dD_ref[0, 0] = dD_acc[dtile, 0]


def bwd_folded(u, delta, A, B, C, Dskip, bias, xsave, dy, T: int, Dt: int):
    """Returns (du, ddelta, dA, dB, dC, dDskip, dbias) in the folded layout."""
    G, L, Dm = u.shape
    K, _, N = A.shape
    nD = Dm // Dt
    pad = (-L) % T
    if pad:
        zpad = ((0, 0), (0, pad), (0, 0))
        u = jnp.pad(u, zpad)
        delta = jnp.pad(delta, zpad)
        B = jnp.pad(B, zpad)
        C = jnp.pad(C, zpad)
        dy = jnp.pad(dy, zpad)
    Lp = L + pad
    nT = Lp // T
    At = jnp.swapaxes(A, 1, 2)                             # [K, N, Dm]

    grid = (G, nT, nD)
    rev = lambda l: nT - 1 - l

    kernel = functools.partial(_bwd_kernel, T=T, nT=nT, nD=nD, Dt=Dt)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, Dt), lambda g, l, d: (g, rev(l), d),
                         memory_space=pltpu.VMEM),          # u
            pl.BlockSpec((1, T, Dt), lambda g, l, d: (g, rev(l), d),
                         memory_space=pltpu.VMEM),          # delta
            pl.BlockSpec((1, N, Dt), lambda g, l, d: (g % K, 0, d),
                         memory_space=pltpu.VMEM),          # A (transposed)
            pl.BlockSpec((1, T, N), lambda g, l, d: (g, rev(l), 0),
                         memory_space=pltpu.VMEM),          # B
            pl.BlockSpec((1, T, N), lambda g, l, d: (g, rev(l), 0),
                         memory_space=pltpu.VMEM),          # C
            pl.BlockSpec((1, 1, Dt), lambda g, l, d: (g % K, 0, d),
                         memory_space=pltpu.VMEM),          # bias
            pl.BlockSpec((1, 1, Dt), lambda g, l, d: (g % K, 0, d),
                         memory_space=pltpu.VMEM),          # Dskip
            pl.BlockSpec((1, 1, N, Dt), lambda g, l, d: (g, rev(l), 0, d),
                         memory_space=pltpu.VMEM),          # xsave (incoming)
            pl.BlockSpec((1, T, Dt), lambda g, l, d: (g, rev(l), d),
                         memory_space=pltpu.VMEM),          # dy
        ],
        out_specs=[
            pl.BlockSpec((1, T, Dt), lambda g, l, d: (g, rev(l), d),
                         memory_space=pltpu.VMEM),          # du
            pl.BlockSpec((1, T, Dt), lambda g, l, d: (g, rev(l), d),
                         memory_space=pltpu.VMEM),          # ddelta
            pl.BlockSpec((1, T, N), lambda g, l, d: (g, rev(l), 0),
                         memory_space=pltpu.VMEM),          # dB
            pl.BlockSpec((1, T, N), lambda g, l, d: (g, rev(l), 0),
                         memory_space=pltpu.VMEM),          # dC
            pl.BlockSpec((1, N, Dt), lambda g, l, d: (g, 0, d),
                         memory_space=pltpu.VMEM),          # dA partial
            pl.BlockSpec((1, 1, Dt), lambda g, l, d: (g, 0, d),
                         memory_space=pltpu.VMEM),          # dbias partial
            pl.BlockSpec((1, 1, Dt), lambda g, l, d: (g, 0, d),
                         memory_space=pltpu.VMEM),          # dD partial
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Lp, Dm), jnp.float32),
            jax.ShapeDtypeStruct((G, Lp, Dm), jnp.float32),
            jax.ShapeDtypeStruct((G, Lp, N), jnp.float32),
            jax.ShapeDtypeStruct((G, Lp, N), jnp.float32),
            jax.ShapeDtypeStruct((G, N, Dm), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, Dm), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, Dm), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nD, N, Dt), jnp.float32),           # g carry
            pltpu.VMEM((nD, N, Dt), jnp.float32),           # dA acc
            pltpu.VMEM((nD, 1, Dt), jnp.float32),           # dbias acc
            pltpu.VMEM((nD, 1, Dt), jnp.float32),           # dD acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=_INTERPRET,
    )(u, delta, At, B, C, bias[:, None, :], Dskip[:, None, :], xsave, dy)

    du, ddelta, dB, dC, dA_part, dbias_part, dD_part = outs
    du = du[:, :L]
    ddelta = ddelta[:, :L]
    dB = dB[:, :L]
    dC = dC[:, :L]
    # reduce per-sequence param partials over the batch within each direction
    batch = G // K
    dA = jnp.swapaxes(dA_part.reshape(batch, K, N, Dm).sum(0), 1, 2)  # [K,Dm,N]
    dbias = dbias_part.reshape(batch, K, Dm).sum(0)
    dD = dD_part.reshape(batch, K, Dm).sum(0)
    return du, ddelta, dA, dB, dC, dD, dbias
