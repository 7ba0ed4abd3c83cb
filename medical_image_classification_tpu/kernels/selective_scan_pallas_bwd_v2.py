"""Work-efficient two-level Pallas selective-scan backward (v2).

Same contract as the v1 backward (`selective_scan_pallas_bwd.py`) but both
in-kernel scans — the forward state recompute and the reverse adjoint — use
the Blelloch-style two-level decomposition (sequential within [nb, S]
sub-blocks + tiny cross-block combine), cutting per-element VPU work ~2x.
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


def _block_prefix(tot_a, tot_b, nb):
    """Inclusive doubling scan over [nb, ...] sub-block totals."""
    pa, pb = tot_a, tot_b
    off = 1
    while off < nb:
        ones = jnp.ones_like(pa[:off])
        zeros = jnp.zeros_like(pb[:off])
        a_sh = jnp.concatenate([ones, pa[:-off]], axis=0)
        b_sh = jnp.concatenate([zeros, pb[:-off]], axis=0)
        pb = pa * b_sh + pb
        pa = pa * a_sh
        off *= 2
    return pa, pb


def _block_suffix(tot_a, tot_b, nb):
    """Inclusive doubling SUFFIX scan over [nb, ...] sub-block totals:
    out[j] = combine(blocks j..nb-1) for recurrence g_j = d_j + a_j g_{j+1}."""
    pa, pb = tot_a, tot_b
    off = 1
    while off < nb:
        a_sh = jnp.concatenate([pa[off:], jnp.ones_like(pa[:off])], axis=0)
        b_sh = jnp.concatenate([pb[off:], jnp.zeros_like(pb[:off])], axis=0)
        pb = pb + pa * b_sh
        pa = pa * a_sh
        off *= 2
    return pa, pb


def _bwd_kernel_v2(u_ref, dt_ref, A_ref, B_ref, C_ref, bias_ref, Dskip_ref,
                   xin_ref, dy_ref,
                   du_ref, ddelta_ref, dB_ref, dC_ref, dA_ref, dbias_ref,
                   dD_ref,
                   g_carry, dA_acc, dbias_acc, dD_acc, x_scr, g_scr,
                   *, T: int, S: int, nT: int, Dt: int):
    lidx = pl.program_id(1)
    dtile = pl.program_id(2)
    first = lidx == 0

    @pl.when(first)
    def _():
        g_carry[...] = jnp.zeros_like(g_carry)
        dA_acc[...] = jnp.zeros_like(dA_acc)
        dbias_acc[...] = jnp.zeros_like(dbias_acc)
        dD_acc[...] = jnp.zeros_like(dD_acc)

    u_f = u_ref[0].astype(jnp.float32)                      # [T, Dt]
    dt_raw = dt_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    dt_f = jax.nn.softplus(dt_raw)
    sig_f = jax.nn.sigmoid(dt_raw)
    A = A_ref[0].astype(jnp.float32)                        # [N, Dt]
    Bv_f = B_ref[0].astype(jnp.float32)                     # [T, N]
    Cv_f = C_ref[0].astype(jnp.float32)
    dy_f = dy_ref[0].astype(jnp.float32)
    x_in = xin_ref[0, 0].astype(jnp.float32)                # [N, Dt]
    Dsk = Dskip_ref[0].astype(jnp.float32)                  # [1, Dt]

    nb = T // S
    N = A.shape[0]
    a_flat = jnp.exp(dt_f[:, None, :] * A[None])            # [T, N, Dt]
    b_flat = (dt_f * u_f)[:, None, :] * Bv_f[:, :, None]
    # â_t = a_{t+1} across the whole chunk (last = 1)
    ah_flat = jnp.concatenate([a_flat[1:], jnp.ones_like(a_flat[:1])], axis=0)

    a = a_flat.reshape(nb, S, N, Dt)
    b = b_flat.reshape(nb, S, N, Dt)
    ah = ah_flat.reshape(nb, S, N, Dt)
    C4 = Cv_f.reshape(nb, S, N)
    B4 = Bv_f.reshape(nb, S, N)
    dy4 = dy_f.reshape(nb, S, Dt)
    u4 = u_f.reshape(nb, S, Dt)
    dt4 = dt_f.reshape(nb, S, Dt)
    sig4 = sig_f.reshape(nb, S, Dt)

    # ---- forward recompute (two-level prefix) ----
    acc_a = a[:, 0]
    acc_b = b[:, 0]
    xloc = [acc_b]
    aruns = [acc_a]
    for s in range(1, S):
        acc_b = a[:, s] * acc_b + b[:, s]
        acc_a = a[:, s] * acc_a
        xloc.append(acc_b)
        aruns.append(acc_a)
    pa, pb = _block_prefix(acc_a, acc_b, nb)
    st = x_in[None]
    e_b = jnp.concatenate([st, pb[:-1] + pa[:-1] * st], axis=0)  # [nb, N, Dt]

    # ---- reverse adjoint (two-level suffix): g_t = C dy + â_t g_{t+1} ----
    d4 = (C4[..., None] * dy4[:, :, None, :])               # [nb, S, N, Dt]
    gacc = d4[:, S - 1]
    ga = ah[:, S - 1]
    gloc = [gacc]                                           # index by S-1-s
    gruns = [ga]
    for s in range(S - 2, -1, -1):
        gacc = d4[:, s] + ah[:, s] * gacc
        ga = ah[:, s] * ga
        gloc.append(gacc)
        gruns.append(ga)
    sa, sb = _block_suffix(ga, gacc, nb)
    # incoming from the LATER chunk (processed previously): pre-multiplied
    cin = g_carry[dtile][None]                              # [1, N, Dt]
    e_g = jnp.concatenate([sb[1:] + sa[1:] * cin, cin], axis=0)  # [nb, N, Dt]
    # earlier chunk's carry is PRE-multiplied by this chunk's first decay
    g_carry[dtile] = a_flat[0] * (sb[0] + sa[0] * cin[0])
    # NOTE e_g[j] = adjoint entering block j from blocks j+1.. and carry;
    # g[:, s] = gloc[s] + gruns[s] * e_g

    # ---- materialise full x and g (scratch normalises layouts: Mosaic
    # cannot reduce over offset-layout slices of 4D values) ----
    for s in range(S):
        x_scr[:, s] = xloc[s] + aruns[s] * e_b              # [nb, N, Dt]
        g_scr[:, s] = gloc[S - 1 - s] + gruns[S - 1 - s] * e_g

    x = x_scr[...].reshape(T, N, Dt)
    g = g_scr[...].reshape(T, N, Dt)
    x_prev = jnp.concatenate([x_in[None], x[:T - 1]], axis=0)

    # ---- gradients (whole-chunk expressions, as in the v1 backward) ----
    gB = jnp.sum(g * Bv_f[:, :, None], axis=1)              # [T, Dt]
    du = dt_f * gB + Dsk * dy_f
    g_ax = g * a_flat * x_prev
    ddt = jnp.sum(g_ax * A[None], axis=1) + gB * u_f
    ddelta = sig_f * ddt
    du_ref[0] = du
    ddelta_ref[0] = ddelta

    dB_blk = jnp.sum(g * (dt_f * u_f)[:, None, :], axis=2)  # [T, N]
    dC_blk = jnp.sum(dy_f[:, None, :] * x, axis=2)
    dA_acc[dtile] += jnp.sum(g_ax * dt_f[:, None, :], axis=0)
    dbias_acc[dtile, 0] += jnp.sum(ddelta, axis=0)
    dD_acc[dtile, 0] += jnp.sum(dy_f * u_f, axis=0)

    @pl.when(dtile == 0)
    def _():
        dB_ref[0] = dB_blk
        dC_ref[0] = dC_blk

    @pl.when(dtile != 0)
    def _():
        dB_ref[0] += dB_blk
        dC_ref[0] += dC_blk

    dA_ref[0] = dA_acc[dtile]
    dbias_ref[0, 0] = dbias_acc[dtile, 0]
    dD_ref[0, 0] = dD_acc[dtile, 0]


def bwd_folded_v2(u, delta, A, B, C, Dskip, bias, xsave, dy, T: int, Dt: int,
                  S: int = 16):
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
    At = jnp.swapaxes(A, 1, 2)
    nb = T // S

    grid = (G, nT, nD)
    rev = lambda l: nT - 1 - l

    kernel = functools.partial(_bwd_kernel_v2, T=T, S=S, nT=nT, Dt=Dt)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, Dt), lambda g, l, d: (g, rev(l), d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dt), lambda g, l, d: (g, rev(l), d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dt), lambda g, l, d: (g % K, 0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda g, l, d: (g, rev(l), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda g, l, d: (g, rev(l), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dt), lambda g, l, d: (g % K, 0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dt), lambda g, l, d: (g % K, 0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, Dt), lambda g, l, d: (g, rev(l), 0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dt), lambda g, l, d: (g, rev(l), d),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, T, Dt), lambda g, l, d: (g, rev(l), d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dt), lambda g, l, d: (g, rev(l), d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda g, l, d: (g, rev(l), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda g, l, d: (g, rev(l), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dt), lambda g, l, d: (g, 0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dt), lambda g, l, d: (g, 0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dt), lambda g, l, d: (g, 0, d),
                         memory_space=pltpu.VMEM),
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
            pltpu.VMEM((nD, N, Dt), jnp.float32),            # g carry
            pltpu.VMEM((nD, N, Dt), jnp.float32),            # dA acc
            pltpu.VMEM((nD, 1, Dt), jnp.float32),            # dbias acc
            pltpu.VMEM((nD, 1, Dt), jnp.float32),            # dD acc
            pltpu.VMEM((nb, S, N, Dt), jnp.float32),         # x rows
            pltpu.VMEM((nb, S, N, Dt), jnp.float32),         # g rows
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=_INTERPRET,
    )(u, delta, At, B, C, bias[:, None, :], Dskip[:, None, :], xsave, dy)

    du, ddelta, dB, dC, dA_part, dbias_part, dD_part = outs
    du = du[:, :L]
    ddelta = ddelta[:, :L]
    dB = dB[:, :L]
    dC = dC[:, :L]
    batch = G // K
    dA = jnp.swapaxes(dA_part.reshape(batch, K, N, Dm).sum(0), 1, 2)
    dbias = dbias_part.reshape(batch, K, Dm).sum(0)
    dD = dD_part.reshape(batch, K, Dm).sum(0)
    return du, ddelta, dA, dB, dC, dD, dbias
