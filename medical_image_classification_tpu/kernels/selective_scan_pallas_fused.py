"""Fused-projection Pallas selective scan (Mamba-1 SS2D hot path, v3).

Fuses the reference's ``x_proj``/``dt_proj`` einsums (`MedMamba.py:397-400`)
INTO the scan kernel: the only large kernel input is the cross-scanned
activation ``x [G, L, D]``; Δ, B, C are produced per chunk by small MXU
matmuls in VMEM and never touch HBM.  The backward emits ONE large gradient
(``dx``) plus tiny per-sequence weight-grad partials, replacing the four
[G, L, *] cotangent arrays of the unfused path.  This is the moral
equivalent of the reference's fused ``MambaInnerFn``
(`mamba_ssm/ops/selective_scan_interface.py:161`), shaped for TPU.

Folded layout (directions ride the sequence axis, batch-major):
  x     : [G, L, Dm]          G = batch * K
  Wdt   : [K, R, Dm]          Δ-rank projection   (rows of x_proj_weight)
  WB/WC : [K, N, Dm]          B/C projections
  dtw   : [K, Dm, R]          Δ up-projection
  A     : [K, Dm, N]  (negative), Dskip/bias: [K, Dm]

Supported when the whole Dm fits one d-tile (nD == 1); the dispatcher falls
back to the unfused kernels otherwise.
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

_F32 = jnp.float32


def _dot(a, b, ta=False, tb=False):
    """dot_general helper with fp32 accumulation.

    Precision is pinned explicitly: a global jax_default_matmul_precision
    of "highest" (parity harnesses) fails Mosaic lowering on bf16 operands
    ("Bad lhs type") if allowed to leak into precision=None.
    """
    ca = 0 if ta else 1
    cb = 1 if tb else 0
    if a.dtype == jnp.float32 and b.dtype == jnp.float32:
        prec = jax.lax.Precision.HIGHEST
    else:
        prec = jax.lax.Precision.DEFAULT
    return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                               preferred_element_type=_F32,
                               precision=prec)


def _block_prefix(pa, pb, nb):
    off = 1
    while off < nb:
        a_sh = jnp.concatenate([jnp.ones_like(pa[:off]), pa[:-off]], axis=0)
        b_sh = jnp.concatenate([jnp.zeros_like(pb[:off]), pb[:-off]], axis=0)
        pb = pa * b_sh + pb
        pa = pa * a_sh
        off *= 2
    return pa, pb


def _block_suffix(pa, pb, nb):
    off = 1
    while off < nb:
        a_sh = jnp.concatenate([pa[off:], jnp.ones_like(pa[:off])], axis=0)
        b_sh = jnp.concatenate([pb[off:], jnp.zeros_like(pb[:off])], axis=0)
        pb = pb + pa * b_sh
        pa = pa * a_sh
        off *= 2
    return pa, pb


def _project(x32, Wdt_ref, WB_ref, WC_ref, dtw_ref, bias_ref):
    """In-kernel Δ/B/C production for one [T, Dm] chunk."""
    Wdt = Wdt_ref[0].astype(_F32)        # [R, Dm]
    WB = WB_ref[0].astype(_F32)          # [N, Dm]
    WC = WC_ref[0].astype(_F32)
    dtw = dtw_ref[0].astype(_F32)        # [Dm, R]
    dtr = _dot(x32, Wdt, tb=True)        # [T, R]
    Bv = _dot(x32, WB, tb=True)          # [T, N]
    Cv = _dot(x32, WC, tb=True)
    dt_raw = _dot(dtr, dtw, tb=True) + bias_ref[0].astype(_F32)  # [T, Dm]
    return dtr, Bv, Cv, dt_raw


def _scan_chunk(x32, dt, A, Bv, state, T, S):
    """Two-level prefix scan; returns (x_states [T,N,Dm], carry [N,Dm])."""
    nb = T // S
    N, Dm = A.shape
    a = jnp.exp(dt[:, None, :] * A[None]).reshape(nb, S, N, Dm)
    b = ((dt * x32)[:, None, :] * Bv[:, :, None]).reshape(nb, S, N, Dm)
    acc_a, acc_b = a[:, 0], b[:, 0]
    xloc, aruns = [acc_b], [acc_a]
    for s in range(1, S):
        acc_b = a[:, s] * acc_b + b[:, s]
        acc_a = a[:, s] * acc_a
        xloc.append(acc_b)
        aruns.append(acc_a)
    pa, pb = _block_prefix(acc_a, acc_b, nb)
    st = state[None]
    e_b = jnp.concatenate([st, pb[:-1] + pa[:-1] * st], axis=0)
    carry = pb[nb - 1] + pa[nb - 1] * state
    return a, xloc, aruns, e_b, carry


def _fwd_kernel(x_ref, Wdt_ref, WB_ref, WC_ref, dtw_ref, bias_ref, A_ref,
                Dskip_ref, y_ref, xsave_ref, state, y_scr, *, T, S):
    lc = pl.program_id(1)

    @pl.when(lc == 0)
    def _():
        state[...] = jnp.zeros_like(state)

    xsave_ref[0, 0] = state[...]
    x32 = x_ref[0].astype(_F32)                          # [T, Dm]
    dtr, Bv, Cv, dt_raw = _project(x32, Wdt_ref, WB_ref, WC_ref, dtw_ref,
                                   bias_ref)
    dt = jax.nn.softplus(dt_raw)
    A = A_ref[0].astype(_F32)                            # [N, Dm]

    nb = T // S
    a, xloc, aruns, e_b, carry = _scan_chunk(x32, dt, A, Bv, state[...], T, S)
    C4 = Cv.reshape(nb, S, Cv.shape[1])
    for s in range(S):
        x_s = xloc[s] + aruns[s] * e_b
        y_scr[:, s] = jnp.sum(C4[:, s][:, :, None] * x_s, axis=1)
    y = y_scr[...].reshape(T, x32.shape[1]) + x32 * Dskip_ref[0].astype(_F32)
    y_ref[0] = y.astype(y_ref.dtype)
    state[...] = carry


def _bwd_kernel(x_ref, Wdt_ref, WB_ref, WC_ref, dtw_ref, bias_ref, A_ref,
                Dskip_ref, xin_ref, dy_ref,
                dx_ref, dWdt_ref, dWB_ref, dWC_ref, ddtw_ref, dA_ref,
                dbias_ref, dD_ref,
                g_carry, dWdt_acc, dWB_acc, dWC_acc, ddtw_acc, dA_acc,
                dbias_acc, dD_acc, x_scr, g_scr, *, T, S):
    lidx = pl.program_id(1)

    @pl.when(lidx == 0)
    def _():
        g_carry[...] = jnp.zeros_like(g_carry)
        dWdt_acc[...] = jnp.zeros_like(dWdt_acc)
        dWB_acc[...] = jnp.zeros_like(dWB_acc)
        dWC_acc[...] = jnp.zeros_like(dWC_acc)
        ddtw_acc[...] = jnp.zeros_like(ddtw_acc)
        dA_acc[...] = jnp.zeros_like(dA_acc)
        dbias_acc[...] = jnp.zeros_like(dbias_acc)
        dD_acc[...] = jnp.zeros_like(dD_acc)

    x32 = x_ref[0].astype(_F32)
    dy = dy_ref[0].astype(_F32)
    x_in = xin_ref[0, 0].astype(_F32)
    A = A_ref[0].astype(_F32)
    Dsk = Dskip_ref[0].astype(_F32)
    dtw = dtw_ref[0].astype(_F32)

    dtr, Bv, Cv, dt_raw = _project(x32, Wdt_ref, WB_ref, WC_ref, dtw_ref,
                                   bias_ref)
    dt = jax.nn.softplus(dt_raw)
    sig = jax.nn.sigmoid(dt_raw)

    nb = T // S
    N, Dm = A.shape
    a, xloc, aruns, e_b, _ = _scan_chunk(x32, dt, A, Bv, x_in, T, S)
    a_flat = a.reshape(T, N, Dm)

    # reverse adjoint (two-level suffix)
    ah_flat = jnp.concatenate([a_flat[1:], jnp.ones_like(a_flat[:1])], axis=0)
    ah = ah_flat.reshape(nb, S, N, Dm)
    C4 = Cv.reshape(nb, S, N)
    dy4 = dy.reshape(nb, S, Dm)
    d4 = C4[..., None] * dy4[:, :, None, :]
    gacc, ga = d4[:, S - 1], ah[:, S - 1]
    gloc, gruns = [gacc], [ga]
    for s in range(S - 2, -1, -1):
        gacc = d4[:, s] + ah[:, s] * gacc
        ga = ah[:, s] * ga
        gloc.append(gacc)
        gruns.append(ga)
    sa, sb = _block_suffix(ga, gacc, nb)
    cin = g_carry[...][None]
    e_g = jnp.concatenate([sb[1:] + sa[1:] * cin, cin], axis=0)
    g_carry[...] = a_flat[0] * (sb[0] + sa[0] * cin[0])

    for s in range(S):
        x_scr[:, s] = xloc[s] + aruns[s] * e_b
        g_scr[:, s] = gloc[S - 1 - s] + gruns[S - 1 - s] * e_g
    x = x_scr[...].reshape(T, N, Dm)
    g = g_scr[...].reshape(T, N, Dm)
    x_prev = jnp.concatenate([x_in[None], x[:T - 1]], axis=0)

    gB = jnp.sum(g * Bv[:, :, None], axis=1)             # [T, Dm]
    du = dt * gB + Dsk * dy
    g_ax = g * a_flat * x_prev
    ddt_raw = sig * (jnp.sum(g_ax * A[None], axis=1) + gB * x32)
    dB_blk = jnp.sum(g * (dt * x32)[:, None, :], axis=2)  # [T, N]
    dC_blk = jnp.sum(dy[:, None, :] * x, axis=2)          # [T, N]

    # fold projection chain: dx = du + d_dtr@Wdt + dB@WB + dC@WC
    d_dtr = _dot(ddt_raw, dtw)                            # [T, R]
    dx = (du
          + _dot(d_dtr, Wdt_ref[0].astype(_F32))
          + _dot(dB_blk, WB_ref[0].astype(_F32))
          + _dot(dC_blk, WC_ref[0].astype(_F32)))
    dx_ref[0] = dx.astype(dx_ref.dtype)

    # weight-grad partials (accumulated across chunks in VMEM)
    dWdt_acc[0] += _dot(d_dtr, x32, ta=True)              # [R, Dm]
    dWB_acc[0] += _dot(dB_blk, x32, ta=True)              # [N, Dm]
    dWC_acc[0] += _dot(dC_blk, x32, ta=True)
    ddtw_acc[0] += _dot(ddt_raw, dtr, ta=True)            # [Dm, R]
    dA_acc[...] += jnp.sum(g_ax * dt[:, None, :], axis=0)
    dbias_acc[0] += jnp.sum(ddt_raw, axis=0)
    dD_acc[0] += jnp.sum(dy * x32, axis=0)

    dWdt_ref[0] = dWdt_acc[0]
    dWB_ref[0] = dWB_acc[0]
    dWC_ref[0] = dWC_acc[0]
    ddtw_ref[0] = ddtw_acc[0]
    dA_ref[0] = dA_acc[...]
    dbias_ref[0, 0] = dbias_acc[0]
    dD_ref[0, 0] = dD_acc[0]


def _tiles_fused(L: int, Dm: int, N: int):
    """(T, S) with the whole Dm in one tile; None when it can't fit."""
    if Dm > 512:
        return None
    n_chunks = -(-L // 128)
    T = -(-L // n_chunks)
    T = min(128, ((T + 15) // 16) * 16)
    while T > 16 and 8 * T * N * Dm * 4 > 9 * 1024 * 1024:
        T = ((T // 2 + 15) // 16) * 16
    if T % 16 and T % 8:
        return None
    S = 16 if T % 16 == 0 else 8
    return T, S


def fused_supported(L: int, Dm: int, N: int) -> bool:
    return (_PALLAS_OK and jax.default_backend() == "tpu"
            and _tiles_fused(L, Dm, N) is not None)


def _specs_common(K, T, Dm, N, R, rev=None):
    if rev is None:
        idx_l = lambda g, l: (g, l, 0)
    else:
        idx_l = lambda g, l: (g, rev(l), 0)
    return [
        pl.BlockSpec((1, T, Dm), idx_l, memory_space=pltpu.VMEM),    # x
        pl.BlockSpec((1, R, Dm), lambda g, l: (g % K, 0, 0),
                     memory_space=pltpu.VMEM),                       # Wdt
        pl.BlockSpec((1, N, Dm), lambda g, l: (g % K, 0, 0),
                     memory_space=pltpu.VMEM),                       # WB
        pl.BlockSpec((1, N, Dm), lambda g, l: (g % K, 0, 0),
                     memory_space=pltpu.VMEM),                       # WC
        pl.BlockSpec((1, Dm, R), lambda g, l: (g % K, 0, 0),
                     memory_space=pltpu.VMEM),                       # dtw
        pl.BlockSpec((1, 1, Dm), lambda g, l: (g % K, 0, 0),
                     memory_space=pltpu.VMEM),                       # bias
        pl.BlockSpec((1, N, Dm), lambda g, l: (g % K, 0, 0),
                     memory_space=pltpu.VMEM),                       # A
        pl.BlockSpec((1, 1, Dm), lambda g, l: (g % K, 0, 0),
                     memory_space=pltpu.VMEM),                       # Dskip
    ]


def _fwd(x, Wdt, WB, WC, dtw, A, Dskip, bias, T, S):
    G, L, Dm = x.shape
    K, R, _ = Wdt.shape
    N = A.shape[2]
    pad = (-L) % T
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    Lp = L + pad
    nT = Lp // T
    At = jnp.swapaxes(A, 1, 2)                           # [K, N, Dm]
    nb = T // S

    kernel = functools.partial(_fwd_kernel, T=T, S=S)
    y, xsave = pl.pallas_call(
        kernel,
        grid=(G, nT),
        in_specs=_specs_common(K, T, Dm, N, R),
        out_specs=[
            pl.BlockSpec((1, T, Dm), lambda g, l: (g, l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, Dm), lambda g, l: (g, l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Lp, Dm), x.dtype),
            jax.ShapeDtypeStruct((G, nT, N, Dm), _F32),
        ],
        scratch_shapes=[pltpu.VMEM((N, Dm), _F32),
                        pltpu.VMEM((nb, S, Dm), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(x, Wdt, WB, WC, dtw, bias[:, None, :], At, Dskip[:, None, :])
    return y[:, :L], xsave


def _bwd(x, Wdt, WB, WC, dtw, A, Dskip, bias, xsave, dy, T, S):
    G, L, Dm = x.shape
    K, R, _ = Wdt.shape
    N = A.shape[2]
    pad = (-L) % T
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        dy = jnp.pad(dy, ((0, 0), (0, pad), (0, 0)))
    Lp = L + pad
    nT = Lp // T
    At = jnp.swapaxes(A, 1, 2)
    nb = T // S
    rev = lambda l: nT - 1 - l

    in_specs = _specs_common(K, T, Dm, N, R, rev=rev) + [
        pl.BlockSpec((1, 1, N, Dm), lambda g, l: (g, rev(l), 0, 0),
                     memory_space=pltpu.VMEM),           # xsave
        pl.BlockSpec((1, T, Dm), lambda g, l: (g, rev(l), 0),
                     memory_space=pltpu.VMEM),           # dy
    ]
    kernel = functools.partial(_bwd_kernel, T=T, S=S)
    outs = pl.pallas_call(
        kernel,
        grid=(G, nT),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, T, Dm), lambda g, l: (g, rev(l), 0),
                         memory_space=pltpu.VMEM),       # dx
            pl.BlockSpec((1, R, Dm), lambda g, l: (g, 0, 0),
                         memory_space=pltpu.VMEM),       # dWdt partial
            pl.BlockSpec((1, N, Dm), lambda g, l: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dm), lambda g, l: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dm, R), lambda g, l: (g, 0, 0),
                         memory_space=pltpu.VMEM),       # ddtw partial
            pl.BlockSpec((1, N, Dm), lambda g, l: (g, 0, 0),
                         memory_space=pltpu.VMEM),       # dA partial
            pl.BlockSpec((1, 1, Dm), lambda g, l: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dm), lambda g, l: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Lp, Dm), x.dtype),
            jax.ShapeDtypeStruct((G, R, Dm), _F32),
            jax.ShapeDtypeStruct((G, N, Dm), _F32),
            jax.ShapeDtypeStruct((G, N, Dm), _F32),
            jax.ShapeDtypeStruct((G, Dm, R), _F32),
            jax.ShapeDtypeStruct((G, N, Dm), _F32),
            jax.ShapeDtypeStruct((G, 1, Dm), _F32),
            jax.ShapeDtypeStruct((G, 1, Dm), _F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, Dm), _F32),                   # g carry
            pltpu.VMEM((1, R, Dm), _F32),                # dWdt acc
            pltpu.VMEM((1, N, Dm), _F32),
            pltpu.VMEM((1, N, Dm), _F32),
            pltpu.VMEM((1, Dm, R), _F32),                # ddtw acc
            pltpu.VMEM((N, Dm), _F32),                   # dA acc
            pltpu.VMEM((1, Dm), _F32),                   # dbias acc
            pltpu.VMEM((1, Dm), _F32),                   # dD acc
            pltpu.VMEM((nb, S, N, Dm), _F32),            # x rows
            pltpu.VMEM((nb, S, N, Dm), _F32),            # g rows
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(x, Wdt, WB, WC, dtw, bias[:, None, :], At, Dskip[:, None, :], xsave, dy)

    dx, dWdt_p, dWB_p, dWC_p, ddtw_p, dA_p, dbias_p, dD_p = outs
    dx = dx[:, :L]
    batch = G // K

    def red(p):                                          # [G, ...] -> [K, ...]
        return p.reshape((batch, K) + p.shape[1:]).sum(0)

    dWdt = red(dWdt_p)
    dWB = red(dWB_p)
    dWC = red(dWC_p)
    ddtw = red(ddtw_p)
    dA = jnp.swapaxes(red(dA_p), 1, 2)                   # [K, Dm, N]
    dbias = red(dbias_p)[:, 0]
    dD = red(dD_p)[:, 0]
    return dx, dWdt, dWB, dWC, ddtw, dA, dD, dbias


@jax.custom_vjp
def ss2d_scan_fused(x, Wdt, WB, WC, dtw, A, Dskip, bias):
    G, L, Dm = x.shape
    T, S = _tiles_fused(L, Dm, A.shape[2])
    return _fwd(x, Wdt, WB, WC, dtw, A, Dskip, bias, T, S)[0]


def _vjp_fwd(x, Wdt, WB, WC, dtw, A, Dskip, bias):
    G, L, Dm = x.shape
    T, S = _tiles_fused(L, Dm, A.shape[2])
    y, xsave = _fwd(x, Wdt, WB, WC, dtw, A, Dskip, bias, T, S)
    return y, (x, Wdt, WB, WC, dtw, A, Dskip, bias, xsave)


def _vjp_bwd(res, dy):
    x, Wdt, WB, WC, dtw, A, Dskip, bias, xsave = res
    G, L, Dm = x.shape
    T, S = _tiles_fused(L, Dm, A.shape[2])
    dx, dWdt, dWB, dWC, ddtw, dA, dD, dbias = _bwd(
        x, Wdt, WB, WC, dtw, A, Dskip, bias, xsave, dy, T, S)
    return (dx.astype(x.dtype), dWdt.astype(Wdt.dtype), dWB.astype(WB.dtype),
            dWC.astype(WC.dtype), ddtw.astype(dtw.dtype), dA.astype(A.dtype),
            dD.astype(Dskip.dtype), dbias.astype(bias.dtype))


ss2d_scan_fused.defvjp(_vjp_fwd, _vjp_bwd)
