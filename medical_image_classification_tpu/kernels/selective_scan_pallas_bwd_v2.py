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
# see selective_scan_pallas_v2._DIM0_SEMANTICS
_DIM0_SEMANTICS = "parallel"


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
                   xin_ref, dy_ref, *refs,
                   T: int, S: int, nT: int, Dt: int,
                   reverse: bool = False, softplus: bool = True,
                   has_dlast: bool = False, L_total: int = 0,
                   want_dinit: bool = False):
    """Backward for one chunk.  ``reverse=True`` is the adjoint of a
    REVERSE forward scan (x_t = a_t x_{t+1} + b_t): the grid walks chunks
    first-to-last, the state recompute is a suffix pass seeded from the
    right-incoming saved states, and the adjoint recurrence g_t = C_t dy_t
    + a_{t-1} g_{t-1} runs forward in time — the exact mirror image of the
    default (forward-scan) case."""
    if has_dlast:
        dlast_ref = refs[0]
        refs = refs[1:]
    if want_dinit:
        (du_ref, ddelta_ref, dB_ref, dC_ref, dA_ref, dbias_ref, dD_ref,
         dinit_ref, g_carry, dA_acc, dbias_acc, dD_acc, x_scr, g_scr,
         dB_acc, dC_acc) = refs
    else:
        (du_ref, ddelta_ref, dB_ref, dC_ref, dA_ref, dbias_ref, dD_ref,
         g_carry, dA_acc, dbias_acc, dD_acc, x_scr, g_scr,
         dB_acc, dC_acc) = refs
    lidx = pl.program_id(1)
    dtile = pl.program_id(2)
    first = lidx == 0

    @pl.when(first)
    def _():
        if has_dlast:
            # cotangent of the returned final state seeds the adjoint: it
            # reaches the last position with factor 1 (the combine chain
            # applies the a factors for earlier positions)
            g_carry[dtile] = dlast_ref[0].astype(jnp.float32)
        else:
            g_carry[dtile] = jnp.zeros_like(g_carry[dtile])
        dA_acc[dtile] = jnp.zeros_like(dA_acc[dtile])
        dbias_acc[dtile] = jnp.zeros_like(dbias_acc[dtile])
        dD_acc[dtile] = jnp.zeros_like(dD_acc[dtile])

    u_f = u_ref[0].astype(jnp.float32)                      # [T, Dt]
    dt_raw = dt_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if softplus:
        dt_f = jax.nn.softplus(dt_raw)
        sig_f = jax.nn.sigmoid(dt_raw)
    else:
        dt_f = dt_raw
        sig_f = jnp.ones_like(dt_raw)
    if has_dlast or want_dinit:
        # mirror the forward's want_state/has_init pad handling: dt=0 on
        # pad rows so the dlast adjoint / initial state propagates with
        # decay 1 and pad rows contribute nothing to dt/A/bias gradients
        ci = lidx if reverse else (nT - 1 - lidx)
        pos = ci * T + jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        inb = pos < L_total
        dt_f = jnp.where(inb, dt_f, 0.0)
        sig_f = jnp.where(inb, sig_f, 0.0)
    A = A_ref[0].astype(jnp.float32)                        # [N, Dt]
    # [T, N] operands (see the forward kernel note: in-kernel [N, T] -> [T, N]
    # transposes measured slower than XLA's padded relayout copies)
    Bv_f = B_ref[0].astype(jnp.float32)                     # [T, N]
    Cv_f = C_ref[0].astype(jnp.float32)
    dy_f = dy_ref[0].astype(jnp.float32)
    x_in = xin_ref[0, 0].astype(jnp.float32)                # [N, Dt]
    Dsk = Dskip_ref[0].astype(jnp.float32)                  # [1, Dt]

    nb = T // S
    N = A.shape[0]
    a_flat = jnp.exp(dt_f[:, None, :] * A[None])            # [T, N, Dt]
    b_flat = (dt_f * u_f)[:, None, :] * Bv_f[:, :, None]

    a = a_flat.reshape(nb, S, N, Dt)
    b = b_flat.reshape(nb, S, N, Dt)
    C4 = Cv_f.reshape(nb, S, N)
    dy4 = dy_f.reshape(nb, S, Dt)
    dt4 = dt_f.reshape(nb, S, Dt)

    # adjoint multiplier â at block position s: a of the time-NEIGHBOUR
    # (t+1 for forward scans, t-1 for reverse ones); across block edges it
    # shifts along nb, with 1 at the chunk edge (the cross-chunk carry is
    # pre-multiplied when stored).  Indexing a[:, s±1] directly avoids the
    # old whole-chunk shifted copy of a.
    one_blk = jnp.ones((1, N, Dt), jnp.float32)
    if reverse:
        edge = jnp.concatenate([one_blk, a[:-1, S - 1]], axis=0)  # â at s=0
        ah_at = lambda s: a[:, s - 1] if s > 0 else edge
    else:
        edge = jnp.concatenate([a[1:, 0], one_blk], axis=0)  # â at s=S-1
        ah_at = lambda s: a[:, s + 1] if s < S - 1 else edge

    # ---- state recompute (two-level; prefix for fwd scans, suffix for
    # reverse scans, seeded from the saved incoming chunk state).
    # Pass 1 computes sub-block totals ONLY: the decay total needs no
    # per-element running product (prod_s exp(dt_s A) = exp((sum_s dt_s) A),
    # one small [nb, N, Dt] exp); pass 2 below re-scans seeded from e_b and
    # emits final rows directly — one less VPU op per element than the old
    # local-state + running-decay correction, and no S-entry dicts of
    # [nb, N, Dt] intermediates competing for VMEM.
    # NB r4 measured dead end: saving e_b itself from the forward (skipping
    # this pass) cut bwd compute ~1.2 ms/step at MedMamba b32 but the e_b
    # HBM stream cost MORE in copy/async traffic — net 69.4 -> 70.0 ms.
    x_order = list(range(S - 1, -1, -1)) if reverse else list(range(S))
    s0 = x_order[0]
    acc_b = b[:, s0]
    for s in x_order[1:]:
        acc_b = a[:, s] * acc_b + b[:, s]
    tot_a = jnp.exp(jnp.sum(dt4, axis=1)[:, None, :] * A[None])
    st = x_in[None]
    if reverse:
        pa, pb = _block_suffix(tot_a, acc_b, nb)
        e_b = jnp.concatenate([pb[1:] + pa[1:] * st, st], axis=0)
    else:
        pa, pb = _block_prefix(tot_a, acc_b, nb)
        e_b = jnp.concatenate([st, pb[:-1] + pa[:-1] * st], axis=0)

    # ---- adjoint (two-level, opposite direction to the forward scan) ----
    d4 = (C4[..., None] * dy4[:, :, None, :])               # [nb, S, N, Dt]
    g_order = list(range(S)) if reverse else list(range(S - 1, -1, -1))
    t0 = g_order[0]
    gacc = d4[:, t0]
    for s in g_order[1:]:
        gacc = d4[:, s] + ah_at(s) * gacc
    # adjoint-decay block total = prod of NEIGHBOUR a's over the block —
    # again one exp of a shifted-window dt sum instead of a running product.
    # Window: all in-block neighbour positions plus the first element of the
    # next block in adjoint order (0 at the chunk-edge block, where the
    # multiplier is 1 because the cross-chunk carry is pre-multiplied).
    zrow = jnp.zeros_like(dt4[:1, 0])
    if reverse:
        wsum = (jnp.sum(dt4[:, :S - 1], axis=1)
                + jnp.concatenate([zrow, dt4[:-1, S - 1]], axis=0))
    else:
        wsum = (jnp.sum(dt4[:, 1:], axis=1)
                + jnp.concatenate([dt4[1:, 0], zrow], axis=0))
    ga = jnp.exp(wsum[:, None, :] * A[None])                # [nb, N, Dt]
    cin = g_carry[dtile][None]                              # [1, N, Dt]
    if reverse:
        sa, sb = _block_prefix(ga, gacc, nb)
        # incoming from the EARLIER chunk (grid walks forward)
        e_g = jnp.concatenate([cin, sb[:-1] + sa[:-1] * cin], axis=0)
        g_carry[dtile] = a_flat[T - 1] * (sb[nb - 1] + sa[nb - 1] * cin[0])
    else:
        sa, sb = _block_suffix(ga, gacc, nb)
        # incoming from the LATER chunk (grid walks backward)
        e_g = jnp.concatenate([sb[1:] + sa[1:] * cin, cin], axis=0)
        g_carry[dtile] = a_flat[0] * (sb[0] + sa[0] * cin[0])
    if want_dinit:
        # after the LAST grid step the carry is exactly the adjoint of the
        # injected initial state: a_0 * g_0 for forward scans, a_{L-1} *
        # g_{L-1} for reverse ones (pad rows pass it through with decay 1)
        @pl.when(lidx == nT - 1)
        def _():
            dinit_ref[0] = g_carry[dtile]
    # NOTE e_g[j] = adjoint entering block j from the blocks already walked
    # plus the cross-chunk carry; g[:, s] = gloc[s] + gruns[s] * e_g

    # ---- materialise full x and g via scratch (normalises layouts:
    # Mosaic cannot reduce over offset-layout slices of 4D values) with
    # SEEDED re-scans from the sub-block boundary values, then whole-chunk
    # vectorised gradient expressions.  NB a fused per-block gradient loop
    # was tried and measured SLOWER (stage2 fwd+bwd 2.95 -> 4.34 ms):
    # 16 small [nb,N,Dt] passes vectorise worse than a few big [T,N,Dt]
    # ones, and the per-s lane reductions add relayouts.
    xv = e_b                                                # [nb, N, Dt]
    for s in x_order:
        xv = a[:, s] * xv + b[:, s]
        x_scr[:, s] = xv
    gv = e_g
    for s in g_order:
        gv = d4[:, s] + ah_at(s) * gv
        g_scr[:, s] = gv

    x = x_scr[...].reshape(T, N, Dt)
    g = g_scr[...].reshape(T, N, Dt)

    # ---- gradients (whole-chunk expressions) ----
    gB = jnp.sum(g * Bv_f[:, :, None], axis=1)              # [T, Dt]
    du = dt_f * gB + Dsk * dy_f
    # a_t * x_{neighbour} = x_t - b_t straight from the recurrence (both
    # directions) — saves the shifted x_prev copy and the a reshape
    g_ax = g * (x - b_flat)
    ddt = jnp.sum(g_ax * A[None], axis=1) + gB * u_f
    ddelta = sig_f * ddt
    # write in the output dtype (input dtype in bf16 training): the values
    # are cast to the primal dtype downstream anyway, and writing bf16 here
    # halves the two biggest HBM stores + skips an XLA cast pass
    du_ref[0] = du.astype(du_ref.dtype)
    ddelta_ref[0] = ddelta.astype(ddelta_ref.dtype)

    # NB a dB/dC lane-reduce via MXU ones-matmul was tried and measured
    # slower (s0 fwd+bwd 18.1 vs 16.4 ms): the matmul serialises behind the
    # product materialisation instead of overlapping the VPU passes.
    dB_blk = jnp.sum(g * (dt_f * u_f)[:, None, :], axis=2)  # [T, N]
    dC_blk = jnp.sum(dy_f[:, None, :] * x, axis=2)
    dA_acc[dtile] += jnp.sum(g_ax * dt_f[:, None, :], axis=0)
    dbias_acc[dtile, 0] += jnp.sum(ddelta, axis=0)
    dD_acc[dtile, 0] += jnp.sum(dy_f * u_f, axis=0)

    # dB/dC accumulate over d-tiles in fp32 VMEM scratch; ONE write to the
    # output ref in the OUTPUT dtype at the last d-tile (bf16 in bf16
    # training: halves the two [G, L, N] stores and kills the downstream
    # fp32->bf16 convert pass that showed up in the step trace)
    nD_total = pl.num_programs(2)

    @pl.when(dtile == 0)
    def _():
        dB_acc[...] = dB_blk
        dC_acc[...] = dC_blk

    @pl.when(dtile != 0)
    def _():
        dB_acc[...] += dB_blk
        dC_acc[...] += dC_blk

    @pl.when(dtile == nD_total - 1)
    def _():
        dB_ref[0] = dB_acc[...].astype(dB_ref.dtype)
        dC_ref[0] = dC_acc[...].astype(dC_ref.dtype)

    dA_ref[0] = dA_acc[dtile]
    dbias_ref[0, 0] = dbias_acc[dtile, 0]
    dD_ref[0, 0] = dD_acc[dtile, 0]


def bwd_folded_v2(u, delta, A, B, C, Dskip, bias, xsave, dy, T: int, Dt: int,
                  S: int = 16, reverse: bool = False, softplus: bool = True,
                  dlast=None, want_dinit: bool = False):
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
    # forward-scan adjoint walks chunks last-to-first; reverse-scan adjoint
    # walks first-to-last (mirrors the forward kernel's chunk order)
    rev = (lambda l: l) if reverse else (lambda l: nT - 1 - l)

    kernel = functools.partial(_bwd_kernel_v2, T=T, S=S, nT=nT, Dt=Dt,
                               reverse=reverse, softplus=softplus,
                               has_dlast=dlast is not None, L_total=L,
                               want_dinit=want_dinit)
    in_specs = [
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
    ]
    operands = [u, delta, At, B, C, bias[:, None, :], Dskip[:, None, :],
                xsave, dy]
    if dlast is not None:
        in_specs.append(pl.BlockSpec((1, N, Dt), lambda g, l, d: (g, 0, d),
                                     memory_space=pltpu.VMEM))
        operands.append(dlast)
    out_specs = [
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
    ]
    out_shape = [
        jax.ShapeDtypeStruct((G, Lp, Dm), u.dtype),
        jax.ShapeDtypeStruct((G, Lp, Dm), delta.dtype),
        jax.ShapeDtypeStruct((G, Lp, N), B.dtype),
        jax.ShapeDtypeStruct((G, Lp, N), C.dtype),
        jax.ShapeDtypeStruct((G, N, Dm), jnp.float32),
        jax.ShapeDtypeStruct((G, 1, Dm), jnp.float32),
        jax.ShapeDtypeStruct((G, 1, Dm), jnp.float32),
    ]
    if want_dinit:
        out_specs.append(pl.BlockSpec((1, N, Dt), lambda g, l, d: (g, 0, d),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((G, N, Dm), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nD, N, Dt), jnp.float32),            # g carry
            pltpu.VMEM((nD, N, Dt), jnp.float32),            # dA acc
            pltpu.VMEM((nD, 1, Dt), jnp.float32),            # dbias acc
            pltpu.VMEM((nD, 1, Dt), jnp.float32),            # dD acc
            pltpu.VMEM((nb, S, N, Dt), jnp.float32),         # x rows
            pltpu.VMEM((nb, S, N, Dt), jnp.float32),         # g rows
            pltpu.VMEM((T, N), jnp.float32),                 # dB acc
            pltpu.VMEM((T, N), jnp.float32),                 # dC acc
        ],
        compiler_params=pltpu.CompilerParams(
            # sequences (dim 0) are carry-free: scratch accumulators reset at
            # lidx==0, so Mosaic may pipeline across them.  The chunk walk
            # (dim 1) and the d-tile accumulation (dim 2, dB/dC revisiting)
            # stay order-dependent.
            dimension_semantics=(_DIM0_SEMANTICS, "arbitrary", "arbitrary")),
        interpret=_INTERPRET,
    )(*operands)

    if want_dinit:
        (du, ddelta, dB, dC, dA_part, dbias_part, dD_part, dinit) = outs
    else:
        du, ddelta, dB, dC, dA_part, dbias_part, dD_part = outs
        dinit = None
    du = du[:, :L]
    ddelta = ddelta[:, :L]
    dB = dB[:, :L]
    dC = dC[:, :L]
    batch = G // K
    dA = jnp.swapaxes(dA_part.reshape(batch, K, N, Dm).sum(0), 1, 2)
    dbias = dbias_part.reshape(batch, K, Dm).sum(0)
    dD = dD_part.reshape(batch, K, Dm).sum(0)
    if want_dinit:
        return du, ddelta, dA, dB, dC, dD, dbias, dinit
    return du, ddelta, dA, dB, dC, dD, dbias
