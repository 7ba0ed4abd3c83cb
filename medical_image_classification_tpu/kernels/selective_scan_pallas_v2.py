"""Work-efficient two-level Pallas selective-scan forward (v2).

The v1 kernel's Hillis-Steele doubling scan costs ~3*log2(T) VPU ops per
element plus shift copies.  v2 is Blelloch-style work-efficient: the chunk
is viewed as [nb, S, N, D] sub-blocks; a *sequential* in-sub-block pass
(python-unrolled, each element touched once — ~3 ops/elem) produces local
states and running decays, sub-block totals are combined with a tiny
doubling scan over nb (1/S of the data), and one fused correction applies
the sub-block prefixes.  ~3x less VPU work per element than v1.

Outputs y and per-chunk incoming states (same contract as v1, so the v1
backward kernel applies unchanged).
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
# dim-0 (sequence x d-tile) grid semantics: carry-free, so "parallel" lets
# Mosaic pipeline across sequence boundaries.  Module-level so perf sweeps
# can A/B it.
_DIM0_SEMANTICS = "parallel"


def _scan_kernel_v2(u_ref, dt_ref, A_ref, B_ref, C_ref, bias_ref, Dskip_ref,
                    *refs, T: int, S: int,
                    reverse: bool = False, softplus: bool = True,
                    want_state: bool = False, L_total: int = 0,
                    nT_total: int = 0, has_init: bool = False):
    """One (sequence, L-chunk) grid step.

    ``reverse=True`` scans the sequence back-to-front (x_t = a_t x_{t+1} +
    b_t): the caller's index maps feed chunks last-to-first, the in-sub-block
    pass runs S-1..0, the cross-block combine is a suffix scan, and the
    carried state flows right-to-left.  This lets flipped scan directions
    run over UNFLIPPED memory — no jnp.flip copies anywhere (the reference
    materialises flipped tensors instead, `MedMamba.py:394-395`)."""
    if has_init:
        init_ref = refs[0]
        refs = refs[1:]
    if want_state:
        y_ref, xsave_ref, state_out_ref, state, y_scr = refs
    else:
        y_ref, xsave_ref, state, y_scr = refs
    lc = pl.program_id(1)

    @pl.when(lc == 0)
    def _():
        if has_init:
            # seed the scan from a caller-provided state (SP pass-2 rescan
            # / chunked prefill); the xsave write below then records it as
            # the first chunk's incoming state, so the backward recompute
            # needs no special casing
            state[...] = init_ref[0].astype(jnp.float32)
        else:
            state[...] = jnp.zeros_like(state)

    # NB r4 measured dead end: saving the SUB-BLOCK seeds e_b here (so the
    # backward skips its state-recompute totals pass) cut bwd kernel time
    # 35.7 -> 34.5 ms/step on MedMamba b32, but the extra HBM stream came
    # back as +1.2-1.9 ms of copy/async traffic — net WORSE (69.4 -> 70.0
    # traced, bf16 seeds; 70.25 fp32).  Chunk-state save + bwd recompute
    # stays.
    xsave_ref[0, 0] = state[...]
    u = u_ref[0].astype(jnp.float32)                    # [T, Dt]
    dt = dt_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if softplus:
        dt = jax.nn.softplus(dt)
    if want_state or has_init:
        # L-padding must not touch the returned final state / the injected
        # initial state: dt=0 there makes the pad decay exp(0*A)=1 and the
        # pad injection 0 (u and B are zero-padded anyway).  softplus(0 +
        # bias) != 0 would otherwise decay the state through the pad
        # region (forward-scan final state; reverse-scan initial state).
        ci = (nT_total - 1 - lc) if reverse else lc     # chunk index in L
        pos = ci * T + jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        dt = jnp.where(pos < L_total, dt, 0.0)
    A = A_ref[0].astype(jnp.float32)                    # [N, Dt]
    # B/C arrive as [T, N] blocks (N-minor).  XLA pays an 8x lane-padded
    # relayout copy to produce this from the L-minor projection outputs
    # (~4 ms/step visible as 'data formatting'), but the L-minor
    # alternative — [N, T] operands transposed IN-kernel — measured far
    # worse: Mosaic lowers the per-chunk [N, T] -> [T, N] transpose to
    # serialized lane shuffles on the critical path (s0 fwd+bwd 12.9 ->
    # 16.4 ms, whole step 449 -> 399 img/s).  Measured A/B on v5e r2.
    Bv = B_ref[0].astype(jnp.float32)                   # [T, N]
    Cv = C_ref[0].astype(jnp.float32)

    nb = T // S
    N, Dt = A.shape
    dt4 = dt.reshape(nb, S, Dt)
    a = jnp.exp(dt[:, None, :] * A[None]).reshape(nb, S, N, Dt)
    b = ((dt * u)[:, None, :] * Bv[:, :, None]).reshape(nb, S, N, Dt)
    C4 = Cv.reshape(nb, S, N)

    # pass 1 — sub-block totals only.  The decay total needs no per-element
    # running product: prod_s exp(dt_s A) = exp((sum_s dt_s) A), one small
    # [nb, N, Dt] exp instead of S-1 full-tensor multiplies.
    order = range(S - 1, -1, -1) if reverse else range(S)
    order = list(order)
    s0 = order[0]
    acc_b = b[:, s0]                                    # [nb, N, Dt]
    for s in order[1:]:
        acc_b = a[:, s] * acc_b + b[:, s]
    tot_b = acc_b
    tot_a = jnp.exp(jnp.sum(dt4, axis=1)[:, None, :] * A[None])

    # inclusive doubling scan over the nb sub-block totals (tiny)
    pa, pb = tot_a, tot_b
    off = 1
    while off < nb:
        if reverse:
            a_sh = jnp.concatenate([pa[off:], jnp.ones_like(pa[:off])], axis=0)
            b_sh = jnp.concatenate([pb[off:], jnp.zeros_like(pb[:off])], axis=0)
            pb = pb + pa * b_sh
            pa = pa * a_sh
        else:
            a_sh = jnp.concatenate([jnp.ones_like(pa[:off]), pa[:-off]], axis=0)
            b_sh = jnp.concatenate([jnp.zeros_like(pb[:off]), pb[:-off]], axis=0)
            pb = pa * b_sh + pb
            pa = pa * a_sh
        off *= 2
    # exclusive prefix/suffix per sub-block + chunk-incoming state folded in
    st = state[...][None]                               # [1, N, Dt]
    if reverse:
        e_b = jnp.concatenate([pb[1:] + pa[1:] * st, st], axis=0)
        carry = pb[0] + pa[0] * state[...]
    else:
        e_b = jnp.concatenate([st, pb[:-1] + pa[:-1] * st], axis=0)
        carry = pb[nb - 1] + pa[nb - 1] * state[...]

    # pass 2 — seeded re-scan: x_t = a_t x_prev + b_t from the sub-block
    # seeds e_b emits final states directly (one less VPU op per element
    # than the old local-state + running-decay correction, and no S-entry
    # dict of [nb, N, Dt] intermediates competing for VMEM).
    # (middle-axis stack does not lower on Mosaic; write rows via scratch)
    x_s = e_b
    for s in order:
        x_s = a[:, s] * x_s + b[:, s]
        y_scr[:, s] = jnp.sum(C4[:, s][:, :, None] * x_s, axis=1)
    y = y_scr[...].reshape(T, Dt) + u * Dskip_ref[0].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)
    state[...] = carry
    if want_state:
        # last grid step's write (the final chunk in scan order) is the
        # sequence's final state
        state_out_ref[0] = carry


def fwd_folded_v2(u, delta, A, B, C, Dskip, bias, T: int, Dt: int,
                  S: int = 16, reverse: bool = False, softplus: bool = True,
                  want_state: bool = False, init=None):
    G, L, Dm = u.shape
    K = A.shape[0]
    N = A.shape[2]
    nD = Dm // Dt
    At = jnp.swapaxes(A, 1, 2)

    pad = (-L) % T
    if pad:
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, pad), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0)))
    Lp = L + pad

    nT = Lp // T
    grid = (G * nD, nT)
    seq = lambda i: i // nD
    dtile = lambda i: i % nD
    # reverse scans walk the L-chunks last-to-first (the in-chunk suffix
    # scan handles within-chunk order); same maps feed fwd and rev kernels.
    lmap = (lambda l: nT - 1 - l) if reverse else (lambda l: l)

    kernel = functools.partial(_scan_kernel_v2, T=T, S=S, reverse=reverse,
                               softplus=softplus, want_state=want_state,
                               L_total=L, nT_total=nT,
                               has_init=init is not None)
    out_specs = [
        pl.BlockSpec((1, T, Dt), lambda i, l: (seq(i), lmap(l), dtile(i)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, N, Dt),
                     lambda i, l: (seq(i), lmap(l), 0, dtile(i)),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((G, Lp, Dm), u.dtype),
        jax.ShapeDtypeStruct((G, Lp // T, N, Dm), jnp.float32),
    ]
    if want_state:
        out_specs.append(pl.BlockSpec(
            (1, N, Dt), lambda i, l: (seq(i), 0, dtile(i)),
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((G, N, Dm), jnp.float32))
    in_specs = [
        pl.BlockSpec((1, T, Dt), lambda i, l: (seq(i), lmap(l), dtile(i)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, Dt), lambda i, l: (seq(i), lmap(l), dtile(i)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, Dt), lambda i, l: (seq(i) % K, 0, dtile(i)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, N), lambda i, l: (seq(i), lmap(l), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, N), lambda i, l: (seq(i), lmap(l), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Dt), lambda i, l: (seq(i) % K, 0, dtile(i)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Dt), lambda i, l: (seq(i) % K, 0, dtile(i)),
                     memory_space=pltpu.VMEM),
    ]
    operands = [u, delta, At, B, C, bias[:, None, :], Dskip[:, None, :]]
    if init is not None:
        in_specs.append(pl.BlockSpec(
            (1, N, Dt), lambda i, l: (seq(i), 0, dtile(i)),
            memory_space=pltpu.VMEM))
        operands.append(init)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((N, Dt), jnp.float32),
                        pltpu.VMEM((T // S, S, Dt), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # only the L-chunk walk (dim 1) is order-dependent (state carry)
            dimension_semantics=(_DIM0_SEMANTICS, "arbitrary")),
        interpret=_INTERPRET,
    )(*operands)
    if want_state:
        y, xsave, last = outs
        return y[:, :L], xsave, last
    y, xsave = outs
    return y[:, :L], xsave
