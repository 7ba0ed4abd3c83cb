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


def _scan_kernel_v2(u_ref, dt_ref, A_ref, B_ref, C_ref, bias_ref, Dskip_ref,
                    y_ref, xsave_ref, state, y_scr, *, T: int, S: int):
    lc = pl.program_id(1)

    @pl.when(lc == 0)
    def _():
        state[...] = jnp.zeros_like(state)

    xsave_ref[0, 0] = state[...]
    u = u_ref[0].astype(jnp.float32)                    # [T, Dt]
    dt = jax.nn.softplus(dt_ref[0].astype(jnp.float32)
                         + bias_ref[0].astype(jnp.float32))
    A = A_ref[0].astype(jnp.float32)                    # [N, Dt]
    Bv = B_ref[0].astype(jnp.float32)                   # [T, N]
    Cv = C_ref[0].astype(jnp.float32)

    nb = T // S
    N, Dt = A.shape
    a = jnp.exp(dt[:, None, :] * A[None]).reshape(nb, S, N, Dt)
    b = ((dt * u)[:, None, :] * Bv[:, :, None]).reshape(nb, S, N, Dt)
    C4 = Cv.reshape(nb, S, N)

    # sequential in-sub-block scan: local states + running decays + local y
    acc_a = a[:, 0]                                     # [nb, N, Dt]
    acc_b = b[:, 0]
    a_runs = [acc_a]
    y_loc = [jnp.sum(C4[:, 0][:, :, None] * acc_b, axis=1)]   # [nb, Dt]
    corr_c = [C4[:, 0][:, :, None] * acc_a]             # C*a_run for the fix-up
    for s in range(1, S):
        acc_b = a[:, s] * acc_b + b[:, s]
        acc_a = a[:, s] * acc_a
        a_runs.append(acc_a)
        y_loc.append(jnp.sum(C4[:, s][:, :, None] * acc_b, axis=1))
        corr_c.append(C4[:, s][:, :, None] * acc_a)
    tot_a, tot_b = acc_a, acc_b                         # sub-block totals

    # inclusive doubling scan over the nb sub-block totals (tiny)
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
    # exclusive prefix per sub-block, with the chunk-incoming state folded in
    st = state[...][None]                               # [1, N, Dt]
    e_b = jnp.concatenate([st, pb[:-1] + pa[:-1] * st], axis=0)  # [nb, N, Dt]

    # y = y_local + sum_n (C * a_run) * e_b   (+ D skip)
    # (middle-axis stack does not lower on Mosaic; write rows via scratch)
    for s in range(S):
        y_scr[:, s] = y_loc[s] + jnp.sum(corr_c[s] * e_b, axis=1)
    y = y_scr[...].reshape(T, Dt) + u * Dskip_ref[0].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)
    state[...] = pb[nb - 1] + pa[nb - 1] * state[...]


def fwd_folded_v2(u, delta, A, B, C, Dskip, bias, T: int, Dt: int,
                  S: int = 16):
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

    grid = (G * nD, Lp // T)
    seq = lambda i: i // nD
    dtile = lambda i: i % nD

    kernel = functools.partial(_scan_kernel_v2, T=T, S=S)
    y, xsave = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, Dt), lambda i, l: (seq(i), l, dtile(i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dt), lambda i, l: (seq(i), l, dtile(i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dt), lambda i, l: (seq(i) % K, 0, dtile(i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda i, l: (seq(i), l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda i, l: (seq(i), l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dt), lambda i, l: (seq(i) % K, 0, dtile(i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dt), lambda i, l: (seq(i) % K, 0, dtile(i)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, T, Dt), lambda i, l: (seq(i), l, dtile(i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, Dt), lambda i, l: (seq(i), l, 0, dtile(i)),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Lp, Dm), u.dtype),
            jax.ShapeDtypeStruct((G, Lp // T, N, Dm), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, Dt), jnp.float32),
                        pltpu.VMEM((T // S, S, Dt), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_INTERPRET,
    )(u, delta, At, B, C, bias[:, None, :], Dskip[:, None, :])
    return y[:, :L], xsave
