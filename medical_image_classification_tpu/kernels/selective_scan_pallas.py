"""Pallas TPU selective-scan kernel (Mamba-1 hot path).

TPU-native replacement for the reference CUDA blocked scan
(`/root/reference/CrossMamba/FusionMamba/selective_scan/selective_scan_fwd_kernel.cuh:67-345`).
Not a translation: the design is shaped by the TPU memory system —

  * grid = (sequences, L-chunks); the [N, D] state lives in VMEM scratch and
    persists across the sequential L-chunk grid dimension (the CUDA kernel
    instead carries a cub BlockScan prefix in smem).
  * within a chunk, a Hillis-Steele doubling scan runs on [T, N, D]-shaped
    VMEM arrays so every VPU op is a full-tile elementwise op.
  * channels ride the 128-lane dimension; the scan state dimension N rides
    sublanes; time is the untiled major axis.
  * fp32 state and accumulation (parity with the reference's fp32 cast).
  * inputs stream through pallas's automatic double buffering; flipped scan
    directions are folded into the sequence axis by the caller, so no
    flipped copies are materialised in HBM.

Backward: a second Pallas kernel (`selective_scan_pallas_bwd.py`) that walks
chunks in reverse, recomputing in-chunk states from saved chunk-boundary
states and running a reverse doubling scan for the adjoint — the TPU shape
of the reference's 530-LoC CUDA backward, with per-sequence parameter-grad
partials instead of atomics.  `_BWD_IMPL = "xla"` switches to a recompute
through the chunked-XLA scan for debugging.

Folded layout (what `ss2d_core_mamba1` produces naturally):
  u, delta : [G, L, Dm]    G = batch * K directions, batch-major
  A        : [K, Dm, N]    per-direction decay (param group = g % K)
  B, C     : [G, L, N]
  D, bias  : [K, Dm]
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from medical_image_classification_tpu.kernels.selective_scan import (
    selective_scan_xla,
)


def _choose_tiles(L: int, Dm: int, N: int):
    """Pick (T, Dt): Dt divides Dm, VMEM footprint ~<= 8MB.

    T adapts to L so short stages don't pad to a full 128-step chunk
    (MedMamba stage 3 has L=49: T=56 wastes 14% instead of 161%)."""
    Dt = None
    for cand in (512, 384, 256, 128):
        if Dm % cand == 0:
            Dt = cand
            break
    if Dt is None:
        if Dm <= 512:
            Dt = Dm
        else:
            return None
    n_chunks = -(-L // 128)
    T = -(-L // n_chunks)               # balanced chunk length
    T = min(128, ((T + 7) // 8) * 8)    # multiple of 8 (sub-block friendly)
    while T > 8 and 6 * T * N * Dt * 4 > 8 * 1024 * 1024:
        T = ((T // 2 + 7) // 8) * 8
    return T, Dt


def pallas_supported(u, A, B, z=None, delta_softplus=False,
                     return_last_state=False) -> bool:
    if not _PALLAS_OK or jax.default_backend() != "tpu":
        return False
    if u.ndim != 3 or B.ndim != 4:
        return False
    if z is not None or return_last_state or not delta_softplus:
        return False
    K = B.shape[2]
    Dm = u.shape[2] // K
    if u.shape[2] % K:
        return False
    return _choose_tiles(u.shape[1], Dm, B.shape[3]) is not None


def _scan_kernel(u_ref, dt_ref, A_ref, B_ref, C_ref, bias_ref, Dskip_ref,
                 y_ref, xsave_ref, state, *, T: int, nT: int):
    """One (sequence, L-chunk) grid step."""
    lc = pl.program_id(1)

    @pl.when(lc == 0)
    def _():
        state[...] = jnp.zeros_like(state)

    xsave_ref[0, 0] = state[...]                       # incoming chunk state
    u = u_ref[0].astype(jnp.float32)                   # [T, Dt]
    dt = dt_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    dt = jax.nn.softplus(dt)
    A = A_ref[0].astype(jnp.float32)                   # [N, Dt] (transposed)
    Bv = B_ref[0].astype(jnp.float32)                  # [T, N]
    Cv = C_ref[0].astype(jnp.float32)

    a = jnp.exp(dt[:, None, :] * A[None])              # [T, N, Dt]
    b = (dt * u)[:, None, :] * Bv[:, :, None]          # [T, N, Dt]

    # Hillis-Steele inclusive scan along T with first-order combine
    # (a1,b1)∘(a2,b2) = (a1*a2, a2*b1 + b2)
    off = 1
    while off < T:
        ones = jnp.ones_like(a[:off])
        zeros = jnp.zeros_like(b[:off])
        a_sh = jnp.concatenate([ones, a[:-off]], axis=0)
        b_sh = jnp.concatenate([zeros, b[:-off]], axis=0)
        b = a * b_sh + b
        a = a * a_sh
        off *= 2

    x = b + a * state[None]                            # fold incoming state
    y = jnp.sum(Cv[:, :, None] * x, axis=1)            # [T, Dt]
    y = y + u * Dskip_ref[0].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)
    state[...] = x[T - 1]


try:  # pallas imports fail gracefully off-TPU builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


# test hook: force interpreter mode (golden tests on CPU, SURVEY §5)
_INTERPRET = False


def _fwd_folded(u, delta, A, B, C, Dskip, bias, T: int, Dt: int):
    G, L, Dm = u.shape
    K = A.shape[0]
    N = A.shape[2]
    nT = pl.cdiv(L, T)
    nD = Dm // Dt
    At = jnp.swapaxes(A, 1, 2)                         # [K, N, Dm]

    pad = (-L) % T
    if pad:
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, pad), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0)))
    Lp = L + pad

    grid = (G * nD, Lp // T)

    def seq(i):            # sequence index for grid row i
        return i // nD

    def dtile(i):          # d-tile index
        return i % nD

    kernel = functools.partial(_scan_kernel, T=T, nT=Lp // T)
    y = pl.pallas_call(
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
        scratch_shapes=[pltpu.VMEM((N, Dt), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=_INTERPRET,
    )(u, delta, At, B, C, bias[:, None, :], Dskip[:, None, :])
    y, xsave = y
    return y[:, :L], xsave


# backward implementation: 'pallas' (reverse-scan kernel) or 'xla' (recompute
# through the chunked-XLA scan) — switchable for debugging/verification.
_BWD_IMPL = "pallas"


def _fwd_dispatch(u, delta, A, B, C, Dskip, bias, T, Dt):
    """Forward: two-level work-efficient kernel (v2) when the sub-block
    size divides T, else the doubling-scan v1."""
    from medical_image_classification_tpu.kernels import (
        selective_scan_pallas_v2 as v2)
    S = 16 if T % 16 == 0 else 8
    if T % S == 0:
        v2._INTERPRET = _INTERPRET
        return v2.fwd_folded_v2(u, delta, A, B, C, Dskip, bias, T, Dt, S=S)
    return _fwd_folded(u, delta, A, B, C, Dskip, bias, T, Dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _scan_folded(u, delta, A, B, C, Dskip, bias):
    G, L, Dm = u.shape
    tiles = _choose_tiles(L, Dm, A.shape[2])
    assert tiles is not None
    T, Dt = tiles
    return _fwd_dispatch(u, delta, A, B, C, Dskip, bias, T, Dt)[0]


def _xla_equivalent(u, delta, A, B, C, Dskip, bias):
    """Same math through the differentiable chunked-XLA scan (debug VJP).
    Output follows u's dtype (matches the pallas fwd)."""
    G, L, Dm = u.shape
    K, _, N = A.shape
    batch = G // K
    # unfold: [G, L, Dm] -> [batch, L, K*Dm]; groups [batch, L, K, N]
    u2 = jnp.swapaxes(u.reshape(batch, K, L, Dm), 1, 2).reshape(batch, L, K * Dm)
    d2 = jnp.swapaxes(delta.reshape(batch, K, L, Dm), 1, 2).reshape(batch, L, K * Dm)
    B2 = jnp.swapaxes(B.reshape(batch, K, L, N), 1, 2)
    C2 = jnp.swapaxes(C.reshape(batch, K, L, N), 1, 2)
    y = selective_scan_xla(u2, d2, A.reshape(K * Dm, N), B2, C2,
                           D=Dskip.reshape(-1), delta_bias=bias.reshape(-1),
                           delta_softplus=True)
    out = jnp.swapaxes(y.reshape(batch, L, K, Dm), 1, 2).reshape(G, L, Dm)
    return out.astype(u.dtype)


def _scan_fwd(u, delta, A, B, C, Dskip, bias):
    G, L, Dm = u.shape
    T, Dt = _choose_tiles(L, Dm, A.shape[2])
    y, xsave = _fwd_dispatch(u, delta, A, B, C, Dskip, bias, T, Dt)
    return y, (u, delta, A, B, C, Dskip, bias, xsave)


def _cast_like(grads, primals):
    return tuple(gr.astype(pr.dtype) for gr, pr in zip(grads, primals))


def _scan_bwd(res, g):
    u, delta, A, B, C, Dskip, bias, xsave = res
    if _BWD_IMPL == "pallas":
        G, L, Dm = u.shape
        T, Dt = _choose_tiles(L, Dm, A.shape[2])
        S = 16 if T % 16 == 0 else 8
        if T % S == 0:
            from medical_image_classification_tpu.kernels import (
                selective_scan_pallas_bwd_v2 as bwd2)
            bwd2._INTERPRET = _INTERPRET
            outs = bwd2.bwd_folded_v2(u, delta, A, B, C, Dskip, bias, xsave,
                                      g, T, Dt, S=S)
        else:
            from medical_image_classification_tpu.kernels import (
                selective_scan_pallas_bwd as bwd_mod)
            bwd_mod._INTERPRET = _INTERPRET
            outs = bwd_mod.bwd_folded(u, delta, A, B, C, Dskip, bias, xsave,
                                      g, T, Dt)
        return _cast_like(outs, (u, delta, A, B, C, Dskip, bias))
    _, vjp = jax.vjp(_xla_equivalent, u, delta, A, B, C, Dskip, bias)
    return _cast_like(vjp(g), (u, delta, A, B, C, Dskip, bias))


_scan_folded.defvjp(_scan_fwd, _scan_bwd)


def selective_scan_pallas_folded(u, delta, A, B, C, Dskip, bias):
    """Folded-layout entry (see module docstring). delta_softplus implied.

    u/delta/B/C keep their incoming dtype (bf16 halves the kernel's HBM
    traffic; accumulation is fp32 inside regardless).  Params stay fp32."""
    return _scan_folded(u, delta,
                        A.astype(jnp.float32), B, C,
                        Dskip.astype(jnp.float32),
                        bias.astype(jnp.float32))


def pallas_folded_supported(L: int, Dm: int, N: int) -> bool:
    return (_PALLAS_OK and jax.default_backend() == "tpu"
            and _choose_tiles(L, Dm, N) is not None)


def selective_scan_pallas(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                          delta_softplus=False, return_last_state=False):
    """Generic-layout entry matching ``selective_scan``'s signature.

    Folds grouped B/C into the sequence axis.  Falls back to requiring
    delta_softplus=True, no z, no last_state (the classifier path); other
    configurations route to the XLA scan in the dispatcher.
    """
    if (return_last_state or z is not None or not delta_softplus
            or B.ndim != 4):
        raise NotImplementedError
    batch, L, D_all = u.shape
    K = B.shape[2]
    N = B.shape[3]
    Dm = D_all // K
    u4 = jnp.swapaxes(u.reshape(batch, L, K, Dm), 1, 2).reshape(batch * K, L, Dm)
    d4 = jnp.swapaxes(delta.reshape(batch, L, K, Dm), 1, 2).reshape(batch * K, L, Dm)
    B4 = jnp.swapaxes(B, 1, 2).reshape(batch * K, L, N)
    C4 = jnp.swapaxes(C, 1, 2).reshape(batch * K, L, N)
    A4 = A.reshape(K, Dm, N)
    Dk = (D if D is not None else jnp.zeros(K * Dm)).reshape(K, Dm)
    bk = (delta_bias if delta_bias is not None
          else jnp.zeros(K * Dm)).reshape(K, Dm)
    y = selective_scan_pallas_folded(u4, d4, A4, B4, C4, Dk, bk)
    return jnp.swapaxes(y.reshape(batch, K, L, Dm), 1, 2).reshape(batch, L, K * Dm)
