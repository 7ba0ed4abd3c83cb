"""Fused Pallas kernel for the ST-SSD semantic-token mixer (STL).

The STL token mixer (`/root/reference/st_mamba/ST_SSD.py:268-319`) computes

  S = w @ u1            [L, P]   (P = p^2 semantic tokens; P = L at stage 0)
  A = softmax_P(S)      [L, P]
  U = A^T @ (w @ u2)    [P, C]

The XLA path materialises S and A in HBM — at ST-SSD stage 0 (L = P = 3136,
4 directions folded into batch) that is ~630 MB of bf16 mixer per tensor per
step, re-read and re-written by the softmax reductions and again by the
backward pass (dA, dS): the dominant HBM traffic of the whole model.

Here the mixer never touches HBM.  ``u1 [C, P]`` fits in VMEM whole (1.6 MB
bf16 at stage 0), so ONE grid pass over l-tiles suffices — no online-softmax
carry is even needed:

  per (b, lt):  S_blk = w_blk @ u1                 (MXU, fp32 accumulate)
                E_blk = softmax over the full lane-resident P axis (VPU)
                U    += E_blk^T @ V_blk            (fp32 VMEM scratch [P, C])

Backward recomputes S/E per tile the same way (flash-style) and emits
dw_partial, dV, and a per-batch du1 (summed outside; the l-grid is
sequential per batch but batches run parallel, so cross-batch accumulation
in scratch would race).  V = w @ u2 stays an XLA matmul outside the kernel:
JAX autodiff chains dV -> (dw, du2) for free.

Precision matches the XLA path: bf16 MXU operands with fp32 accumulation,
softmax in fp32, E cast to the input dtype for the second matmul (the XLA
path's ``A.astype(w.dtype)``).  fp32 inputs use HIGHEST precision (Mosaic's
DEFAULT rounds fp32 MXU operands to bf16 — see `ssd_ydiag_pallas._dg`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from medical_image_classification_tpu.kernels.ssd_ydiag_pallas import (
    _PALLAS_OK,
    _dg,
)

if _PALLAS_OK:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

# test hook: interpreter mode (golden tests on CPU)
_INTERPRET = False

# VMEM working-set cap for choosing the l-tile (bwd holds ~4 fp32 [lt, P]
# buffers + u1 + dU + the [C, P] du1 scratch)
_VMEM_BUDGET = int(48 * 1024 * 1024)

# below this much mixer work XLA's fused softmax is already fine
_MIN_LP = 512 * 512


def _pick_lt(L: int, P: int, C: int, itemsize: int, bwd: bool) -> int | None:
    """Largest 8-aligned divisor l-tile of L that fits the VMEM budget."""
    fixed = C * P * 4 + C * P * itemsize          # U/du1 scratch + u1
    if bwd:
        fixed += P * C * itemsize                 # dU block
    per_row = P * 4 * (4 if bwd else 2) + 4 * C   # S/E (+dE/dS) + w/V rows
    for lt in range(min(L, 512), 7, -8):
        if L % lt == 0 and fixed + lt * per_row <= _VMEM_BUDGET:
            return lt
    return None


def stl_mixer_supported(L: int, P: int, C: int, itemsize: int = 2) -> bool:
    if not _PALLAS_OK:
        return False
    if not (_INTERPRET or jax.default_backend() == "tpu"):
        return False
    if L * P < _MIN_LP:
        return False
    if L % 8 or P % 8 or C % 128:
        return False
    return (_pick_lt(L, P, C, itemsize, bwd=True) is not None)


def _fwd_kernel(w_ref, u1_ref, v_ref, u_ref, acc, *, mm_dtype):
    lt_i = pl.program_id(1)

    @pl.when(lt_i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref[0]                                       # [lt, C]
    S = _dg(w.astype(mm_dtype), u1_ref[...].astype(mm_dtype),
            (((1,), (0,)), ((), ())))                  # [lt, P] fp32
    m = jnp.max(S, axis=1, keepdims=True)              # [lt, 1]
    A = jnp.exp(S - m)
    n = jnp.sum(A, axis=1, keepdims=True)
    E = (A / n).astype(mm_dtype)
    acc[...] += _dg(E, v_ref[0].astype(mm_dtype),
                    (((0,), (0,)), ((), ())))          # [P, C] fp32

    @pl.when(lt_i == pl.num_programs(1) - 1)
    def _():
        u_ref[0] = acc[...].astype(u_ref.dtype)


def _bwd_kernel(w_ref, u1_ref, v_ref, du_ref,
                dw_ref, dv_ref, du1_ref, acc, *, mm_dtype):
    lt_i = pl.program_id(1)

    @pl.when(lt_i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref[0]                                       # [lt, C]
    u1 = u1_ref[...].astype(mm_dtype)                  # [C, P]
    dU = du_ref[0].astype(mm_dtype)                    # [P, C]
    S = _dg(w.astype(mm_dtype), u1, (((1,), (0,)), ((), ())))
    m = jnp.max(S, axis=1, keepdims=True)
    A = jnp.exp(S - m)
    n = jnp.sum(A, axis=1, keepdims=True)
    E = A / n                                          # [lt, P] fp32
    Em = E.astype(mm_dtype)

    # dV = E @ dU ; dE = V @ dU^T ; dS = E * (dE - rowdot) ; dw = dS @ u1^T
    dv_ref[0] = _dg(Em, dU, (((1,), (0,)), ((), ()))).astype(dv_ref.dtype)
    dE = _dg(v_ref[0].astype(mm_dtype), dU,
             (((1,), (1,)), ((), ())))                 # [lt, P] fp32
    rowdot = jnp.sum(E * dE, axis=1, keepdims=True)    # [lt, 1]
    dS = E * (dE - rowdot)
    dSm = dS.astype(mm_dtype)
    dw_ref[0] = _dg(dSm, u1, (((1,), (1,)), ((), ()))).astype(dw_ref.dtype)
    # du1 is accumulated TRANSPOSED ([P, C]: P on sublanes, C on lanes) so
    # the accumulator's lane dim stays 128-aligned at the model's P=3136
    # (P % 128 == 64); the caller transposes the [P, C] sum back to [C, P].
    acc[...] += _dg(dSm, w.astype(mm_dtype), (((0,), (0,)), ((), ())))

    @pl.when(lt_i == pl.num_programs(1) - 1)
    def _():
        du1_ref[0] = acc[...]


def _run_fwd(w, u1, V):
    BB, L, C = w.shape
    P = u1.shape[1]
    lt = _pick_lt(L, P, C, w.dtype.itemsize, bwd=False)
    blc = pl.BlockSpec((1, lt, C), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, mm_dtype=w.dtype),
        grid=(BB, L // lt),
        in_specs=[blc,
                  pl.BlockSpec((C, P), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  blc],
        out_specs=pl.BlockSpec((1, P, C), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BB, P, C), w.dtype),
        scratch_shapes=[pltpu.VMEM((P, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024),
        interpret=_INTERPRET,
    )(w, u1, V)


def _run_bwd(w, u1, V, dU):
    BB, L, C = w.shape
    P = u1.shape[1]
    lt = _pick_lt(L, P, C, w.dtype.itemsize, bwd=True)
    blc = pl.BlockSpec((1, lt, C), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    dw, dV, du1b = pl.pallas_call(
        functools.partial(_bwd_kernel, mm_dtype=w.dtype),
        grid=(BB, L // lt),
        in_specs=[blc,
                  pl.BlockSpec((C, P), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  blc,
                  pl.BlockSpec((1, P, C), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[blc, blc,
                   pl.BlockSpec((1, P, C), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((BB, L, C), w.dtype),
                   jax.ShapeDtypeStruct((BB, L, C), V.dtype),
                   jax.ShapeDtypeStruct((BB, P, C), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((P, C), jnp.float32)],
        # the stack working set at lt=448 is ~26 MB — above Mosaic's 16 MB
        # default scoped-vmem limit (a standalone jit of this call is a
        # compile error without the raised limit; v5e has 128 MB VMEM)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024),
        interpret=_INTERPRET,
    )(w, u1, V, dU)
    return dw, dV, du1b


@jax.custom_vjp
def _mixer(w, u1, V):
    """U[b] = softmax_P(w[b] @ u1)^T @ V[b]; no [L, P] HBM tensor."""
    return _run_fwd(w, u1, V)


def _vjp_fwd(w, u1, V):
    return _run_fwd(w, u1, V), (w, u1, V)


def _vjp_bwd(res, dU):
    w, u1, V = res
    dw, dV, du1b = _run_bwd(w, u1, V, dU.astype(w.dtype))
    # du1b is [BB, P, C] (transposed in-kernel; see _bwd_kernel)
    return dw, jnp.sum(du1b, axis=0).T.astype(u1.dtype), dV


_mixer.defvjp(_vjp_fwd, _vjp_bwd)


def stl_mixer(w, u1, u2):
    """Fused STL token mixer: ``softmax_P(w @ u1)^T @ (w @ u2)``.

    w : [BB, L, C]  gated features (directions folded into BB)
    u1: [C, P]      token projection
    u2: [C, C]      value projection
    Returns U [BB, P, C].  Caller must have checked `stl_mixer_supported`.
    """
    V = jnp.einsum("blc,cd->bld", w, u2)   # XLA matmul; vjp -> du2, dw term
    return _mixer(w, u1, V)
