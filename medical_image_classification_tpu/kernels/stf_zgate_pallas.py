"""Fused Pallas kernel for the ST-SSD STF fusion gate.

The STF gate (`/root/reference/st_mamba/ST_SSD.py:322-375`, last two lines)
computes

  Z = sigmoid(pooled^T @ lz)     [P, P]   (P = p^2; P = L at stage 0)
  Y = Z @ U                      [P, C]

The XLA path materialises Z (and its cotangent) in HBM — 157 MB bf16 per
tensor at ST-SSD stage 0 (P = 3136, batch 8).  Here each p-tile's rows of Z
are built in VMEM, gated, and immediately contracted:

  per (b, pt):  Zr = sigmoid(pooledT_blk @ lz)    [pt, P]  (VMEM only)
                Y_blk = Zr @ U                     [pt, C]

Rows are independent (sigmoid is elementwise), so the p grid is fully
parallel in fwd.  Backward recomputes Zr per tile and emits dpooledT and a
per-batch dlz (summed outside), while dU accumulates across the sequential
p dimension in fp32 scratch.

Precision: bf16 MXU operands with fp32 accumulation; sigmoid in fp32; the
gated rows are cast back to the input dtype for the second matmul (matching
the XLA path, where Z inherits pooled's dtype).  fp32 inputs force HIGHEST
precision (see `ssd_ydiag_pallas._dg`).
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

_VMEM_BUDGET = int(48 * 1024 * 1024)

# below this the Z tensor is small enough that XLA's version is fine
_MIN_PP = 512 * 512


def _pick_pt(P: int, C: int, itemsize: int, bwd: bool) -> int | None:
    """Largest 8-aligned divisor p-tile of P that fits the VMEM budget."""
    fixed = 2 * C * P * itemsize                  # lz + U
    if bwd:
        fixed += C * P * 4 + C * P * itemsize     # dU scratch + dlz out
    per_row = P * 4 * (3 if bwd else 1) + 4 * C   # Zr (+dZ/dZ') + row blocks
    for pt in range(min(P, 512), 7, -8):
        if P % pt == 0 and fixed + pt * per_row <= _VMEM_BUDGET:
            return pt
    return None


def stf_zgate_supported(P: int, C: int, itemsize: int = 2) -> bool:
    if not _PALLAS_OK:
        return False
    if not (_INTERPRET or jax.default_backend() == "tpu"):
        return False
    if P * P < _MIN_PP:
        return False
    if P % 8 or C % 128:
        return False
    return _pick_pt(P, C, itemsize, bwd=True) is not None


def _fwd_kernel(pt_ref, lz_ref, u_ref, y_ref, *, mm_dtype):
    pooledT = pt_ref[0]                                # [pt, C]
    S = _dg(pooledT.astype(mm_dtype), lz_ref[...].astype(mm_dtype),
            (((1,), (0,)), ((), ())))                  # [pt, P] fp32
    Zr = jax.nn.sigmoid(S).astype(mm_dtype)
    y_ref[0] = _dg(Zr, u_ref[0].astype(mm_dtype),
                   (((1,), (0,)), ((), ()))).astype(y_ref.dtype)


def _bwd_kernel(pt_ref, lz_ref, u_ref, dy_ref,
                dpt_ref, du_ref, dlz_ref, du_acc, *, mm_dtype):
    p_i = pl.program_id(1)

    @pl.when(p_i == 0)
    def _():
        du_acc[...] = jnp.zeros_like(du_acc)

    pooledT = pt_ref[0].astype(mm_dtype)               # [pt, C]
    lz = lz_ref[...].astype(mm_dtype)                  # [C, P]
    dy = dy_ref[0].astype(mm_dtype)                    # [pt, C]
    S = _dg(pooledT, lz, (((1,), (0,)), ((), ())))     # [pt, P] fp32
    Z = jax.nn.sigmoid(S)
    Zm = Z.astype(mm_dtype)

    du_acc[...] += _dg(Zm, dy, (((0,), (0,)), ((), ())))       # [P, C]
    dZ = _dg(dy, u_ref[0].astype(mm_dtype),
             (((1,), (1,)), ((), ())))                          # [pt, P] fp32
    dS = (dZ * Z * (1.0 - Z)).astype(mm_dtype)
    dpt_ref[0] = _dg(dS, lz, (((1,), (1,)), ((), ()))).astype(dpt_ref.dtype)
    # dlz is accumulated TRANSPOSED ([P, C]: C on 128-aligned lanes; the
    # [C, P] orientation puts P — not a 128 multiple at the model's
    # P=3136 — on the lane dim); the caller transposes the sum back.
    dlz_c = _dg(dS, pooledT, (((0,), (0,)), ((), ())))         # [P, C] fp32

    @pl.when(p_i == 0)
    def _():
        dlz_ref[0] = dlz_c

    @pl.when(p_i > 0)
    def _():
        dlz_ref[0] += dlz_c

    @pl.when(p_i == pl.num_programs(1) - 1)
    def _():
        du_ref[0] = du_acc[...].astype(du_ref.dtype)


def _run_fwd(pooledT, lz, U):
    BB, P, C = pooledT.shape
    pt = _pick_pt(P, C, pooledT.dtype.itemsize, bwd=False)
    bpc = pl.BlockSpec((1, pt, C), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, mm_dtype=pooledT.dtype),
        grid=(BB, P // pt),
        in_specs=[bpc,
                  pl.BlockSpec((C, P), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, P, C), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=bpc,
        out_shape=jax.ShapeDtypeStruct((BB, P, C), pooledT.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_INTERPRET,
    )(pooledT, lz, U)


def _run_bwd(pooledT, lz, U, dY):
    BB, P, C = pooledT.shape
    pt = _pick_pt(P, C, pooledT.dtype.itemsize, bwd=True)
    bpc = pl.BlockSpec((1, pt, C), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, P, C), lambda b, i: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    dpt, dU, dlzb = pl.pallas_call(
        functools.partial(_bwd_kernel, mm_dtype=pooledT.dtype),
        grid=(BB, P // pt),
        in_specs=[bpc,
                  pl.BlockSpec((C, P), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  full, bpc],
        out_specs=[bpc, full,
                   pl.BlockSpec((1, P, C), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((BB, P, C), pooledT.dtype),
                   jax.ShapeDtypeStruct((BB, P, C), U.dtype),
                   jax.ShapeDtypeStruct((BB, P, C), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((P, C), jnp.float32)],
        # the stack working set exceeds Mosaic's 16 MB default scoped-vmem
        # limit at the stage-0 shape (P=3136) — raise it (v5e: 128 MB VMEM)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024),
        interpret=_INTERPRET,
    )(pooledT, lz, U, dY)
    return dpt, dU, dlzb


@jax.custom_vjp
def stf_zgate(pooledT, lz, U):
    """Y[b] = sigmoid(pooledT[b] @ lz) @ U[b]; no [P, P] HBM tensor.

    pooledT: [BB, P, C]   (the STF pooled features, already transposed)
    lz     : [C, P]
    U      : [BB, P, C]   merged semantic tokens
    Caller must have checked `stf_zgate_supported(P, C)`.
    """
    return _run_fwd(pooledT, lz, U)


def _vjp_fwd(pooledT, lz, U):
    return _run_fwd(pooledT, lz, U), (pooledT, lz, U)


def _vjp_bwd(res, dY):
    pooledT, lz, U = res
    dpt, dU, dlzb = _run_bwd(pooledT, lz, U, dY.astype(pooledT.dtype))
    # dlzb is [BB, P, C] (transposed in-kernel; see _bwd_kernel)
    return dpt, jnp.sum(dlzb, axis=0).T.astype(lz.dtype), dU


stf_zgate.defvjp(_vjp_fwd, _vjp_bwd)
