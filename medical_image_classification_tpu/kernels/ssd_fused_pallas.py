"""Fully fused Pallas SSD scan: intra-chunk matmuls + inter-chunk state
walk in one kernel, state resident in VMEM.

`ssd.py`'s XLA formulation pays the state path in HBM: the per-chunk state
einsum writes ``S [B, nc, H, P, N]`` (435 MB fp32 at MedSSD b16 stage 0),
the sequential walk re-reads/writes the carry per chunk, and the Y_off
einsum reads the stacked incoming states again — ~8 ms of the 18.9 ms
stage-0 fwd+bwd after the Y_diag kernel landed (trace in STATUS.md).

Here the whole SSD recurrence runs inside one kernel (the same shape as the
reference's Triton `mamba_chunk_scan_combined`, re-tiled for TPU):

  grid = (batch, chunks, head-blocks); chunk and head-block dims are
  sequential, batch is parallel.  Per (b, c, hb) step:
    * scores = C @ B^T once per (b, c) into VMEM scratch (head-blocks
      reuse it);
    * per head: masked decay matmul (Y_diag), output contribution from the
      VMEM-resident incoming state (Y_off = (C @ S^T) * exp(acum)), and
      the state update S <- exp(sum dtA) * S + (dte*dtx)^T B — the state
      ``[nHB, HB, P, N]`` (fp32) never leaves VMEM;
    * forward saves each chunk's incoming state (bf16, write-only) so the
      backward kernel can walk chunks in REVERSE (index-mapped), carrying
      the state adjoint in scratch and recomputing scores/decay in VMEM —
      the TPU shape of the reference's recompute-from-boundary-states CUDA
      backward, with no atomics and no l^2 or state tensors in HBM.

``dte = exp(a_last - a)`` and ``cdec = exp(a_last)`` are taken as primal
inputs with their own cotangents, so XLA's autodiff chains them back to
``acum`` outside the kernel (no hand-folded double counting).

Layouts (G=1 / ref_flat — the layout every SSD model here uses):
  Cc, Bc : [B, nc, l, N]
  acum   : [B, nc, H, l]    fp32 within-chunk inclusive cumsum of dt*A
  dte    : [B, nc, H, l]    fp32 exp(acum[..., -1:] - acum)
  cdec   : [B, nc, H]       fp32 exp(acum[..., -1])
  dtx    : [B, nc, H, l, P] head-major dt-weighted x
  out y  : [B, nc, H, l, P] head-major
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from medical_image_classification_tpu.kernels.ssd_ydiag_pallas import (
    _PALLAS_OK,
    _decay,
    _dg,
    _pick_hb,
    _rowsum,
)

if _PALLAS_OK:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

# test hook: interpreter mode (golden tests on CPU)
_INTERPRET = False

# chunk-length window where the fused kernel measures ahead of XLA
_MIN_L = 224
_MAX_L = 256


def ssd_fused_supported(l: int, N: int, P: int, G: int, nc: int,
                        H: int, itemsize: int = 2) -> bool:
    if not _PALLAS_OK:
        return False
    if not (_INTERPRET or jax.default_backend() == "tpu"):
        return False
    if _pick_hb(H, l, N, P, itemsize) is None:
        return False
    # N % 64: see ydiag_supported — small-N models (ST-SSD, CNN-Mamba at
    # ref_flat N=64) lane-pad B/C/state to 128 lanes but keep the l^2 and
    # state-stack HBM savings
    return (G == 1 and nc >= 2 and _MIN_L <= l <= _MAX_L and l % 8 == 0
            and N % 64 == 0 and P % 8 == 0)


def _fwd_kernel(C_ref, B_ref, acum_ref, dte_ref, cdec_ref, dtx_ref,
                y_ref, save_ref, scores, state,
                *, l: int, HB: int, nHB: int, mm_dtype):
    """save_ref is None on the inference-only build (no state saving).

    cdec_ref is the whole per-batch [nc, H] scalar table in SMEM (a
    (1, 1, HB) block violates Mosaic's last-two-dims blocking rule).
    """
    c = pl.program_id(1)
    hb = pl.program_id(2)
    st = 0 if nHB == 1 else hb          # static scratch index when possible

    @pl.when((c == 0) & (hb == 0))
    def _():
        state[...] = jnp.zeros_like(state)

    @pl.when(hb == 0)
    def _():
        scores[...] = _dg(
            C_ref[0, 0].astype(mm_dtype), B_ref[0, 0].astype(mm_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [l, l]

    sc = scores[...]
    Cm = C_ref[0, 0].astype(mm_dtype)
    Bm = B_ref[0, 0].astype(mm_dtype)
    for h in range(HB):
        a_row = acum_ref[0, 0, h:h + 1]                     # [1, l] fp32
        a_col = jnp.transpose(a_row)                        # [l, 1]
        E = _decay(a_row, l, a_col)
        M = (sc * E).astype(mm_dtype)
        dtx = dtx_ref[0, 0, h]                              # [l, P]
        Yd = _dg(M, dtx.astype(mm_dtype),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        Sin = state[st, h]                                  # [P, N] fp32
        if save_ref is not None:
            save_ref[0, 0, h] = Sin.astype(save_ref.dtype)
        Yoff = _dg(Cm, Sin.astype(mm_dtype),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        # per-row scales broadcast from [l, 1] column vectors (exact; the
        # MXU outer-product variant rounded them to bf16)
        y_ref[0, 0, h] = (Yd + Yoff * jnp.exp(a_col)).astype(y_ref.dtype)
        # state update: S <- cdec * S + (dte*dtx)^T B
        dte_col = jnp.transpose(dte_ref[0, 0, h:h + 1])     # [l, 1]
        dtx_d = (dtx.astype(jnp.float32) * dte_col).astype(mm_dtype)
        Snew = _dg(dtx_d, Bm, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        cd = cdec_ref[0, c, hb * HB + h] if nHB > 1 else cdec_ref[0, c, h]
        state[st, h] = cd * Sin + Snew


def _bwd_kernel(C_ref, B_ref, acum_ref, dte_ref, cdec_ref, dtx_ref,
                save_ref, dy_ref,
                ddtx_ref, dacum_ref, ddte_ref, dcdec_ref, dC_ref, dB_ref,
                scores, dscores, dC_acc, dB_acc, dstate,
                *, l: int, HB: int, nHB: int, mm_dtype):
    cr = pl.program_id(1)                                   # reversed chunks
    rc = pl.num_programs(1) - 1 - cr                        # real chunk idx
    hb = pl.program_id(2)
    st = 0 if nHB == 1 else hb

    @pl.when((cr == 0) & (hb == 0))
    def _():
        dstate[...] = jnp.zeros_like(dstate)

    @pl.when(hb == 0)
    def _():
        scores[...] = _dg(
            C_ref[0, 0].astype(mm_dtype), B_ref[0, 0].astype(mm_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dscores[...] = jnp.zeros_like(dscores)
        dC_acc[...] = jnp.zeros_like(dC_acc)
        dB_acc[...] = jnp.zeros_like(dB_acc)

    sc = scores[...]
    Cm = C_ref[0, 0].astype(mm_dtype)
    Bm = B_ref[0, 0].astype(mm_dtype)
    for h in range(HB):
        a_row = acum_ref[0, 0, h:h + 1]
        a_col = jnp.transpose(a_row)                        # [l, 1]
        E = _decay(a_row, l, a_col)
        M = sc * E
        dtx = dtx_ref[0, 0, h].astype(mm_dtype)             # [l, P]
        dy = dy_ref[0, 0, h].astype(mm_dtype)               # [l, P]
        dyf = dy.astype(jnp.float32)
        Sin = save_ref[0, 0, h].astype(mm_dtype)            # [P, N]
        dSout = dstate[st, h]                               # [P, N] fp32

        # --- Y_diag adjoints
        ddtx_diag = _dg(M.astype(mm_dtype), dy,
                                        (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        dM = _dg(dy, dtx, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # accumulate straight into the VMEM scratches (register accumators
        # across the unrolled h loop measured scoped-vmem OOM at HB=16)
        dscores[...] += dM * E
        G = dM * M
        # dacum[i] = sum_j G[i, j] - sum_l G[l, i]; exact VPU reductions
        # emitted lane-major (ones-MATMULS rounded fp32 G to bf16)
        dacum_h = _rowsum(G) - jnp.sum(G, axis=0, keepdims=True)

        # --- Y_off = (C @ Sin^T) * exp(acum)  adjoints
        eA_col = jnp.exp(a_col)                             # [l, 1]
        Yoff = _dg(Cm, Sin, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dYoff = (dyf * eA_col).astype(mm_dtype)             # [l, P]
        dacum_h = dacum_h + _rowsum(dyf * Yoff * eA_col)    # [1, l]
        dC_acc[...] += _dg(
            dYoff, Sin, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [l, N]
        dSin = _dg(dYoff, Cm, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

        # --- state recurrence Sout = cdec*Sin + (dte*dtx)^T B  adjoints
        dte_col = jnp.transpose(dte_ref[0, 0, h:h + 1])     # [l, 1]
        t = _dg(Bm, dSout.astype(mm_dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [l, P]
        ddtx_ref[0, 0, h] = (ddtx_diag + t * dte_col).astype(ddtx_ref.dtype)
        dtx_d = (dtx.astype(jnp.float32) * dte_col).astype(mm_dtype)
        dB_acc[...] += _dg(
            dtx_d, dSout.astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [l, N]
        ddte_ref[0, 0, h:h + 1] = _rowsum(t * dtx.astype(jnp.float32))
        habs = (hb * HB + h) if nHB > 1 else h
        dcdec_ref[0, rc, habs] = jnp.sum(dSout * Sin.astype(jnp.float32))
        dacum_ref[0, 0, h:h + 1] = dacum_h
        dstate[st, h] = cdec_ref[0, rc, habs] * dSout + dSin

    @pl.when(hb == pl.num_programs(2) - 1)
    def _():
        ds = dscores[...].astype(mm_dtype)
        dC_ref[0, 0] = (dC_acc[...] + _dg(
            ds, Bm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(dC_ref.dtype)
        dB_ref[0, 0] = (dB_acc[...] + _dg(
            ds, Cm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(dB_ref.dtype)


def _run_fwd(Cc, Bc, acum, dte, cdec, dtx, save: bool):
    B, nc, l, N = Cc.shape
    H, P = dtx.shape[2], dtx.shape[4]
    HB = _pick_hb(H, l, N, P, Cc.dtype.itemsize)
    nHB = H // HB
    mm_dtype = Cc.dtype
    ln = pl.BlockSpec((1, 1, l, N), lambda b, c, h: (b, c, 0, 0),
                      memory_space=pltpu.VMEM)
    hl = pl.BlockSpec((1, 1, HB, l), lambda b, c, h: (b, c, h, 0),
                      memory_space=pltpu.VMEM)
    hlp = pl.BlockSpec((1, 1, HB, l, P), lambda b, c, h: (b, c, h, 0, 0),
                       memory_space=pltpu.VMEM)
    # whole per-batch scalar table: (1, 1, HB) blocks violate Mosaic's
    # last-two-dims rule; full (nc, H) trailing dims are always legal
    hsc = pl.BlockSpec((1, nc, H), lambda b, c, h: (b, 0, 0),
                       memory_space=pltpu.SMEM)
    body = functools.partial(_fwd_kernel, l=l, HB=HB, nHB=nHB,
                             mm_dtype=mm_dtype)
    if save:
        kern = body
        out_specs = [hlp,
                     pl.BlockSpec((1, 1, HB, P, N),
                                  lambda b, c, h: (b, c, h, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((B, nc, H, l, P), dtx.dtype),
                     jax.ShapeDtypeStruct((B, nc, H, P, N), mm_dtype)]
    else:
        def kern(C, Bc_, a, d, cd, x, y, scores, state):
            body(C, Bc_, a, d, cd, x, y, None, scores, state)
        out_specs = [hlp]
        out_shape = [jax.ShapeDtypeStruct((B, nc, H, l, P), dtx.dtype)]
    res = pl.pallas_call(
        kern,
        grid=(B, nc, nHB),
        in_specs=[ln, ln, hl, hl, hsc, hlp],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((l, l), jnp.float32),
                        pltpu.VMEM((nHB, HB, P, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=_INTERPRET,
    )(Cc, Bc, acum, dte, cdec, dtx)
    return (res[0], res[1]) if save else (res[0], None)


def _run_bwd(Cc, Bc, acum, dte, cdec, dtx, Ssave, dy):
    B, nc, l, N = Cc.shape
    H, P = dtx.shape[2], dtx.shape[4]
    HB = _pick_hb(H, l, N, P, Cc.dtype.itemsize)
    # the bwd working set is ~2x the fwd (dy + saved states + adjoint
    # temporaries); HB=16 measured scoped-vmem OOM at stage-0 shapes
    if HB > 8 and H % 8 == 0:
        HB = 8
    nHB = H // HB
    mm_dtype = Cc.dtype
    kern = functools.partial(_bwd_kernel, l=l, HB=HB, nHB=nHB,
                             mm_dtype=mm_dtype)
    rev = lambda c: nc - 1 - c
    ln = pl.BlockSpec((1, 1, l, N), lambda b, c, h: (b, rev(c), 0, 0),
                      memory_space=pltpu.VMEM)
    hl = pl.BlockSpec((1, 1, HB, l), lambda b, c, h: (b, rev(c), h, 0),
                      memory_space=pltpu.VMEM)
    hlp = pl.BlockSpec((1, 1, HB, l, P), lambda b, c, h: (b, rev(c), h, 0, 0),
                       memory_space=pltpu.VMEM)
    hpn = pl.BlockSpec((1, 1, HB, P, N), lambda b, c, h: (b, rev(c), h, 0, 0),
                       memory_space=pltpu.VMEM)
    # per-batch scalar tables (kernel indexes by the REAL chunk rc itself)
    hsc = pl.BlockSpec((1, nc, H), lambda b, c, h: (b, 0, 0),
                       memory_space=pltpu.SMEM)
    ddtx, dacum, ddte, dcdec, dC, dB = pl.pallas_call(
        kern,
        grid=(B, nc, nHB),
        in_specs=[ln, ln, hl, hl, hsc, hlp, hpn, hlp],
        out_specs=[hlp, hl, hl, hsc, ln, ln],
        out_shape=[
            jax.ShapeDtypeStruct((B, nc, H, l, P), dtx.dtype),
            jax.ShapeDtypeStruct((B, nc, H, l), jnp.float32),
            jax.ShapeDtypeStruct((B, nc, H, l), jnp.float32),
            jax.ShapeDtypeStruct((B, nc, H), jnp.float32),
            jax.ShapeDtypeStruct((B, nc, l, N), Cc.dtype),
            jax.ShapeDtypeStruct((B, nc, l, N), Bc.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((l, l), jnp.float32),
                        pltpu.VMEM((l, l), jnp.float32),
                        pltpu.VMEM((l, N), jnp.float32),
                        pltpu.VMEM((l, N), jnp.float32),
                        pltpu.VMEM((nHB, HB, P, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=_INTERPRET,
    )(Cc, Bc, acum, dte, cdec, dtx, Ssave, dy)
    return ddtx, dacum, ddte, dcdec, dC, dB


@jax.custom_vjp
def ssd_fused(Cc, Bc, acum, dte, cdec, dtx):
    """y[b,c,h,l,p] = Y_diag + exp(acum) * (C @ S_in^T), S walked in VMEM."""
    return _run_fwd(Cc, Bc, acum, dte, cdec, dtx, save=False)[0]


def _vjp_fwd(Cc, Bc, acum, dte, cdec, dtx):
    y, Ssave = _run_fwd(Cc, Bc, acum, dte, cdec, dtx, save=True)
    return y, (Cc, Bc, acum, dte, cdec, dtx, Ssave)


def _vjp_bwd(res, dy):
    Cc, Bc, acum, dte, cdec, dtx, Ssave = res
    ddtx, dacum, ddte, dcdec, dC, dB = _run_bwd(
        Cc, Bc, acum, dte, cdec, dtx, Ssave, dy.astype(dtx.dtype))
    return dC, dB, dacum, ddte, dcdec, ddtx


ssd_fused.defvjp(_vjp_fwd, _vjp_bwd)
