"""Fully fused Pallas SSD scan: intra-chunk matmuls + inter-chunk state
walk in one kernel, state resident in VMEM.

`ssd.py`'s XLA formulation pays the state path in HBM: the per-chunk state
einsum writes ``S [B, nc, H, P, N]`` (435 MB fp32 at MedSSD b16 stage 0),
the sequential walk re-reads/writes the carry per chunk, and the Y_off
einsum reads the stacked incoming states again — ~8 ms of the 18.9 ms
stage-0 fwd+bwd after the Y_diag kernel landed (trace in STATUS.md).

Here the whole SSD recurrence runs inside one kernel (the same shape as the
reference's Triton `mamba_chunk_scan_combined`, re-tiled for TPU):

  grid = (batch, chunks, head-groups); chunk and head dims are sequential,
  batch is parallel.  Per (b, c, hb) step, for each head in the group:
    * scores = C @ B^T once per (b, c) into VMEM scratch (heads reuse it);
    * dtx = x * dt computed in VMEM (the host never materialises the
      dt-weighted, head-major x — see layout note below);
    * masked decay matmul (Y_diag), output contribution from the
      VMEM-resident incoming state (Y_off = (C @ S^T) * exp(acum)), and the
      state update S <- exp(sum dtA) * S + (dte*dtx)^T B — the state
      ``[H, P, N]`` (fp32) never leaves VMEM;
    * forward saves each chunk's incoming state (bf16, write-only) so the
      backward kernel can walk chunks in REVERSE (index-mapped), carrying
      the state adjoint in scratch and recomputing scores/decay in VMEM —
      the TPU shape of the reference's recompute-from-boundary-states CUDA
      backward, with no atomics and no l^2 or state tensors in HBM.

``dte = exp(a_last - a)`` and ``cdec = exp(a_last)`` are taken as primal
inputs with their own cotangents, so XLA's autodiff chains them back to
``acum`` outside the kernel (no hand-folded double counting).

Layout note (the v2 redesign): x and y move through the kernel FLAT and
l-major — ``[B, nc, l, H*P]``, a free view of the model's natural
``[B, L, H, P]``.  The v1 kernel took head-major ``[B, nc, H, l, P]`` dtx
and emitted head-major y: XLA then paid an [l, H] transpose relayout on
each of dtx-in / y-out / dy-in / dx-out — ~3 ms/step at MedSSD b16 — plus
materialising dtx itself.  Mosaic requires the minor block dim to be a
multiple of 128 (or the full array dim), so heads are processed in GROUPS
of ``hpg = max(1, 128 // P)`` per grid step: the block holds ``[l, hpg*P]``
and per-head [l, P] windows are STATIC lane slices (dynamic lane slices
would need 128 alignment; static 64-offset slices lower fine).
Row-shaped per-head outputs (dacum/ddte/ddtp) accumulate in [H, l]
scratch and flush once per (b, c) at the last head step, because a
(1, 1, 1, l) block would put 1 on the sublane dim (illegal unless it
equals the array dim).

Remaining layouts (G=1 / ref_flat — the layout every SSD model here uses):
  Cc, Bc : [B, nc, l, N]
  acum   : [B, nc, H, l]    fp32 within-chunk inclusive cumsum of dt*A
  dte    : [B, nc, H, l]    fp32 exp(acum[..., -1:] - acum)
  cdec   : [B, nc, H]       fp32 exp(acum[..., -1])
  dtp    : [B, nc, H, l]    fp32 softplus(dt + bias) (discretisation step)
  x      : [B, nc, l, H*P]  flat l-major (free view of [B, L, H, P])
  out y  : [B, nc, l, H*P]  flat l-major
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from medical_image_classification_tpu.kernels.ssd_ydiag_pallas import (
    _PALLAS_OK,
    _decay,
    _dg,
    _rowsum,
)

if _PALLAS_OK:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

# test hook: interpreter mode (golden tests on CPU)
_INTERPRET = False

# chunk-length window where the fused kernel measures ahead of XLA.
# 196 admits MedSSD stage 1 (L=784 -> 4 x 196 pad-free): single-chunk XLA
# measured 5.83 ms fwd+bwd there, the fused walk is state-traffic-free so
# more/smaller chunks cost almost nothing (see ssd.py::_pick_chunk notes)
_MIN_L = 196
_MAX_L = 256

# VMEM feasibility budget for the bwd working set (the bigger pass)
_VMEM_BUDGET = int(10 * 1024 * 1024)

# Mosaic's default 16 MB scoped-vmem stack is 132 KB short of the bwd
# kernel's working set at the fusion-decoder fp32 shape (H=16, l=256,
# N=512: the unrolled head loop's fp32 [l, N] matmul temporaries spill) —
# raise it like the ST kernels do; v5e has 128 MB VMEM per core
_VMEM_LIMIT = int(32 * 1024 * 1024)


def _heads_per_group(H: int, P: int) -> int:
    """Heads per grid step: enough that the x/y block's minor dim hpg*P is
    a multiple of 128 lanes — or all of H (a full-array minor dim is always
    legal)."""
    hpg = max(1, -(-128 // P))
    if hpg >= H or H % hpg:
        return H
    return hpg


def _vmem_ok(l: int, N: int, P: int, H: int, itemsize: int) -> bool:
    hpg = _heads_per_group(H, P)
    scratch = (2 * l * l + 2 * l * N + H * P * N + 3 * H * l) * 4
    blocks = (2 * (2 * l * N + 4 * l * hpg * P + hpg * P * N) * itemsize
              + 4 * H * l * 4)
    return scratch + blocks <= _VMEM_BUDGET


def ssd_fused_supported(l: int, N: int, P: int, G: int, nc: int,
                        H: int, itemsize: int = 2) -> bool:
    if not _PALLAS_OK:
        return False
    if not (_INTERPRET or jax.default_backend() == "tpu"):
        return False
    if not _vmem_ok(l, N, P, H, itemsize):
        return False
    # fp32 stays on the XLA path (interpret-mode tests excepted): the fp32
    # [l, N] matmul temporaries double the kernel working set and spill —
    # measured vfefm_2b2 fp32 12.4 pairs/s fused vs 16.3 on XLA, while
    # bf16 wins end-to-end on every SSD model (STATUS.md sixth pass)
    if itemsize > 2 and not _INTERPRET:
        return False
    # N % 128: at N=64 (ST-SSD / CNN-Mamba ref_flat) B/C/state lane-pad to
    # 128 lanes, halving MXU efficiency — measured on-device st0 fwd+bwd
    # 3.69 ms fused vs 1.78 ms for the pad-free chunked XLA path
    # (scripts/ssd_fused_parity.py), so small-N stays on XLA now that
    # N-aware _pick_chunk keeps its decay tensors small
    # l % 4 (not 8): the l axis is always a FULL array dim of its blocks
    # ([l, N] / [l, hpg*P] sublanes, [H, l] lanes), so Mosaic pads it
    # internally — l=196 costs a 2% sublane pad, measured fine
    return (G == 1 and nc >= 2 and _MIN_L <= l <= _MAX_L and l % 4 == 0
            and N % 128 == 0 and P % 8 == 0)


def _fwd_kernel(C_ref, B_ref, acum_ref, dte_ref, cdec_ref, dtp_ref, x_ref,
                y_ref, save_ref, scores, state,
                *, l: int, P: int, HPG: int, mm_dtype):
    """save_ref is None on the inference-only build (no state saving).

    cdec_ref is the whole per-batch [nc, H] scalar table in SMEM (a
    (1, 1, 1) block violates Mosaic's last-two-dims blocking rule).
    """
    c = pl.program_id(1)
    hb = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        state[pl.ds(hb * HPG, HPG)] = jnp.zeros((HPG,) + state.shape[1:],
                                                state.dtype)

    @pl.when(hb == 0)
    def _():
        scores[...] = _dg(
            C_ref[0, 0].astype(mm_dtype), B_ref[0, 0].astype(mm_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [l, l]

    sc = scores[...]
    Cm = C_ref[0, 0].astype(mm_dtype)
    Bm = B_ref[0, 0].astype(mm_dtype)
    for j in range(HPG):                                    # static unroll
        h = hb * HPG + j
        a_row = acum_ref[0, 0, pl.ds(h, 1)]                 # [1, l] fp32
        a_col = jnp.transpose(a_row)                        # [l, 1]
        E = _decay(a_row, l, a_col)
        M = (sc * E).astype(mm_dtype)
        dtp_col = jnp.transpose(dtp_ref[0, 0, pl.ds(h, 1)])  # [l, 1] fp32
        x = x_ref[0, 0, :, j * P:(j + 1) * P]               # [l, P] static
        dtx = (x.astype(jnp.float32) * dtp_col).astype(mm_dtype)
        Yd = _dg(M, dtx, (((1,), (0,)), ((), ())),
                 preferred_element_type=jnp.float32)
        Sin = state[h]                                      # [P, N] fp32
        if save_ref is not None:
            save_ref[0, 0, j] = Sin.astype(save_ref.dtype)
        Yoff = _dg(Cm, Sin.astype(mm_dtype), (((1,), (1,)), ((), ())),
                   preferred_element_type=jnp.float32)
        # per-row scales broadcast from [l, 1] column vectors (exact; the
        # MXU outer-product variant rounded them to bf16)
        y_ref[0, 0, :, j * P:(j + 1) * P] = (
            Yd + Yoff * jnp.exp(a_col)).astype(y_ref.dtype)
        # state update: S <- cdec * S + (dte*dtx)^T B
        dte_col = jnp.transpose(dte_ref[0, 0, pl.ds(h, 1)])  # [l, 1]
        dtx_d = (dtx.astype(jnp.float32) * dte_col).astype(mm_dtype)
        Snew = _dg(dtx_d, Bm, (((0,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32)
        state[h] = cdec_ref[0, c, h] * Sin + Snew


def _bwd_kernel(C_ref, B_ref, acum_ref, dte_ref, cdec_ref, dtp_ref, x_ref,
                save_ref, dy_ref,
                dx_ref, dacum_ref, ddte_ref, ddtp_ref, dcdec_ref,
                dC_ref, dB_ref,
                scores, dscores, dC_acc, dB_acc, dstate,
                dacum_acc, ddte_acc, ddtp_acc,
                *, l: int, P: int, HPG: int, mm_dtype):
    cr = pl.program_id(1)                                   # reversed chunks
    rc = pl.num_programs(1) - 1 - cr                        # real chunk idx
    hb = pl.program_id(2)

    @pl.when(cr == 0)
    def _():
        dstate[pl.ds(hb * HPG, HPG)] = jnp.zeros(
            (HPG,) + dstate.shape[1:], dstate.dtype)

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
    for j in range(HPG):                                    # static unroll
        h = hb * HPG + j
        a_row = acum_ref[0, 0, pl.ds(h, 1)]
        a_col = jnp.transpose(a_row)                        # [l, 1]
        E = _decay(a_row, l, a_col)
        M = sc * E
        dtp_col = jnp.transpose(dtp_ref[0, 0, pl.ds(h, 1)])  # [l, 1] fp32
        xf = x_ref[0, 0, :, j * P:(j + 1) * P].astype(jnp.float32)  # [l, P]
        dtx = (xf * dtp_col).astype(mm_dtype)               # [l, P]
        dy = dy_ref[0, 0, :, j * P:(j + 1) * P].astype(mm_dtype)
        dyf = dy.astype(jnp.float32)
        Sin = save_ref[0, 0, j].astype(mm_dtype)            # [P, N]
        dSout = dstate[h]                                   # [P, N] fp32

        # --- Y_diag adjoints
        ddtx_diag = _dg(M.astype(mm_dtype), dy, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        dM = _dg(dy, dtx, (((1,), (1,)), ((), ())),
                 preferred_element_type=jnp.float32)
        # accumulate straight into the VMEM scratches (register
        # accumulators across the unrolled head loop measured
        # scoped-vmem OOM in v1)
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
        dC_acc[...] += _dg(dYoff, Sin, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)  # [l, N]
        dSin = _dg(dYoff, Cm, (((0,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32)

        # --- state recurrence Sout = cdec*Sin + (dte*dtx)^T B  adjoints
        dte_col = jnp.transpose(dte_ref[0, 0, pl.ds(h, 1)])  # [l, 1]
        t = _dg(Bm, dSout.astype(mm_dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [l, P]
        ddtx = ddtx_diag + t * dte_col                      # [l, P] fp32
        # dtx = x * dtp  (computed in-kernel): chain to x and dtp
        dx_ref[0, 0, :, j * P:(j + 1) * P] = (
            ddtx * dtp_col).astype(dx_ref.dtype)
        ddtp_acc[pl.ds(h, 1)] = _rowsum(ddtx * xf)
        dtx_d = (dtx.astype(jnp.float32) * dte_col).astype(mm_dtype)
        dB_acc[...] += _dg(dtx_d, dSout.astype(mm_dtype),
                           (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)  # [l, N]
        ddte_acc[pl.ds(h, 1)] = _rowsum(t * dtx.astype(jnp.float32))
        dcdec_ref[0, rc, h] = jnp.sum(dSout * Sin.astype(jnp.float32))
        dacum_acc[pl.ds(h, 1)] = dacum_h
        dstate[h] = cdec_ref[0, rc, h] * dSout + dSin

    @pl.when(hb == pl.num_programs(2) - 1)
    def _():
        ds = dscores[...].astype(mm_dtype)
        dC_ref[0, 0] = (dC_acc[...] + _dg(
            ds, Bm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(dC_ref.dtype)
        dB_ref[0, 0] = (dB_acc[...] + _dg(
            ds, Cm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(dB_ref.dtype)
        dacum_ref[0, 0] = dacum_acc[...]
        ddte_ref[0, 0] = ddte_acc[...]
        ddtp_ref[0, 0] = ddtp_acc[...]


def _run_fwd(Cc, Bc, acum, dte, cdec, dtp, x, save: bool):
    B, nc, l, N = Cc.shape
    H = acum.shape[2]
    P = x.shape[3] // H
    HPG = _heads_per_group(H, P)
    mm_dtype = Cc.dtype
    ln = pl.BlockSpec((1, 1, l, N), lambda b, c, h: (b, c, 0, 0),
                      memory_space=pltpu.VMEM)
    hT = pl.BlockSpec((1, 1, H, l), lambda b, c, h: (b, c, 0, 0),
                      memory_space=pltpu.VMEM)
    xP = pl.BlockSpec((1, 1, l, HPG * P), lambda b, c, h: (b, c, 0, h),
                      memory_space=pltpu.VMEM)
    # whole per-batch scalar table: (1, 1, 1) blocks violate Mosaic's
    # last-two-dims rule; full (nc, H) trailing dims are always legal
    hsc = pl.BlockSpec((1, nc, H), lambda b, c, h: (b, 0, 0),
                       memory_space=pltpu.SMEM)
    body = functools.partial(_fwd_kernel, l=l, P=P, HPG=HPG,
                             mm_dtype=mm_dtype)
    if save:
        kern = body
        out_specs = [xP,
                     pl.BlockSpec((1, 1, HPG, P, N),
                                  lambda b, c, h: (b, c, h, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((B, nc, l, H * P), x.dtype),
                     jax.ShapeDtypeStruct((B, nc, H, P, N), mm_dtype)]
    else:
        def kern(C, Bc_, a, d, cd, dtp_, x_, y, scores, state):
            body(C, Bc_, a, d, cd, dtp_, x_, y, None, scores, state)
        out_specs = [xP]
        out_shape = [jax.ShapeDtypeStruct((B, nc, l, H * P), x.dtype)]
    res = pl.pallas_call(
        kern,
        grid=(B, nc, H // HPG),
        in_specs=[ln, ln, hT, hT, hsc, hT, xP],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((l, l), jnp.float32),
                        pltpu.VMEM((H, P, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(Cc, Bc, acum, dte, cdec, dtp, x)
    return (res[0], res[1]) if save else (res[0], None)


def _run_bwd(Cc, Bc, acum, dte, cdec, dtp, x, Ssave, dy):
    B, nc, l, N = Cc.shape
    H = acum.shape[2]
    P = x.shape[3] // H
    HPG = _heads_per_group(H, P)
    mm_dtype = Cc.dtype
    kern = functools.partial(_bwd_kernel, l=l, P=P, HPG=HPG,
                             mm_dtype=mm_dtype)
    rev = lambda c: nc - 1 - c
    ln = pl.BlockSpec((1, 1, l, N), lambda b, c, h: (b, rev(c), 0, 0),
                      memory_space=pltpu.VMEM)
    hT = pl.BlockSpec((1, 1, H, l), lambda b, c, h: (b, rev(c), 0, 0),
                      memory_space=pltpu.VMEM)
    xP = pl.BlockSpec((1, 1, l, HPG * P), lambda b, c, h: (b, rev(c), 0, h),
                      memory_space=pltpu.VMEM)
    hpn = pl.BlockSpec((1, 1, HPG, P, N), lambda b, c, h: (b, rev(c), h, 0, 0),
                       memory_space=pltpu.VMEM)
    # per-batch scalar tables (kernel indexes by the REAL chunk rc itself)
    hsc = pl.BlockSpec((1, nc, H), lambda b, c, h: (b, 0, 0),
                       memory_space=pltpu.SMEM)
    dx, dacum, ddte, ddtp, dcdec, dC, dB = pl.pallas_call(
        kern,
        grid=(B, nc, H // HPG),
        in_specs=[ln, ln, hT, hT, hsc, hT, xP, hpn, xP],
        out_specs=[xP, hT, hT, hT, hsc, ln, ln],
        out_shape=[
            jax.ShapeDtypeStruct((B, nc, l, H * P), x.dtype),
            jax.ShapeDtypeStruct((B, nc, H, l), jnp.float32),
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
                        pltpu.VMEM((H, P, N), jnp.float32),
                        pltpu.VMEM((H, l), jnp.float32),
                        pltpu.VMEM((H, l), jnp.float32),
                        pltpu.VMEM((H, l), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(Cc, Bc, acum, dte, cdec, dtp, x, Ssave, dy)
    return dx, dacum, ddte, ddtp, dcdec, dC, dB


@jax.custom_vjp
def ssd_fused(Cc, Bc, acum, dte, cdec, dtp, x):
    """y[b,c,l,h*P+p] = Y_diag + exp(acum) * (C @ S_in^T), S walked in VMEM.

    x is the flat l-major [B, nc, l, H*P] view; dtx = x * dtp happens
    in-kernel (see module docstring layout note).
    """
    return _run_fwd(Cc, Bc, acum, dte, cdec, dtp, x, save=False)[0]


def _vjp_fwd(Cc, Bc, acum, dte, cdec, dtp, x):
    y, Ssave = _run_fwd(Cc, Bc, acum, dte, cdec, dtp, x, save=True)
    return y, (Cc, Bc, acum, dte, cdec, dtp, x, Ssave)


def _vjp_bwd(res, dy):
    Cc, Bc, acum, dte, cdec, dtp, x, Ssave = res
    dx, dacum, ddte, ddtp, dcdec, dC, dB = _run_bwd(
        Cc, Bc, acum, dte, cdec, dtp, x, Ssave, dy.astype(x.dtype))
    return dC, dB, dacum, ddte, dcdec, ddtp, dx


ssd_fused.defvjp(_vjp_fwd, _vjp_bwd)
