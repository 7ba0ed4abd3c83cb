"""Direction-folded, flip-free fused Pallas SSD scan.

`ss2d_core_ssd` folds the four 2-D scan directions into the head axis and
feeds `ssd_chunked` materialised per-direction copies: directions 2/3 are
sequence flips of 0/1, so the host stack writes two flipped x slabs, the
merge flips the y halves back, and the backward pass flips dy/dx again —
measured 5.5 ms (stack fwd+bwd) + 1.6 ms (merge) per MedSSD b16 step,
pure HBM copy traffic (trace r3, /tmp/xscan_bench).

This kernel keeps the folded-head design but reads directions 2/3 from
the SAME bytes as 0/1:

  * the host materialises only the d0/d1 stack ([B, L, 2, C'] — d1's
    spatial transpose cannot be a view); d2 = flip(d0) and d3 = flip(d1)
    never exist in HBM;
  * every head still scans ascending position p (the folded design), but
    a reverse-class head's data at chunk c lives in chunk nc-1-c of the
    d0/d1 arrays, reversed within the chunk.  The block index maps select
    the mirrored chunk per head-group, and the within-chunk reversal is
    an anti-identity permutation matmul J @ X on the MXU — EXACT for bf16
    operands (one nonzero product per output lane), zero HBM traffic,
    ~0.03 ms of MXU work per step;
  * y for reverse-class heads is written back through J into the mirrored
    chunk, so the kernel emits all four direction outputs already in
    d0/d1 order — `cross_merge_noflip_time_major` just adds the halves
    (no flips, fwd or bwd);
  * ref_flat's cross-direction coupling (state = K*d_state per group,
    B/C concatenated over directions) is preserved: the [l, 4*gn] group
    B/C rows are assembled in VMEM from the direct chunk block plus
    J @ (mirrored chunk block), and the shared scores matmul runs once
    per (b, c) for all heads exactly as in `ssd_fused_pallas`;
  * backward mirrors the maps: dy reads / dx writes ride the mirrored
    chunks through J, and the flipped-half dB/dC gradients flush into
    their own outputs at the mirrored chunk (J applied at flush — J is a
    permutation, so the bf16 store rounding is bit-identical to the
    direct store), summed with the direct parts outside the kernel.

Reference semantics: `mamba_chunk_scan_combined`
(/root/reference/CrossMamba/FusionMamba/mamba_ssm/ops/triton/), folded
four-direction form of `SSD/MedSSD.py:343-358`.

Layouts (ref_flat, G=1; H4 = 4 * nheads heads, dir-major; gn = d_state):
  C2, B2 : [B, nc, l, 2*gn]   d0|d1 slabs (flipped halves assembled here)
  acum   : [B, nc, H4, l]     fp32 cumsum rows, p-order per head
  dte    : [B, nc, H4, l]     fp32 exp(acum[..., -1:] - acum)
  cdec   : [B, nc, H4]        fp32 exp(acum[..., -1])
  dtp    : [B, nc, H4, l]     fp32 softplus(dt + bias)
  x2     : [B, nc, l, 2*nh*P] flat l-major d0|d1 sections
  out y  : [B, nc, l, H4*P]   four sections, d0/d1-ordered content
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from medical_image_classification_tpu.kernels.ssd_fused_pallas import (
    _MAX_L,
    _MIN_L,
    _VMEM_LIMIT,
)
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

_VMEM_BUDGET = int(10 * 1024 * 1024)


def _heads_per_group(H2: int, P: int) -> int:
    """Head-group size within ONE direction class: hpg*P lanes must tile
    to 128 (or cover the class's full section width)."""
    hpg = max(1, -(-128 // P))
    if hpg >= H2 or H2 % hpg:
        return H2
    return hpg


def _vmem_ok(l: int, N: int, P: int, H4: int, itemsize: int) -> bool:
    hpg = _heads_per_group(H4 // 2, P)
    # scores + dscores + Bfull/Cfull + Mg + dB/dC acc + state + rows
    scratch = ((2 * l * l + 2 * l * N) * 4 + 2 * l * N * itemsize
               + l * l * itemsize + H4 * P * N * 4 + 3 * H4 * l * 4)
    blocks = (2 * (2 * 2 * l * N // 2 + 4 * l * hpg * P + hpg * P * N)
              * itemsize + 4 * H4 * l * 4)
    return scratch + blocks <= _VMEM_BUDGET


def ssd_fused_dirs_supported(l: int, N: int, P: int, nc: int, H4: int,
                             itemsize: int = 2) -> bool:
    """N here is the full coupled state width (K * d_state = 4 * gn)."""
    if not _PALLAS_OK:
        return False
    if not (_INTERPRET or jax.default_backend() == "tpu"):
        return False
    if H4 % 4 or N % 4:
        return False
    if not _vmem_ok(l, N, P, H4, itemsize):
        return False
    if itemsize > 2 and not _INTERPRET:
        return False            # fp32: same economics as ssd_fused (gate off)
    h2 = H4 // 2
    hpg = _heads_per_group(h2, P)
    if (h2 // hpg) * hpg != h2:
        return False
    # nc >= 2: single-chunk stages (MedSSD stage 2, L=196) were tried at
    # nc=1 (the kernel handles it — the mirror map degenerates to a pure
    # J reversal, parity-tested) but measured a 4.8 ms/step LOSS on the
    # full model (ABBA 47.1 -> 51.9 ms, r3): at l=196 with H4=32 the
    # per-head [l, P] matmuls are too small to beat XLA's batched
    # einsums + fused epilogue, and there is no state walk to win back.
    return (nc >= 2 and _MIN_L <= l <= _MAX_L and l % 4 == 0
            and N % 128 == 0 and P % 8 == 0)


def _perm_mat(l: int, is_rev, dtype):
    """Identity (forward class) or anti-identity J (reverse class), exact
    permutation matmul operand.  ``is_rev`` is a traced scalar bool."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    target = jnp.where(is_rev, l - 1 - cols, cols)
    return (rows == target).astype(dtype)


def _fwd_kernel(C2_ref, B2_ref, C2r_ref, B2r_ref, acum_ref, dte_ref,
                cdec_ref, dtp_ref, x2_ref,
                y_ref, save_ref, scores, state, bfull, cfull,
                *, l: int, P: int, HPG: int, HBF: int, nh: int, gn2: int,
                mm_dtype):
    """save_ref is None on the inference-only build."""
    c = pl.program_id(1)
    g = pl.program_id(2)
    is_rev = g >= HBF

    @pl.when(c == 0)
    def _():
        state[pl.ds(g * HPG, HPG)] = jnp.zeros((HPG,) + state.shape[1:],
                                               state.dtype)

    Mg = _perm_mat(l, is_rev, mm_dtype)

    @pl.when(g == 0)
    def _():
        # assemble the coupled [l, 4*gn] group rows: direct d0|d1 slabs,
        # then J @ mirrored-chunk slabs for the flipped halves
        J = _perm_mat(l, True, mm_dtype)
        bfull[:, :gn2] = B2_ref[0, 0].astype(mm_dtype)
        bfull[:, gn2:] = _dg(J, B2r_ref[0, 0].astype(mm_dtype),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(mm_dtype)
        cfull[:, :gn2] = C2_ref[0, 0].astype(mm_dtype)
        cfull[:, gn2:] = _dg(J, C2r_ref[0, 0].astype(mm_dtype),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(mm_dtype)
        scores[...] = _dg(cfull[...], bfull[...], (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)

    sc = scores[...]
    Cm = cfull[...]
    Bm = bfull[...]
    for j in range(HPG):                                    # static unroll
        h = g * HPG + j
        a_row = acum_ref[0, 0, pl.ds(h, 1)]                 # [1, l] fp32
        a_col = jnp.transpose(a_row)                        # [l, 1]
        E = _decay(a_row, l, a_col)
        M = (sc * E).astype(mm_dtype)
        dtp_col = jnp.transpose(dtp_ref[0, 0, pl.ds(h, 1)])  # [l, 1] fp32
        xr = x2_ref[0, 0, :, j * P:(j + 1) * P]             # [l, P] static
        # p-order data for this head: identity for the forward class,
        # within-chunk reversal (J) for the reverse class — exact
        x = _dg(Mg, xr.astype(mm_dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dtx = (x * dtp_col).astype(mm_dtype)
        Yd = _dg(M, dtx, (((1,), (0,)), ((), ())),
                 preferred_element_type=jnp.float32)
        Sin = state[h]                                      # [P, N] fp32
        if save_ref is not None:
            save_ref[0, 0, j] = Sin.astype(save_ref.dtype)
        Yoff = _dg(Cm, Sin.astype(mm_dtype), (((1,), (1,)), ((), ())),
                   preferred_element_type=jnp.float32)
        y_p = (Yd + Yoff * jnp.exp(a_col)).astype(mm_dtype)
        # write back in d0/d1 order (the block map already targets the
        # mirrored chunk for the reverse class)
        y_ref[0, 0, :, j * P:(j + 1) * P] = _dg(
            Mg, y_p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(y_ref.dtype)
        dte_col = jnp.transpose(dte_ref[0, 0, pl.ds(h, 1)])  # [l, 1]
        dtx_d = (dtx.astype(jnp.float32) * dte_col).astype(mm_dtype)
        Snew = _dg(dtx_d, Bm, (((0,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32)
        state[h] = cdec_ref[0, c, h] * Sin + Snew


def _bwd_kernel(C2_ref, B2_ref, C2r_ref, B2r_ref, acum_ref, dte_ref,
                cdec_ref, dtp_ref, x2_ref, save_ref, dy_ref,
                dx_ref, dacum_ref, ddte_ref, ddtp_ref, dcdec_ref,
                dC_dir_ref, dB_dir_ref, dC_flip_ref, dB_flip_ref,
                scores, dscores, dC_acc, dB_acc, dstate,
                dacum_acc, ddte_acc, ddtp_acc, bfull, cfull,
                *, l: int, P: int, HPG: int, HBF: int, nh: int, gn2: int,
                mm_dtype):
    cr = pl.program_id(1)                                   # reversed chunks
    rc = pl.num_programs(1) - 1 - cr                        # real chunk idx
    g = pl.program_id(2)
    is_rev = g >= HBF

    @pl.when(cr == 0)
    def _():
        dstate[pl.ds(g * HPG, HPG)] = jnp.zeros(
            (HPG,) + dstate.shape[1:], dstate.dtype)

    Mg = _perm_mat(l, is_rev, mm_dtype)

    @pl.when(g == 0)
    def _():
        J = _perm_mat(l, True, mm_dtype)
        bfull[:, :gn2] = B2_ref[0, 0].astype(mm_dtype)
        bfull[:, gn2:] = _dg(J, B2r_ref[0, 0].astype(mm_dtype),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(mm_dtype)
        cfull[:, :gn2] = C2_ref[0, 0].astype(mm_dtype)
        cfull[:, gn2:] = _dg(J, C2r_ref[0, 0].astype(mm_dtype),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(mm_dtype)
        scores[...] = _dg(cfull[...], bfull[...], (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)
        dscores[...] = jnp.zeros_like(dscores)
        dC_acc[...] = jnp.zeros_like(dC_acc)
        dB_acc[...] = jnp.zeros_like(dB_acc)

    sc = scores[...]
    Cm = cfull[...]
    Bm = bfull[...]
    for j in range(HPG):                                    # static unroll
        h = g * HPG + j
        a_row = acum_ref[0, 0, pl.ds(h, 1)]
        a_col = jnp.transpose(a_row)                        # [l, 1]
        E = _decay(a_row, l, a_col)
        M = sc * E
        dtp_col = jnp.transpose(dtp_ref[0, 0, pl.ds(h, 1)])  # [l, 1] fp32
        xr = x2_ref[0, 0, :, j * P:(j + 1) * P]
        xf = _dg(Mg, xr.astype(mm_dtype), (((1,), (0,)), ((), ())),
                 preferred_element_type=jnp.float32)        # [l, P] p-order
        dtx = (xf * dtp_col).astype(mm_dtype)               # [l, P]
        dyr = dy_ref[0, 0, :, j * P:(j + 1) * P]
        dy = _dg(Mg, dyr.astype(mm_dtype), (((1,), (0,)), ((), ())),
                 preferred_element_type=jnp.float32)        # [l, P] p-order
        dym = dy.astype(mm_dtype)
        Sin = save_ref[0, 0, j].astype(mm_dtype)            # [P, N]
        dSout = dstate[h]                                   # [P, N] fp32

        # --- Y_diag adjoints
        ddtx_diag = _dg(M.astype(mm_dtype), dym, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        dM = _dg(dym, dtx, (((1,), (1,)), ((), ())),
                 preferred_element_type=jnp.float32)
        dscores[...] += dM * E
        G = dM * M
        dacum_h = _rowsum(G) - jnp.sum(G, axis=0, keepdims=True)

        # --- Y_off = (C @ Sin^T) * exp(acum)  adjoints
        eA_col = jnp.exp(a_col)                             # [l, 1]
        Yoff = _dg(Cm, Sin, (((1,), (1,)), ((), ())),
                   preferred_element_type=jnp.float32)
        dYoff = (dy * eA_col).astype(mm_dtype)              # [l, P]
        dacum_h = dacum_h + _rowsum(dy * Yoff * eA_col)     # [1, l]
        dC_acc[...] += _dg(dYoff, Sin, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)  # [l, N]
        dSin = _dg(dYoff, Cm, (((0,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32)

        # --- state recurrence adjoints
        dte_col = jnp.transpose(dte_ref[0, 0, pl.ds(h, 1)])  # [l, 1]
        t = _dg(Bm, dSout.astype(mm_dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [l, P]
        ddtx = ddtx_diag + t * dte_col                      # [l, P] fp32
        # dx back in d0/d1 order through the same permutation
        dx_ref[0, 0, :, j * P:(j + 1) * P] = _dg(
            Mg, (ddtx * dtp_col).astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dx_ref.dtype)
        ddtp_acc[pl.ds(h, 1)] = _rowsum(ddtx * xf)
        dtx_d = (dtx.astype(jnp.float32) * dte_col).astype(mm_dtype)
        dB_acc[...] += _dg(dtx_d, dSout.astype(mm_dtype),
                           (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)  # [l, N]
        ddte_acc[pl.ds(h, 1)] = _rowsum(t * dtx.astype(jnp.float32))
        dcdec_ref[0, rc, h] = jnp.sum(dSout * Sin.astype(jnp.float32))
        dacum_acc[pl.ds(h, 1)] = dacum_h
        dstate[h] = cdec_ref[0, rc, h] * dSout + dSin

    @pl.when(g == pl.num_programs(2) - 1)
    def _():
        ds = dscores[...].astype(mm_dtype)
        dC_full = dC_acc[...] + _dg(ds, bfull[...], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        dB_full = dB_acc[...] + _dg(ds, cfull[...], (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        J = _perm_mat(l, True, mm_dtype)
        dC_dir_ref[0, 0] = dC_full[:, :gn2].astype(dC_dir_ref.dtype)
        dB_dir_ref[0, 0] = dB_full[:, :gn2].astype(dB_dir_ref.dtype)
        # flipped halves flush at the MIRRORED chunk, back in d0/d1 order
        # (J is a permutation: bf16 rounding identical to a direct store)
        dC_flip_ref[0, 0] = _dg(
            J, dC_full[:, gn2:].astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dC_flip_ref.dtype)
        dB_flip_ref[0, 0] = _dg(
            J, dB_full[:, gn2:].astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dB_flip_ref.dtype)
        dacum_ref[0, 0] = dacum_acc[...]
        ddte_ref[0, 0] = ddte_acc[...]
        ddtp_ref[0, 0] = ddtp_acc[...]


def _dims(C2, x2, acum):
    B, nc, l, gn2 = C2.shape
    H4 = acum.shape[2]
    nh = H4 // 4
    P = x2.shape[3] // (2 * nh)
    return B, nc, l, gn2, H4, nh, P


def _run_fwd(C2, B2, acum, dte, cdec, dtp, x2, save: bool):
    B, nc, l, gn2, H4, nh, P = _dims(C2, x2, acum)
    N = 2 * gn2
    h2 = H4 // 2
    HPG = _heads_per_group(h2, P)
    HB = H4 // HPG
    HBF = HB // 2
    mm_dtype = C2.dtype
    rev = lambda c: nc - 1 - c

    def sel(c, g):
        return jnp.where(g < HBF, c, rev(c))

    ln = pl.BlockSpec((1, 1, l, gn2), lambda b, c, g: (b, c, 0, 0),
                      memory_space=pltpu.VMEM)
    lnr = pl.BlockSpec((1, 1, l, gn2), lambda b, c, g: (b, rev(c), 0, 0),
                       memory_space=pltpu.VMEM)
    hT = pl.BlockSpec((1, 1, H4, l), lambda b, c, g: (b, c, 0, 0),
                      memory_space=pltpu.VMEM)
    hsc = pl.BlockSpec((1, nc, H4), lambda b, c, g: (b, 0, 0),
                       memory_space=pltpu.SMEM)
    xS = pl.BlockSpec((1, 1, l, HPG * P),
                      lambda b, c, g: (b, sel(c, g), 0, g % HBF),
                      memory_space=pltpu.VMEM)
    yS = pl.BlockSpec((1, 1, l, HPG * P),
                      lambda b, c, g: (b, sel(c, g), 0, g),
                      memory_space=pltpu.VMEM)
    body = functools.partial(_fwd_kernel, l=l, P=P, HPG=HPG, HBF=HBF,
                             nh=nh, gn2=gn2, mm_dtype=mm_dtype)
    scratch = [pltpu.VMEM((l, l), jnp.float32),
               pltpu.VMEM((H4, P, N), jnp.float32),
               pltpu.VMEM((l, N), mm_dtype),
               pltpu.VMEM((l, N), mm_dtype)]
    if save:
        kern = body
        out_specs = [yS,
                     pl.BlockSpec((1, 1, HPG, P, N),
                                  lambda b, c, g: (b, c, g, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((B, nc, l, H4 * P), x2.dtype),
                     jax.ShapeDtypeStruct((B, nc, H4, P, N), mm_dtype)]
    else:
        def kern(C2_, B2_, C2r_, B2r_, a_, d_, cd_, dtp_, x_, y_, *scr):
            body(C2_, B2_, C2r_, B2r_, a_, d_, cd_, dtp_, x_, y_, None,
                 *scr)
        out_specs = [yS]
        out_shape = [jax.ShapeDtypeStruct((B, nc, l, H4 * P), x2.dtype)]
    res = pl.pallas_call(
        kern,
        grid=(B, nc, HB),
        in_specs=[ln, ln, lnr, lnr, hT, hT, hsc, hT, xS],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(C2, B2, C2, B2, acum, dte, cdec, dtp, x2)
    return (res[0], res[1]) if save else (res[0], None)


def _run_bwd(C2, B2, acum, dte, cdec, dtp, x2, Ssave, dy):
    B, nc, l, gn2, H4, nh, P = _dims(C2, x2, acum)
    N = 2 * gn2
    h2 = H4 // 2
    HPG = _heads_per_group(h2, P)
    HB = H4 // HPG
    HBF = HB // 2
    mm_dtype = C2.dtype
    rev = lambda c: nc - 1 - c

    def selx(c, g):
        # forward class: real chunk rc = rev(c); reverse class: rev(rc) = c
        return jnp.where(g < HBF, rev(c), c)

    ln = pl.BlockSpec((1, 1, l, gn2), lambda b, c, g: (b, rev(c), 0, 0),
                      memory_space=pltpu.VMEM)
    lnr = pl.BlockSpec((1, 1, l, gn2), lambda b, c, g: (b, c, 0, 0),
                       memory_space=pltpu.VMEM)
    hT = pl.BlockSpec((1, 1, H4, l), lambda b, c, g: (b, rev(c), 0, 0),
                      memory_space=pltpu.VMEM)
    hsc = pl.BlockSpec((1, nc, H4), lambda b, c, g: (b, 0, 0),
                       memory_space=pltpu.SMEM)
    xS = pl.BlockSpec((1, 1, l, HPG * P),
                      lambda b, c, g: (b, selx(c, g), 0, g % HBF),
                      memory_space=pltpu.VMEM)
    dyS = pl.BlockSpec((1, 1, l, HPG * P),
                       lambda b, c, g: (b, selx(c, g), 0, g),
                       memory_space=pltpu.VMEM)
    hpn = pl.BlockSpec((1, 1, HPG, P, N),
                       lambda b, c, g: (b, rev(c), g, 0, 0),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_bwd_kernel, l=l, P=P, HPG=HPG, HBF=HBF,
                             nh=nh, gn2=gn2, mm_dtype=mm_dtype)
    outs = pl.pallas_call(
        kern,
        grid=(B, nc, HB),
        in_specs=[ln, ln, lnr, lnr, hT, hT, hsc, hT, xS, hpn, dyS],
        out_specs=[dyS, hT, hT, hT, hsc, ln, ln, lnr, lnr],
        out_shape=[
            jax.ShapeDtypeStruct((B, nc, l, H4 * P), x2.dtype),
            jax.ShapeDtypeStruct((B, nc, H4, l), jnp.float32),
            jax.ShapeDtypeStruct((B, nc, H4, l), jnp.float32),
            jax.ShapeDtypeStruct((B, nc, H4, l), jnp.float32),
            jax.ShapeDtypeStruct((B, nc, H4), jnp.float32),
            jax.ShapeDtypeStruct((B, nc, l, gn2), C2.dtype),
            jax.ShapeDtypeStruct((B, nc, l, gn2), B2.dtype),
            jax.ShapeDtypeStruct((B, nc, l, gn2), C2.dtype),
            jax.ShapeDtypeStruct((B, nc, l, gn2), B2.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((l, l), jnp.float32),
                        pltpu.VMEM((l, l), jnp.float32),
                        pltpu.VMEM((l, N), jnp.float32),
                        pltpu.VMEM((l, N), jnp.float32),
                        pltpu.VMEM((H4, P, N), jnp.float32),
                        pltpu.VMEM((H4, l), jnp.float32),
                        pltpu.VMEM((H4, l), jnp.float32),
                        pltpu.VMEM((H4, l), jnp.float32),
                        pltpu.VMEM((l, N), mm_dtype),
                        pltpu.VMEM((l, N), mm_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(C2, B2, C2, B2, acum, dte, cdec, dtp, x2, Ssave, dy)
    (dx, dacum, ddte, ddtp, dcdec,
     dC_dir, dB_dir, dC_flip, dB_flip) = outs
    return dx, dacum, ddte, ddtp, dcdec, dC_dir + dC_flip, dB_dir + dB_flip


@jax.custom_vjp
def ssd_fused_dirs(C2, B2, acum, dte, cdec, dtp, x2):
    """Four-direction folded SSD from d0/d1 bytes only (see module doc)."""
    return _run_fwd(C2, B2, acum, dte, cdec, dtp, x2, save=False)[0]


def _vjp_fwd(C2, B2, acum, dte, cdec, dtp, x2):
    y, Ssave = _run_fwd(C2, B2, acum, dte, cdec, dtp, x2, save=True)
    return y, (C2, B2, acum, dte, cdec, dtp, x2, Ssave)


def _vjp_bwd(res, dy):
    C2, B2, acum, dte, cdec, dtp, x2, Ssave = res
    dx, dacum, ddte, ddtp, dcdec, dC2, dB2 = _run_bwd(
        C2, B2, acum, dte, cdec, dtp, x2, Ssave, dy.astype(x2.dtype))
    # dx carries all four direction sections (2/3 already d0/d1-ordered);
    # the x2 cotangent is the sum of the two direction-class halves
    half = x2.shape[3]
    dx2 = dx[..., :half].astype(jnp.float32) + dx[..., half:].astype(
        jnp.float32)
    return dC2, dB2, dacum, ddte, dcdec, ddtp, dx2.astype(x2.dtype)


ssd_fused_dirs.defvjp(_vjp_fwd, _vjp_bwd)
