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

r4: the kernel cuts its x and B/C operands directly out of the caller's
ROLE-MAJOR d0/d1 stack [B, nc, l, x_j0|x_j1|B_j0|B_j1|C_j0|C_j1|dt_j0|
dt_j1] via BlockSpecs (the same array is passed once per role with its
own spec) — the old host-side xs2/B2/C2 channel-slice copies (~3-5
ms/step of 'data formatting' at MedSSD b32 / fusion b2, r4 traces) no
longer exist, and the stack cotangent is ONE concat instead of the
slice-backward pad+add chain.  NB the first r4 attempt interleaved the
stack as [.., 2, C'] and cut (l, 2, gn) blocks: that puts the layout dim
on SUBLANES (2 -> 8 pad + a relayout per use) and cost +13 ms/step of
kernel time at MedSSD b16 — role-major channel runs are the layout that
works.  The D-skip runs inside the kernel (dD accumulated per chunk like
dcdec), and the caller builds the flipped dt rows with exact
permutation-matmul einsums instead of `jnp.flip` (lax.rev measured
0.9-2.7 ms/step).

Layouts (ref_flat, G=1; H4 = 4 * nheads heads, dir-major; gn = d_state;
C' = d_ssm + 2*gn + nheads):
  stackr : [B, nc, l, 2*C']   role-major d0|d1 stack (see above);
                              d_ssm % gn == 0 gates the block cutting
  acum   : [B, nc, H4, l]     fp32 cumsum rows, p-order per head
  dte    : [B, nc, H4, l]     fp32 exp(acum[..., -1:] - acum)
  cdec   : [B, nc, H4]        fp32 exp(acum[..., -1])
  dtp    : [B, nc, H4, l]     fp32 softplus(dt + bias)
  Dsk    : [1, 1, H4]         fp32 per-head D skip (SMEM)
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
    to 128 (or cover the class's full section width).  The role-major
    stack keeps x sections contiguous across layouts, so groups may span
    the d0/d1 boundary freely."""
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
                             itemsize: int = 2, d_ssm: int = 0) -> bool:
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
    gn = N // 4
    if d_ssm:
        # role-major stack block cutting: B/C blocks are 2*gn wide at
        # offset 2*d_ssm (block-unit indexing needs d_ssm % gn == 0), and
        # the 2*gn block width must be lane-tileable on hardware (every
        # model on this path has gn=128: MedSSD, KAN heads, cross
        # classifiers, both fusion U-Nets — r4 survey)
        if d_ssm % gn or d_ssm != (H4 // 4) * P:
            return False
        if not (_INTERPRET or (2 * gn) % 128 == 0):
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


def _assemble_full(dst, d_ref, m_ref, gn2: int, mm_dtype):
    """Coupled [l, 4*gn] group rows into ``dst``: the direct d0|d1 slab
    (one contiguous (1,1,l,2*gn) role-major stack block), then J @ the
    mirrored-chunk slab for the flipped halves."""
    l = dst.shape[0]
    J = _perm_mat(l, True, mm_dtype)
    dst[:, :gn2] = d_ref[0, 0].astype(mm_dtype)
    dst[:, gn2:] = _dg(J, m_ref[0, 0].astype(mm_dtype),
                       (((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.float32).astype(mm_dtype)


def _fwd_kernel(Bd_ref, Bm_ref, Cd_ref, Cm_ref, acum_ref, dte_ref,
                cdec_ref, dtp_ref, Dsk_ref, x2_ref,
                y_ref, save_ref, scores, state, bfull, cfull,
                *, l: int, P: int, HPG: int, HBF: int, nh: int, gn: int,
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
        _assemble_full(bfull, Bd_ref, Bm_ref, 2 * gn, mm_dtype)
        _assemble_full(cfull, Cd_ref, Cm_ref, 2 * gn, mm_dtype)
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
        # D-skip folded in (x is already p-order; y_p is p-order too)
        y_p = (Yd + Yoff * jnp.exp(a_col)
               + x * Dsk_ref[0, 0, h]).astype(mm_dtype)
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


def _bwd_kernel(Bd_ref, Bm_ref, Cd_ref, Cm_ref, acum_ref, dte_ref,
                cdec_ref, dtp_ref, Dsk_ref, x2_ref, save_ref, dy_ref,
                dx_ref, dacum_ref, ddte_ref, ddtp_ref, dcdec_ref,
                dD_ref, dC_dir_ref, dB_dir_ref, dC_flip_ref, dB_flip_ref,
                scores, dscores, dC_acc, dB_acc, dstate,
                dacum_acc, ddte_acc, ddtp_acc, bfull, cfull,
                *, l: int, P: int, HPG: int, HBF: int, nh: int, gn: int,
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
        _assemble_full(bfull, Bd_ref, Bm_ref, 2 * gn, mm_dtype)
        _assemble_full(cfull, Cd_ref, Cm_ref, 2 * gn, mm_dtype)
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

        # --- D-skip adjoints (y_p += x_p * D_h in fwd)
        D_h = Dsk_ref[0, 0, h]
        dD_ref[0, rc, h] = jnp.sum(dy * xf)

        # --- state recurrence adjoints
        dte_col = jnp.transpose(dte_ref[0, 0, pl.ds(h, 1)])  # [l, 1]
        t = _dg(Bm, dSout.astype(mm_dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [l, P]
        ddtx = ddtx_diag + t * dte_col                      # [l, P] fp32
        # dx back in d0/d1 order through the same permutation; the D-skip
        # contribution dy * D_h rides the same store
        dx_ref[0, 0, :, j * P:(j + 1) * P] = _dg(
            Mg, (ddtx * dtp_col + dy * D_h).astype(mm_dtype),
            (((1,), (0,)), ((), ())),
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
        # direct halves: one contiguous [l, 2*gn] role-major slab each
        gn2 = 2 * gn
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


def _dims(stackr, acum, d_ssm):
    B, nc, l, C2c = stackr.shape
    H4 = acum.shape[2]
    nh = H4 // 4
    P = d_ssm // nh
    return B, nc, l, C2c, H4, nh, P


def _specs(nc, l, H4, nh, P, gn, d_ssm, bwd: bool):
    """Shared BlockSpec factory for fwd/bwd (bwd walks chunks reversed).

    The role-major stack [B, nc, l, 2*C'] lays channels as
    [x_j0|x_j1|B_j0|B_j1|C_j0|C_j1|dt_j0|dt_j1], so every operand cut is
    a CONTIGUOUS channel run: x sections are HPG*P-unit blocks within
    [0, 2*d_ssm), the B/C slabs are single (l, 2*gn) blocks at
    block-aligned offsets — no host slice copies, no strided sub-layout
    blocks (an interleaved [.., 2, C'] stack put the layout dim on
    sublanes: +13 ms/step of kernel time at MedSSD b16, measured r4)."""
    HPG = _heads_per_group(H4 // 2, P)
    HB = H4 // HPG
    HBF = HB // 2
    gn2 = 2 * gn
    iB = d_ssm // gn                     # B slab block index (gn2 units)
    rev = lambda c: nc - 1 - c
    rc_ = (lambda c: rev(c)) if bwd else (lambda c: c)     # real t-chunk

    def sel(c, g):
        # chunk holding this head-group's data for t-chunk rc_(c)
        return jnp.where(g < HBF, rc_(c), rev(rc_(c)))

    def bc(i, mirror):
        return pl.BlockSpec(
            (1, 1, l, gn2),
            (lambda b, c, g: (b, rev(rc_(c)), 0, i)) if mirror else
            (lambda b, c, g: (b, rc_(c), 0, i)),
            memory_space=pltpu.VMEM)

    xS = pl.BlockSpec((1, 1, l, HPG * P),
                      lambda b, c, g: (b, sel(c, g), 0, g % HBF),
                      memory_space=pltpu.VMEM)
    yS = pl.BlockSpec((1, 1, l, HPG * P),
                      lambda b, c, g: (b, sel(c, g), 0, g),
                      memory_space=pltpu.VMEM)
    hT = pl.BlockSpec((1, 1, H4, l), lambda b, c, g: (b, rc_(c), 0, 0),
                      memory_space=pltpu.VMEM)
    hsc = pl.BlockSpec((1, nc, H4), lambda b, c, g: (b, 0, 0),
                       memory_space=pltpu.SMEM)
    dS = pl.BlockSpec((1, 1, H4), lambda b, c, g: (0, 0, 0),
                      memory_space=pltpu.SMEM)
    hpn = pl.BlockSpec((1, 1, HPG, P, 4 * gn),
                       lambda b, c, g: (b, rc_(c), g, 0, 0),
                       memory_space=pltpu.VMEM)
    lng = pl.BlockSpec((1, 1, l, gn2),
                       lambda b, c, g: (b, rc_(c), 0, 0),
                       memory_space=pltpu.VMEM)
    lngm = pl.BlockSpec((1, 1, l, gn2),
                        lambda b, c, g: (b, rev(rc_(c)), 0, 0),
                        memory_space=pltpu.VMEM)
    return dict(HPG=HPG, HB=HB, HBF=HBF, iB=iB, bc=bc, xS=xS, yS=yS,
                hT=hT, hsc=hsc, dS=dS, hpn=hpn, lng=lng, lngm=lngm)


def _run_fwd(stackr, acum, dte, cdec, dtp, Dsk, d_ssm, gn, save: bool):
    B, nc, l, C2c, H4, nh, P = _dims(stackr, acum, d_ssm)
    N = 4 * gn
    sp = _specs(nc, l, H4, nh, P, gn, d_ssm, bwd=False)
    HPG, HB, HBF, iB = sp["HPG"], sp["HB"], sp["HBF"], sp["iB"]
    mm_dtype = stackr.dtype
    body = functools.partial(_fwd_kernel, l=l, P=P, HPG=HPG, HBF=HBF,
                             nh=nh, gn=gn, mm_dtype=mm_dtype)
    scratch = [pltpu.VMEM((l, l), jnp.float32),
               pltpu.VMEM((H4, P, N), jnp.float32),
               pltpu.VMEM((l, N), mm_dtype),
               pltpu.VMEM((l, N), mm_dtype)]
    if save:
        kern = body
        out_specs = [sp["yS"],
                     pl.BlockSpec((1, 1, HPG, P, N),
                                  lambda b, c, g: (b, c, g, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((B, nc, l, H4 * P), stackr.dtype),
                     jax.ShapeDtypeStruct((B, nc, H4, P, N), mm_dtype)]
    else:
        def kern(Bd_, Bm_, Cd_, Cm_, a_, d_, cd_, dtp_, Dk_, x_, y_, *scr):
            body(Bd_, Bm_, Cd_, Cm_, a_, d_, cd_, dtp_, Dk_, x_, y_, None,
                 *scr)
        out_specs = [sp["yS"]]
        out_shape = [jax.ShapeDtypeStruct((B, nc, l, H4 * P), stackr.dtype)]
    res = pl.pallas_call(
        kern,
        grid=(B, nc, HB),
        in_specs=[sp["bc"](iB, False), sp["bc"](iB, True),
                  sp["bc"](iB + 1, False), sp["bc"](iB + 1, True),
                  sp["hT"], sp["hT"], sp["hsc"], sp["hT"], sp["dS"],
                  sp["xS"]],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(stackr, stackr, stackr, stackr, acum, dte, cdec, dtp, Dsk, stackr)
    return (res[0], res[1]) if save else (res[0], None)


def _run_bwd(stackr, acum, dte, cdec, dtp, Dsk, d_ssm, gn, Ssave, dy):
    B, nc, l, C2c, H4, nh, P = _dims(stackr, acum, d_ssm)
    N = 4 * gn
    sp = _specs(nc, l, H4, nh, P, gn, d_ssm, bwd=True)
    HPG, HB, HBF, iB = sp["HPG"], sp["HB"], sp["HBF"], sp["iB"]
    mm_dtype = stackr.dtype
    kern = functools.partial(_bwd_kernel, l=l, P=P, HPG=HPG, HBF=HBF,
                             nh=nh, gn=gn, mm_dtype=mm_dtype)
    outs = pl.pallas_call(
        kern,
        grid=(B, nc, HB),
        in_specs=[sp["bc"](iB, False), sp["bc"](iB, True),
                  sp["bc"](iB + 1, False), sp["bc"](iB + 1, True),
                  sp["hT"], sp["hT"], sp["hsc"], sp["hT"], sp["dS"],
                  sp["xS"], sp["hpn"], sp["yS"]],
        out_specs=[sp["yS"], sp["hT"], sp["hT"], sp["hT"], sp["hsc"],
                   sp["hsc"], sp["lng"], sp["lng"], sp["lngm"], sp["lngm"]],
        out_shape=[
            jax.ShapeDtypeStruct((B, nc, l, H4 * P), stackr.dtype),
            jax.ShapeDtypeStruct((B, nc, H4, l), jnp.float32),
            jax.ShapeDtypeStruct((B, nc, H4, l), jnp.float32),
            jax.ShapeDtypeStruct((B, nc, H4, l), jnp.float32),
            jax.ShapeDtypeStruct((B, nc, H4), jnp.float32),
            jax.ShapeDtypeStruct((B, nc, H4), jnp.float32),
            jax.ShapeDtypeStruct((B, nc, l, 2 * gn), stackr.dtype),
            jax.ShapeDtypeStruct((B, nc, l, 2 * gn), stackr.dtype),
            jax.ShapeDtypeStruct((B, nc, l, 2 * gn), stackr.dtype),
            jax.ShapeDtypeStruct((B, nc, l, 2 * gn), stackr.dtype),
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
    )(stackr, stackr, stackr, stackr, acum, dte, cdec, dtp, Dsk, stackr,
      Ssave, dy)
    (dx, dacum, ddte, ddtp, dcdec, dD,
     dC_dir, dB_dir, dC_flip, dB_flip) = outs
    return (dx, dacum, ddte, ddtp, dcdec, dD,
            dB_dir + dB_flip, dC_dir + dC_flip)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def ssd_fused_dirs(stackr, acum, dte, cdec, dtp, Dsk, d_ssm, gn):
    """Four-direction folded SSD from d0/d1 bytes only (see module doc)."""
    return _run_fwd(stackr, acum, dte, cdec, dtp, Dsk, d_ssm, gn,
                    save=False)[0]


def _vjp_fwd(stackr, acum, dte, cdec, dtp, Dsk, d_ssm, gn):
    y, Ssave = _run_fwd(stackr, acum, dte, cdec, dtp, Dsk, d_ssm, gn,
                        save=True)
    return y, (stackr, acum, dte, cdec, dtp, Dsk, Ssave)


def _vjp_bwd(d_ssm, gn, res, dy):
    stackr, acum, dte, cdec, dtp, Dsk, Ssave = res
    B, nc, l, C2c = stackr.shape
    nh = acum.shape[2] // 4
    dx, dacum, ddte, ddtp, dcdec, dD, dB2, dC2 = _run_bwd(
        stackr, acum, dte, cdec, dtp, Dsk, d_ssm, gn, Ssave,
        dy.astype(stackr.dtype))
    # dx carries all four direction sections (2/3 already d0/d1-ordered);
    # the role-major stack x cotangent is the sum of the direction-class
    # halves (already [x_j0 | x_j1] order); B/C cotangents slot in at
    # their channel runs and dt channels are zero (dt flows through the
    # OUTSIDE softplus/cumsum chain, differentiated by XLA).  ONE concat
    # replaces the old slice-backward pad+add chain.
    half = dx.shape[3] // 2
    dx2 = (dx[..., :half].astype(jnp.float32)
           + dx[..., half:].astype(jnp.float32)).astype(stackr.dtype)
    d_stackr = jnp.concatenate(
        [dx2, dB2, dC2,
         jnp.zeros((B, nc, l, 2 * nh), stackr.dtype)], axis=-1)
    dDsk = jnp.sum(dD, axis=(0, 1))[None, None].astype(Dsk.dtype)
    return d_stackr, dacum, ddte, dcdec, ddtp, dDsk


ssd_fused_dirs.defvjp(_vjp_fwd, _vjp_bwd)
