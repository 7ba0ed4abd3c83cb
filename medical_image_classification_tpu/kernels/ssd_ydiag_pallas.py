"""Fused Pallas kernel for the SSD intra-chunk output (Y_diag).

The XLA path in `ssd.py` materialises the per-head masked-decay matrix
``M = (C B^T) * exp(segsum(dtA))`` — a ``[B, nc, H, l, l]`` tensor — in HBM
(436 MB at MedSSD b16 stage 0), then reads it back for the output einsum,
and the backward pass recomputes + re-materialises it plus its cotangent.
That l^2 HBM traffic dominates the SSD stage cost (profiled ~7.4 ms of a
20.5 ms stage-0 call).

This kernel is the flash-attention shape of the same math (the reference's
Triton kernel `mamba_chunk_scan_combined` fuses identically): per
(batch*chunk, head-block) grid step everything lives in VMEM —

  * the group-level scores matmul ``C @ B^T`` (the expensive N-contraction,
    N = K*d_state = 512 at ref_flat) runs ONCE per chunk into a VMEM
    scratch that persists across the sequential head grid dimension;
  * per head, the decay matrix ``exp(a_i - a_j)`` (a = inclusive cumsum of
    dtA) is built on the fly: the sublane orientation a_i comes from an
    MXU outer product of the lane-major cumsum with ones (a [l, 1] input
    block would tile to 128 lanes — 128x VMEM waste), masked causally,
    multiplied by the scores, and contracted with dt*x on the MXU;
  * backward recomputes scores/decay the same way and emits d(dtx), the
    two dacum reductions (row/col sums as lane-major ones-matmuls —
    combined outside), and accumulates dscores across head blocks in fp32
    scratch, producing dC/dB with two matmuls on the last step.

No l^2 tensor ever touches HBM.  Reference semantics mirror
`/root/reference/CrossMamba/FusionMamba/mamba_ssm/ops/triton/` (SSD
algorithm); tolerances follow the reference ladder.

Layouts (G=1 / ref_flat only — the layout every SSD model here uses):
  Cc, Bc : [BC, l, N]      BC = batch * num_chunks
  acum   : [BC, H, l]      fp32 inclusive cumsum of dt*A within the chunk
  dtx    : [BC, H, l, P]   head-major dt-weighted x
  out Yd : [BC, H, l, P]   head-major (caller transposes once, fused by XLA)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas imports fail gracefully off-TPU builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

# test hook: interpreter mode (golden tests on CPU)
_INTERPRET = False

# fp32 matmul operands round to bf16 on the MXU at DEFAULT precision —
# measured ~1%% errors through exp(a_i - a_j) on-chip; HIGHEST forces the
# fp32 emulation passes (no-op for native bf16 operands)
_P_HI = jax.lax.Precision.HIGHEST

def _dg(a, b, dimension_numbers, preferred_element_type=jnp.float32,
        precision=None):
    """dot_general with fp32-safe precision.

    Mosaic's DEFAULT precision rounds fp32 MXU operands to bf16 (measured
    ~1% error through exp(a_i - a_j) on-chip), while HIGHEST on native
    bf16 operands fails to compile ("Bad lhs type") — so HIGHEST is applied
    exactly when both operands are fp32.  The precision is always passed
    explicitly: a global ``jax_default_matmul_precision=highest`` (set e.g.
    by parity harnesses) would otherwise leak into ``precision=None`` and
    hit the bf16 "Bad lhs type" Mosaic failure.
    """
    if precision is None:
        if a.dtype == jnp.float32 and b.dtype == jnp.float32:
            precision = _P_HI
        else:
            precision = jax.lax.Precision.DEFAULT
    return jax.lax.dot_general(a, b, dimension_numbers,
                               preferred_element_type=preferred_element_type,
                               precision=precision)


# VMEM working-set cap for choosing the head-block size
_VMEM_BUDGET = int(8 * 1024 * 1024)

# smallest chunk the kernel beats XLA at (tests lower it to exercise
# small interpret-mode shapes)
_MIN_L = 224


def _pick_hb(H: int, l: int, N: int, P: int, itemsize: int = 2) -> int:
    """Largest head-block HB dividing H whose working set fits the budget.

    Models the bwd kernel (the bigger one): scores/dscores scratches +
    per-head [l, l] fp32 temporaries, double-buffered C/B blocks, and
    double-buffered [HB, l, P] blocks (dtx, dy, ddtx, y).

    Mosaic block shapes need the second-to-last dim divisible by 8 or equal
    to the array dim, so HB is 16, 8, or H itself; returns None if nothing
    fits (callers gate the kernel off).
    """
    fixed = 2 * l * l * 4 + 4 * l * N * itemsize + 6 * l * l * 4
    for hb in (16, 8, H):
        if hb > H or H % hb:
            continue
        per = 8 * hb * l * P * itemsize + 4 * hb * l * 4
        if fixed + per <= _VMEM_BUDGET:
            return hb
    return None


def ydiag_supported(l: int, N: int, P: int, G: int, H: int = None,
                    itemsize: int = 2) -> bool:
    if not _PALLAS_OK:
        return False
    if not (_INTERPRET or jax.default_backend() == "tpu"):
        return False
    if H is not None and _pick_hb(H, l, N, P, itemsize) is None:
        return False
    # one (l, l) tile per program; lane-friendly operands.  Small chunks
    # (l < _MIN_L) measured SLOWER than the XLA batched einsums (per-program
    # launch + half-empty tiles beat the l^2 HBM saving only at big l:
    # stage2 l=200: 0.81 -> 1.28 ms, stage3 l=56: 0.67 -> 0.89, but
    # stage0 l=256: 20.5 -> 19.5 fwd+bwd).
    # N % 64: N=64 (ST-SSD / CNN-Mamba ref_flat) lane-pads the B/C loads and
    # the scores contraction to 128 — acceptable (B/C are the small
    # operands); the l^2 HBM saving is what matters
    return (G == 1 and _MIN_L <= l <= 256 and l % 8 == 0 and N % 64 == 0
            and P % 8 == 0)


def _decay(a_row, l, a_col=None):
    """exp(a_i - a_j) for i >= j else 0, from the lane-major cumsum.

    a_row: [1, l] fp32.  The sublane orientation comes from an in-VMEM
    vector transpose (exact; an MXU outer-product variant rounded the
    exponents to bf16 at DEFAULT precision — ~1% on-chip error — and cost
    6 emulation passes at HIGHEST; a [*, l, 1]-shaped input block would
    tile to 128 lanes, 128x VMEM waste).
    """
    if a_col is None:
        a_col = jnp.transpose(a_row)                        # [l, 1]
    seg = a_col - a_row                                     # [l, l]
    mask = (jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
            >= jax.lax.broadcasted_iota(jnp.int32, (l, l), 1))
    return jnp.where(mask, jnp.exp(seg), 0.0)


def _rowsum(x):
    """Exact VPU row sums of a 2-D fp32 value, emitted lane-major [1, l]."""
    return jnp.transpose(jnp.sum(x, axis=1, keepdims=True))


def _fwd_kernel(C_ref, B_ref, acj_ref, dtx_ref, y_ref, scores,
                *, l: int, HB: int, mm_dtype):
    hb = pl.program_id(1)

    @pl.when(hb == 0)
    def _():
        scores[...] = _dg(
            C_ref[0].astype(mm_dtype), B_ref[0].astype(mm_dtype),
            (((1,), (1,)), ((), ())),                       # C @ B^T
            preferred_element_type=jnp.float32)             # [l, l]

    sc = scores[...]
    for h in range(HB):
        E = _decay(acj_ref[0, h:h + 1], l)                  # [l, l] fp32
        M = (sc * E).astype(mm_dtype)
        y = _dg(M, dtx_ref[0, h].astype(mm_dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y_ref[0, h] = y.astype(y_ref.dtype)


def _bwd_kernel(C_ref, B_ref, acj_ref, dtx_ref, dy_ref,
                ddtx_ref, dar_ref, dac_ref, dC_ref, dB_ref,
                scores, dscores, *, l: int, HB: int, mm_dtype):
    hb = pl.program_id(1)

    @pl.when(hb == 0)
    def _():
        scores[...] = _dg(
            C_ref[0].astype(mm_dtype), B_ref[0].astype(mm_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dscores[...] = jnp.zeros_like(dscores)

    sc = scores[...]
    dsc = jnp.zeros((l, l), jnp.float32)
    for h in range(HB):
        E = _decay(acj_ref[0, h:h + 1], l)                  # [l, l] fp32
        M = sc * E
        dy = dy_ref[0, h].astype(mm_dtype)                  # [l, P]
        dtx = dtx_ref[0, h].astype(mm_dtype)                # [l(s), P]
        # d(dtx)[s] = sum_l M[l, s] dy[l]  (contract l)
        ddtx = _dg(M.astype(mm_dtype), dy,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        ddtx_ref[0, h] = ddtx.astype(ddtx_ref.dtype)
        # dM[l, s] = sum_p dy[l, p] dtx[s, p]  (contract P)
        dM = _dg(dy, dtx, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dsc = dsc + dM * E
        G = dM * M                                          # [l, l] fp32
        # dacum[i] = sum_j G[i, j] - sum_l G[l, i]; both reductions are
        # exact VPU sums emitted lane-major (ones-MATMULS here rounded the
        # fp32 G to bf16 at DEFAULT precision)
        dar_ref[0, h:h + 1] = _rowsum(G)                    # row sums [1, l]
        dac_ref[0, h:h + 1] = jnp.sum(G, axis=0,
                                      keepdims=True)        # col sums [1, l]
    dscores[...] += dsc

    @pl.when(hb == pl.num_programs(1) - 1)
    def _():
        ds = dscores[...].astype(mm_dtype)
        dC_ref[0] = _dg(
            ds, B_ref[0].astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dC_ref.dtype)
        dB_ref[0] = _dg(
            ds, C_ref[0].astype(mm_dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dB_ref.dtype)


def _run_fwd(Cc, Bc, acum, dtx):
    BC, l, N = Cc.shape
    H, P = dtx.shape[1], dtx.shape[3]
    HB = _pick_hb(H, l, N, P, Cc.dtype.itemsize)
    mm_dtype = Cc.dtype
    kern = functools.partial(_fwd_kernel, l=l, HB=HB, mm_dtype=mm_dtype)
    return pl.pallas_call(
        kern,
        grid=(BC, H // HB),
        in_specs=[
            pl.BlockSpec((1, l, N), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, N), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HB, l), lambda i, h: (i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HB, l, P), lambda i, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HB, l, P), lambda i, h: (i, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BC, H, l, P), dtx.dtype),
        scratch_shapes=[pltpu.VMEM((l, l), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(Cc, Bc, acum, dtx)


def _run_bwd(Cc, Bc, acum, dtx, dy):
    BC, l, N = Cc.shape
    H, P = dtx.shape[1], dtx.shape[3]
    HB = _pick_hb(H, l, N, P, Cc.dtype.itemsize)
    mm_dtype = Cc.dtype
    kern = functools.partial(_bwd_kernel, l=l, HB=HB, mm_dtype=mm_dtype)
    ddtx, dar, dac, dC, dB = pl.pallas_call(
        kern,
        grid=(BC, H // HB),
        in_specs=[
            pl.BlockSpec((1, l, N), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, N), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HB, l), lambda i, h: (i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HB, l, P), lambda i, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HB, l, P), lambda i, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, HB, l, P), lambda i, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HB, l), lambda i, h: (i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HB, l), lambda i, h: (i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, N), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, N), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BC, H, l, P), dtx.dtype),
            jax.ShapeDtypeStruct((BC, H, l), jnp.float32),
            jax.ShapeDtypeStruct((BC, H, l), jnp.float32),
            jax.ShapeDtypeStruct((BC, l, N), Cc.dtype),
            jax.ShapeDtypeStruct((BC, l, N), Bc.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((l, l), jnp.float32),
                        pltpu.VMEM((l, l), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(Cc, Bc, acum, dtx, dy)
    dacum = dar - dac                                       # [BC, H, l]
    return ddtx, dacum, dC, dB


@jax.custom_vjp
def ydiag_fused(Cc, Bc, acum, dtx):
    """Yd[bc, h, l, p] = sum_{s<=l} (C_l.B_s) e^(a_l - a_s) dtx[bc,h,s,p]."""
    return _run_fwd(Cc, Bc, acum, dtx)


def _vjp_fwd(Cc, Bc, acum, dtx):
    return _run_fwd(Cc, Bc, acum, dtx), (Cc, Bc, acum, dtx)


def _vjp_bwd(res, dy):
    Cc, Bc, acum, dtx = res
    ddtx, dacum, dC, dB = _run_bwd(Cc, Bc, acum, dtx,
                                   dy.astype(dtx.dtype))
    return dC, dB, dacum, ddtx


ydiag_fused.defvjp(_vjp_fwd, _vjp_bwd)
