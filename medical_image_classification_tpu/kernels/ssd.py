"""Chunked SSD scan (Mamba-2 / state-space duality), TPU-native.

Replaces the reference's external Triton kernel ``mamba_chunk_scan_combined``
(imported at `/root/reference/CNN_Mamba.py:33`, used `:523-537`).  Unlike the
Mamba-1 selective scan, the SSD form has a *scalar* decay per head
(``A: [heads]``), which turns both intra-chunk work and the chunk-state
construction into dense matmuls — exactly what the MXU wants.  All heavy ops
below are einsums that XLA tiles onto the systolic array; only the tiny
inter-chunk recurrence is a scan.

Shapes (Mamba-2 convention, time-major-in-middle):
x  : [B, L, H, P]   (H heads, P headdim)
dt : [B, L, H]
A  : [H]            (negative)
B,C: [B, L, G, N]   (G groups, broadcast over H//G heads)

Returns y: [B, L, H, P] and optionally the final state [B, H, P, N].
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# Y_diag remat flavour: "full" recomputes the whole region in bwd; "dots"
# saves the MXU contractions and recomputes only the elementwise decay
# product (A/B-measured on v5e — see ssd_chunked._y_diag comment).
_YDIAG_REMAT = "full"

# fused Pallas Y_diag (no l^2 HBM traffic — see ssd_ydiag_pallas.py);
# auto-gated by shape/backend, this flag force-disables for A/B.
_USE_YDIAG_PALLAS = True

# fully fused Pallas SSD (intra-chunk + state walk in VMEM — see
# ssd_fused_pallas.py); auto-gated, force-disable for A/B.
_USE_SSD_FUSED = True


def _ssd_epilogue(y, x, Bsz, Lp, L, H, P, D, z, mm_dtype, out_dtype):
    """Shared D-skip / z-gate / dtype tail (XLA fuses it into consumers)."""
    if D is not None:
        xs = x.reshape(Bsz, Lp, H, P)[:, :L]
        if D.ndim == 1:                                  # per-head scalar D
            y = y + xs * D.astype(mm_dtype)[None, None, :, None]
        else:
            y = y + xs * D.astype(mm_dtype)
    if z is not None:
        y = y * jax.nn.silu(z.astype(mm_dtype))
    return y.astype(out_dtype)


def _cumsum_last(x):
    """Inclusive cumsum along the last axis as a triangular-ones matmul.

    ``jnp.cumsum`` lowers to log-depth reduce-window chains on TPU —
    measured ~4.5 ms/step fwd+bwd at MedSSD production shapes — while one
    [T, T] 0/1 matmul is MXU-trivial and its adjoint is the transposed
    matmul (another single dot instead of a reversed reduce-window chain).
    """
    T = x.shape[-1]
    tri = jnp.triu(jnp.ones((T, T), x.dtype))        # tri[k, i] = 1 for k <= i
    return jnp.einsum("...k,ki->...i", x, tri)


def _segsum(x, xc=None):
    """Stable segment-sum: out[..., i, j] = sum_{j < k <= i} x[..., k].

    Lower-triangular (j <= i) entries are finite, the rest -inf, so that
    ``exp(segsum(x))`` is the causal decay matrix.  Differences of cumsums
    keep everything bounded because x <= 0.  ``xc`` lets callers share an
    already-computed inclusive cumsum of ``x``.
    """
    T = x.shape[-1]
    if xc is None:
        xc = _cumsum_last(x)
    seg = xc[..., :, None] - xc[..., None, :]
    mask = jnp.tril(jnp.ones((T, T), dtype=bool))
    return jnp.where(mask, seg, -jnp.inf)


def _pick_chunk(L: int, chunk_size: int, N: int = 512) -> int:
    """Padding-aware effective chunk size.

    Two competing costs: intra-chunk (decay-matrix) work grows LINEARLY
    with c, while the inter-chunk state path (S stack + walk + Y_off)
    shrinks as 1/c.  The balance depends on the state width N:

    LARGE N (>= 256 — MedSSD's ref_flat N = K*d_state = 512), measured at
    MedSSD b16 (fwd+bwd, v5e):
      - L=49  padded to 256 is 5x wasted work: 2.12 -> 0.62 ms single-chunk
      - L=784: c=784 single-chunk 5.83 ms beats c=256 (7.78), c=392 (7.58);
        SMALLER chunks lose badly (c=128: 12.2, c=160: 11.6) — state traffic
        dominates, so fewer chunks win until l^2 work catches up
      - L=3136: c=256 (20.5 ms) beats c=448 (see STATUS) — past ~1k the
        linear intra term has taken over.
    Rule: one sublane-aligned chunk for L <= 3.5*chunk_size (covers the
    measured L=784 win at the default chunk 256; the untested L=1024 case
    conservatively stays chunked), else prefer an 8-aligned chunk that
    DIVIDES L exactly just below the caller's chunk: padding L=3136 to
    13 x 256 materialises pad copies of x/dt/B/C (+ the [:, :L] slice) in
    fwd AND bwd, while 14 x 224 runs pad-free for ~the same intra/inter
    split (the fused Pallas kernel's gate window [224, 256] covers both).

    SMALL N (< 256 — e.g. ST-SSD / CNN-Mamba at d_state=16 -> N=64): the
    per-chunk state is trivial ([B, H, P, N] ~ 1 MB), so l^2 work dominates
    everywhere and smaller chunks win; a pad-free divisor in [96, 256] also
    keeps l inside the fused-kernel window where one exists (L=3136 -> 224).
    The divisor search is NOT 8-stepped: only the fused Pallas kernel needs
    l % 8 (its gate re-checks), and XLA handles any chunk — the LARGEST
    pad-free divisor wins (L=784 -> 196: 0.49 ms fwd+bwd vs 1.20 at the
    8-stepped pick 112, measured v5e b8 N=64; c=392 ties at 0.52).
    """
    if N >= 256:
        if 2 * L <= 7 * chunk_size:
            return -(-L // 8) * 8                   # one chunk, 8-aligned
        for c in range(chunk_size, (7 * chunk_size) // 8 - 1, -8):
            if L % c == 0:
                return c
        return chunk_size
    if L <= max(chunk_size, 256):
        return -(-L // 8) * 8                       # one chunk, 8-aligned
    for c in range(min(chunk_size, 256), 95, -1):   # largest pad-free divisor
        if L % c == 0:
            return c
    return chunk_size


# Re-chunk out-of-window stages onto the fused kernel?  MEASURED OFF (r3):
# at MedSSD stage 1 (L=784, H=16, N=512) the isolated kernel A/B favours
# 4 x 196 fused over single-chunk XLA (0.65 vs 0.73 ms fwd+bwd,
# scripts/ssd_fused_parity.py), but END-TO-END the override costs 1.1
# ms/step (48.48 -> 49.58 ms, b16 train) — the single-chunk XLA stage
# fuses its epilogue/B/C-grad work into neighbouring ops and skips the
# boundary-state saves.  Kept opt-in for future shapes; the l=196 kernel
# window itself is parity-tested (tests/test_ssd_fused.py).  Env-hookable
# (ADVICE r3) so future shapes can A/B it without a source edit:
_FUSED_CHUNK_OVERRIDE = bool(int(os.environ.get(
    "MIC_SSD_FUSED_CHUNK_OVERRIDE", "0")))


def _effective_chunk(L: int, chunk_size: int, N: int, P: int, G: int,
                     H: int, itemsize: int, fused_eligible: bool) -> int:
    """_pick_chunk, then (opt-in) a fused-kernel window override."""
    from medical_image_classification_tpu.kernels import ssd_fused_pallas

    c0 = _pick_chunk(L, chunk_size, N)
    if (not _FUSED_CHUNK_OVERRIDE or not fused_eligible
            or ssd_fused_pallas.ssd_fused_supported(
                c0, N, P, G, -(-L // c0), H, itemsize)):
        return c0
    for c in range(ssd_fused_pallas._MAX_L, ssd_fused_pallas._MIN_L - 1, -4):
        if (L % c == 0 and ssd_fused_pallas.ssd_fused_supported(
                c, N, P, G, L // c, H, itemsize)):
            return c
    return c0


def ssd_dirs_chunk(L: int, chunk_size: int, N: int, P: int, H4: int,
                   itemsize: int = 2, d_ssm: int = 0):
    """Chunk size for the flip-free direction-folded fused path, or None.

    Requires a pad-free chunk inside the fused window (the direction
    mirroring maps chunk c <-> nc-1-c, so padding would corrupt the
    mirrored reads).
    """
    from medical_image_classification_tpu.kernels import (
        ssd_fused_dirs_pallas as sfd)

    if not _USE_SSD_FUSED:
        return None
    c = _pick_chunk(L, chunk_size, N)
    if L % c == 0 and sfd.ssd_fused_dirs_supported(c, N, P, L // c, H4,
                                                   itemsize, d_ssm):
        return c
    for c in range(min(chunk_size, sfd._MAX_L), sfd._MIN_L - 1, -4):
        if (L % c == 0 and sfd.ssd_fused_dirs_supported(c, N, P, L // c,
                                                        H4, itemsize,
                                                        d_ssm)):
            return c
    return None


def _anti_identity(n: int, dtype):
    """Exact anti-identity permutation-matmul operand (rev doesn't lower
    well anywhere: jnp.flip measured 0.9-2.7 ms/step on the dt rows)."""
    i = jnp.arange(n)
    return (i[:, None] == (n - 1 - i)[None, :]).astype(dtype)


def ssd_chunked_dirs(stackr, A, chunk_size: int, *, d_ssm: int, gn: int,
                     nheads: int, headdim: int, D=None, dt_bias=None,
                     dt_softplus=True, acc_dtype=jnp.float32):
    """Four-direction folded SSD from the d0/d1 stack's bytes only.

    stackr : [B, L, 2*C']  ROLE-major d0|d1 stack (channel runs
             [x_j0|x_j1|B_j0|B_j1|C_j0|C_j1|dt_j0|dt_j1], built by
             `cross_scan_time_major2_roles`); directions 2/3 are sequence
             flips — never materialised.  The kernel cuts x/B/C blocks
             straight out of this array (r4: the old per-tensor slice
             copies cost ~3-5 ms/step of 'data formatting'); only the tiny
             dt rows are prepared outside, with the dirs-2/3 flips done as
             exact permutation matmuls over (chunk, position) instead of
             lax.rev.
    A, D, dt_bias : [4*nh]  per-direction params (D per-head scalar only).

    Returns y [B, L, 4*nh, P] with directions 2/3 already in d0/d1 order
    (use `cross_merge_noflip_time_major`).  Caller must have validated the
    shape via `ssd_dirs_chunk`.
    """
    from medical_image_classification_tpu.kernels import (
        ssd_fused_dirs_pallas as sfd)

    out_dtype = stackr.dtype
    Bsz, L, C2c = stackr.shape
    H2 = 2 * nheads
    H4 = 4 * nheads
    P = headdim
    assert L % chunk_size == 0, "dirs path requires pad-free chunks"
    nc = L // chunk_size
    l = chunk_size
    stackc = stackr.reshape(Bsz, nc, l, C2c)

    # dt rows: [B, L, 2*nh] run -> [B, nc, H2, l] transposed, then the
    # dirs-2/3 rows via exact permutation matmuls (mirror the chunk axis,
    # reverse within the chunk) — no lax.rev anywhere
    dt2 = stackr[..., 2 * (d_ssm + 2 * gn):]
    dtT_f = jnp.moveaxis(dt2.reshape(Bsz, nc, l, H2), 3, 2)  # [B,nc,H2,l]
    dtT_f = dtT_f.astype(acc_dtype)
    Jc = _anti_identity(nc, acc_dtype)
    Jl = _anti_identity(l, acc_dtype)
    hp = jax.lax.Precision.HIGHEST
    dtT_r = jnp.einsum("mn,bnhl,lk->bmhk", Jc, dtT_f, Jl, precision=hp)
    dtT = jnp.concatenate([dtT_f, dtT_r], axis=2)            # [B,nc,H4,l]
    if dt_bias is not None:
        dtT = dtT + dt_bias.astype(acc_dtype)[:, None]
    if dt_softplus:
        dtT = jax.nn.softplus(dtT)
    dtA_t = dtT * A.astype(acc_dtype)[:, None]               # [B,nc,H4,l]
    A_cum_t = _cumsum_last(dtA_t)
    dte_t = jnp.exp(A_cum_t[..., -1:] - A_cum_t)
    cdec = jnp.exp(A_cum_t[..., -1])
    dtp_t = dtT.astype(jnp.float32)

    assert D is None or D.ndim == 1, "dirs path: per-head scalar D only"
    Dsk = (D.astype(jnp.float32) if D is not None
           else jnp.zeros((H4,), jnp.float32))[None, None]   # [1, 1, H4]

    y = sfd.ssd_fused_dirs(stackc, A_cum_t, dte_t, cdec, dtp_t, Dsk,
                           d_ssm, gn)                        # [B,nc,l,H4*P]
    return y.reshape(Bsz, L, H4, P).astype(out_dtype)


def ssd_chunked(x, dt, A, B, C, chunk_size: int = 128, D=None, z=None,
                dt_bias=None, dt_softplus=True, initial_state=None,
                return_final_state=False, acc_dtype=jnp.float32,
                adaptive_chunk: bool = True):
    """Chunked block-matmul SSD scan.

    The four stages (mirroring the SSD algorithm the reference's Triton kernel
    implements):
      1. intra-chunk outputs   : Y_diag = (C B^T * decay) X   (per chunk)
      2. chunk states          : S_c    = B^T (decay_to_end * X)
      3. inter-chunk recurrence: S_c'   = exp(sum dtA_c) S_{c-1}' + S_c
      4. state contribution    : Y_off  = C S_in * decay_from_start
    """
    out_dtype = x.dtype
    # MXU inputs follow the activation dtype: bf16 activations hit the
    # systolic array at native rate with fp32 accumulation
    # (preferred_element_type); fp32 activations (parity tests) stay fp32.
    mm_dtype = x.dtype
    Bsz, L, H, P = x.shape
    G, N = B.shape[2], B.shape[3]
    rep = H // G

    dt = dt.astype(acc_dtype)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(acc_dtype)
    if dt_softplus:
        dt = jax.nn.softplus(dt)

    from medical_image_classification_tpu.kernels import (
        ssd_fused_pallas,
        ssd_ydiag_pallas,
    )

    if adaptive_chunk:
        fused_eligible = (_USE_SSD_FUSED and G == 1 and initial_state is None
                          and not return_final_state)
        chunk_size = _effective_chunk(L, chunk_size, N, P, G, H,
                                      jnp.dtype(mm_dtype).itemsize,
                                      fused_eligible)
    pad = (-L) % chunk_size
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Lp = L + pad
    nc = Lp // chunk_size

    # chunked views  (c = chunk index, l = position within chunk).  Heads are
    # group-major (head h belongs to group h // rep), so [H] reshapes to
    # [G, rep] — B/C are NEVER materialised per head (the reference's Triton
    # kernel broadcasts groups in-register; `jnp.repeat` here would both copy
    # [B, L, H, N] to HBM and multiply the scores matmul cost by `rep`).
    xc = x.reshape(Bsz, nc, chunk_size, H, P)
    dtc = dt.reshape(Bsz, nc, chunk_size, H)
    Bc = B.reshape(Bsz, nc, chunk_size, G, N)
    Cc = C.reshape(Bsz, nc, chunk_size, G, N)

    dtA = dtc * A.astype(acc_dtype)                      # [B, nc, l, H]  (<= 0)
    # ONE l-minor cumsum (MXU matmul, see _cumsum_last) shared by the decay
    # matrix and all the chunk-level decay terms below
    dtA_t = jnp.moveaxis(dtA, 3, 2)                      # [B, nc, H, l]
    A_cum_t = _cumsum_last(dtA_t)                        # [B, nc, H, l]
    A_cum = jnp.moveaxis(A_cum_t, 3, 2)                  # [B, nc, l, H]

    if (_USE_SSD_FUSED and G == 1 and initial_state is None
            and not return_final_state
            and ssd_fused_pallas.ssd_fused_supported(
                chunk_size, N, P, G, nc, H,
                jnp.dtype(mm_dtype).itemsize)):
        # whole SSD (masked-decay matmuls + state walk) in one Pallas
        # kernel; the [B, nc, H, P, N] state stack and every l^2 tensor
        # stay in VMEM (bwd walks chunks in reverse from saved boundary
        # states — see ssd_fused_pallas.py).  x moves FLAT and l-major
        # ([B, nc, l, H*P], a free view) and dtx = x * dt happens in-kernel:
        # the v1 head-major dtx cost an HBM materialisation plus [l, H]
        # transpose relayouts on each of dtx-in / y-out / dy-in / dx-out
        # (~3 ms/step at MedSSD b16, trace in STATUS.md).
        dte_t = jnp.exp(A_cum_t[..., -1:] - A_cum_t)     # [B, nc, H, l]
        cdec = jnp.exp(A_cum_t[..., -1])                 # [B, nc, H]
        dtp_t = jnp.moveaxis(dtc, 3, 2)                  # [B, nc, H, l] fp32
        y = ssd_fused_pallas.ssd_fused(
            Cc.astype(mm_dtype).reshape(Bsz, nc, chunk_size, N),
            Bc.astype(mm_dtype).reshape(Bsz, nc, chunk_size, N),
            A_cum_t, dte_t, cdec, dtp_t.astype(jnp.float32),
            x.reshape(Bsz, nc, chunk_size, H * P))       # [B, nc, l, H*P]
        y = y.reshape(Bsz, Lp, H, P)[:, :L]
        return _ssd_epilogue(y, x, Bsz, Lp, L, H, P, D, z, mm_dtype,
                             out_dtype)

    # weight dt into B (discretisation): dB_t = dt_t * B_t.  The product is
    # materialised ONCE in the matmul dtype (bf16 training: an fp32 dtx here
    # was re-written to HBM three times — raw, head-major copy, decayed copy
    # — and the elementwise passes over it scaled superlinearly with batch;
    # measured s0 b32 fwd+bwd 42.0 -> see below)
    dtx_r = ((xc * dtc.astype(mm_dtype)[..., None])
             .reshape(Bsz, nc, chunk_size, G, rep, P))   # [B, nc, l, G, r, P]
    # head-major copy feeds the chunk-state einsum (measured ~2 ms/step
    # cheaper than the l-major orientation at MedSSD shapes); Y_diag below
    # keeps the l-major orientation — the head-major variant of THAT dot
    # measured ~3 ms slower plus a final transpose-back
    dtx_h = jnp.moveaxis(dtx_r, 2, 4)                    # [B, nc, G, r, l, P]

    Bc_h = jnp.moveaxis(Bc, 2, 3).astype(mm_dtype)       # [B, nc, G, l, N]

    # 1. intra-chunk (causal masked attention-like matmul).  Scores are
    # computed once per GROUP (the expensive N-contraction), then modulated
    # by the per-head decay matrix — `rep`x less MXU work than per-head.
    # Segment sums stay fp32 (differences of cumsums); every [l, l]-sized
    # tensor downstream of the exp lives in mm_dtype (decays are in [0, 1],
    # bf16-safe; the MXU accumulates fp32 regardless of operand dtype).
    # remat: the masked-decay matrix M is [B, nc, H, l, l] — by far the
    # largest intermediate (l^2).  Recomputing it in the bwd pass from the
    # (small) inputs costs one extra group-level matmul + exp but removes
    # the fwd->bwd residual round trip of two l^2 tensors.  The dots policy
    # additionally SAVES the group-level scores matmul ([B,nc,G,l,s] — G=1
    # at ref_flat, rep-x smaller than M) so only the elementwise decay
    # product is recomputed in bwd, not the MXU contraction.
    policy = (jax.checkpoint_policies.checkpoint_dots
              if _YDIAG_REMAT == "dots" else None)

    @partial(jax.checkpoint, policy=policy)
    def _y_diag(Cc_, Bc_, A_cum_t_, dtx_r_):
        Lmat = jnp.exp(_segsum(dtA_t, xc=A_cum_t_)).astype(mm_dtype)
        Lmat_r = Lmat.reshape(Bsz, nc, G, rep, chunk_size, chunk_size)
        scores = jnp.einsum("bclgn,bcsgn->bcgls", Cc_, Bc_,
                            preferred_element_type=mm_dtype)  # [B,nc,G,l,s]
        M = scores[:, :, :, None] * Lmat_r
        # output in mm_dtype directly (the MXU accumulates fp32 internally;
        # preferred=f32 + astype paid an extra fp32 [B, L, H, P] HBM pass)
        Yd = jnp.einsum("bcgrls,bcsgrp->bclgrp", M, dtx_r_,
                        preferred_element_type=mm_dtype)
        return Yd.reshape(Bsz, nc, chunk_size, H, P)

    if (_USE_YDIAG_PALLAS and G == 1
            and ssd_ydiag_pallas.ydiag_supported(
                chunk_size, N, P, G, H, jnp.dtype(mm_dtype).itemsize)):
        # fused kernel consumes the head-major dtx already built for the
        # chunk-state einsum; scores/decay never leave VMEM
        BC = Bsz * nc
        Ydh = ssd_ydiag_pallas.ydiag_fused(
            Cc.astype(mm_dtype).reshape(BC, chunk_size, N),
            Bc.astype(mm_dtype).reshape(BC, chunk_size, N),
            A_cum_t.reshape(BC, H, chunk_size),
            dtx_h.reshape(BC, H, chunk_size, P))            # [BC,H,l,P]
        Y_diag = jnp.moveaxis(
            Ydh.reshape(Bsz, nc, H, chunk_size, P), 2, 3)   # [B,nc,l,H,P]
    else:
        Y_diag = _y_diag(Cc.astype(mm_dtype), Bc.astype(mm_dtype), A_cum_t,
                         dtx_r)

    # 2. per-chunk end states (decay folds into the P-sized operand, not the
    # N-sized one)
    decay_to_end_t = jnp.exp(A_cum_t[..., -1:] - A_cum_t).astype(mm_dtype)
    dtx_d_h = dtx_h * decay_to_end_t.reshape(
        Bsz, nc, G, rep, chunk_size)[..., None]
    S = jnp.einsum("bcgln,bcgrlp->bcgrpn", Bc_h, dtx_d_h,
                   preferred_element_type=acc_dtype)     # [B, nc, G, r, P, N]

    chunk_decay = jnp.exp(A_cum[:, :, -1, :])            # [B, nc, H]
    decay_from_start = jnp.exp(A_cum).astype(mm_dtype)   # [B, nc, l, H]

    # carry rides in the grouped orientation the Y_off dot wants — one
    # reshape at entry/exit instead of one per chunk
    S_carry = (jnp.zeros((Bsz, G, rep, P, N), acc_dtype)
               if initial_state is None
               else initial_state.astype(acc_dtype).reshape(
                   Bsz, G, rep, P, N))

    # 3+4. inter-chunk recurrence.  The carry accumulates in fp32 (like the
    # reference's Triton state pass); incoming states are staged in mm_dtype
    # and the Y_off contraction runs as ONE batched einsum over all chunks —
    # with fp32 states that stack was a measured dead end (+4 ms HBM pass),
    # at bf16 it wins (s0 fwd 6.5 -> 5.6 ms) because the stack halves and
    # the 13 latency-bound in-walk dots collapse into one MXU launch.  The
    # log-depth associative_scan alternative stays ~2x slower (log2(nc)
    # full passes over the ~64MB-per-state stack).
    def chunk_step(S_prev, inp):
        S_c, Cc_c, dec_c = inp
        # Y_off for this chunk from the INCOMING state (scalar decay
        # commutes out of the N-contraction: matmul first, then modulate)
        Y_off_c = jnp.einsum(
            "blgn,bgrpn->blgrp", Cc_c.astype(mm_dtype),
            S_prev.astype(mm_dtype),
            preferred_element_type=mm_dtype)
        S_next = dec_c.reshape(Bsz, G, rep, 1, 1) * S_prev + S_c
        return S_next, Y_off_c

    if nc <= 32:        # unrolled: straight-line XLA, no stacking overhead,
        S_ins = []      # operands sliced in place (no [nc]-major moveaxis)
        for c in range(nc):
            S_ins.append(S_carry.astype(mm_dtype))
            S_carry = (chunk_decay[:, c].reshape(Bsz, G, rep, 1, 1) * S_carry
                       + S[:, c])
        S_in = jnp.stack(S_ins, axis=1)                  # [B, nc, G, r, P, N]
        Y_off = jnp.einsum("bclgn,bcgrpn->bclgrp", Cc.astype(mm_dtype), S_in,
                           preferred_element_type=mm_dtype)
    else:
        xs_scan = (jnp.moveaxis(S, 1, 0), jnp.moveaxis(Cc, 1, 0),
                   jnp.moveaxis(chunk_decay, 1, 0))
        S_carry, Y_offs = lax.scan(chunk_step, S_carry, xs_scan)
        Y_off = jnp.moveaxis(Y_offs, 0, 1)
    Y_off = (Y_off.reshape(Bsz, nc, chunk_size, H, P)
             * decay_from_start[..., None])

    y = (Y_diag + Y_off).reshape(Bsz, Lp, H, P)[:, :L]
    y = _ssd_epilogue(y, x, Bsz, Lp, L, H, P, D, z, mm_dtype, out_dtype)
    if return_final_state:
        return y, S_carry.reshape(Bsz, H, P, N).astype(out_dtype)
    return y


def ssd_seq_ref(x, dt, A, B, C, D=None, z=None, dt_bias=None, dt_softplus=True,
                initial_state=None, return_final_state=False):
    """Golden sequential reference for parity tests (per-token recurrence)."""
    f32 = jnp.float32
    out_dtype = x.dtype
    Bsz, L, H, P = x.shape
    G, N = B.shape[2], B.shape[3]
    rep = H // G
    dt = dt.astype(f32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(f32)
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    Bh = jnp.repeat(B, rep, axis=2).astype(f32)
    Ch = jnp.repeat(C, rep, axis=2).astype(f32)

    def step(s, inp):
        x_t, dt_t, b_t, c_t = inp          # [B,H,P], [B,H], [B,H,N], [B,H,N]
        dA = jnp.exp(dt_t * A.astype(f32))                 # [B,H]
        s = dA[..., None, None] * s + jnp.einsum(
            "bhp,bhn->bhpn", x_t.astype(f32) * dt_t[..., None], b_t)
        y = jnp.einsum("bhpn,bhn->bhp", s, c_t)
        return s, y

    s0 = (jnp.zeros((Bsz, H, P, N), f32) if initial_state is None
          else initial_state.astype(f32))
    xs = (jnp.moveaxis(x, 1, 0), jnp.moveaxis(dt, 1, 0),
          jnp.moveaxis(Bh, 1, 0), jnp.moveaxis(Ch, 1, 0))
    s_last, ys = lax.scan(step, s0, xs)
    y = jnp.moveaxis(ys, 0, 1)
    if D is not None:
        y = y + x.astype(f32) * (D.astype(f32)[None, None, :, None]
                                 if D.ndim == 1 else D.astype(f32))
    if z is not None:
        y = y * jax.nn.silu(z.astype(f32))
    y = y.astype(out_dtype)
    if return_final_state:
        return y, s_last.astype(out_dtype)
    return y
