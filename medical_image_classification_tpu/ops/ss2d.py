"""Functional SS2D cores: the 2-D selective-scan op family.

These are pure functions over (activations, parameters); the Flax modules in
``models/`` own the parameters and call into here.  TPU-native rebuilds of:

* ``ss2d_core_mamba1`` — `/root/reference/MedMamba.py:386-424` (forward_corev0)
* ``ss2d_core_ssd``    — `/root/reference/CNN_Mamba.py:472-552` (SS2D_with_SSD
  forward, SSD/Mamba-2 multi-head path)

Both fold the K=4 scan directions into a single kernel invocation (directions
become extra channels / heads / B-C groups), exactly one scan launch per op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from medical_image_classification_tpu.kernels.selective_scan import selective_scan
from medical_image_classification_tpu.kernels.ssd import ssd_chunked
from medical_image_classification_tpu.ops.cross_scan import (
    cross_scan,
    cross_scan_time_major,
    cross_scan_time_major2_roles,
    cross_merge,
    cross_merge_noflip_time_major,
    cross_merge_stack,
    cross_merge_stack_time_major,
    cross_stack_scan_order,
    cross_merge_time_major,
)


def _scan_seq_parallel(u, delta, A, Bg, Cg, Df, bf, seq_axis: str):
    """shard_map the folded Mamba-1 scan over an L-sharding mesh axis."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from medical_image_classification_tpu.parallel.mesh import current_mesh
    from medical_image_classification_tpu.parallel.sequence_parallel import (
        selective_scan_sequence_parallel)

    mesh = current_mesh()
    assert mesh is not None and seq_axis in mesh.axis_names, (
        f"seq_axis='{seq_axis}' needs a registered mesh with that axis "
        "(parallel.mesh.make_mesh(sp=...))")
    lspec = P(None, seq_axis, None)

    def local(u_, d_, B_, C_, A_, Df_, bf_):
        # params ride in as replicated ARGS (closing over GSPMD-sharded
        # arrays inside shard_map trips an Auto/Manual mesh clash)
        return selective_scan_sequence_parallel(
            u_, d_, A_, B_, C_, axis_name=seq_axis, D=Df_, delta_bias=bf_,
            delta_softplus=True)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(lspec, lspec, P(None, seq_axis, None, None),
                             P(None, seq_axis, None, None), P(), P(), P()),
                   out_specs=lspec, check_rep=False)
    return fn(u, delta, Bg, Cg, A, Df, bf)


def ss2d_core_mamba1(x, x_proj_w, dt_proj_w, dt_proj_b, A_log, Ds, *,
                     d_state: int, dt_rank: int, impl: str = "auto",
                     merge: bool = True, seq_axis=None):
    """Mamba-1 4-direction 2-D scan.

    x         : [B, H, W, D]  (post depthwise-conv + SiLU, channel-last)
    x_proj_w  : [4, dt_rank + 2*d_state, D]   (shared Δ/B/C projection)
    dt_proj_w : [4, D, dt_rank]
    dt_proj_b : [4, D]
    A_log     : [4, D, d_state]
    Ds        : [4, D]

    Returns [B, H, W, D] (sum of the four direction outputs, un-permuted), or
    the aligned stack [B, 4, L, D] when ``merge=False`` (for WMF merges).

    The K directions are folded into the channel axis of a single
    selective-scan call: u [B, L, 4*D] with B/C as 4 groups — the same
    batching trick as the reference's single ``selective_scan_fn`` call over
    ``(b, k*d, l)`` (`MedMamba.py:411-417`).
    """
    Bb, H, W, D = x.shape
    L = H * W
    K = 4

    from medical_image_classification_tpu.kernels.selective_scan_pallas import (
        pallas_folded_supported, selective_scan_pallas_folded)
    if impl == "pallas_fused":
        # the r1 fused-projection kernel (427 LoC, projections inside the
        # scan kernel) was REMOVED in r4 after a fresh ABBA on the current
        # tree: medmamba b32 train 74.4 ms/step unfused vs 115.4 fused —
        # the per-chunk in-kernel projection matmuls cannot compete with
        # the folded 2-D XLA projections (r2) + the plain kernels.  The
        # impl string stays accepted for config compat and rides the
        # normal dispatch ladder.
        impl = "auto"

    if (seq_axis is None and impl in ("auto", "pallas")
            and pallas_folded_supported(L, D, d_state)):
        # FLIP-FREE path: the reference materialises flipped copies for
        # directions 2/3 (`MedMamba.py:394-395`) and flips the outputs back
        # (`:420-423`).  Here directions 2/3 run the kernel in REVERSE over
        # the same unflipped bytes as directions 0/1 — u/delta for dirs
        # {0,2} and {1,3} share one HBM buffer, and no flip is ever
        # materialised (kernel index maps + in-chunk suffix scans instead).
        N = d_state
        x_row = x.reshape(Bb, L, D)
        x_col = jnp.swapaxes(x, 1, 2).reshape(Bb, L, D)
        # reference direction order k = rev*2 + layout  (0=row, 1=col,
        # 2=row-reversed, 3=col-reversed)
        # ONE clean 2-D matmul per layout j: [B*L, D] @ [D, 2D+4N] covering
        # both r's Δ/B/C projections.  Earlier shapes (5-D einsums with tiny
        # q/N minor dims) made XLA choose l-minor layouts for the fwd dots
        # AND the dW grad dots, paying ~5ms/step of 5-D relayout copies (r2
        # step trace); canonical 2-D matmuls need none.  The low-rank Δ
        # projection (D -> q -> D) folds into one effective [D, D] weight —
        # mathematically identical (associativity), negligible MXU FLOPs.
        Wp = x_proj_w.reshape(2, 2, -1, D)
        Wq = Wp[:, :, :dt_rank]                          # [r, j, q, D]
        Wb = Wp[:, :, dt_rank:dt_rank + N]
        Wc = Wp[:, :, dt_rank + N:]
        dtw = dt_proj_w.reshape(2, 2, D, dt_rank)        # [r, j, e, q]
        Weff = jnp.einsum("rjqd,rjeq->rjde", Wq, dtw)    # [r, j, D, D] fp32
        dt_c = x.dtype                                   # bf16 halves HBM IO

        def proj(xj, j):
            # column order: [Δ_r0 | Δ_r1 | B_r0 | C_r0 | B_r1 | C_r1]
            Wall = jnp.concatenate(
                [Weff[0, j], Weff[1, j],
                 Wb[0, j].T, Wc[0, j].T, Wb[1, j].T, Wc[1, j].T], axis=1)
            # cast the (tiny) weight to the compute dtype: a bf16 x fp32
            # einsum promotes to an fp32 MXU matmul (4-8x slower); the
            # output is bf16 anyway, and the MXU accumulates in fp32
            out = jnp.einsum("bld,dc->blc", xj, Wall.astype(dt_c)).astype(dt_c)
            # NB plain slices, NOT split_channels: the one-concat vjp that
            # wins on the SSD in_proj (ss2d_modules) measured +2.0 ms/step
            # HERE (r5 trace A/B 69.4 -> 71.4) — XLA fuses these slices'
            # pad+add adjoints into the scan kernels' surrounding passes,
            # and the explicit concat re-materialises them instead.
            dts = (out[..., :D], out[..., D:2 * D])
            o = 2 * D
            bc = [(out[..., o:o + N], out[..., o + N:o + 2 * N]),
                  (out[..., o + 2 * N:o + 3 * N], out[..., o + 3 * N:])]
            return dts, bc

        A2 = -jnp.exp(A_log.astype(jnp.float32)).reshape(2, 2, D, N)
        D2 = Ds.astype(jnp.float32).reshape(2, 2, D)
        b2 = dt_proj_b.astype(jnp.float32).reshape(2, 2, D)

        def scan_dir(xj, dts, Bm, Cm, r, j):
            # single-direction call (K=1): operands are matmul outputs /
            # activation views — zero stack/relayout glue.  NB an r4 A/B
            # folded {row, col} layouts into one G=2B call per direction
            # (half the launches): per-launch overhead is negligible but
            # the jnp.stack operand glue cost ~6 ms/step of HBM copies
            # (traced 69.4 -> 76.8 ms) — keep the 4 zero-glue calls.
            return selective_scan_pallas_folded(
                xj, dts, A2[r, j][None], Bm, Cm, D2[r, j][None],
                b2[r, j][None], reverse=bool(r))

        dts_row, bc_row = proj(x_row, 0)
        dts_col, bc_col = proj(x_col, 1)
        y00 = scan_dir(x_row, dts_row[0], *bc_row[0], 0, 0)   # dir 0
        y01 = scan_dir(x_col, dts_col[0], *bc_col[0], 0, 1)   # dir 1
        y10 = scan_dir(x_row, dts_row[1], *bc_row[1], 1, 0)   # dir 2 (rev)
        y11 = scan_dir(x_col, dts_col[1], *bc_col[1], 1, 1)   # dir 3 (rev)

        def un_col(yc):                                  # [B, L, D] col->row
            return jnp.swapaxes(yc.reshape(Bb, W, H, D), 1, 2).reshape(Bb, L, D)

        if merge:
            y = y00 + y10 + un_col(y01 + y11)
            return y.reshape(Bb, H, W, D)
        return jnp.stack([y00, un_col(y01), y10, un_col(y11)], axis=1)

    xs = cross_scan(x)                                   # [B, 4, L, D]
    x_dbl = jnp.einsum("bkld,kcd->bklc", xs, x_proj_w)
    dts = x_dbl[..., :dt_rank]
    Bmat = x_dbl[..., dt_rank:dt_rank + d_state]
    Cmat = x_dbl[..., dt_rank + d_state:]
    dts = jnp.einsum("bklr,kdr->bkld", dts, dt_proj_w)

    # fold K into channels (direction-major channel order)
    u = jnp.swapaxes(xs, 1, 2).reshape(Bb, L, K * D)
    delta = jnp.swapaxes(dts, 1, 2).reshape(Bb, L, K * D)
    Bg = jnp.swapaxes(Bmat, 1, 2)                        # [B, L, 4, n] groups
    Cg = jnp.swapaxes(Cmat, 1, 2)
    A = -jnp.exp(A_log.astype(jnp.float32)).reshape(K * D, d_state)
    Df = Ds.astype(jnp.float32).reshape(K * D)
    bf = dt_proj_b.astype(jnp.float32).reshape(K * D)
    if seq_axis is not None:
        # sequence parallelism: L-shard the scan over the 'seq' mesh axis
        # (the TPU shape of the reference's sequence_parallel=True plumbing,
        # `CNN_Mamba.py:354,365`): each device scans its shard, shard
        # summaries are combined with one small all_gather.
        y = _scan_seq_parallel(u, delta, A, Bg, Cg, Df, bf, seq_axis)
    else:
        y = selective_scan(u, delta, A, Bg, Cg, D=Df, delta_bias=bf,
                           delta_softplus=True, impl=impl)  # [B, L, 4*D] fp32
    ys = jnp.swapaxes(y.reshape(Bb, L, K, D), 1, 2)      # [B, 4, L, D]
    if merge:
        return cross_merge(ys, H, W)
    return cross_merge_stack(ys, H, W)


def _ssd_scan_seq_parallel(xh, dth, A, Bh, Ch, Df, dtb, chunk_size,
                           seq_axis: str):
    """shard_map the folded SSD scan over an L-sharding mesh axis.

    The TPU shape of the reference's ``sequence_parallel`` flag on its SSD
    model (`CNN_Mamba.py:354,365`): each device scans its L-shard, the
    per-shard (decay, final-state) summaries combine with ONE small
    all_gather, and a cheap Y_off-style einsum adds the cross-shard
    contribution (exact — see parallel/sequence_parallel.py)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from medical_image_classification_tpu.parallel.mesh import current_mesh
    from medical_image_classification_tpu.parallel.sequence_parallel import (
        ssd_sequence_parallel)

    mesh = current_mesh()
    assert mesh is not None and seq_axis in mesh.axis_names, (
        f"seq_axis='{seq_axis}' needs a registered mesh with that axis "
        "(parallel.mesh.make_mesh(sp=...))")
    l3 = P(None, seq_axis, None)
    l4 = P(None, seq_axis, None, None)

    def local(x_, dt_, B_, C_, A_, D_, b_):
        # params ride in as replicated ARGS (closures over GSPMD-sharded
        # arrays inside shard_map trip an Auto/Manual mesh clash)
        return ssd_sequence_parallel(x_, dt_, A_, B_, C_, axis_name=seq_axis,
                                     chunk_size=chunk_size, D=D_, dt_bias=b_,
                                     dt_softplus=True)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(l4, l3, l4, l4, P(), P(), P()),
                   out_specs=l4, check_rep=False)
    return fn(xh, dth, Bh, Ch, A, Df, dtb)


def ss2d_core_ssd(xBCdt, A_log, dt_bias, Ds, *, d_ssm: int, ngroups: int,
                  d_state: int, nheads: int, headdim: int,
                  chunk_size: int = 256, merge: bool = True,
                  stack_scan_order: bool = False,
                  bc_layout: str = "ref_flat", seq_axis=None):
    """Mamba-2 (SSD) 4-direction 2-D scan.

    xBCdt  : [B, H, W, d_ssm + 2*ngroups*d_state + nheads]
             (post depthwise-conv + SiLU; channel layout [x | B | C | dt])
    A_log  : [4, nheads]
    dt_bias: [4, nheads]
    Ds     : [4, nheads]  (or [4, d_ssm] if D has headdim)

    Directions fold into the head axis (direction-major), one ``ssd_chunked``
    call for all four scans.  ``bc_layout`` selects the B/C grouping:

    * ``"ref_flat"`` (default, matches the reference bit-for-bit): after the
      reference flattens K into channels it regroups B/C with ``g=ngroups``
      (`SSD/MedSSD.py:343-358`, `CNN_Mamba.py:515-521`), so each group's
      state dimension becomes K*d_state shared by every head — directions
      are coupled through the state.  FLOP-equal to per-direction grouping
      (1 group x K*N vs K groups x N), reproduced for logit parity.
    * ``"per_direction"``: clean per-direction states (groups g = (k, group));
      same cost, no cross-direction coupling.  Not reference-equivalent.
    """
    Bb, H, W, Cc = xBCdt.shape
    L = H * W
    K = 4
    gn = ngroups * d_state

    # flip-free direction folding: when the fused dirs kernel covers this
    # shape, materialise only the d0/d1 stack — directions 2/3 ride the
    # same bytes via mirrored chunk maps + an exact permutation matmul
    # (kernels/ssd_fused_dirs_pallas.py).  Kills the two flipped x slabs,
    # the merge/dy/dx flips, and halves the stack width (measured ~7 ms of
    # copy traffic per MedSSD b16 step, r3 trace).  r4: the kernel cuts
    # x/B/C blocks straight out of the stack (no host slice copies) and
    # runs the D-skip in-VMEM.
    if (merge and seq_axis is None and bc_layout == "ref_flat"
            and ngroups == 1 and Ds.size == K * nheads):
        from medical_image_classification_tpu.kernels.ssd import (
            ssd_chunked_dirs,
            ssd_dirs_chunk,
        )
        eff_c = ssd_dirs_chunk(L, chunk_size, K * d_state, headdim,
                               K * nheads, jnp.dtype(xBCdt.dtype).itemsize,
                               d_ssm=d_ssm)
        if eff_c is not None:
            stackr = jax.lax.optimization_barrier(
                cross_scan_time_major2_roles(xBCdt, d_ssm, gn))
            A = -jnp.exp(A_log.astype(jnp.float32)).reshape(K * nheads)
            Df = Ds.astype(jnp.float32).reshape(-1)
            dtb = dt_bias.astype(jnp.float32).reshape(K * nheads)
            y = ssd_chunked_dirs(stackr, A, eff_c, d_ssm=d_ssm, gn=gn,
                                 nheads=nheads, headdim=headdim, D=Df,
                                 dt_bias=dtb, dt_softplus=True)
            ys = y.reshape(Bb, L, K, d_ssm)
            return cross_merge_noflip_time_major(ys, H, W)
    # time-major stack [B, L, 4, Cc]: every direction-major fold below is a
    # free reshape (the old [B, 4, L, *] layout paid full-tensor swapaxes
    # copies for xh/dth/Bh/Ch).  The optimization_barrier pins the stack to
    # the default (channel-minor) layout: without it XLA's layout
    # assignment propagates an L-minor layout from the flip/transpose
    # producers through the concatenate, and every downstream consumer
    # (the chunked reshapes feeding the Pallas kernel) pays an L-minor ->
    # channel-minor relayout copy.  Measured (v5e, order-reversed A/B):
    # MedSSD b16 51.5 -> 47.8 ms/step (+7%); ST-SSD neutral.
    xs_all = jax.lax.optimization_barrier(
        cross_scan_time_major(xBCdt))                    # [B, L, 4, Cc]
    xs = xs_all[..., :d_ssm]
    Bmat = xs_all[..., d_ssm:d_ssm + gn]
    Cmat = xs_all[..., d_ssm + gn:d_ssm + 2 * gn]
    dts = xs_all[..., d_ssm + 2 * gn:]

    # direction-major folds: heads h = (k, head)
    xh = xs.reshape(Bb, L, K * nheads, headdim)
    dth = dts.reshape(Bb, L, K * nheads)
    if bc_layout == "ref_flat":
        assert ngroups == 1, "ref_flat layout requires ngroups=1 (all models)"
        Bh = Bmat.reshape(Bb, L, 1, K * d_state)
        Ch = Cmat.reshape(Bb, L, 1, K * d_state)
    else:
        Bh = Bmat.reshape(Bb, L, K * ngroups, d_state)
        Ch = Cmat.reshape(Bb, L, K * ngroups, d_state)

    A = -jnp.exp(A_log.astype(jnp.float32)).reshape(K * nheads)
    Df = Ds.astype(jnp.float32).reshape(-1)
    if Df.shape[0] == K * d_ssm:                          # D_has_hdim
        Df = Df.reshape(K * nheads, headdim)

    dtb = dt_bias.astype(jnp.float32).reshape(K * nheads)
    if seq_axis is not None:
        y = _ssd_scan_seq_parallel(xh, dth, A, Bh, Ch, Df, dtb, chunk_size,
                                   seq_axis)              # [B, L, KH, P]
    else:
        y = ssd_chunked(xh, dth, A, Bh, Ch, chunk_size=chunk_size, D=Df,
                        dt_bias=dtb,
                        dt_softplus=True)                 # [B, L, K*nheads, headdim]
    ys = y.reshape(Bb, L, K, d_ssm)                       # free view
    if merge:
        return cross_merge_time_major(ys, H, W)
    if stack_scan_order:
        # permutation-invariant consumer (ST-SSD STL/WMF): skip the
        # alignment flips/transposes entirely — one moveaxis instead
        return cross_stack_scan_order(ys)
    return cross_merge_stack_time_major(ys, H, W)


def rmsnorm_gated(x, z, weight, *, eps: float = 1e-5,
                  norm_before_gate: bool = False, group_size=None):
    """Gated RMSNorm (reference Triton kernel K9,
    `mamba_ssm/ops/triton/layernorm.py:481`): on TPU this is a handful of
    VPU ops that XLA fuses — no custom kernel needed.

    norm_before_gate=False (the models' setting): out = rmsnorm(x * silu(z)).
    """
    dtype = x.dtype
    x = x.astype(jnp.float32)
    if z is not None and not norm_before_gate:
        x = x * jax.nn.silu(z.astype(jnp.float32))
    d = x.shape[-1]
    if group_size is None or group_size == d:
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        y = x * jax.lax.rsqrt(var + eps)
    else:
        g = d // group_size
        xg = x.reshape(x.shape[:-1] + (g, group_size))
        var = jnp.mean(jnp.square(xg), axis=-1, keepdims=True)
        y = (xg * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    y = y * weight.astype(jnp.float32)
    if z is not None and norm_before_gate:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(dtype)
