"""4-direction 2-D cross-scan / cross-merge and the strided EfficientScan.

TPU-native equivalents of the reference's direction handling
(`/root/reference/MedMamba.py:393-395,420-424` and
`/root/reference/CrossMamba/FusionMamba/models/cross.py:34-190`).

Everything is channel-last ([B, H, W, C]); the four directions are
  0: row-major           (scan H rows left→right, top→bottom)
  1: column-major        (transpose: scan W columns top→bottom, left→right)
  2: reversed row-major
  3: reversed column-major
The reference materialises flipped copies in HBM; here the flips/transposes
are pure `jnp` reshapes+reverses which XLA fuses into the consumer — no extra
HBM round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def cross_scan(x):
    """[B, H, W, C] -> [B, 4, L, C] with L = H*W."""
    Bb, H, W, C = x.shape
    L = H * W
    d0 = x.reshape(Bb, L, C)
    d1 = jnp.swapaxes(x, 1, 2).reshape(Bb, L, C)
    d2 = jnp.flip(d0, axis=1)
    d3 = jnp.flip(d1, axis=1)
    return jnp.stack([d0, d1, d2, d3], axis=1)


def cross_merge(ys, H, W):
    """Inverse of cross_scan followed by a sum over directions.

    ys: [B, 4, L, C]  ->  [B, H, W, C]
    """
    Bb, K, L, C = ys.shape
    assert K == 4 and L == H * W
    y0 = ys[:, 0]
    y1 = jnp.swapaxes(ys[:, 1].reshape(Bb, W, H, C), 1, 2).reshape(Bb, L, C)
    y2 = jnp.flip(ys[:, 2], axis=1)
    y3f = jnp.flip(ys[:, 3], axis=1)
    y3 = jnp.swapaxes(y3f.reshape(Bb, W, H, C), 1, 2).reshape(Bb, L, C)
    return (y0 + y1 + y2 + y3).reshape(Bb, H, W, C)


def cross_merge_stack(ys, H, W):
    """Like cross_merge but returns the 4 aligned maps stacked (no sum):
    [B, 4, L, C] -> [B, 4, L, C], all in direction-0 (row-major) order.
    Used by the ST-SSD weighted merge (WMF), which learns the combination
    instead of summing (`/root/reference/st_mamba/ST_SSD.py:539-549`)."""
    Bb, K, L, C = ys.shape
    y0 = ys[:, 0]
    y1 = jnp.swapaxes(ys[:, 1].reshape(Bb, W, H, C), 1, 2).reshape(Bb, L, C)
    y2 = jnp.flip(ys[:, 2], axis=1)
    y3f = jnp.flip(ys[:, 3], axis=1)
    y3 = jnp.swapaxes(y3f.reshape(Bb, W, H, C), 1, 2).reshape(Bb, L, C)
    return jnp.stack([y0, y1, y2, y3], axis=1)


def efficient_scan(x, step: int = 2):
    """Strided ("atrous") 4-way spatial subsampling scan.

    [B, H, W, C] -> [B, 4, L/4, C]; subsequence k takes pixels at offset
    (k % 2, k // 2) with stride `step` in each spatial dim.  TPU-native
    rebuild of EfficientScan (`cross.py:139-190`): a pure strided-slice
    (space-to-depth) instead of a hand-written autograd pair — JAX
    differentiates the gather automatically.
    """
    Bb, H, W, C = x.shape
    subs = [x[:, i::step, j::step, :] for j in range(step) for i in range(step)]
    return jnp.stack([s.reshape(Bb, -1, C) for s in subs], axis=1)


def efficient_merge(ys, H, W, step: int = 2):
    """Inverse of efficient_scan (sums nothing — reassembles the image).

    ys: [B, 4, L/4, C] -> [B, H, W, C]
    """
    Bb, K, Ls, C = ys.shape
    h, w = H // step, W // step
    out = jnp.zeros((Bb, H, W, C), dtype=ys.dtype)
    idx = 0
    for j in range(step):
        for i in range(step):
            out = out.at[:, i::step, j::step, :].set(ys[:, idx].reshape(Bb, h, w, C))
            idx += 1
    return out


def cross_scan_time_major(x):
    """[B, H, W, C] -> [B, L, 4, C] (time-major direction stack).

    Same four directions as `cross_scan`, stacked on axis 2 so that folding
    directions into heads/groups ([B, L, K*C'] views) is a free reshape —
    the SSD core's [B, 4, L, C] -> swapaxes(1, 2) full-tensor copies
    disappear (measured ~2 ms/step at MedSSD b16 shapes).
    """
    Bb, H, W, C = x.shape
    L = H * W
    d0 = x.reshape(Bb, L, C)
    d1 = jnp.swapaxes(x, 1, 2).reshape(Bb, L, C)
    d2 = jnp.flip(d0, axis=1)
    d3 = jnp.flip(d1, axis=1)
    return jnp.stack([d0, d1, d2, d3], axis=2)


def cross_scan_time_major2(x):
    """d0/d1 half of cross_scan_time_major: [B, H, W, C] -> [B, L, 2, C].

    Directions 2/3 are sequence flips of these two — the flip-free fused
    SSD kernel (`kernels/ssd_fused_dirs_pallas.py`) reads them from the
    same bytes via mirrored chunk maps, so they are never materialised.
    """
    Bb, H, W, C = x.shape
    L = H * W
    d0 = x.reshape(Bb, L, C)
    d1 = jnp.swapaxes(x, 1, 2).reshape(Bb, L, C)
    return jnp.stack([d0, d1], axis=2)


def cross_scan_time_major2_roles(x, d_ssm: int, gn: int):
    """d0/d1 stack with ROLE-major channels:
    [B, H, W, C'] -> [B, L, x_j0|x_j1|B_j0|B_j1|C_j0|C_j1|dt_j0|dt_j1].

    The flip-free dirs kernel cuts its x/B/C operands straight out of this
    array with BlockSpecs (r4): every block is a CONTIGUOUS channel run at
    a block-aligned offset, so no host-side slice copies and no strided
    sub-layout blocks (an interleaved [.., 2, C'] stack put the layout dim
    on sublanes — measured +13 ms/step of kernel time at MedSSD b16).
    One concatenate pass, same bytes as the interleaved stack.
    """
    Bb, H, W, C = x.shape
    L = H * W
    d0 = x.reshape(Bb, L, C)
    d1 = jnp.swapaxes(x, 1, 2).reshape(Bb, L, C)
    o1, o2 = d_ssm, d_ssm + gn
    return jnp.concatenate(
        [d0[..., :o1], d1[..., :o1],
         d0[..., o1:o2], d1[..., o1:o2],
         d0[..., o2:o2 + gn], d1[..., o2:o2 + gn],
         d0[..., o2 + gn:], d1[..., o2 + gn:]], axis=-1)


def cross_merge_noflip_time_major(ys, H, W):
    """Merge for the flip-free fused path: ys [B, L, 4, C] with directions
    2/3 ALREADY in d0/d1 order (the kernel un-mirrors them), so the merge
    is two adds and one un-transpose — no flips, fwd or bwd."""
    Bb, L, K, C = ys.shape
    assert K == 4 and L == H * W
    y02 = ys[:, :, 0] + ys[:, :, 2]
    y13 = ys[:, :, 1] + ys[:, :, 3]
    y13 = jnp.swapaxes(y13.reshape(Bb, W, H, C), 1, 2).reshape(Bb, L, C)
    return (y02 + y13).reshape(Bb, H, W, C)


def cross_merge_time_major(ys, H, W):
    """Inverse of cross_scan_time_major + sum over directions.

    ys: [B, L, 4, C] -> [B, H, W, C]
    """
    Bb, L, K, C = ys.shape
    assert K == 4 and L == H * W
    y0 = ys[:, :, 0]
    y1 = jnp.swapaxes(ys[:, :, 1].reshape(Bb, W, H, C), 1, 2).reshape(Bb, L, C)
    y2 = jnp.flip(ys[:, :, 2], axis=1)
    y3f = jnp.flip(ys[:, :, 3], axis=1)
    y3 = jnp.swapaxes(y3f.reshape(Bb, W, H, C), 1, 2).reshape(Bb, L, C)
    return (y0 + y1 + y2 + y3).reshape(Bb, H, W, C)


def cross_stack_scan_order(ys):
    """[B, L, 4, C] -> [B, 4, L, C] with each direction kept in ITS OWN
    scan order — no alignment flips or transposes.

    Exact for consumers that are permutation-invariant over L: the ST-SSD
    STL token mixer is one (U = sum_l A[l] outer V[l]; the gate, channel
    max/avg and row softmax are all per-position), so the WMF path needs no
    alignment at all.  The reference aligns first
    (`/root/reference/st_mamba/ST_SSD.py:632-646`) only because its scan
    outputs come back permuted — the aligned and unaligned stacks feed STL
    identical multisets of rows, differing only in fp summation order.
    """
    return jnp.moveaxis(ys, 2, 1)


def cross_merge_stack_time_major(ys, H, W):
    """Like cross_merge_time_major but returns the 4 aligned maps stacked
    ([B, 4, L, C], direction-0 order) for learned merges (WMF)."""
    Bb, L, K, C = ys.shape
    y0 = ys[:, :, 0]
    y1 = jnp.swapaxes(ys[:, :, 1].reshape(Bb, W, H, C), 1, 2).reshape(Bb, L, C)
    y2 = jnp.flip(ys[:, :, 2], axis=1)
    y3f = jnp.flip(ys[:, :, 3], axis=1)
    y3 = jnp.swapaxes(y3f.reshape(Bb, W, H, C), 1, 2).reshape(Bb, L, C)
    return jnp.stack([y0, y1, y2, y3], axis=1)


def split_channels(x, sizes):
    """Split the trailing axis into contiguous runs with a ONE-CONCAT vjp.

    ``tuple(x[..., o:o+s])`` slices are free views forward (XLA fuses them
    into consumers), but their autodiff adjoint is a chain of pad+add ops
    — each cotangent is padded to the full width and summed, re-reading
    the whole tensor per piece (traced: ~0.4 ms per pad_add_fusion at
    MedSSD b32 on the in_proj output, `models/ss2d_modules.py`).  The
    custom vjp assembles the cotangent with a single ``jnp.concatenate``
    instead — the same trick the r4 dirs-kernel rework used for its
    operand stack.
    """
    assert sum(sizes) == x.shape[-1], (sizes, x.shape)
    return _split_channels(x, tuple(sizes))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _split_channels(x, sizes):
    out = []
    o = 0
    for s in sizes:
        out.append(jax.lax.slice_in_dim(x, o, o + s, axis=x.ndim - 1))
        o += s
    return tuple(out)


def _split_channels_fwd(x, sizes):
    return _split_channels(x, sizes), None


def _split_channels_bwd(sizes, _, cts):
    # cotangents arrive in the slices' dtype (= x's); one concat, no pads
    return (jnp.concatenate(list(cts), axis=-1),)


_split_channels.defvjp(_split_channels_fwd, _split_channels_bwd)
