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

import jax
import jax.numpy as jnp
from jax import lax


def _segsum(x):
    """Stable segment-sum: out[..., i, j] = sum_{j < k <= i} x[..., k].

    Lower-triangular (j <= i) entries are finite, the rest -inf, so that
    ``exp(segsum(x))`` is the causal decay matrix.  Differences of cumsums
    keep everything bounded because x <= 0.
    """
    T = x.shape[-1]
    xc = jnp.cumsum(x, axis=-1)
    seg = xc[..., :, None] - xc[..., None, :]
    mask = jnp.tril(jnp.ones((T, T), dtype=bool))
    return jnp.where(mask, seg, -jnp.inf)


def ssd_chunked(x, dt, A, B, C, chunk_size: int = 128, D=None, z=None,
                dt_bias=None, dt_softplus=True, initial_state=None,
                return_final_state=False, acc_dtype=jnp.float32):
    """Chunked block-matmul SSD scan.

    The four stages (mirroring the SSD algorithm the reference's Triton kernel
    implements):
      1. intra-chunk outputs   : Y_diag = (C B^T * decay) X   (per chunk)
      2. chunk states          : S_c    = B^T (decay_to_end * X)
      3. inter-chunk recurrence: S_c'   = exp(sum dtA_c) S_{c-1}' + S_c
      4. state contribution    : Y_off  = C S_in * decay_from_start
    """
    out_dtype = x.dtype
    Bsz, L, H, P = x.shape
    G, N = B.shape[2], B.shape[3]
    rep = H // G

    dt = dt.astype(acc_dtype)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(acc_dtype)
    if dt_softplus:
        dt = jax.nn.softplus(dt)

    pad = (-L) % chunk_size
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Lp = L + pad
    nc = Lp // chunk_size

    # chunked views  (c = chunk index, l = position within chunk)
    xc = x.reshape(Bsz, nc, chunk_size, H, P)
    dtc = dt.reshape(Bsz, nc, chunk_size, H)
    Bc = B.reshape(Bsz, nc, chunk_size, G, N)
    Cc = C.reshape(Bsz, nc, chunk_size, G, N)
    # broadcast groups over heads: [B, nc, l, H, N]
    Bh = jnp.repeat(Bc, rep, axis=3)
    Ch = jnp.repeat(Cc, rep, axis=3)

    dtA = dtc * A.astype(acc_dtype)                      # [B, nc, l, H]  (<= 0)
    A_cum = jnp.cumsum(dtA, axis=2)                      # [B, nc, l, H]

    # weight dt into B (discretisation): dB_t = dt_t * B_t
    dtx = (xc.astype(acc_dtype) * dtc[..., None])        # [B, nc, l, H, P]

    # 1. intra-chunk (causal masked attention-like matmul)
    Lmat = jnp.exp(_segsum(jnp.moveaxis(dtA, 3, 2)))     # [B, nc, H, l, l]
    scores = jnp.einsum("bclhn,bcshn->bchls", Ch, Bh,
                        preferred_element_type=acc_dtype)
    Y_diag = jnp.einsum("bchls,bcshp->bclhp", scores * Lmat, dtx,
                        preferred_element_type=acc_dtype)

    # 2. per-chunk end states
    decay_to_end = jnp.exp(A_cum[:, :, -1:, :] - A_cum)  # [B, nc, l, H]
    S = jnp.einsum("bclhn,bclhp->bchpn", Bh * decay_to_end[..., None], dtx,
                   preferred_element_type=acc_dtype)     # [B, nc, H, P, N]

    # 3. inter-chunk recurrence over nc (tiny sequential scan)
    chunk_decay = jnp.exp(A_cum[:, :, -1, :])            # [B, nc, H]

    def combine(e1, e2):
        a1, s1 = e1
        a2, s2 = e2
        return a1 * a2, a2[..., None, None] * s1 + s2

    if initial_state is not None:
        S = S.at[:, 0].add(chunk_decay[:, 0][..., None, None] *
                           initial_state.astype(acc_dtype))
    a_acc, S_end = lax.associative_scan(combine, (chunk_decay, S), axis=1)
    # state entering chunk c = state at end of chunk c-1
    zero0 = jnp.zeros_like(S_end[:, :1])
    S_in = jnp.concatenate([zero0, S_end[:, :-1]], axis=1)
    if initial_state is not None:
        S_in = S_in.at[:, 0].set(initial_state.astype(acc_dtype))

    # 4. contribution of the incoming state
    decay_from_start = jnp.exp(A_cum)                    # [B, nc, l, H]
    Y_off = jnp.einsum("bclhn,bchpn->bclhp", Ch * decay_from_start[..., None],
                       S_in, preferred_element_type=acc_dtype)

    y = (Y_diag + Y_off).reshape(Bsz, Lp, H, P)[:, :L]
    if D is not None:
        xs = x.reshape(Bsz, Lp, H, P)[:, :L]
        if D.ndim == 1:                                  # per-head scalar D
            y = y + xs.astype(acc_dtype) * D.astype(acc_dtype)[None, None, :, None]
        else:
            y = y + xs.astype(acc_dtype) * D.astype(acc_dtype)
    if z is not None:
        y = y * jax.nn.silu(z.astype(acc_dtype))
    y = y.astype(out_dtype)
    if return_final_state:
        return y, S_end[:, -1].astype(out_dtype)
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
