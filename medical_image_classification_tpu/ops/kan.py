"""Kolmogorov–Arnold (KAN) B-spline ops, vectorised for XLA.

Functional rebuilds of the reference's two KAN families:

* efficient-KAN ``eKANLinear`` (`/root/reference/kanSSD/e_kan.py:8-239`,
  spline_order 1 and 3 variants) — grid is a non-trainable state variable,
  forward = Linear(silu(x), W_base) + Linear(bspline(x), W_spline·scaler).
* original pykan ``KANLayer`` (`/root/reference/medmamba_kan/o_kan.py:159-488`)
  — per-edge activations with scale_base/scale_sp/mask, ridge-least-squares
  coefficient fitting, adaptive grid refinement.

All basis evaluation is the Cox–de-Boor recursion unrolled for a *static*
spline order k — fixed shapes, jit-friendly, vectorised over (batch, in).
``update_grid`` / ``curve2coeff`` involve sorts and least-squares solves and
are pure functions intended to be called *outside* the jitted train step
(rare, host-driven re-gridding, as the reference does at
`medmamba_kan/MedSSD_ekan.py:1046-1047`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_grid(in_features: int, grid_size: int, spline_order: int,
              grid_range=(-1.0, 1.0)):
    """Uniform extended grid: [in_features, grid_size + 2*spline_order + 1]."""
    h = (grid_range[1] - grid_range[0]) / grid_size
    pts = (jnp.arange(-spline_order, grid_size + spline_order + 1,
                      dtype=jnp.float32) * h + grid_range[0])
    return jnp.broadcast_to(pts, (in_features, pts.shape[0]))


def extend_grid(grid, k: int):
    """Extend a [in, G+1] grid by k steps on both sides (o-KAN convention)."""
    h = (grid[:, -1:] - grid[:, :1]) / (grid.shape[1] - 1)
    left = grid[:, :1] - h * jnp.arange(k, 0, -1, dtype=grid.dtype)
    right = grid[:, -1:] + h * jnp.arange(1, k + 1, dtype=grid.dtype)
    return jnp.concatenate([left, grid, right], axis=1)


def b_splines(x, grid, spline_order: int):
    """B-spline bases by Cox–de-Boor, unrolled over the static order.

    x    : [batch, in]
    grid : [in, n_pts]   (n_pts = grid_size + 2*spline_order + 1)
    -> [batch, in, grid_size + spline_order]
    """
    x = x[..., None]                                    # [batch, in, 1]
    bases = jnp.logical_and(x >= grid[:, :-1], x < grid[:, 1:]).astype(x.dtype)
    for k in range(1, spline_order + 1):
        left = (x - grid[:, :-(k + 1)]) / (grid[:, k:-1] - grid[:, :-(k + 1)])
        right = (grid[:, k + 1:] - x) / (grid[:, k + 1:] - grid[:, 1:-k])
        bases = left * bases[..., :-1] + right * bases[..., 1:]
    return bases


def curve2coeff(x, y, grid, spline_order: int, ridge: float = 1e-8):
    """Fit spline coefficients interpolating (x, y) by ridge least squares.

    x: [batch, in];  y: [batch, in, out]
    -> [out, in, n_coeff]   (e-KAN weight layout)

    The reference uses ``torch.linalg.lstsq`` (e_kan.py:115-145); a ridge
    normal-equation solve is equivalent at these sizes, TPU-friendly, and
    matches o-KAN's λ-regularised pinverse (o_kan.py:116-122).
    """
    A = jnp.swapaxes(b_splines(x, grid, spline_order), 0, 1)  # [in, batch, coeff]
    Bm = jnp.swapaxes(y, 0, 1)                                # [in, batch, out]
    AtA = jnp.einsum("ibc,ibd->icd", A, A)
    AtB = jnp.einsum("ibc,ibo->ico", A, Bm)
    n = AtA.shape[-1]
    # scale the ridge with the problem (few samples => singular AtA)
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)[:, None, None] / n
    lam = ridge + 1e-6 * tr + 1e-8
    sol = jnp.linalg.solve(AtA + lam * jnp.eye(n, dtype=AtA.dtype), AtB)
    return jnp.transpose(sol, (2, 0, 1))                      # [out, in, coeff]


def kan_linear(x, grid, base_weight, spline_weight, spline_scaler,
               spline_order: int):
    """Efficient-KAN forward (e_kan.py:155-168).

    x: [..., in]; base_weight: [out, in];
    spline_weight: [out, in, coeff]; spline_scaler: [out, in] or None.
    """
    shape = x.shape
    x2 = x.reshape(-1, shape[-1]).astype(jnp.float32)
    base = jax.nn.silu(x2) @ base_weight.T
    bases = b_splines(x2, grid, spline_order)                 # [b, in, coeff]
    w = spline_weight
    if spline_scaler is not None:
        w = w * spline_scaler[..., None]
    spline = jnp.einsum("bic,oic->bo", bases, w)
    out = (base + spline).astype(x.dtype)
    return out.reshape(shape[:-1] + (base_weight.shape[0],))


def kan_update_grid(x, grid, spline_weight, spline_scaler, *,
                    grid_size: int, spline_order: int, grid_eps: float = 0.02,
                    margin: float = 0.01):
    """Adaptive re-gridding from sample quantiles (e_kan.py:170-217).

    Pure: returns (new_grid, new_spline_weight).  Call outside jit.
    """
    batch = x.shape[0]
    splines = b_splines(x, grid, spline_order)                # [b, in, coeff]
    w = spline_weight * (spline_scaler[..., None]
                         if spline_scaler is not None else 1.0)
    # current spline outputs per (batch, in, out)
    unreduced = jnp.einsum("bic,oic->bio", splines, w)

    x_sorted = jnp.sort(x, axis=0)
    idx = jnp.linspace(0, batch - 1, grid_size + 1).astype(jnp.int32)
    grid_adaptive = x_sorted[idx]                             # [G+1, in]
    step = (x_sorted[-1] - x_sorted[0] + 2 * margin) / grid_size
    grid_uniform = (jnp.arange(grid_size + 1, dtype=jnp.float32)[:, None] * step
                    + x_sorted[0] - margin)
    g = grid_eps * grid_uniform + (1 - grid_eps) * grid_adaptive
    # guard against degenerate (duplicate) knots from small sample batches:
    # enforce strictly increasing knots with a span-scaled epsilon
    g = jax.lax.cummax(g, axis=0)
    span = jnp.maximum(g[-1] - g[0], 1e-3)
    g = g + (jnp.arange(g.shape[0], dtype=jnp.float32)[:, None]
             * 1e-4 * span)
    step = jnp.maximum(step, 1e-4 * span)
    lo = g[:1] - step * jnp.arange(spline_order, 0, -1, dtype=jnp.float32)[:, None]
    hi = g[-1:] + step * jnp.arange(1, spline_order + 1, dtype=jnp.float32)[:, None]
    new_grid = jnp.concatenate([lo, g, hi], axis=0).T          # [in, n_pts]
    new_w = curve2coeff(x, unreduced, new_grid, spline_order)
    if spline_scaler is not None:
        sc = spline_scaler[..., None]
        safe = jnp.where(jnp.abs(sc) > 1e-3, sc,
                         jnp.where(sc >= 0, 1e-3, -1e-3))
        new_w = new_w / safe
    return new_grid, new_w


def kan_regularization(spline_weight, regularize_activation: float = 1.0,
                       regularize_entropy: float = 1.0):
    """L1 + entropy regulariser over spline weights (e_kan.py:219-239)."""
    l1 = jnp.mean(jnp.abs(spline_weight), axis=-1)
    act = jnp.sum(l1)
    p = l1 / (act + 1e-12)
    ent = -jnp.sum(p * jnp.log(p + 1e-12))
    return regularize_activation * act + regularize_entropy * ent


# ---------------------------------------------------------------------------
# original pykan ("o-KAN") functional core
# ---------------------------------------------------------------------------

def coef2curve(x, grid, coef, k: int):
    """Evaluate per-edge splines: [batch, in] x coef[in, out, coeff]
    -> [batch, out, in]  (o_kan.py:52-79 layout: y[b, i, o] then used
    transposed; we return [batch, in, out])."""
    bases = b_splines(x, grid, k)                             # [b, in, coeff]
    return jnp.einsum("bic,ioc->bio", bases, coef)            # [b, in, out]


def okan_curve2coef(x, y, grid, k: int, lamb: float = 1e-8):
    """Ridge LSQ in o-KAN layout: y[batch, in, out] -> coef[in, out, coeff]."""
    c = curve2coeff(x, y, grid, k, ridge=lamb)                # [out, in, coeff]
    return jnp.transpose(c, (1, 0, 2))


def sparse_mask(in_dim: int, out_dim: int):
    """Connectivity mask used by o-KAN sparse_init (o_kan.py:140-156):
    each input connects to its nearest output (and vice versa) on [0, 1]."""
    in_coord = (jnp.arange(in_dim, dtype=jnp.float32) + 0.5) / in_dim
    out_coord = (jnp.arange(out_dim, dtype=jnp.float32) + 0.5) / out_dim
    dist = jnp.abs(in_coord[:, None] - out_coord[None, :])
    near_out = jnp.argmin(dist, axis=1)                       # per input
    near_in = jnp.argmin(dist, axis=0)                        # per output
    mask = jnp.zeros((in_dim, out_dim))
    mask = mask.at[jnp.arange(in_dim), near_out].set(1.0)
    mask = mask.at[near_in, jnp.arange(out_dim)].set(1.0)
    return mask


def okan_forward(x, grid, coef, scale_base, scale_sp, mask, k: int,
                 return_acts: bool = False):
    """o-KAN forward (o_kan.py:279-321).

    y[b, o] = sum_i mask[i,o] * (scale_base[i,o]*silu(x[b,i])
                                 + scale_sp[i,o]*spline_io(x[b,i]))
    """
    x = x.astype(jnp.float32)
    base = jax.nn.silu(x)                                     # [b, in]
    postspline = coef2curve(x, grid, coef, k)                 # [b, in, out]
    post = mask * (scale_base * base[..., None] + scale_sp * postspline)
    y = jnp.sum(post, axis=1)                                 # [b, out]
    if return_acts:
        preacts = jnp.broadcast_to(x[:, None, :],
                                   (x.shape[0], coef.shape[1], x.shape[1]))
        return y, preacts, jnp.swapaxes(post, 1, 2), jnp.swapaxes(postspline, 1, 2)
    return y


def okan_update_grid(x, grid, coef, k: int, num: int, grid_eps: float = 0.02):
    """o-KAN update_grid_from_samples (o_kan.py:323-367): re-fit grid to the
    sample distribution, re-fit coef to preserve the function."""
    batch = x.shape[0]
    x_sorted = jnp.sort(x, axis=0)
    y_eval = coef2curve(x_sorted, grid, coef, k)              # [b, in, out]
    ids = jnp.concatenate([(batch / num * jnp.arange(num)).astype(jnp.int32),
                           jnp.array([batch - 1])])
    grid_adaptive = x_sorted[ids].T                           # [in, num+1]
    margin = 0.0
    h = (grid_adaptive[:, -1:] - grid_adaptive[:, :1] + 2 * margin) / num
    grid_uniform = (grid_adaptive[:, :1] - margin +
                    h * jnp.arange(num + 1, dtype=jnp.float32)[None, :])
    new_grid = grid_eps * grid_uniform + (1 - grid_eps) * grid_adaptive
    # degenerate-knot guard (see kan_update_grid)
    new_grid = jax.lax.cummax(new_grid, axis=1)
    span = jnp.maximum(new_grid[:, -1:] - new_grid[:, :1], 1e-3)
    new_grid = new_grid + (jnp.arange(new_grid.shape[1],
                                      dtype=jnp.float32)[None, :]
                           * 1e-4 * span)
    new_grid = extend_grid(new_grid, k)
    new_coef = okan_curve2coef(x_sorted, y_eval, new_grid, k)
    return new_grid, new_coef


def okan_get_subset(grid, coef, scale_base, scale_sp, mask, in_idx, out_idx):
    """o-KAN pruning: restrict a layer to (in_idx, out_idx) edges
    (`o_kan.py:420-451` get_subset)."""
    import numpy as np
    in_idx = jnp.asarray(in_idx)
    out_idx = jnp.asarray(out_idx)
    return (grid[in_idx],
            coef[in_idx][:, out_idx],
            scale_base[in_idx][:, out_idx],
            scale_sp[in_idx][:, out_idx],
            mask[in_idx][:, out_idx])


def okan_swap(arrs, i, j, axis: int):
    """o-KAN neuron swap (`o_kan.py:453-488`): exchange rows/cols i<->j of
    every array in ``arrs`` along ``axis``."""
    out = []
    for a in arrs:
        ai = jnp.take(a, i, axis=axis)
        aj = jnp.take(a, j, axis=axis)
        a = _set_along(a, i, aj, axis)
        a = _set_along(a, j, ai, axis)
        out.append(a)
    return out


def _set_along(a, idx, val, axis):
    sl = [slice(None)] * a.ndim
    sl[axis] = idx
    return a.at[tuple(sl)].set(val)


def okan_refine_grid(grid, coef, new_num: int, k: int,
                     samples=None, n_eval: int = 256):
    """Grid refinement (`o_kan.py:369-418` initialize_grid_from_parent):
    re-fit the layer on a finer grid (new_num intervals) while preserving
    the learned function.  Returns (new_grid, new_coef)."""
    in_dim = grid.shape[0]
    lo = grid[:, k][:, None]
    hi = grid[:, -(k + 1)][:, None]
    if samples is None:
        t = jnp.linspace(0.0, 1.0, n_eval)[None, :]
        samples = (lo + (hi - lo) * t).T                 # [n_eval, in]
    y_eval = coef2curve(samples, grid, coef, k)          # [n_eval, in, out]
    t2 = jnp.linspace(0.0, 1.0, new_num + 1)[None, :]
    new_core = (lo + (hi - lo) * t2)                     # [in, new_num+1]
    new_grid = extend_grid(new_core, k)
    new_coef = okan_curve2coef(samples, y_eval, new_grid, k)
    return new_grid, new_coef
