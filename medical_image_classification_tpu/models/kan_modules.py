"""KAN Flax modules: efficient-KAN and original-pykan layers + head wirings.

Rebuilds of `/root/reference/kanSSD/e_kan.py` (KANLinear),
`/root/reference/medmamba_kan/o_kan.py` (KANLayer), and the five head
variants inventoried in SURVEY §2.4 H3.

The B-spline grid lives in the ``kan_state`` variable collection (a buffer,
not trained); adaptive re-gridding is an explicit call with
``mutable=['kan_state', 'params']`` outside the jitted train step, mirroring
the reference's rare host-driven ``update_grid`` hook
(`medmamba_kan/MedSSD_ekan.py:1046-1047`).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from medical_image_classification_tpu.ops import kan as kan_ops


def _kaiming_uniform_a(a: float):
    """torch kaiming_uniform_ with negative_slope a: U(-b, b),
    b = sqrt(6 / ((1 + a^2) * fan_in))."""
    def init(rng, shape, dtype=jnp.float32):
        fan_in = shape[-1]
        bound = math.sqrt(6.0 / ((1.0 + a * a) * fan_in))
        return jax.random.uniform(rng, shape, dtype, -bound, bound)
    return init


class KANLinear(nn.Module):
    """Efficient-KAN spline layer (`e_kan.py:8-239`).

    forward = Linear(silu(x), W_base) + Linear(B-splines(x), W_spline·scaler).
    ``__call__(x, update_grid=True)`` re-fits the grid to the batch sample
    distribution and re-fits the spline weights to preserve the function
    (requires mutable 'kan_state' and 'params').
    """
    features: int
    grid_size: int = 5
    spline_order: int = 1
    scale_noise: float = 0.1
    scale_base: float = 1.0
    scale_spline: float = 1.0
    standalone_scale: bool = True
    grid_range: Sequence[float] = (-1.0, 1.0)

    @nn.compact
    def __call__(self, x, update_grid: bool = False):
        in_f = x.shape[-1]
        gs, k = self.grid_size, self.spline_order
        grid0 = kan_ops.make_grid(in_f, gs, k, self.grid_range)
        grid = self.variable("kan_state", "grid", lambda: grid0)

        base_w = self.param(
            "base_weight", _kaiming_uniform_a(math.sqrt(5) * self.scale_base),
            (self.features, in_f))

        def spline_init(rng, shape, dtype=jnp.float32):
            noise = ((jax.random.uniform(rng, (gs + 1, in_f, self.features))
                      - 0.5) * self.scale_noise / gs)
            pts = grid0[:, k:-k].T if k > 0 else grid0.T  # [gs+1, in]
            coeff = kan_ops.curve2coeff(pts, noise, grid0, k)
            scale = 1.0 if self.standalone_scale else self.scale_spline
            return (scale * coeff).astype(dtype)

        spline_w = self.param("spline_weight", spline_init,
                              (self.features, in_f, gs + k))
        scaler = (self.param("spline_scaler",
                             _kaiming_uniform_a(math.sqrt(5) * self.scale_spline),
                             (self.features, in_f))
                  if self.standalone_scale else None)

        if update_grid:
            x2 = x.reshape(-1, in_f).astype(jnp.float32)
            new_grid, new_w = kan_ops.kan_update_grid(
                x2, grid.value, spline_w, scaler, grid_size=gs, spline_order=k)
            grid.value = new_grid
            self.put_variable("params", "spline_weight", new_w)
            spline_w = new_w

        return kan_ops.kan_linear(x, grid.value, base_w, spline_w, scaler, k)


class OKANLayer(nn.Module):
    """Original pykan layer (`o_kan.py:159-321`): per-edge spline activations
    with residual silu base, scale_base/scale_sp/mask."""
    out_dim: int
    num: int = 5
    k: int = 3
    noise_scale: float = 0.5
    scale_base_mu: float = 0.0
    scale_base_sigma: float = 1.0
    scale_sp: float = 1.0
    grid_range: Sequence[float] = (-1.0, 1.0)
    sparse_init: bool = False

    @nn.compact
    def __call__(self, x, update_grid: bool = False, return_acts: bool = False):
        in_dim = x.shape[-1]
        lead = x.shape[:-1]
        x2 = x.reshape(-1, in_dim)
        g0 = jnp.broadcast_to(
            jnp.linspace(self.grid_range[0], self.grid_range[1], self.num + 1),
            (in_dim, self.num + 1)).astype(jnp.float32)
        grid0 = kan_ops.extend_grid(g0, self.k)
        grid = self.variable("kan_state", "grid", lambda: grid0)
        mask0 = (kan_ops.sparse_mask(in_dim, self.out_dim) if self.sparse_init
                 else jnp.ones((in_dim, self.out_dim)))
        mask = self.variable("kan_state", "mask", lambda: mask0)

        def coef_init(rng, shape, dtype=jnp.float32):
            noise = ((jax.random.uniform(rng, (self.num + 1, in_dim, self.out_dim))
                      - 0.5) * self.noise_scale / self.num)
            pts = grid0[:, self.k:-self.k].T          # [num+1, in]
            return kan_ops.okan_curve2coef(pts, noise, grid0, self.k).astype(dtype)

        coef = self.param("coef", coef_init, (in_dim, self.out_dim,
                                              self.num + self.k))

        def sb_init(rng, shape, dtype=jnp.float32):
            r = jax.random.uniform(rng, shape, dtype) * 2.0 - 1.0
            s = 1.0 / math.sqrt(in_dim)
            return self.scale_base_mu * s + self.scale_base_sigma * r * s

        scale_base = self.param("scale_base", sb_init, (in_dim, self.out_dim))
        scale_sp = self.param(
            "scale_sp", lambda rng, s: jnp.ones(s) * self.scale_sp * mask0,
            (in_dim, self.out_dim))

        if update_grid:
            new_grid, new_coef = kan_ops.okan_update_grid(
                x2.astype(jnp.float32), grid.value, coef, self.k, self.num)
            grid.value = new_grid
            self.put_variable("params", "coef", new_coef)
            coef = new_coef

        out = kan_ops.okan_forward(x2, grid.value, coef, scale_base, scale_sp,
                                   mask.value, self.k, return_acts=return_acts)
        if return_acts:
            y, pre, post, postsp = out
            return y.reshape(lead + (self.out_dim,)), pre, post, postsp
        return out.reshape(lead + (self.out_dim,)).astype(x.dtype)


class KansModule(nn.Module):
    """kan1 -> BN -> +residual -> kan2 (`MedSSD_kan/MedSSD_kan.py:475-502`)."""
    features: int
    num: int = 5
    k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        h = OKANLayer(x.shape[-1], num=self.num, k=self.k, name="kan1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(h)
        h = h + residual
        return OKANLayer(self.features, num=self.num, k=self.k, name="kan2")(h)


class ThreeKansModule(nn.Module):
    """kan1 -> BN -> kan2 -> BN -> +residual -> kan3
    (`MedSSD_kan/MedSSD_3kan.py:475-505`; the reference reuses ONE BatchNorm
    module at both hops — mirrored here)."""
    features: int
    num: int = 5
    k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, name="bn")
        h = OKANLayer(x.shape[-1], num=self.num, k=self.k, name="kan1")(x)
        h = bn(h)
        h = OKANLayer(x.shape[-1], num=self.num, k=self.k, name="kan2")(h)
        h = bn(h)
        h = h + residual
        return OKANLayer(self.features, num=self.num, k=self.k, name="kan3")(h)


class ClassifierHead(nn.Module):
    """All head variants behind one switch (SURVEY §2.4 H3):

    kind: 'linear' | 'ekan' | 'okan' | 'kan_stack' | 'kan_module' | '3kan'
    """
    num_classes: int
    kind: str = "linear"
    ekan_spline_order: int = 1
    ekan_grid_size: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False, update_grid: bool = False):
        kind = self.kind
        if kind == "linear":
            from medical_image_classification_tpu.models.common import trunc_normal_02
            return nn.Dense(self.num_classes, kernel_init=trunc_normal_02,
                            name="head")(x)
        if kind == "ekan":
            return KANLinear(self.num_classes, grid_size=self.ekan_grid_size,
                             spline_order=self.ekan_spline_order,
                             name="head")(x, update_grid=update_grid)
        if kind == "okan":
            return OKANLayer(self.num_classes, name="head")(
                x, update_grid=update_grid)
        if kind == "kan_stack":
            # 3 chained o-KANs: (num=5,k=3) -> (num=7,k=5) -> (num=5,k=3)
            # (`medmamba_kan/MedSSD_kan.py:1125-1165`)
            h = OKANLayer(x.shape[-1], num=5, k=3, name="kan1")(x)
            h = OKANLayer(x.shape[-1], num=7, k=5, name="kan2")(h)
            return OKANLayer(self.num_classes, num=5, k=3, name="kan3")(h)
        if kind == "kan_module":
            return KansModule(self.num_classes, name="kans")(x, train=train)
        if kind == "3kan":
            return ThreeKansModule(self.num_classes, name="kans")(x, train=train)
        raise ValueError(f"unknown head kind: {kind}")
