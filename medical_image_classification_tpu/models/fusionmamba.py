"""FusionMamba (vendored VM-UNet-style) fusion family, TPU-native.

Rebuilds of `/root/reference/CrossMamba/FusionMamba/models/cross.py` and
`vmamba_Fusion_efficross.py`:

* ``LDCConv``             — learnable-difference conv (`cross.py:790-840`;
  the reference ships two identical copies, LDC and Enhancement_texture_LDC)
* ``DifferentialEnhance`` / ``CrossLayer`` — texture/difference interaction
  (`cross.py:843-888`)
* ``BiAttn``              — global channel gate (`cross.py:744-768`)
* ``SS2DEfficient``       — single-input SS2D whose 4 "directions" are the
  EfficientScan strided spatial subsequences (`cross.py:193-265`, S5)
* ``SS2DCrossEfficient``  — two-input variant fusing x = x1*x2 + x1 + x2
  before the scan, dual gating (`cross.py:340-414,890-1230`, S6)
* ``VSSBlockNew`` / ``VSSBlockCrossNew`` — plain VMamba blocks around them
* ``VSSMFusion``          — weight-shared dual encoder + cross-fused skips +
  VSS decoder + final expand + input residual
  (`vmamba_Fusion_efficross.py:753-929`)

The strided scans reuse the Mamba-1 selective-scan kernels (Pallas on TPU)
in the folded [B*4, L/4, D] layout.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medical_image_classification_tpu.models.common import (
    DropPath,
    ECALayer,
    FinalPatchExpand,
    PatchEmbed,
    PatchExpand,
    PatchMerging,
    kaiming_conv,
    trunc_normal_02,
)
from medical_image_classification_tpu.models.ss2d_modules import (
    a_log_init_s4d,
    dt_bias_init,
    torch_linear_rowmajor,
    uniform_pm,
)
from medical_image_classification_tpu.ops.cross_scan import (
    efficient_merge,
    efficient_scan,
)
from medical_image_classification_tpu.kernels.selective_scan import (
    selective_scan,
)
from medical_image_classification_tpu.kernels.selective_scan_pallas import (
    pallas_folded_supported,
    selective_scan_pallas_folded,
)


def _efficient_scan_core(x, x_proj_w, dt_proj_w, dt_proj_b, A_log, Ds, *,
                         d_state: int, dt_rank: int, step: int = 2,
                         impl: str = "auto"):
    """EfficientScan -> per-K projection -> selective scan -> EfficientMerge.

    x: [B, H, W, D] -> [B, H, W, D] (un-normalised).  The 4 sequences are
    the strided spatial subsamples; all scan in raster order."""
    Bb, H, W, D = x.shape
    xs = efficient_scan(x, step)                          # [B, 4, L4, D]
    K = xs.shape[1]
    L4 = xs.shape[2]

    # (the r1 fused-projection kernel variant was removed in r4 after
    # re-measurement — see ops/ss2d.py note)
    # weights cast to the compute dtype: a bf16 x fp32 einsum promotes to an
    # fp32 MXU matmul (4-8x slower); the MXU accumulates fp32 regardless
    x_dbl = jnp.einsum("bkld,kcd->bklc", xs, x_proj_w.astype(xs.dtype))
    dts = jnp.einsum("bklr,kdr->bkld", x_dbl[..., :dt_rank],
                     dt_proj_w.astype(xs.dtype))
    Bmat = x_dbl[..., dt_rank:dt_rank + d_state]
    Cmat = x_dbl[..., dt_rank + d_state:]

    if impl in ("auto", "pallas") and pallas_folded_supported(L4, D, d_state):
        A_neg = -jnp.exp(A_log.astype(jnp.float32))
        y4 = selective_scan_pallas_folded(
            xs.reshape(Bb * K, L4, D), dts.reshape(Bb * K, L4, D), A_neg,
            Bmat.reshape(Bb * K, L4, d_state), Cmat.reshape(Bb * K, L4, d_state),
            Ds.astype(jnp.float32), dt_proj_b.astype(jnp.float32))
        ys = y4.reshape(Bb, K, L4, D)
    else:
        u = jnp.swapaxes(xs, 1, 2).reshape(Bb, L4, K * D)
        delta = jnp.swapaxes(dts, 1, 2).reshape(Bb, L4, K * D)
        A = -jnp.exp(A_log.astype(jnp.float32)).reshape(K * D, d_state)
        y = selective_scan(u, delta, A, jnp.swapaxes(Bmat, 1, 2),
                           jnp.swapaxes(Cmat, 1, 2),
                           D=Ds.astype(jnp.float32).reshape(K * D),
                           delta_bias=dt_proj_b.astype(jnp.float32).reshape(K * D),
                           delta_softplus=True, impl=impl)
        ys = jnp.swapaxes(y.reshape(Bb, L4, K, D), 1, 2)
    return efficient_merge(ys, H, W, step)                # [B, H, W, D]


class _ScanParams(nn.Module):
    """Shared parameter bundle for the efficient-scan cores."""
    d_inner: int
    d_state: int
    dt_rank: int

    @nn.compact
    def __call__(self):
        K = 4
        x_proj_w = self.param("x_proj_weight", torch_linear_rowmajor,
                              (K, self.dt_rank + 2 * self.d_state, self.d_inner))
        dt_w = self.param("dt_projs_weight", uniform_pm(self.dt_rank ** -0.5),
                          (K, self.d_inner, self.dt_rank))
        dt_b = self.param("dt_projs_bias", dt_bias_init(), (K, self.d_inner))
        A_log = self.param("A_logs", a_log_init_s4d(),
                           (K, self.d_inner, self.d_state))
        Ds = self.param("Ds", nn.initializers.ones, (K, self.d_inner))
        return x_proj_w, dt_w, dt_b, A_log, Ds


class SS2DEfficient(nn.Module):
    """Single-input SS2D over strided subsequences (`cross.py` SS2D_new v2)."""
    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    d_conv: int = 3
    dropout: float = 0.0
    bias: bool = False
    step_size: int = 2
    scan_impl: str = "auto"
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d_expand = int(self.ssm_ratio * self.d_model)
        R = math.ceil(self.d_model / 16)
        xz = nn.Dense(2 * d_expand, use_bias=self.bias, dtype=self.dtype,
                      kernel_init=trunc_normal_02, name="in_proj")(x)
        xp, z = jnp.split(xz, 2, axis=-1)
        xp = nn.Conv(d_expand, (self.d_conv, self.d_conv), padding="SAME",
                     feature_group_count=d_expand, kernel_init=kaiming_conv,
                     dtype=self.dtype, name="conv2d")(xp)
        xp = jax.nn.silu(xp)
        pw, dw, db, Alog, Ds = _ScanParams(d_expand, self.d_state, R,
                                           name="scan")()
        y = _efficient_scan_core(xp, pw, dw, db, Alog, Ds,
                                 d_state=self.d_state, dt_rank=R,
                                 step=self.step_size, impl=self.scan_impl)
        y = nn.LayerNorm(name="out_norm")(y.astype(x.dtype))
        y = y * jax.nn.silu(z)
        out = nn.Dense(self.d_model, use_bias=self.bias, dtype=self.dtype,
                       kernel_init=trunc_normal_02, name="out_proj")(y)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class SS2DCrossEfficient(nn.Module):
    """Two-input SS2D: fuse x = x1*x2 + x1 + x2, scan once, gate with both
    branches (`cross.py:890-1230`).  NB the reference computes
    ``z2 = act(z1)`` (`cross.py:1208`) — a copy-paste slip baked into any
    trained checkpoint, so it is the DEFAULT here; set fix_z2=True for the
    intended act(z2)."""
    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    d_conv: int = 3
    dropout: float = 0.0
    bias: bool = False
    step_size: int = 2
    fix_z2: bool = False
    scan_impl: str = "auto"
    dtype: object = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        d_expand = int(self.ssm_ratio * self.d_model)
        R = math.ceil(self.d_model / 16)
        conv = nn.Conv(d_expand, (self.d_conv, self.d_conv), padding="SAME",
                       feature_group_count=d_expand, kernel_init=kaiming_conv,
                       dtype=self.dtype, name="conv2d")  # shared between branches
        xz1 = nn.Dense(2 * d_expand, use_bias=self.bias, dtype=self.dtype,
                       kernel_init=trunc_normal_02, name="in_proj1")(x1)
        xz2 = nn.Dense(2 * d_expand, use_bias=self.bias, dtype=self.dtype,
                       kernel_init=trunc_normal_02, name="in_proj2")(x2)
        xa, z1 = jnp.split(xz1, 2, axis=-1)
        xb, z2 = jnp.split(xz2, 2, axis=-1)
        z2 = jax.nn.silu(z2 if self.fix_z2 else z1)   # ref slip: act(z1) twice
        z1 = jax.nn.silu(z1)
        xa = jax.nn.silu(conv(xa))
        xb = jax.nn.silu(conv(xb))
        x = xa * xb + xa + xb                    # content fuse (`cross.py:372`)
        pw, dw, db, Alog, Ds = _ScanParams(d_expand, self.d_state, R,
                                           name="scan")()
        y = _efficient_scan_core(x, pw, dw, db, Alog, Ds,
                                 d_state=self.d_state, dt_rank=R,
                                 step=self.step_size, impl=self.scan_impl)
        y = nn.LayerNorm(name="out_norm")(y.astype(x1.dtype))
        y = y * z1 + y * z2
        out = nn.Dense(self.d_model, use_bias=self.bias, dtype=self.dtype,
                       kernel_init=trunc_normal_02, name="out_proj")(y)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class LDCConv(nn.Module):
    """Learnable-difference conv (`cross.py:790-840`): subtract a learnable
    center-weighted kernel sum from the conv weight."""
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        w = self.param("kernel", kaiming_conv, (k, k, cin, self.features))
        lm = self.param("learnable_mask", nn.initializers.ones,
                        (cin, self.features))
        theta = self.param("learnable_theta",
                           lambda rng, s: jnp.full(s, 0.5), (1,))
        center = jnp.zeros((k, k)).at[k // 2, k // 2].set(1.0)
        ksum = jnp.sum(w, axis=(0, 1))                     # [cin, cout]
        mask = 1.0 - theta * center[:, :, None, None] * lm * ksum
        return jax.lax.conv_general_dilated(
            x, (w * mask).astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class DifferentialEnhance(nn.Module):
    """Difference-gated fuse injection (`cross.py:843-864`)."""

    @nn.compact
    def __call__(self, fuse, x1, x2):
        w12 = jax.nn.sigmoid(jnp.mean(x1 - x2, axis=(1, 2), keepdims=True))
        w21 = jax.nn.sigmoid(jnp.mean(x2 - x1, axis=(1, 2), keepdims=True))
        return x1 + w12 * fuse, x2 + w21 * fuse


class CrossLayer(nn.Module):
    """Texture + differential enhancement (`cross.py:866-888`)."""
    dim: int

    @nn.compact
    def __call__(self, fuse, x1, x2):
        t1 = LDCConv(self.dim, name="texture_enhance1")(x1)
        t2 = LDCConv(self.dim, name="texture_enhance2")(x2)
        d1, d2 = DifferentialEnhance(name="diff_enhance")(fuse, x1, x2)
        return t1 + d1, t2 + d2


class BiAttn(nn.Module):
    """Global channel attention gate (`cross.py:744-768`)."""
    act_ratio: float = 0.125

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        red = max(1, int(c * self.act_ratio))
        h = nn.LayerNorm(name="norm")(x)
        g = jnp.mean(h, axis=(1, 2), keepdims=True)
        g = nn.gelu(nn.Dense(red, name="global_reduce")(g),
                    approximate=False)   # torch nn.GELU is erf-exact
        attn = jax.nn.sigmoid(nn.Dense(c, name="channel_select")(g))
        return x * attn.astype(x.dtype)


class VSSBlockNew(nn.Module):
    """FusionMamba encoder/decoder block (`cross.py:1297-1380` VSSBlock_new):

        h = LN(x); y_ssm = SS2D_v2(h); y = y_ssm + eca(y_ssm)
        y_conv = LDC(y); out = x + droppath(se(y_ssm) + se(y_conv))
        out = out + droppath(mlp(LN2(out)))          # 4x GELU MLP

    (se = ONE BiAttn applied to both branches — shared weights in the
    reference too.)  NB the reference passes ``d_state`` into the block
    but VSSBlock_new's kwarg is ``ssm_d_state``, so it lands in **kwargs
    and the blocks always run their d_state=16 default — mirrored here by
    keeping our d_state field default 16."""
    dim: int
    d_state: int = 16
    drop_path: float = 0.0
    mlp_ratio: float = 4.0
    scan_impl: str = "auto"
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(x).astype(x.dtype)
        y_ssm = SS2DEfficient(self.dim, d_state=self.d_state,
                              scan_impl=self.scan_impl, dtype=self.dtype,
                              name="op")(
            h, train=train)
        y = y_ssm + ECALayer(name="channel_attn")(y_ssm)
        y_conv = LDCConv(self.dim, name="conv_branch")(y)
        se = BiAttn(name="se")
        dp = DropPath(self.drop_path, name="drop_path")
        out = x + dp(se(y_ssm) + se(y_conv), deterministic=not train)
        if self.mlp_ratio > 0:
            h2 = nn.LayerNorm(epsilon=1e-6, name="norm2")(out).astype(out.dtype)
            h2 = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                          kernel_init=trunc_normal_02, name="mlp_fc1")(h2)
            h2 = nn.gelu(h2, approximate=False)  # torch GELU = erf
            h2 = nn.Dense(self.dim, kernel_init=trunc_normal_02,
                          dtype=self.dtype, name="mlp_fc2")(h2)
            out = out + dp(h2, deterministic=not train)
        return out


class VSSBlockCrossNew(nn.Module):
    """Cross-fusion block (`cross.py:1262-1295`): CrossLayer enhancement,
    cross SS2D, ECA spatial gate, 4-way residual sum."""
    dim: int
    d_state: int = 16
    drop_path: float = 0.0
    scan_impl: str = "auto"
    dtype: object = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        fuse = x1 + x2
        f1, f2 = CrossLayer(self.dim, name="cross_layer")(fuse, x1, x2)
        f1 = nn.LayerNorm(epsilon=1e-6, name="ln_1")(f1).astype(x1.dtype)
        f2 = nn.LayerNorm(epsilon=1e-6, name="ln_2")(f2).astype(x2.dtype)
        y = SS2DCrossEfficient(self.dim, d_state=self.d_state,
                               scan_impl=self.scan_impl, dtype=self.dtype,
                               name="self_attention_cross")(f1, f2, train=train)
        y_sp = ECALayer(name="eca")(y)
        return x1 + x2 + y + y_sp


class VSSMFusion(nn.Module):
    """FusionMamba U-Net (`vmamba_Fusion_efficross.py:753-929`).

    Weight-shared encoder applied to both inputs; per-stage cross-fusion of
    the skip features; VSS decoder with additive skips; final 4x expand +
    1x1 conv + input residual.  In/out NHWC: two [B,H,W,1] -> [B,H,W,1].
    """
    patch_size: int = 4
    depths: Sequence[int] = (2, 2, 9, 2)
    depths_decoder: Sequence[int] = (2, 9, 2, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    dims_decoder: Sequence[int] = (768, 384, 192, 96)
    d_state: int = 16
    drop_path_rate: float = 0.1
    scan_impl: str = "auto"
    dtype: object = None          # compute dtype (bf16 on TPU); params fp32;
                                  # the fused image is emitted in fp32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        nl = len(self.depths)
        in1, in2 = x1, x2
        if self.dtype is not None:
            x1 = x1.astype(self.dtype)
            x2 = x2.astype(self.dtype)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()

        # weight-shared encoder: define once, apply to both inputs
        embed1 = PatchEmbed(self.patch_size, self.dims[0], dtype=self.dtype,
                            name="patch_embed1")
        embed2 = PatchEmbed(self.patch_size, self.dims[0], dtype=self.dtype,
                            name="patch_embed2")

        stages = []
        p = 0
        for i in range(nl):
            blocks = [VSSBlockNew(self.dims[i], d_state=self.d_state,
                                  drop_path=dpr[p + j],
                                  scan_impl=self.scan_impl, dtype=self.dtype,
                                  name=f"layers_{i}_blocks_{j}")
                      for j in range(self.depths[i])]
            down = (PatchMerging(dtype=self.dtype,
                                 name=f"layers_{i}_downsample")
                    if i < nl - 1 else None)
            stages.append((blocks, down))
            p += self.depths[i]

        def encode(h):
            skips = []
            for blocks, down in stages:
                skips.append(h)
                for blk in blocks:
                    h = blk(h, train=train)
                if down is not None:
                    h = down(h)
            return h, skips

        h1, skips1 = encode(embed1(x1))
        h2, skips2 = encode(embed2(x2))
        h = h1 + h2

        fused_skips = []
        for i in range(nl):
            fused_skips.append(VSSBlockCrossNew(
                self.dims[i], d_state=self.d_state, scan_impl=self.scan_impl,
                dtype=self.dtype,
                name=f"cross_block_{i}")(skips1[i], skips2[i], train=train))

        dpr_d = np.linspace(0, self.drop_path_rate,
                            sum(self.depths_decoder)).tolist()[::-1]
        p = 0
        for i in range(nl):
            if i > 0:
                h = h + fused_skips[-i]
                h = PatchExpand(dtype=self.dtype,
                                name=f"layers_up_{i}_upsample")(h)
            for j in range(self.depths_decoder[i]):
                h = VSSBlockNew(self.dims_decoder[i], d_state=self.d_state,
                                drop_path=dpr_d[p + j],
                                scan_impl=self.scan_impl, dtype=self.dtype,
                                name=f"layers_up_{i}_blocks_{j}")(h, train=train)
            p += self.depths_decoder[i]

        h = FinalPatchExpand(dtype=self.dtype, name="final_up")(h)
        out = nn.Conv(1, (1, 1), kernel_init=kaiming_conv,
                      name="final_conv")(h).astype(jnp.float32)
        # the reference adds the raw inputs twice (`:926`) — i.e. a
        # 2*(x1+x2) residual; replicated for behavioural parity.
        return out + 2.0 * (in1 + in2)


class CDCConvHV(nn.Module):
    """Central-difference conv, horizontal/vertical cross
    (`vmamba_Fusion_efficross.py:492-523` Conv2d_Hori_Veri_Cross): 5 learned
    taps placed on a 3x3 cross, minus theta x (kernel-sum pointwise conv)."""
    features: int
    theta: float = 0.7

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("taps", kaiming_conv, (1, 5, cin, self.features))
        z = jnp.zeros((1, 1, cin, self.features))
        t = [w[:, i:i + 1] for i in range(5)]
        # cross layout: [0 t0 0 / t1 t2 t3 / 0 t4 0]
        row0 = jnp.concatenate([z, t[0], z], axis=1)
        row1 = jnp.concatenate([t[1], t[2], t[3]], axis=1)
        row2 = jnp.concatenate([z, t[4], z], axis=1)
        k = jnp.concatenate([row0, row1, row2],
                            axis=0).astype(x.dtype)       # [3,3,cin,cout]
        out = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        kd = jnp.sum(k, axis=(0, 1), keepdims=True)
        out_diff = jax.lax.conv_general_dilated(
            x, kd, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out - self.theta * out_diff


class CDCConvDiag(nn.Module):
    """Central-difference conv, diagonal cross
    (`vmamba_Fusion_efficross.py:526-557` Conv2d_Diag_Cross): taps on the
    3x3 diagonals + center."""
    features: int
    theta: float = 0.7

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("taps", kaiming_conv, (1, 5, cin, self.features))
        z = jnp.zeros((1, 1, cin, self.features))
        t = [w[:, i:i + 1] for i in range(5)]
        # diag layout: [t0 0 t1 / 0 t2 0 / t3 0 t4]
        row0 = jnp.concatenate([t[0], z, t[1]], axis=1)
        row1 = jnp.concatenate([z, t[2], z], axis=1)
        row2 = jnp.concatenate([t[3], z, t[4]], axis=1)
        k = jnp.concatenate([row0, row1, row2], axis=0).astype(x.dtype)
        out = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        kd = jnp.sum(k, axis=(0, 1), keepdims=True)
        out_diff = jax.lax.conv_general_dilated(
            x, kd, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out - self.theta * out_diff
