"""Shared building blocks for the VSSM model family (Flax linen, NHWC).

TPU-native rebuilds of the reference's per-file duplicated layers
(`/root/reference/MedMamba.py:146-250,486-538`, `CNN_Mamba.py:43-94`,
`MIFA_block.py:17-63`).  Everything is channel-last end-to-end so XLA never
inserts layout transposes around the scans (SURVEY §7 hard-parts note).

Init parity with the reference's final `_init_weights` pass
(`MedMamba.py:721-741`): Dense kernels trunc-normal(0.02) with zero bias,
conv kernels kaiming-normal(fan_out, relu), LayerNorm (1, 0).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# --- reference-parity initializers -----------------------------------------
trunc_normal_02 = nn.initializers.truncated_normal(stddev=0.02)
kaiming_conv = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# torch nn.Linear default (kaiming_uniform a=sqrt(5)) = U(-1/sqrt(fan_in), ...)
torch_linear_default = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def channel_shuffle(x, groups: int):
    """ShuffleNet-style channel interleave in NHWC (`MedMamba.py:486-499`).

    Formulated as a stack of group slices along a NEW trailing axis instead
    of reshape+swapaxes(3,4): the swapaxes form lowers to a serialized
    lane-permutation copy (~0.93 ms fwd+bwd per stage-0 block on v5e),
    while stack(-1)+reshape lowers to fused strided writes (~0.16 ms,
    bit-exact — measured 5.8x).
    """
    b, h, w, c = x.shape
    step = c // groups
    parts = [x[..., i * step:(i + 1) * step] for i in range(groups)]
    return jnp.stack(parts, axis=-1).reshape(b, h, w, c)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath used throughout the ref).

    ``rate_override`` (call-time, may be a traced scalar) replaces the
    static attribute — needed by depth-scanned block stacks where the
    linspace schedule varies along the scanned axis
    (`crossmamba._BlockStack`)."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rate_override=None):
        if deterministic or (rate_override is None and self.rate == 0.0):
            return x
        rate = self.rate if rate_override is None else rate_override
        keep = 1.0 - rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class PatchEmbed(nn.Module):
    """Conv patchify + optional LayerNorm (`MedMamba.py:146-169`). NHWC in/out."""
    patch_size: int = 4
    embed_dim: int = 96
    use_norm: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, kernel_size=(p, p), strides=(p, p),
                    padding="VALID", kernel_init=kaiming_conv,
                    dtype=self.dtype, name="proj")(x)
        if self.use_norm:
            # LN statistics stay fp32 (default promotion) but the OUTPUT is
            # cast back to the compute dtype: without this the whole stage-0
            # residual stream (adds, concats, channel shuffles) runs in fp32
            # — measured as fp32 copy traffic in the step trace.
            x = nn.LayerNorm(name="norm")(x)
            if self.dtype is not None:
                x = x.astype(self.dtype)
        return x


class PatchMerging(nn.Module):
    """2x2 space-to-depth -> LN -> Dense 4C->2C (`MedMamba.py:172-212`).

    Odd spatial sizes are cropped to even (the reference prints a warning and
    crops; we crop silently — shapes are static under jit anyway)."""
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = x[:, : (h // 2) * 2, : (w // 2) * 2, :]
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(name="norm")(x)
        x = nn.Dense(2 * c, use_bias=False, kernel_init=trunc_normal_02,
                     dtype=self.dtype, name="reduction")(x)
        return x


class PatchExpand(nn.Module):
    """x2 upsample: Dense expand + pixel shuffle (`MedMamba.py:215-235`).

    Matches the reference convention: constructed with the *previous* stage
    dim `dim`, operates on inputs of 2*dim channels, emits dim channels."""
    dim_scale: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        s = self.dim_scale
        x = nn.Dense(s * c, use_bias=False, kernel_init=trunc_normal_02,
                     dtype=self.dtype, name="expand")(x)
        cout = c // s
        x = x.reshape(b, h, w, s, s, cout)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h * s, w * s, cout)
        x = nn.LayerNorm(name="norm")(x)
        return x


class FinalPatchExpand(nn.Module):
    """x4 upsample for the fusion decoder head (`MedMamba.py:238-250`)."""
    dim_scale: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        s = self.dim_scale
        x = nn.Dense(s * c, use_bias=False, kernel_init=trunc_normal_02,
                     dtype=self.dtype, name="expand")(x)
        cout = c // s
        x = x.reshape(b, h, w, s, s, cout)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h * s, w * s, cout)
        x = nn.LayerNorm(name="norm")(x)
        return x


class ConvBranch(nn.Module):
    """The SS_Conv block's left/conv half: BN-3x3-BN-ReLU-3x3-BN-ReLU-1x1-ReLU
    (`MedMamba.py:517-528`).  NHWC; BatchNorm uses the 'batch_stats'
    collection (reference DDP runs unsynced BN; under GSPMD jit the batch
    stats are computed over the *global* batch, which is strictly better)."""
    dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        norm = lambda nm: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=nm)
        conv = lambda k, nm: nn.Conv(d, kernel_size=(k, k), padding="SAME",
                                     kernel_init=kaiming_conv,
                                     dtype=self.dtype, name=nm)
        x = norm("bn0")(x)
        x = conv(3, "conv1")(x)
        x = nn.relu(norm("bn1")(x))
        x = conv(3, "conv2")(x)
        x = nn.relu(norm("bn2")(x))
        x = conv(1, "conv3")(x)
        return nn.relu(x)


class ConvTConvPW(nn.Module):
    """CNN-Mamba pre-stem on raw RGB: 3x3 conv, 5x5 conv, residual, 1x1
    pointwise (`CNN_Mamba.py:43-94`).  The reference's two `torch.flip`
    calls discard their results (dead code, SURVEY B8) — not reproduced.
    Note the reference reuses ONE BatchNorm module at both call sites; we
    mirror that (shared scale/bias/stats)."""
    channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, name="bn")
        identity = x
        x = bn(x)
        x = nn.Conv(c, (3, 3), padding="SAME", kernel_init=kaiming_conv,
                    name="conv1")(x)
        x = nn.relu(bn(x))
        x = nn.Conv(c, (5, 5), padding="SAME", kernel_init=kaiming_conv,
                    name="conv2")(x)
        x = x + identity
        x = nn.Conv(c, (1, 1), kernel_init=kaiming_conv, name="pw")(x)
        return x


class ECALayer(nn.Module):
    """Efficient channel attention (`cross.py:1233-1259`): GAP -> 1-D conv
    over the channel axis -> sigmoid gate."""
    k_size: int = 3

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = jnp.mean(x, axis=(1, 2))                       # [b, c]
        y = nn.Conv(1, kernel_size=(self.k_size,), padding="SAME",
                    use_bias=False, name="conv")(y[..., None])
        y = jax.nn.sigmoid(y[..., 0])
        # gate in the activation dtype (the tiny conv runs fp32; without the
        # cast a bf16 stream would silently promote to fp32 downstream)
        return x * y.astype(x.dtype)[:, None, None, :]


class MIFABlock(nn.Module):
    """Local/global feature-interaction gate (`MIFA_block.py:17-63`).

    The reference version is dead code and unrunnable (`from torch.nn import
    nn`); rebuilt working per SURVEY B9: depthwise-conv local map and GELU
    global map cross-gated by sigmoids, concat, channel shuffle, ECA."""
    dim: int

    @nn.compact
    def __call__(self, x):
        d = self.dim
        local = nn.Conv(d, (3, 3), padding="SAME", feature_group_count=d,
                        kernel_init=kaiming_conv, name="dw")(x)
        local = nn.relu(local)
        glob = nn.gelu(nn.Conv(d, (1, 1), kernel_init=kaiming_conv,
                               name="pw")(x))
        a = local * jax.nn.sigmoid(glob)
        b = glob * jax.nn.sigmoid(local)
        out = jnp.concatenate([a, b], axis=-1)
        out = channel_shuffle(out, 2)
        out = nn.Conv(d, (1, 1), kernel_init=kaiming_conv, name="merge")(out)
        return ECALayer(name="eca")(out) + x
