"""The unified VSSM classifier skeleton.

The reference duplicates PatchEmbed → 4 stages of SS-Conv blocks →
PatchMerging → pool → head ~10× across model files (SURVEY overview); here
it is ONE parameterised skeleton.  Every reference classifier is a config:

  MedMamba      (`MedMamba.py:671-767`)       core='mamba1', dims 96..768
  MedSSD        (`SSD/MedSSD.py:546-`)        core='ssd',    dims 128..1024
  CNN_Mamba     (`CNN_Mamba.py:752-852`)      + ConvTConvPW stem
  ST_SSD        (`st_mamba/ST_SSD.py:852-`)   + st_tokens (56,28,14,7)
  kanin/kanout  (`kanSSD/kanin{out}SSD.py`)   + kan_in / kan_filter
  MedSSD_*kan   (`medmamba_kan/`, `MedSSD_kan/`)  + head kind

Activation checkpointing maps the reference's per-block
``torch.utils.checkpoint`` (`MedMamba.py:596-597`) to ``nn.remat``.
Stage outputs are sowed into the 'intermediates' collection for Grad-CAM
(replacing the reference's forward hooks, `cam.py:13-31`).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medical_image_classification_tpu.models.common import (
    ConvBranch,
    ConvTConvPW,
    DropPath,
    MIFABlock,
    PatchEmbed,
    PatchMerging,
    trunc_normal_02,
)
from medical_image_classification_tpu.models.ss2d_modules import SS2D, SS2DSSD
from medical_image_classification_tpu.models.kan_modules import ClassifierHead


class SSConvBlock(nn.Module):
    """The MedMamba hybrid block (`MedMamba.py:502-538`, `CNN_Mamba.py:583-619`):
    channel-split; right half → LN → SS2D (+DropPath); left half → conv
    branch; concat; channel_shuffle(2); +residual."""
    hidden_dim: int
    drop_path: float = 0.0
    d_state: int = 16
    core: str = "mamba1"               # 'mamba1' | 'ssd'
    ssd_chunk_size: int = 256
    ssd_headdim: int = 64
    st_tokens: Optional[int] = None
    kan_in: bool = False
    kan_filter: bool = False
    kan_spline_order: int = 1
    attn_drop: float = 0.0
    scan_impl: str = "auto"
    seq_axis: object = None
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False, drop_path_override=None):
        half = self.hidden_dim // 2
        left, right = jnp.split(x, 2, axis=-1)
        # NB fp32 LN output is free here: r4 measured dtype=self.dtype on
        # this LN and SS2D's out_norm at 69.49 vs 69.39 ms/step (noise) —
        # XLA already fuses the fp32 round-trips into the neighbours
        r = nn.LayerNorm(epsilon=1e-6, name="ln_1")(right)
        if self.core == "mamba1":
            r = SS2D(d_model=half, d_state=self.d_state, dropout=self.attn_drop,
                     scan_impl=self.scan_impl, seq_axis=self.seq_axis,
                     dtype=self.dtype,
                     name="self_attention")(r, train=train)
        elif self.core == "ssd":
            r = SS2DSSD(d_model=half, d_state=self.d_state,
                        headdim=self.ssd_headdim,
                        dropout=self.attn_drop, chunk_size=self.ssd_chunk_size,
                        st_tokens=self.st_tokens, kan_in=self.kan_in,
                        kan_filter=self.kan_filter,
                        kan_spline_order=self.kan_spline_order,
                        seq_axis=self.seq_axis, dtype=self.dtype,
                        name="self_attention")(r, train=train)
        else:
            raise ValueError(f"unknown core: {self.core}")
        r = DropPath(self.drop_path, name="drop_path")(
            r, deterministic=not train, rate_override=drop_path_override)
        l = ConvBranch(half, dtype=self.dtype, name="conv_branch")(left, train=train)
        # channel_shuffle(concat([l, r]), 2) == interleave(l, r).  The
        # reshape+swapaxes form lowers to a serialized lane-permutation copy
        # (~0.9 ms fwd+bwd per stage-0 block on v5e).  For 2-byte dtypes the
        # interleave rides the MXU as two 0/1 permutation matmuls that fuse
        # with the residual add (exact: one nonzero product per output lane;
        # measured ~11x over the swapaxes form).  fp32 streams would round
        # operands to bf16 on the MXU at default precision, so they take the
        # stack(-1)+reshape form instead (bit-exact, ~6x).  Caveat: a single
        # Inf/NaN input lane smears to NaN across all 2*half_c output
        # channels at that pixel (0*Inf=NaN in the zero-weight products) —
        # fine for NaN-skip/loss-scale logic (NaN still propagates), but if
        # fp16 runs with loss scaling ever need per-channel NaN forensics,
        # gate this path to bf16 only.
        b, h, w, half_c = l.shape
        if l.dtype in (jnp.bfloat16, jnp.float16):
            # iota+compare, NOT a numpy array: a concrete numpy matrix is
            # serialized into the HLO as a dense constant — ~1 MB per
            # block at dims=512, and the fusion U-Net's accumulated
            # constants pushed its graph past the axon relay's
            # remote-compile body limit (HTTP 413, BENCH_r04/r05).  XLA
            # folds the iota form to the same on-device constant.
            ii = jax.lax.broadcasted_iota(jnp.int32, (half_c, 2 * half_c), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (half_c, 2 * half_c), 1)
            pe = (jj == 2 * ii).astype(l.dtype)
            po = (jj == 2 * ii + 1).astype(r.dtype)
            dot = partial(jax.lax.dot_general,
                          dimension_numbers=(((3,), (0,)), ((), ())),
                          preferred_element_type=l.dtype)
            out = dot(l, pe) + dot(r, po)
        else:
            out = jnp.stack([l, r], axis=-1).reshape(b, h, w, 2 * half_c)
        return out + x


class VSSLayer(nn.Module):
    """One stage: depth× SSConvBlock, then optional PatchMerging downsample
    (`MedMamba.py:541-614`)."""
    dim: int
    depth: int
    d_state: int = 16
    drop_paths: Sequence[float] = ()
    core: str = "mamba1"
    ssd_chunk_size: int = 256
    ssd_headdim: int = 64
    st_tokens: Optional[int] = None
    kan_in: bool = False
    kan_filter: bool = False
    kan_spline_order: int = 1
    downsample: bool = True
    use_checkpoint: bool = False
    scan_impl: str = "auto"
    seq_axis: object = None
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        Block = SSConvBlock
        if self.use_checkpoint:
            Block = nn.remat(SSConvBlock, static_argnums=(2,))
        for i in range(self.depth):
            dp = self.drop_paths[i] if i < len(self.drop_paths) else 0.0
            x = Block(hidden_dim=self.dim, drop_path=dp, d_state=self.d_state,
                      core=self.core, ssd_chunk_size=self.ssd_chunk_size,
                      ssd_headdim=self.ssd_headdim,
                      st_tokens=self.st_tokens, kan_in=self.kan_in,
                      kan_filter=self.kan_filter,
                      kan_spline_order=self.kan_spline_order,
                      scan_impl=self.scan_impl, seq_axis=self.seq_axis,
                      dtype=self.dtype,
                      name=f"blocks_{i}")(x, train)
        self.sow("intermediates", "stage_out", x)
        # zero-valued perturbation hook: grad w.r.t. it == grad w.r.t. the
        # stage activation (Grad-CAM; replaces the reference's backward
        # hooks, cam.py:24-31).  No-op unless a 'perturbations' collection
        # is passed to apply().
        x = self.perturb("stage_perturb", x)
        if self.downsample:
            x = PatchMerging(dtype=self.dtype, name="downsample")(x)
        return x


class VSSM(nn.Module):
    """Unified VSSM image classifier.  NHWC input [B, H, W, 3] -> logits."""
    num_classes: int
    patch_size: int = 4
    depths: Sequence[int] = (2, 2, 4, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    core: str = "mamba1"
    ssd_chunk_size: int = 256
    ssd_headdim: int = 64
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    use_checkpoint: bool = False
    conv_stem: bool = False                       # CNN_Mamba's ConvTConvPW
    use_mifa: bool = False                        # MIFA block after embed
    st_tokens: Optional[Sequence[int]] = None     # per-stage p (ST-SSD)
    kan_in: bool = False
    kan_filter: bool = False
    kan_spline_order: int = 1
    head: str = "linear"
    scan_impl: str = "auto"
    seq_axis: object = None       # mesh axis for L-sharded SS2D scans (SP)
    dtype: object = None          # compute dtype (bf16 on TPU); params fp32

    @nn.compact
    def __call__(self, x, train: bool = False, update_grid: bool = False):
        nl = len(self.depths)
        if self.conv_stem:
            x = ConvTConvPW(channels=x.shape[-1], name="conv_t_conv")(x, train=train)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = PatchEmbed(patch_size=self.patch_size, embed_dim=self.dims[0],
                       use_norm=self.patch_norm, dtype=self.dtype,
                       name="patch_embed")(x)
        if self.use_mifa:
            x = MIFABlock(self.dims[0], name="mifa")(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=not train,
                           name="pos_drop")(x)
        dpr = np.linspace(0.0, self.drop_path_rate, sum(self.depths)).tolist()
        for i in range(nl):
            sl = slice(sum(self.depths[:i]), sum(self.depths[:i + 1]))
            x = VSSLayer(
                dim=self.dims[i], depth=self.depths[i], d_state=self.d_state,
                drop_paths=tuple(dpr[sl]), core=self.core,
                ssd_chunk_size=self.ssd_chunk_size,
                ssd_headdim=self.ssd_headdim,
                st_tokens=(self.st_tokens[i] if self.st_tokens else None),
                kan_in=self.kan_in, kan_filter=self.kan_filter,
                kan_spline_order=self.kan_spline_order,
                downsample=(i < nl - 1), use_checkpoint=self.use_checkpoint,
                scan_impl=self.scan_impl, seq_axis=self.seq_axis,
                dtype=self.dtype,
                name=f"layers_{i}")(x, train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))   # global avg pool
        return ClassifierHead(self.num_classes, kind=self.head,
                              ekan_spline_order=self.kan_spline_order,
                              name="classifier")(x, train=train,
                                                 update_grid=update_grid)
