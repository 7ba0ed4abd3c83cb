"""CrossMamba dual-branch fusion family.

TPU-native rebuilds of:

* ``CrossMamba``           — content-aware cross-parameterised dual-input SSD
  core (`/root/reference/CrossMamba/CrossMamba_fusion_2b2.py:54-385`): each
  branch scans its *own* x-sequence but draws (B, C, dt) from the other /
  fused branch.  All projections are shared between branches.
* ``DownLayer``/``UpLayer``— fusion U-Net stages (`:836-1075`)
* ``FusionVFEFM``          — dual-branch U-Net emitting a 1-channel fused
  image (`:1078-1285`); ``single_decoder=True`` gives the `_2c1` variant
  (branches merged before one decoder, `CrossMamba_fusion_2c1.py:986-1026`).
* ``CrossVSSMClassifier``  — dual-branch classifier with CrossMamba fusion
  after stage 3 (`CrossMamba_3e1f1eadd.py:755-987`) or at every stage
  (`CrossMamba_4ef.py:756-867`), selected by ``fuse_mode``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medical_image_classification_tpu.models.common import (
    DropPath,
    FinalPatchExpand,
    PatchEmbed,
    PatchExpand,
    PatchMerging,
    kaiming_conv,
    trunc_normal_02,
)
from medical_image_classification_tpu.models.ss2d_modules import (
    a_log_init_uniform,
    dt_bias_init,
)
from medical_image_classification_tpu.models.vssm import SSConvBlock
from medical_image_classification_tpu.ops.ss2d import ss2d_core_ssd, rmsnorm_gated

# The two branch streams run the SAME block structure with SEPARATE
# weights at every U-Net stage (reference `blocks1`/`blocks2`,
# `CrossMamba_fusion_2b2.py:858-888`).  Emitting them as two module
# instances doubles the serialized program: the vfefm train graph hit the
# axon relay's remote-compile body limit (HTTP 413 — BENCH_r04/r05; the
# limit sits between 9.8 and 16.2 MB of serialized HLO while the
# two-instance graph is 16.2 MB).  nn.vmap folds each pair into ONE
# traced instance mapped over a leading branch axis — params/batch_stats
# get a [2, ...] leading dim (importer stacks the reference's blocks1/2
# leaves), the graph halves, and every block op runs at an effective 2x
# batch, which also helps the latency-bound b2 fusion anchor.
SSConvBlockPair = nn.vmap(
    SSConvBlock,
    in_axes=(0, None, None), out_axes=0,
    variable_axes={"params": 0, "batch_stats": 0},
    split_rngs={"params": True, "dropout": True},
)


class _PairScanBody(nn.Module):
    """lax.scan body over depth: carry = the [2, B, H, W, C] branch pair,
    scanned input = that depth's stochastic-depth rate (the reference's
    linspace schedule varies per block, so the rate rides the scan as a
    traced input — `common.DropPath` rate_override)."""
    hidden_dim: int
    d_state: int
    ssd_headdim: int
    train: bool
    dtype: object = None

    @nn.compact
    def __call__(self, x12, dp):
        y = SSConvBlockPair(hidden_dim=self.hidden_dim, core="ssd",
                            d_state=self.d_state,
                            ssd_headdim=self.ssd_headdim, dtype=self.dtype,
                            name="block")(x12, self.train, dp)
        return y, None


def _block_stack_pair(x12, drop_paths, *, depth, dim, d_state, headdim,
                      dtype, train, name):
    """depth x SSConvBlockPair as ONE nn.scan'd program.

    The fusion U-Net carries 25 branch-pair block stacks; emitting each
    depth separately made the serialized train graph exceed the relay's
    remote-compile body limit even after the vmap fold (r5: the evening
    relay rejects >~8 MB while the folded graph was 8.9).  nn.scan emits
    ONE body per stage; params/batch_stats stack [depth, 2, ...].

    By default the scan is fully UNROLLED (``unroll=depth``): the rolled
    loop measured 110.9 vs ~83 ms/step at vfefm_2b2 b2 bf16 (the while
    carry pins layouts and blocks cross-depth fusion), and unrolling
    keeps the stacked param tree (importer/checkpoints unchanged) while
    restoring straight-line compute.  ``MIC_FUSION_GRAPH_COMPACT=1``
    switches to the rolled loop (unroll=1) — the graph-size fallback the
    bench engages when a relay rejects the unrolled graph (HTTP 413)."""
    import os
    unroll = 1 if os.environ.get("MIC_FUSION_GRAPH_COMPACT") == "1" \
        else depth
    body = nn.scan(
        _PairScanBody,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=0, out_axes=0, length=depth, unroll=unroll,
    )(hidden_dim=dim, d_state=d_state, ssd_headdim=headdim, dtype=dtype,
      train=train, name=name)
    y, _ = body(x12, jnp.asarray(drop_paths, jnp.float32))
    return y


class CrossMamba(nn.Module):
    """Dual-input SSD core with cross parameterisation (shared weights)."""
    d_model: int
    d_state: int = 128
    d_conv: int = 3
    expand: int = 2
    headdim: int = 64
    ngroups: int = 1
    chunk_size: int = 256
    rmsnorm: bool = True
    dropout: float = 0.0
    conv_bias: bool = True
    bias: bool = False
    dtype: object = None          # compute dtype (bf16 on TPU); params fp32

    @nn.compact
    def __call__(self, u1, u2, u2_cat_u1, u1_cat_u2, train: bool = False):
        d_inner = self.expand * self.d_model
        d_ssm = d_inner
        nheads = d_ssm // self.headdim
        G, N = self.ngroups, self.d_state
        K = 4

        # shared projections (`CrossMamba_fusion_2b2.py:128-136`)
        skip_proj = nn.Dense(2 * d_inner - d_ssm, use_bias=self.bias,
                             kernel_init=trunc_normal_02, dtype=self.dtype,
                             name="skip_in_proj")
        xs_proj = nn.Dense(d_ssm, use_bias=self.bias, dtype=self.dtype,
                           kernel_init=trunc_normal_02, name="xs_in_proj")
        bcdt_proj = nn.Dense(2 * G * N + nheads, use_bias=self.bias,
                             kernel_init=trunc_normal_02, dtype=self.dtype,
                             name="BCdts_in_proj")
        xs_conv = nn.Conv(d_ssm, (self.d_conv, self.d_conv), padding="SAME",
                          feature_group_count=d_ssm, use_bias=self.conv_bias,
                          kernel_init=kaiming_conv, dtype=self.dtype,
                          name="xs_conv2d")
        d_bc = 2 * G * N + nheads
        bcdt_conv = nn.Conv(d_bc, (self.d_conv, self.d_conv), padding="SAME",
                            feature_group_count=d_bc, use_bias=self.conv_bias,
                            kernel_init=kaiming_conv, dtype=self.dtype,
                            name="BCdts_conv2d")

        A_log = self.param("A_logs", a_log_init_uniform(), (K, nheads))
        dt_b = self.param("dt_bias", dt_bias_init(), (K, nheads))
        Ds = self.param("Ds", nn.initializers.ones, (K, nheads))
        norm_w = (self.param("norm_weight", nn.initializers.ones, (d_ssm,))
                  if self.rmsnorm else None)
        out_proj = nn.Dense(self.d_model, use_bias=self.bias,
                            kernel_init=trunc_normal_02, dtype=self.dtype,
                            name="out_proj")
        d_mlp = ((2 * d_inner - d_ssm) - d_ssm) // 2   # 0 when d_ssm == d_inner

        def branch(u_own, u_cross):
            zx = skip_proj(u_own)
            z0 = zx[..., :d_mlp]
            x0 = zx[..., d_mlp:2 * d_mlp]
            z = zx[..., 2 * d_mlp:]
            xs = jax.nn.silu(xs_conv(xs_proj(u_own)))
            bcdt = jax.nn.silu(bcdt_conv(bcdt_proj(u_cross)))
            xBCdt = jnp.concatenate([xs, bcdt], axis=-1)
            y = ss2d_core_ssd(xBCdt, A_log, dt_b, Ds, d_ssm=d_ssm,
                              ngroups=G, d_state=N, nheads=nheads,
                              headdim=self.headdim,
                              chunk_size=self.chunk_size).astype(u_own.dtype)
            if self.rmsnorm:
                y = rmsnorm_gated(y, z, norm_w, group_size=d_ssm // G)
            else:
                y = y * jax.nn.silu(z)
            if d_mlp > 0:
                y = jnp.concatenate([jax.nn.silu(z0) * x0, y], axis=-1)
            out = out_proj(y)
            if self.dropout > 0:
                out = nn.Dropout(self.dropout, deterministic=not train)(out)
            return out

        return branch(u1, u2_cat_u1), branch(u2, u1_cat_u2)


def _cat_inputs(x1, x2, method: str, proj):
    """Build the cross inputs per cat_method (`:920-931`)."""
    if method == "none":
        return x2, x1
    if method == "add":
        s = x1 + x2
        return s, s
    if method == "stack":
        u = proj(jnp.concatenate([x1, x2], axis=-1))
        return u, u
    return x2, x1


class DownLayer(nn.Module):
    """Encoder stage of the fusion U-Net (`CrossMamba_fusion_2b2.py:836-946`):
    per-branch SS-Conv-SSD blocks → cat_method merge → CrossMamba → residual
    → (skip collected) → shared-structure downsample."""
    dim: int
    depth: int
    cat_method: str = "stack"
    d_state: int = 128
    fusion_d_state: int = 128     # the reference's CrossMamba default, used
    ssd_headdim: int = 64         # regardless of the model-level d_state
    drop_paths: Sequence[float] = ()
    downsample: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        dps = [self.drop_paths[i] if i < len(self.drop_paths) else 0.0
               for i in range(self.depth)]
        x12 = _block_stack_pair(
            jnp.stack([x1, x2]), dps, depth=self.depth, dim=self.dim,
            d_state=self.d_state, headdim=self.ssd_headdim,
            dtype=self.dtype, train=train, name="blocks")
        x1, x2 = x12[0], x12[1]
        proj = (nn.Dense(self.dim, kernel_init=trunc_normal_02,
                         dtype=self.dtype, name="cat_proj")
                if self.cat_method == "stack" else None)
        c1, c2 = _cat_inputs(x1, x2, self.cat_method, proj)
        f1, f2 = CrossMamba(d_model=self.dim, d_state=self.fusion_d_state,
                            headdim=self.ssd_headdim, dtype=self.dtype,
                            name="fusion")(x1, x2, c1, c2, train=train)
        f1, f2 = x1 + f1, x2 + f2
        skip = (x1, x2)
        if self.downsample:
            f1 = PatchMerging(dtype=self.dtype, name="downsample1")(f1)
            f2 = PatchMerging(dtype=self.dtype, name="downsample2")(f2)
        return f1, f2, skip


class UpLayer(nn.Module):
    """Decoder stage (`:949-1075`): PatchExpand ×2 → skip-concat+proj →
    blocks → CrossMamba fusion + residual."""
    dim: int                      # block width (post-upsample channels)
    depth: int
    cat_method: str = "stack"
    d_state: int = 128
    fusion_d_state: int = 128
    ssd_headdim: int = 64
    drop_paths: Sequence[float] = ()
    upsample: bool = True
    skip: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x1, x2, s1, s2, train: bool = False):
        if self.upsample:
            x1 = PatchExpand(dtype=self.dtype, name="upsample1")(x1)
            x2 = PatchExpand(dtype=self.dtype, name="upsample2")(x2)
        if self.skip:
            x1 = nn.Dense(self.dim, kernel_init=trunc_normal_02,
                          dtype=self.dtype,
                          name="in_proj1")(jnp.concatenate([x1, s1], axis=-1))
            x2 = nn.Dense(self.dim, kernel_init=trunc_normal_02,
                          dtype=self.dtype,
                          name="in_proj2")(jnp.concatenate([x2, s2], axis=-1))
        dps = [self.drop_paths[i] if i < len(self.drop_paths) else 0.0
               for i in range(self.depth)]
        x12 = _block_stack_pair(
            jnp.stack([x1, x2]), dps, depth=self.depth, dim=self.dim,
            d_state=self.d_state, headdim=self.ssd_headdim,
            dtype=self.dtype, train=train, name="blocks")
        x1, x2 = x12[0], x12[1]
        proj = (nn.Dense(self.dim, kernel_init=trunc_normal_02,
                         dtype=self.dtype, name="cat_proj")
                if self.cat_method == "stack" else None)
        c1, c2 = _cat_inputs(x1, x2, self.cat_method, proj)
        f1, f2 = CrossMamba(d_model=self.dim, d_state=self.fusion_d_state,
                            headdim=self.ssd_headdim, dtype=self.dtype,
                            name="fusion")(x1, x2, c1, c2, train=train)
        return x1 + f1, x2 + f2


class UpLayerSingle(nn.Module):
    """Single-stream decoder stage of the `_2c1` variant
    (`CrossMamba_fusion_2c1.py` upLayer): PatchExpand -> fold the two skip
    maps (cat_down) -> in_proj on the concat -> blocks.  No decoder fusion."""
    dim: int
    depth: int
    d_state: int = 128
    ssd_headdim: int = 64
    drop_paths: Sequence[float] = ()
    upsample: bool = True
    skip: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, s1, s2, train: bool = False):
        if self.upsample:
            x = PatchExpand(dtype=self.dtype, name="upsample")(x)
        if self.skip:
            sdown = nn.Dense(self.dim, kernel_init=trunc_normal_02,
                             dtype=self.dtype,
                             name="cat_down")(jnp.concatenate([s1, s2],
                                                              axis=-1))
            x = nn.Dense(self.dim, kernel_init=trunc_normal_02,
                         dtype=self.dtype,
                         name="in_proj")(jnp.concatenate([x, sdown], axis=-1))
        for i in range(self.depth):
            dp = self.drop_paths[i] if i < len(self.drop_paths) else 0.0
            x = SSConvBlock(hidden_dim=self.dim, drop_path=dp, core="ssd",
                            d_state=self.d_state,
                            ssd_headdim=self.ssd_headdim, dtype=self.dtype,
                            name=f"blocks_{i}")(x, train)
        return x


class FusionVFEFM(nn.Module):
    """Dual-branch image-fusion U-Net (CT/MRI → fused image).

    Input/output NHWC: (x1 [B,H,W,C], x2 [B,H,W,C]) -> [B,H,W,1].
    ``single_decoder=True`` = the `_2c1` wiring: branches merged after the
    bridge, one decoder stream.
    """
    patch_size: int = 4
    depths: Sequence[int] = (2, 2, 4, 2)
    dims: Sequence[int] = (128, 256, 512, 1024)
    depths_decoder: Sequence[int] = (2, 9, 2, 2)
    dims_decoder: Sequence[int] = (1024, 512, 256, 128)
    d_state: int = 128
    fusion_d_state: int = 128
    ssd_headdim: int = 64
    cat_method: str = "stack"
    drop_path_rate: float = 0.1
    single_decoder: bool = False
    dtype: object = None          # compute dtype (bf16 on TPU); params fp32;
                                  # the fused image is emitted in fp32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        nl = len(self.depths)
        if self.dtype is not None:
            x1 = x1.astype(self.dtype)
            x2 = x2.astype(self.dtype)
        x1 = PatchEmbed(self.patch_size, self.dims[0], dtype=self.dtype,
                        name="patch_embed1")(x1)
        x2 = PatchEmbed(self.patch_size, self.dims[0], dtype=self.dtype,
                        name="patch_embed2")(x2)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        skips = []
        p = 0
        for i in range(nl):
            d = self.depths[i]
            x1, x2, skip = DownLayer(
                dim=self.dims[i], depth=d, cat_method=self.cat_method,
                d_state=self.d_state, fusion_d_state=self.fusion_d_state,
                ssd_headdim=self.ssd_headdim, dtype=self.dtype,
                drop_paths=tuple(dpr[p:p + d]), downsample=(i < nl - 1),
                name=f"layers_{i}")(x1, x2, train)
            skips.append(skip)
            p += d

        # 1x1 conv bridges (`:1189-1190`)
        nd = len(self.depths_decoder)
        dpr_d = np.linspace(0, self.drop_path_rate,
                            sum(self.depths_decoder)).tolist()

        def skip_for(j):
            # match the skip whose spatial size equals the post-upsample
            # size (`:1249-1266`): layer j sits at encoder level nd-2-j
            # after its upsample (level 0 for the last layer, which reuses
            # the H/4 skip like the reference's search)
            idx = 0 if j == nd - 1 else nd - 2 - j
            return skips[idx]

        if self.single_decoder:
            # the `_2c1` wiring (`CrossMamba_fusion_2c1.py`): ONE Linear
            # bridge on the concat, a single-stream decoder whose layers
            # fold the (s1, s2) skips via cat_down + in_proj and have NO
            # decoder fusion, then final_expand + 1x1 conv.  (The file also
            # defines norm/final_cat_proj but its forward never uses them.)
            x = nn.Dense(self.dims_decoder[0], kernel_init=trunc_normal_02,
                         dtype=self.dtype,
                         name="bridge")(jnp.concatenate([x1, x2], axis=-1))
            p = 0
            for j in range(nd):
                d = self.depths_decoder[j]
                ups = j < nd - 1
                block_dim = (self.dims_decoder[j] // 2 if ups
                             else self.dims_decoder[j])
                s1, s2 = (None, None) if j == 0 else skip_for(j)
                x = UpLayerSingle(
                    dim=block_dim, depth=d, d_state=self.d_state,
                    ssd_headdim=self.ssd_headdim, dtype=self.dtype,
                    drop_paths=tuple(dpr_d[p:p + d]), upsample=ups,
                    skip=j > 0, name=f"layers_up_{j}")(x, s1, s2, train)
                p += d
            x = FinalPatchExpand(dtype=self.dtype, name="final_expand")(x)
            return nn.Conv(1, (1, 1), kernel_init=kaiming_conv,
                           name="final_conv")(x).astype(jnp.float32)

        x1 = nn.Conv(self.dims_decoder[0], (1, 1), kernel_init=kaiming_conv,
                     dtype=self.dtype, name="bridge1")(x1)
        x2 = nn.Conv(self.dims_decoder[0], (1, 1), kernel_init=kaiming_conv,
                     dtype=self.dtype, name="bridge2")(x2)
        p = 0
        for j in range(nd):
            d = self.depths_decoder[j]
            ups = j < nd - 1
            block_dim = (self.dims_decoder[j] // 2 if ups
                         else self.dims_decoder[j])
            if j == 0:
                s1 = s2 = None
                use_skip = False
            else:
                use_skip = True
                s1, s2 = skip_for(j)
            x1, x2 = UpLayer(
                dim=block_dim, depth=d, cat_method=self.cat_method,
                d_state=self.d_state, fusion_d_state=self.fusion_d_state,
                ssd_headdim=self.ssd_headdim, dtype=self.dtype,
                drop_paths=tuple(dpr_d[p:p + d]), upsample=ups,
                skip=use_skip, name=f"layers_up_{j}")(x1, x2, s1, s2, train)
            p += d

        x = nn.LayerNorm(name="norm")(jnp.concatenate([x1, x2], axis=-1))
        x = nn.Dense(self.dims_decoder[-1], kernel_init=trunc_normal_02,
                     dtype=self.dtype, name="final_cat_proj")(x)
        x = FinalPatchExpand(dtype=self.dtype, name="final_expand")(x)
        out = nn.Conv(1, (1, 1), kernel_init=kaiming_conv,
                      name="final_conv")(x)
        return out.astype(jnp.float32)


class CrossVSSMClassifier(nn.Module):
    """Dual-branch CrossMamba classifier.

    fuse_mode='stage3': two parallel encoders, CrossMamba fusion after the
    3rd stage, per-branch downsample + stage 4, additive merge → pool → head
    (`CrossMamba_3e1f1eadd.py:937-987`).
    fuse_mode='stage3_merged': diagram-2 wiring — the fused branches are
    ADDED first, then ONE shared downsample and ONE shared stage-4 layer
    (`CrossMamba_3e1fadd1e.py:957-972`).
    fuse_mode='all': CrossMamba fusion with residual at EVERY stage
    (`CrossMamba_4ef.py:756-867`).
    """
    num_classes: int
    patch_size: int = 4
    depths: Sequence[int] = (2, 2, 4, 2)
    dims: Sequence[int] = (128, 256, 512, 1024)
    d_state: int = 16
    fusion_d_state: int = 128     # the reference hardcodes CrossMamba's
    ssd_headdim: int = 64         # default in its fusion modules
    cat_method: str = "stack"
    fuse_mode: str = "stage3"
    drop_path_rate: float = 0.1
    dtype: object = None          # compute dtype (bf16 on TPU); params fp32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        nl = len(self.depths)
        if self.dtype is not None:
            x1 = x1.astype(self.dtype)
            x2 = x2.astype(self.dtype)
        x1 = PatchEmbed(self.patch_size, self.dims[0], dtype=self.dtype,
                        name="patch_embed1")(x1)
        x2 = PatchEmbed(self.patch_size, self.dims[0], dtype=self.dtype,
                        name="patch_embed2")(x2)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()

        def stage_blocks(x, i, branch):
            p = sum(self.depths[:i])
            for k in range(self.depths[i]):
                x = SSConvBlock(hidden_dim=self.dims[i], drop_path=dpr[p + k],
                                core="ssd", d_state=self.d_state,
                                ssd_headdim=self.ssd_headdim, dtype=self.dtype,
                                name=f"layers{branch}_{i}_blocks_{k}")(x, train)
            return x

        if self.fuse_mode == "all":
            for i in range(nl):
                x1 = stage_blocks(x1, i, 1)
                x2 = stage_blocks(x2, i, 2)
                proj = (nn.Dense(self.dims[i], kernel_init=trunc_normal_02,
                                 dtype=self.dtype, name=f"cat_proj_{i}")
                        if self.cat_method == "stack" else None)
                c1, c2 = _cat_inputs(x1, x2, self.cat_method, proj)
                f1, f2 = CrossMamba(d_model=self.dims[i],
                                    d_state=self.fusion_d_state,
                                    headdim=self.ssd_headdim, dtype=self.dtype,
                                    name=f"fusion_{i}")(x1, x2, c1, c2,
                                                        train=train)
                x1, x2 = x1 + f1, x2 + f2
                if i < nl - 1:
                    x1 = PatchMerging(dtype=self.dtype, name=f"down1_{i}")(x1)
                    x2 = PatchMerging(dtype=self.dtype, name=f"down2_{i}")(x2)
            # `CrossMamba_4ef.py` merges branches with a Linear on the
            # concat (before_head_proj), not a sum
            x = nn.Dense(self.dims[-1], kernel_init=trunc_normal_02,
                         dtype=self.dtype, name="before_head_proj")(
                jnp.concatenate([x1, x2], axis=-1))
            x1, x2 = x, jnp.zeros_like(x)
        else:  # stage3 / stage3_merged
            for i in range(nl - 1):
                x1 = stage_blocks(x1, i, 1)
                x2 = stage_blocks(x2, i, 2)
                if i < nl - 2:
                    x1 = PatchMerging(dtype=self.dtype, name=f"down1_{i}")(x1)
                    x2 = PatchMerging(dtype=self.dtype, name=f"down2_{i}")(x2)
            proj = (nn.Dense(self.dims[-2], kernel_init=trunc_normal_02,
                             dtype=self.dtype, name="cat_proj")
                    if self.cat_method == "stack" else None)
            c1, c2 = _cat_inputs(x1, x2, self.cat_method, proj)
            x1, x2 = CrossMamba(d_model=self.dims[-2],
                                d_state=self.fusion_d_state,
                                headdim=self.ssd_headdim, dtype=self.dtype,
                                name="fusion")(x1, x2, c1, c2, train=train)
            if self.fuse_mode == "stage3_merged":
                # diagram-2 (`CrossMamba_3e1fadd1e.py:965-970`): add fused
                # branches, ONE shared downsample + ONE shared stage 4
                x = PatchMerging(dtype=self.dtype, name="downsample")(x1 + x2)
                x = stage_blocks(x, nl - 1, 0)
                x1, x2 = x, jnp.zeros_like(x)
            else:
                x1 = PatchMerging(dtype=self.dtype, name="downsample1")(x1)
                x2 = PatchMerging(dtype=self.dtype, name="downsample2")(x2)
                x1 = stage_blocks(x1, nl - 1, 1)
                x2 = stage_blocks(x2, nl - 1, 2)

        x = x1 + x2
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes, kernel_init=trunc_normal_02,
                        name="head")(x)
