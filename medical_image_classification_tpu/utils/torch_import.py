"""Import reference PyTorch checkpoints into this framework's params.

Maps `/root/reference/MedMamba.py`-family ``state_dict``s (both the
weights-only `train.py:101-103` format and the composite
`ddp_train.py:186-195` format) onto the Flax VSSM parameter tree, so users
switching from the reference keep their trained models.

Layout conversions: Conv2d OIHW -> HWIO; Linear [out,in] -> [in,out];
BatchNorm running stats -> the 'batch_stats' collection; stacked scan
parameters (x_proj_weight, dt_projs_*, A_logs, Ds) keep their layout
(reference merges K into the leading dim for A_logs/Ds; we store [K, ...]).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):
    """OIHW -> HWIO."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _bn(sd, prefix):
    params = {"scale": np.asarray(sd[prefix + ".weight"]),
              "bias": np.asarray(sd[prefix + ".bias"])}
    stats = {"mean": np.asarray(sd[prefix + ".running_mean"]),
             "var": np.asarray(sd[prefix + ".running_var"])}
    return params, stats


def _dense(sd, prefix, bias=True):
    out = {"kernel": _t(sd[prefix + ".weight"])}
    if bias and prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _conv2d(sd, prefix, bias=True):
    out = {"kernel": _conv(sd[prefix + ".weight"])}
    if bias and prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _ss2d(sd, p, d_inner: int, d_state: int):
    """SS2D (Mamba-1) parameter group (`MedMamba.py:253-483`)."""
    K = 4
    params = {
        "in_proj": _dense(sd, p + ".in_proj"),
        "conv2d": _conv2d(sd, p + ".conv2d"),
        "x_proj_weight": np.asarray(sd[p + ".x_proj_weight"]),
        "dt_projs_weight": np.asarray(sd[p + ".dt_projs_weight"]),
        "dt_projs_bias": np.asarray(sd[p + ".dt_projs_bias"]),
        "A_logs": np.asarray(sd[p + ".A_logs"]).reshape(K, d_inner, d_state),
        "Ds": np.asarray(sd[p + ".Ds"]).reshape(K, d_inner),
        "out_norm": _ln(sd, p + ".out_norm"),
        "out_proj": _dense(sd, p + ".out_proj"),
    }
    return params


def _conv_branch(sd, p):
    """conv33conv33conv11 Sequential (`MedMamba.py:517-528`):
    [0]=BN [1]=Conv [2]=BN [3]=ReLU [4]=Conv [5]=BN [6]=ReLU [7]=Conv [8]=ReLU."""
    bn0_p, bn0_s = _bn(sd, p + ".0")
    bn1_p, bn1_s = _bn(sd, p + ".2")
    bn2_p, bn2_s = _bn(sd, p + ".5")
    params = {
        "bn0": bn0_p, "bn1": bn1_p, "bn2": bn2_p,
        "conv1": _conv2d(sd, p + ".1"),
        "conv2": _conv2d(sd, p + ".4"),
        "conv3": _conv2d(sd, p + ".7"),
    }
    stats = {"bn0": bn0_s, "bn1": bn1_s, "bn2": bn2_s}
    return params, stats


def import_medmamba_state_dict(sd: Dict[str, Any], depths=(2, 2, 4, 2),
                               dims=(96, 192, 384, 768), d_state: int = 16,
                               expand: int = 2) -> Tuple[dict, dict]:
    """Reference MedMamba VSSM state_dict -> (params, batch_stats).

    Accepts the composite resume dict (uses its 'model' entry) or a raw
    state_dict; strips DDP 'module.' prefixes.
    """
    if "model" in sd and not any(k.startswith("patch_embed") for k in sd):
        sd = sd["model"]
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }

    params: dict = {}
    stats: dict = {}
    params["patch_embed"] = {"proj": _conv2d(sd, "patch_embed.proj"),
                             "norm": _ln(sd, "patch_embed.norm")}
    for i, depth in enumerate(depths):
        layer: dict = {}
        layer_stats: dict = {}
        half = dims[i] // 2
        d_inner = expand * half
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            cb_p, cb_s = _conv_branch(sd, p + ".conv33conv33conv11")
            layer[f"blocks_{j}"] = {
                "ln_1": _ln(sd, p + ".ln_1"),
                "self_attention": _ss2d(sd, p + ".self_attention",
                                        d_inner, d_state),
                "conv_branch": cb_p,
            }
            layer_stats[f"blocks_{j}"] = {"conv_branch": cb_s}
        if f"layers.{i}.downsample.reduction.weight" in sd:
            layer["downsample"] = {
                "norm": _ln(sd, f"layers.{i}.downsample.norm"),
                "reduction": {"kernel": _t(
                    sd[f"layers.{i}.downsample.reduction.weight"])},
            }
        params[f"layers_{i}"] = layer
        stats[f"layers_{i}"] = layer_stats
    params["classifier"] = {"head": _dense(sd, "head")}
    return params, stats


def load_torch_checkpoint(path: str):
    """Load a reference .pth with torch (CPU) and return the raw dict."""
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def import_checkpoint_into_state(path: str, state, model_name="medmamba",
                                 **kw):
    """Convenience: load .pth -> new TrainState with imported params/stats."""
    import jax.numpy as jnp
    from flax.core import FrozenDict

    raw = load_torch_checkpoint(path)
    params, stats = import_medmamba_state_dict(raw, **kw)

    def to_jnp(tree):
        import jax
        return jax.tree_util.tree_map(lambda x: jnp.asarray(x), tree)

    params = to_jnp(params)
    model_state = dict(state.model_state)
    # merge imported BN stats into the existing batch_stats structure
    bs = model_state.get("batch_stats", {})
    model_state["batch_stats"] = _merge_stats(bs, to_jnp(stats))
    return state.replace(params=params, model_state=FrozenDict(model_state))


def _merge_stats(base, new):
    if not isinstance(base, dict) or not isinstance(new, dict):
        return new if new is not None else base
    out = dict(base)
    for k, v in new.items():
        out[k] = _merge_stats(base.get(k, {}), v)
    return out


def _ss2d_ssd(sd, p, nheads: int, st: bool = False):
    """SS2D_with_SSD parameter group (`CNN_Mamba.py:322-564`); with
    ``st=True`` also the semantic-token extension (STL/STF/WMF + o_norm +
    o_linear, `st_mamba/ST_SSD.py:498-507,625-655`).  Returns
    (params, batch_stats)."""
    K = 4
    params = {
        "in_proj": _dense(sd, p + ".in_proj"),
        "conv2d": _conv2d(sd, p + ".conv2d"),
        "dt_bias": np.asarray(sd[p + ".dt_bias"]),          # already [4, H]
        "A_logs": np.asarray(sd[p + ".A_logs"]).reshape(K, nheads),
        "Ds": np.asarray(sd[p + ".Ds"]).reshape(K, nheads),
        "norm_weight": np.asarray(sd[p + ".norm.weight"]),
        "out_proj": _dense(sd, p + ".out_proj"),
    }
    stats = {}
    if st:
        def mix(prefix):
            # Conv1d(2 -> 1, k=1) -> Dense(2 -> 1)
            w = np.asarray(sd[prefix + ".weight"])          # [1, 2, 1]
            return {"kernel": np.ascontiguousarray(w[:, :, 0].T),
                    "bias": np.asarray(sd[prefix + ".bias"])}
        params["stl"] = {
            "u1": np.asarray(sd[p + ".stl.learnable_u1"]),
            "u2": np.asarray(sd[p + ".stl.learnable_u2"]),
            "mix": mix(p + ".stl.conv1d"),
        }
        params["stf"] = {
            "z": np.asarray(sd[p + ".stf.learnable_z"]),
            "mix": mix(p + ".stf.conv1d"),
        }
        onorm_p, onorm_s = _bn(sd, p + ".o_norm")
        params["o_norm"] = onorm_p
        stats["o_norm"] = onorm_s
        params["o_linear"] = _conv2d(sd, p + ".o_linear")
        params["k_weights"] = np.asarray(sd[p + ".k_weights"])
    return params, stats


def import_medssd_state_dict(sd: Dict[str, Any], depths=(2, 2, 4, 2),
                             dims=(128, 256, 512, 1024), headdim: int = 64,
                             expand: int = 2, conv_stem: bool = False,
                             st_tokens: bool = False) -> Tuple[dict, dict]:
    """Reference MedSSD / CNN_Mamba state_dict -> (params, batch_stats)."""
    if "model" in sd and not any(k.startswith("patch_embed") for k in sd):
        sd = sd["model"]
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}

    params: dict = {}
    stats: dict = {}
    if conv_stem:
        bn_p, bn_s = _bn(sd, "conv_T_conv.bn")
        params["conv_t_conv"] = {
            "bn": bn_p,
            "conv1": _conv2d(sd, "conv_T_conv.conv1"),
            "conv2": _conv2d(sd, "conv_T_conv.conv2"),
            "pw": _conv2d(sd, "conv_T_conv.PW_conv"),
        }
        stats["conv_t_conv"] = {"bn": bn_s}
    params["patch_embed"] = {"proj": _conv2d(sd, "patch_embed.proj"),
                             "norm": _ln(sd, "patch_embed.norm")}
    for i, depth in enumerate(depths):
        layer: dict = {}
        layer_stats: dict = {}
        half = dims[i] // 2
        nheads = (expand * half) // headdim
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            cb_p, cb_s = _conv_branch(sd, p + ".conv33conv33conv11")
            sa_p, sa_s = _ss2d_ssd(sd, p + ".self_attention", nheads,
                                   st=st_tokens)
            layer[f"blocks_{j}"] = {
                "ln_1": _ln(sd, p + ".ln_1"),
                "self_attention": sa_p,
                "conv_branch": cb_p,
            }
            layer_stats[f"blocks_{j}"] = {"conv_branch": cb_s}
            if sa_s:
                layer_stats[f"blocks_{j}"]["self_attention"] = sa_s
        if f"layers.{i}.downsample.reduction.weight" in sd:
            layer["downsample"] = {
                "norm": _ln(sd, f"layers.{i}.downsample.norm"),
                "reduction": {"kernel": _t(
                    sd[f"layers.{i}.downsample.reduction.weight"])},
            }
        params[f"layers_{i}"] = layer
        stats[f"layers_{i}"] = layer_stats
    if "head.weight" in sd:                    # linear head (KAN variants
        params["classifier"] = {"head": _dense(sd, "head")}   # import theirs
    return params, stats                       # via import_kan_head)


def import_mamba_lm_state_dict(sd: Dict[str, Any], n_layer: int) -> dict:
    """Reference/HF Mamba-1 LM state_dict -> MambaLMHeadModel params
    (`mamba_ssm/models/mixer_seq_simple.py` + `utils/hf.py` naming;
    'backbone.' prefixes stripped)."""
    sd = {(k[9:] if k.startswith("backbone.") else k): v
          for k, v in sd.items()}
    params: dict = {
        "embedding": {"embedding": np.asarray(sd["embedding.weight"])},
        "norm_f": {"scale": np.asarray(sd["norm_f.weight"])},
    }
    for i in range(n_layer):
        p = f"layers.{i}"
        mixer = {
            "in_proj": _dense(sd, p + ".mixer.in_proj"),
            "conv1d_weight": np.asarray(
                sd[p + ".mixer.conv1d.weight"])[:, 0, :].T,  # [D,1,K]->[K,D]
            "x_proj": _dense(sd, p + ".mixer.x_proj"),
            "dt_proj_weight": np.asarray(sd[p + ".mixer.dt_proj.weight"]),
            "dt_proj_bias": np.asarray(
                sd[p + ".mixer.dt_proj.bias"])[None, :],
            "A_log": np.asarray(sd[p + ".mixer.A_log"]),
            "D": np.asarray(sd[p + ".mixer.D"]),
            "out_proj": _dense(sd, p + ".mixer.out_proj"),
        }
        if p + ".mixer.conv1d.bias" in sd:
            mixer["conv1d_bias"] = np.asarray(sd[p + ".mixer.conv1d.bias"])
        params[f"layers_{i}"] = {
            "norm": {"scale": np.asarray(sd[p + ".norm.weight"])},
            "mixer": mixer,
        }
    return params


# --- KAN-family importers (heads + SS2D-embedded KANs) -----------------------

def _ekan(sd, p):
    """efficient-KAN KANLinear (`medmamba_kan/e_kan.py:8-239`):
    params (base_weight [out,in], spline_weight [out,in,gs+k],
    spline_scaler [out,in]) + the 'grid' buffer ([in, gs+2k+1])."""
    params = {"base_weight": np.asarray(sd[p + ".base_weight"]),
              "spline_weight": np.asarray(sd[p + ".spline_weight"])}
    if p + ".spline_scaler" in sd:
        params["spline_scaler"] = np.asarray(sd[p + ".spline_scaler"])
    state = {"grid": np.asarray(sd[p + ".grid"])}
    return params, state


def _okan(sd, p):
    """original-pykan KANLayer (`medmamba_kan/o_kan.py:159-321`):
    params (coef [in,out,num+k], scale_base, scale_sp) + non-trained
    grid [in, num+2k+1] and mask [in,out]."""
    params = {"coef": np.asarray(sd[p + ".coef"]),
              "scale_base": np.asarray(sd[p + ".scale_base"]),
              "scale_sp": np.asarray(sd[p + ".scale_sp"])}
    state = {"grid": np.asarray(sd[p + ".grid"]),
             "mask": np.asarray(sd[p + ".mask"])}
    return params, state


def _bn1d(sd, prefix):
    params = {"scale": np.asarray(sd[prefix + ".weight"]),
              "bias": np.asarray(sd[prefix + ".bias"])}
    stats = {"mean": np.asarray(sd[prefix + ".running_mean"]),
             "var": np.asarray(sd[prefix + ".running_var"])}
    return params, stats


def import_kan_head(sd, head: str):
    """Reference KAN classifier heads -> (params, batch_stats, kan_state)
    subtrees for the 'classifier' scope.

    head: 'ekan' (`medmamba_kan/MedSSD_ekan.py:990`, attr 'kan'),
          'okan' (`MedSSD_okan.py:1242`, attr 'kan'),
          'kan_stack' (`medmamba_kan/MedSSD_kan.py:1125-1165`, kan1..3),
          'kan_module' (`MedSSD_kan/MedSSD_kan.py:475-502,1155`, 'kans'),
          '3kan' (`MedSSD_kan/MedSSD_3kan.py:475-505`, 'kans').
    """
    params: dict = {}
    stats: dict = {}
    kstate: dict = {}
    if head == "ekan":
        params["head"], kstate["head"] = _ekan(sd, "kan")
    elif head == "okan":
        params["head"], kstate["head"] = _okan(sd, "kan")
    elif head == "kan_stack":
        for i in (1, 2, 3):
            params[f"kan{i}"], kstate[f"kan{i}"] = _okan(sd, f"kan{i}")
    elif head in ("kan_module", "3kan"):
        kans_p: dict = {}
        kans_s: dict = {}
        n = 2 if head == "kan_module" else 3
        for i in range(1, n + 1):
            kans_p[f"kan{i}"], kans_s[f"kan{i}"] = _okan(sd, f"kans.kan{i}")
        bn_p, bn_s = _bn1d(sd, "kans.bn")
        kans_p["bn"] = bn_p
        params["kans"] = kans_p
        stats["kans"] = {"bn": bn_s}
        kstate["kans"] = kans_s
    else:
        raise ValueError(head)
    return params, stats, kstate


def import_medssd_family_state_dict(sd, head: str = "linear",
                                    depths=(2, 2, 4, 2),
                                    dims=(128, 256, 512, 1024),
                                    headdim: int = 64, expand: int = 2,
                                    conv_stem: bool = False,
                                    st_tokens: bool = False):
    """MedSSD-family state_dict -> (params, variables) where variables is
    {'batch_stats': ..., 'kan_state': ...} ready for model.apply.

    Covers the KAN-head variants (ekan/okan/kan_stack/kan_module/3kan).
    kanin/kanout SSD carry NO KAN weights in reference checkpoints — the
    reference constructs those KANs inside forward() on every call
    (`kanSSD/kaninSSD.py:393-410`, an acknowledged bug, SURVEY §2.2 S8) —
    so their registered-KAN parameters here keep their initialization.
    """
    params, stats = import_medssd_state_dict(
        sd, depths=depths, dims=dims, headdim=headdim, expand=expand,
        conv_stem=conv_stem, st_tokens=st_tokens)
    kan_state: dict = {}
    if head != "linear":
        if "model" in sd and not any(k.startswith("patch_embed") for k in sd):
            sd = sd["model"]
        sd = {(k[7:] if k.startswith("module.") else k): v
              for k, v in sd.items()}
        hp, hs, hk = import_kan_head(sd, head)
        params["classifier"] = hp
        if hs:
            stats["classifier"] = hs
        if hk:
            kan_state["classifier"] = hk
    variables = {"batch_stats": stats}
    if kan_state:
        variables["kan_state"] = kan_state
    return params, variables


# --- CrossMamba / fusion family importers ------------------------------------

def _crossmamba(sd, p, nheads: int):
    """CrossMamba dual-input core (`CrossMamba_fusion_2b2.py:54-385`).
    The reference also constructs an unused standard in_proj/conv2d pair
    (`:121,138`) — dead weights, skipped here."""
    K = 4
    return {
        "skip_in_proj": _dense(sd, p + ".skip_in_proj"),
        "xs_in_proj": _dense(sd, p + ".xs_in_proj"),
        "BCdts_in_proj": _dense(sd, p + ".BCdts_in_proj"),
        "xs_conv2d": _conv2d(sd, p + ".xs_conv2d"),
        "BCdts_conv2d": _conv2d(sd, p + ".BCdts_conv2d"),
        "dt_bias": np.asarray(sd[p + ".dt_bias"]),
        "A_logs": np.asarray(sd[p + ".A_logs"]).reshape(K, nheads),
        "Ds": np.asarray(sd[p + ".Ds"]).reshape(K, nheads),
        "norm_weight": np.asarray(sd[p + ".norm.weight"]),
        "out_proj": _dense(sd, p + ".out_proj"),
    }


def _stack_pair(t1, t2):
    """Stack two structurally-identical subtrees on a new leading axis.

    The fusion U-Net runs its two branch streams through ONE vmapped
    SSConvBlock per depth (`crossmamba.SSConvBlockPair`), so the
    reference's separate blocks1/blocks2 weights import as [2, ...]
    stacked leaves."""
    import jax
    return jax.tree_util.tree_map(
        lambda a, b: np.stack([np.asarray(a), np.asarray(b)]), t1, t2)


def _stack_depth(trees):
    """Stack per-depth subtrees on a new leading axis (the U-Net stages
    scan their block pairs over depth — `crossmamba._block_stack_pair` —
    so leaves end up [depth, 2, ...])."""
    import jax
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *trees)


def _ssconv_blocks(sd, p, n, dim, headdim, branch):
    """blocks{branch}.{j} SS_Conv_SSD list -> blocks{branch}_{j} subtrees."""
    params, stats = {}, {}
    nheads = dim // headdim            # d_model = dim//2, d_inner = dim
    for j in range(n):
        q = f"{p}.blocks{branch}.{j}"
        cb_p, cb_s = _conv_branch(sd, q + ".conv33conv33conv11")
        sa_p, _ = _ss2d_ssd(sd, q + ".self_attention", nheads)
        params[f"blocks{branch}_{j}"] = {
            "ln_1": _ln(sd, q + ".ln_1"),
            "self_attention": sa_p,
            "conv_branch": cb_p,
        }
        stats[f"blocks{branch}_{j}"] = {"conv_branch": cb_s}
    return params, stats


def _expand(sd, p):
    return {"expand": {"kernel": _t(sd[p + ".expand.weight"])},
            "norm": _ln(sd, p + ".norm")}


def _merging(sd, p):
    return {"norm": _ln(sd, p + ".norm"),
            "reduction": {"kernel": _t(sd[p + ".reduction.weight"])}}


def import_vfefm_state_dict(sd, depths=(2, 2, 4, 2),
                            depths_decoder=(2, 9, 2, 2),
                            dims=(128, 256, 512, 1024), headdim: int = 64,
                            single_decoder: bool = False):
    """CrossMamba fusion U-Net VFEFM state_dict -> (params, batch_stats)
    (`CrossMamba_fusion_2b2.py:1078-1285`; `_2c1` with single_decoder)."""
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}
    dims_dec = tuple(reversed(dims))
    params: dict = {}
    stats: dict = {}
    for b in (1, 2):
        params[f"patch_embed{b}"] = {"proj": _conv2d(sd, f"patch_embed{b}.proj"),
                                     "norm": _ln(sd, f"patch_embed{b}.norm")}
    for i, depth in enumerate(depths):
        p = f"layers.{i}"
        lp, ls = {}, {}
        b1p, b1s = _ssconv_blocks(sd, p, depth, dims[i], headdim, 1)
        b2p, b2s = _ssconv_blocks(sd, p, depth, dims[i], headdim, 2)
        lp["blocks"] = {"block": _stack_depth(
            [_stack_pair(b1p[f"blocks1_{j}"], b2p[f"blocks2_{j}"])
             for j in range(depth)])}
        ls["blocks"] = {"block": _stack_depth(
            [_stack_pair(b1s[f"blocks1_{j}"], b2s[f"blocks2_{j}"])
             for j in range(depth)])}
        if f"{p}.cat_proj.weight" in sd:
            lp["cat_proj"] = _dense(sd, p + ".cat_proj")
        lp["fusion"] = _crossmamba(sd, p + ".fusion",
                                   2 * dims[i] // headdim)
        for b in (1, 2):
            if f"{p}.downsample{b}.reduction.weight" in sd:
                lp[f"downsample{b}"] = _merging(sd, f"{p}.downsample{b}")
        params[f"layers_{i}"] = lp
        stats[f"layers_{i}"] = ls
    if single_decoder:
        # `_2c1`: ONE Linear bridge on the concat; single-stream decoder
        # (upsample / cat_down / in_proj / blocks, no decoder fusion); the
        # file's norm/final_cat_proj exist but its forward never uses them
        params["bridge"] = _dense(sd, "bridge")
        for j, depth in enumerate(depths_decoder):
            p = f"layers_up.{j}"
            ups = j < len(depths_decoder) - 1
            block_dim = dims_dec[j] // 2 if ups else dims_dec[j]
            lp, ls = {}, {}
            nheads = block_dim // headdim
            for k in range(depth):
                q = f"{p}.blocks.{k}"
                cb_p, cb_s = _conv_branch(sd, q + ".conv33conv33conv11")
                sa_p, _ = _ss2d_ssd(sd, q + ".self_attention", nheads)
                lp[f"blocks_{k}"] = {"ln_1": _ln(sd, q + ".ln_1"),
                                     "self_attention": sa_p,
                                     "conv_branch": cb_p}
                ls[f"blocks_{k}"] = {"conv_branch": cb_s}
            if f"{p}.upsample.expand.weight" in sd:
                lp["upsample"] = _expand(sd, f"{p}.upsample")
            if f"{p}.cat_down.weight" in sd:
                lp["cat_down"] = _dense(sd, f"{p}.cat_down")
                lp["in_proj"] = _dense(sd, f"{p}.in_proj")
            params[f"layers_up_{j}"] = lp
            stats[f"layers_up_{j}"] = ls
        params["final_expand"] = _expand(sd, "final_expand")
        params["final_conv"] = _conv2d(sd, "final_conv")
        return params, stats

    params["bridge1"] = _conv2d(sd, "bridge1")
    params["bridge2"] = _conv2d(sd, "bridge2")
    for j, depth in enumerate(depths_decoder):
        p = f"layers_up.{j}"
        ups = j < len(depths_decoder) - 1
        block_dim = dims_dec[j] // 2 if ups else dims_dec[j]
        lp, ls = {}, {}
        b1p, b1s = _ssconv_blocks(sd, p, depth, block_dim, headdim, 1)
        b2p, b2s = _ssconv_blocks(sd, p, depth, block_dim, headdim, 2)
        lp["blocks"] = {"block": _stack_depth(
            [_stack_pair(b1p[f"blocks1_{k}"], b2p[f"blocks2_{k}"])
             for k in range(depth)])}
        ls["blocks"] = {"block": _stack_depth(
            [_stack_pair(b1s[f"blocks1_{k}"], b2s[f"blocks2_{k}"])
             for k in range(depth)])}
        for b in (1, 2):
            if f"{p}.upsample{b}.expand.weight" in sd:
                lp[f"upsample{b}"] = _expand(sd, f"{p}.upsample{b}")
            if f"{p}.in_proj{b}.weight" in sd:
                lp[f"in_proj{b}"] = _dense(sd, f"{p}.in_proj{b}")
        if f"{p}.cat_proj.weight" in sd:
            lp["cat_proj"] = _dense(sd, p + ".cat_proj")
        lp["fusion"] = _crossmamba(sd, p + ".fusion",
                                   2 * block_dim // headdim)
        params[f"layers_up_{j}"] = lp
        stats[f"layers_up_{j}"] = ls
    params["norm"] = _ln(sd, "norm")
    params["final_cat_proj"] = _dense(sd, "final_cat_proj")
    params["final_expand"] = _expand(sd, "final_expand")
    params["final_conv"] = _conv2d(sd, "final_conv")
    return params, stats


def import_cross_classifier_state_dict(sd, depths=(2, 2, 4, 2),
                                       dims=(128, 256, 512, 1024),
                                       headdim: int = 64,
                                       fuse_mode: str = "stage3"):
    """Dual-branch CrossMamba classifier state_dicts
    (`CrossMamba_3e1f1eadd.py:755-987` fuse_mode='stage3',
    `CrossMamba_3e1fadd1e.py:821-987` 'stage3_merged',
    `CrossMamba_4ef.py:756-867` 'all') -> (params, batch_stats)."""
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}
    for b in (1, 2):
        params[f"patch_embed{b}"] = {"proj": _conv2d(sd, f"patch_embed{b}.proj"),
                                     "norm": _ln(sd, f"patch_embed{b}.norm")}

    def blocks_at(prefix_fmt, i, depth, dim, branch, my_branch):
        # reference nests blocks in per-stage layer modules
        out_p, out_s = {}, {}
        nheads = dim // headdim
        for j in range(depth):
            q = prefix_fmt.format(i=i, j=j)
            cb_p, cb_s = _conv_branch(sd, q + ".conv33conv33conv11")
            sa_p, _ = _ss2d_ssd(sd, q + ".self_attention", nheads)
            out_p[f"layers{my_branch}_{i}_blocks_{j}"] = {
                "ln_1": _ln(sd, q + ".ln_1"),
                "self_attention": sa_p,
                "conv_branch": cb_p,
            }
            out_s[f"layers{my_branch}_{i}_blocks_{j}"] = {"conv_branch": cb_s}
        return out_p, out_s

    nl = len(depths)
    n_two_branch = nl if fuse_mode == "all" else nl - 1
    for i in range(nl):
        for b in (1, 2):
            if i >= n_two_branch and fuse_mode == "stage3_merged":
                continue
            if fuse_mode == "all":
                # 4ef: one layers list, per-Layer blocks1/blocks2
                pf = f"layers.{i}.blocks{b}.{{j}}"
            else:
                # stage3 variants: two per-branch layers1/layers2 lists
                pf = f"layers{b}.{i}.blocks.{{j}}"
            bp, bs = blocks_at(pf, i, depths[i], dims[i], b, b)
            params.update(bp)
            stats.update(bs)
    if fuse_mode == "stage3_merged":
        # shared stage 4 lives in `fused_layer` (`CrossMamba_3e1fadd1e.py:76`)
        bp, bs = blocks_at(f"fused_layer.blocks.{{j}}", nl - 1,
                           depths[-1], dims[-1], 0, 0)
        params.update(bp)
        stats.update(bs)
        params["downsample"] = _merging(sd, "downsample")
    if fuse_mode == "all":
        # `CrossMamba_4ef.py`: ONE layers list; each Layer owns blocks1/2,
        # cat_proj, fusion, downsample1/2; tail = before_head_proj on concat
        for i in range(nl):
            params[f"fusion_{i}"] = _crossmamba(sd, f"layers.{i}.fusion",
                                                2 * dims[i] // headdim)
            if f"layers.{i}.cat_proj.weight" in sd:
                params[f"cat_proj_{i}"] = _dense(sd, f"layers.{i}.cat_proj")
            for b in (1, 2):
                if f"layers.{i}.downsample{b}.reduction.weight" in sd:
                    params[f"down{b}_{i}"] = _merging(
                        sd, f"layers.{i}.downsample{b}")
        params["before_head_proj"] = _dense(sd, "before_head_proj")
    else:
        params["fusion"] = _crossmamba(sd, "fusion", 2 * dims[-2] // headdim)
        if "cat_proj.weight" in sd:
            params["cat_proj"] = _dense(sd, "cat_proj")
        for b in (1, 2):
            if f"downsample{b}.reduction.weight" in sd:
                params[f"downsample{b}"] = _merging(sd, f"downsample{b}")
        # per-stage downsamples inside the two-branch encoder
        for i in range(nl - 2):
            for b in (1, 2):
                key = f"layers{b}.{i}.downsample.reduction.weight"
                if key in sd:
                    params[f"down{b}_{i}"] = _merging(sd,
                                                      f"layers{b}.{i}.downsample")
    params["head"] = _dense(sd, "head")
    return params, stats


# --- FusionMamba (vendored VSSM_Fusion) importer ------------------------------

def _ldc(sd, p):
    """LDC / Enhancement_texture_LDC (`cross.py:790-840`): conv weight +
    learnable_mask [out,in] (ours [in,out]) + theta.  base_mask is a fixed
    ones buffer; Differential_enhance.lastconv is defined but never used."""
    return {"kernel": _conv(sd[p + ".conv.weight"]),
            "learnable_mask": _t(sd[p + ".learnable_mask"]),
            "learnable_theta": np.asarray(sd[p + ".learnable_theta"])}


def _eca(sd, p):
    """eca_layer (`cross.py:1233-1259`): Conv1d(1,1,k) -> flax Conv kernel
    [k, 1, 1]."""
    w = np.asarray(sd[p + ".conv.weight"])                  # [1, 1, k]
    return {"conv": {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}}


def _scan_params(sd, p, d_inner, d_state):
    K = 4
    return {
        "x_proj_weight": np.asarray(sd[p + ".x_proj_weight"]),
        "dt_projs_weight": np.asarray(sd[p + ".dt_projs_weight"]),
        "dt_projs_bias": np.asarray(sd[p + ".dt_projs_bias"]),
        "A_logs": np.asarray(sd[p + ".A_logs"]).reshape(K, d_inner, d_state),
        "Ds": np.asarray(sd[p + ".Ds"]).reshape(K, d_inner),
    }


def _ss2d_efficient(sd, p, d_model, d_state=16):
    """cross.py SS2D (v2 / EfficientScan core, `cross.py:417-743`)."""
    d_expand = 2 * d_model
    return {
        "in_proj": _dense(sd, p + ".in_proj"),
        "conv2d": _conv2d(sd, p + ".conv2d"),
        "scan": _scan_params(sd, p, d_expand, d_state),
        "out_norm": _ln(sd, p + ".out_norm"),
        "out_proj": _dense(sd, p + ".out_proj"),
    }


def _biattn(sd, p):
    return {"norm": _ln(sd, p + ".norm"),
            "global_reduce": _dense(sd, p + ".global_reduce"),
            "channel_select": _dense(sd, p + ".channel_select")}


def _vssblock_new(sd, p, dim, d_state=16):
    """VSSBlock_new (`cross.py:1297-1380`)."""
    return {
        "norm": _ln(sd, p + ".norm"),
        "op": _ss2d_efficient(sd, p + ".op", dim, d_state),
        "channel_attn": _eca(sd, p + ".self_attention_cross_channel"),
        "conv_branch": _ldc(sd, p + ".conv_branch"),
        "se": _biattn(sd, p + ".se"),
        "norm2": _ln(sd, p + ".norm2"),
        "mlp_fc1": _dense(sd, p + ".mlp.fc1"),
        "mlp_fc2": _dense(sd, p + ".mlp.fc2"),
    }


def import_vssm_fusion_state_dict(sd, depths=(2, 2, 9, 2),
                                  depths_decoder=(2, 9, 2, 2),
                                  dims=(96, 192, 384, 768),
                                  d_state: int = 16):
    """Vendored FusionMamba VSSM_Fusion (`vmamba_Fusion_efficross.py:753-929`)
    state_dict -> params for models/fusionmamba.py::VSSMFusion.

    NB the reference passes d_state into VSSBlock_new as ``d_state`` but the
    block's kwarg is ``ssm_d_state``, so every block runs its d_state=16
    default regardless (`vmamba_Fusion_efficross.py:657`, `cross.py:1304`).
    """
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}
    dims_dec = tuple(reversed(dims))
    params: dict = {}
    for b in (1, 2):
        params[f"patch_embed{b}"] = {"proj": _conv2d(sd, f"patch_embed{b}.proj"),
                                     "norm": _ln(sd, f"patch_embed{b}.norm")}
    for i, depth in enumerate(depths):
        for j in range(depth):
            params[f"layers_{i}_blocks_{j}"] = _vssblock_new(
                sd, f"layers.{i}.blocks.{j}", dims[i])
        if f"layers.{i}.downsample.reduction.weight" in sd:
            params[f"layers_{i}_downsample"] = _merging(
                sd, f"layers.{i}.downsample")
    for i, depth in enumerate(depths_decoder):
        for j in range(depth):
            params[f"layers_up_{i}_blocks_{j}"] = _vssblock_new(
                sd, f"layers_up.{i}.blocks.{j}", dims_dec[i])
        if f"layers_up.{i}.upsample.expand.weight" in sd:
            params[f"layers_up_{i}_upsample"] = _expand(
                sd, f"layers_up.{i}.upsample")
    for i, dim in enumerate(dims):
        p = f"Cross_block.{i}"
        params[f"cross_block_{i}"] = {
            "ln_1": _ln(sd, p + ".ln_1"),
            "ln_2": _ln(sd, p + ".ln_2"),
            "cross_layer": {
                "texture_enhance1": _ldc(sd, p + ".Cross_layer.texture_enhance1"),
                "texture_enhance2": _ldc(sd, p + ".Cross_layer.texture_enhance2"),
            },
            "self_attention_cross": {
                "in_proj1": _dense(sd, p + ".self_attention_cross.in_proj1"),
                "in_proj2": _dense(sd, p + ".self_attention_cross.in_proj2"),
                "conv2d": _conv2d(sd, p + ".self_attention_cross.conv2d"),
                "scan": _scan_params(sd, p + ".self_attention_cross",
                                     2 * dim, d_state),
                "out_norm": _ln(sd, p + ".self_attention_cross.out_norm"),
                "out_proj": _dense(sd, p + ".self_attention_cross.out_proj"),
            },
            "eca": _eca(sd, p + ".self_attention_cross_spatial"),
        }
    params["final_up"] = _expand(sd, "final_up")
    params["final_conv"] = _conv2d(sd, "final_conv")
    return params
