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


def _ss2d_ssd(sd, p, nheads: int):
    """SS2D_with_SSD parameter group (`CNN_Mamba.py:322-564`)."""
    K = 4
    return {
        "in_proj": _dense(sd, p + ".in_proj"),
        "conv2d": _conv2d(sd, p + ".conv2d"),
        "dt_bias": np.asarray(sd[p + ".dt_bias"]),          # already [4, H]
        "A_logs": np.asarray(sd[p + ".A_logs"]).reshape(K, nheads),
        "Ds": np.asarray(sd[p + ".Ds"]).reshape(K, nheads),
        "norm_weight": np.asarray(sd[p + ".norm.weight"]),
        "out_proj": _dense(sd, p + ".out_proj"),
    }


def import_medssd_state_dict(sd: Dict[str, Any], depths=(2, 2, 4, 2),
                             dims=(128, 256, 512, 1024), headdim: int = 64,
                             expand: int = 2,
                             conv_stem: bool = False) -> Tuple[dict, dict]:
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
            layer[f"blocks_{j}"] = {
                "ln_1": _ln(sd, p + ".ln_1"),
                "self_attention": _ss2d_ssd(sd, p + ".self_attention", nheads),
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
