"""Model zoo: every reference classifier variant as a named config.

The reference ships ~10 near-identical model files; each maps to a config
of the single VSSM skeleton (SURVEY §7.3).  Fusion models (CrossMamba /
FusionMamba) live in ``models/crossmamba.py`` with their own registry hooks.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

from medical_image_classification_tpu.models.vssm import VSSM

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def available_models():
    return sorted(_REGISTRY)


def create_model(name: str, num_classes: int, **kw):
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; available: {available_models()}")
    return _REGISTRY[name](num_classes=num_classes, **kw)


def _build(num_classes, defaults, overrides):
    cfg = dict(defaults)
    cfg.update(overrides)
    return VSSM(num_classes=num_classes, **cfg)


@register("medmamba")
def medmamba(num_classes, **kw):
    """MedMamba (Mamba-1 core), `MedMamba.py:671-767` defaults."""
    return _build(num_classes, dict(depths=(2, 2, 4, 2),
                dims=(96, 192, 384, 768), d_state=16, core="mamba1"), kw)


@register("medmamba_t")
def medmamba_t(num_classes, **kw):
    return medmamba(num_classes, **kw)


@register("medmamba_s")
def medmamba_s(num_classes, **kw):
    """MedMamba-S (paper scaling: deeper stage 3)."""
    return _build(num_classes, dict(depths=(2, 2, 8, 2),
                dims=(96, 192, 384, 768), d_state=16, core="mamba1"), kw)


@register("medmamba_b")
def medmamba_b(num_classes, **kw):
    return _build(num_classes, dict(depths=(2, 2, 12, 2),
                dims=(128, 256, 512, 1024), d_state=16, core="mamba1"), kw)


@register("medssd")
def medssd(num_classes, **kw):
    """MedSSD (Mamba-2/SSD core), `SSD/MedSSD.py` defaults.

    NB the reference's VSSM here defaults d_state=128 (`SSD/MedSSD.py:594`),
    unlike every other SSD-family file (d_state=16); with the reference's
    B/C flattening that makes the effective per-head state K*128=512."""
    return _build(num_classes, dict(depths=(2, 2, 4, 2),
                dims=(128, 256, 512, 1024), d_state=128, core="ssd"), kw)


@register("cnn_mamba")
def cnn_mamba(num_classes, **kw):
    """CNN_Mamba = MedSSD + ConvTConvPW RGB pre-stem (`CNN_Mamba.py:752-852`)."""
    return _build(num_classes, dict(depths=(2, 2, 4, 2),
                dims=(128, 256, 512, 1024), d_state=16, core="ssd",
                conv_stem=True), kw)


@register("cnn_mamba_mifa")
def cnn_mamba_mifa(num_classes, **kw):
    """CNN_Mamba + MIFA feature-interaction block after patch embedding.
    (MIFA is dead, unrunnable code in the reference — `MIFA_block.py:2`;
    rebuilt working and wired here per BASELINE.json config 2.)"""
    return _build(num_classes, dict(depths=(2, 2, 4, 2),
                dims=(128, 256, 512, 1024), d_state=16, core="ssd",
                conv_stem=True, use_mifa=True), kw)


@register("st_ssd")
def st_ssd(num_classes, **kw):
    """ST-SSD: SSD core + semantic-token STL/STF/WMF merge
    (`st_mamba/ST_SSD.py:852-`, ps=[56,28,14,7] at 224 input)."""
    return _build(num_classes, dict(depths=(2, 2, 4, 2),
                dims=(128, 256, 512, 1024), d_state=16, core="ssd",
                st_tokens=(56, 28, 14, 7)), kw)


@register("kanin_ssd")
def kanin_ssd(num_classes, **kw):
    """kaninSSD: eKAN in_proj inside every SS2D (`kanSSD/kaninSSD.py:393-449`)."""
    return _build(num_classes, dict(depths=(2, 2, 4, 2),
                dims=(128, 256, 512, 1024), d_state=16, core="ssd",
                kan_in=True, kan_spline_order=1), kw)


@register("kanout_ssd")
def kanout_ssd(num_classes, **kw):
    """kanoutSSD: eKAN pre-filter before in_proj (`kanSSD/kanoutSSD.py:392-447`)."""
    return _build(num_classes, dict(depths=(2, 2, 4, 2),
                dims=(128, 256, 512, 1024), d_state=16, core="ssd",
                kan_filter=True, kan_spline_order=1), kw)


@register("medssd_ekan")
def medssd_ekan(num_classes, **kw):
    """MedSSD + single eKANLinear head (`medmamba_kan/MedSSD_ekan.py:990-999`)."""
    return _build(num_classes, dict(depths=(2, 2, 4, 2),
                dims=(128, 256, 512, 1024), d_state=16, core="ssd",
                head="ekan", kan_spline_order=3), kw)


@register("medssd_okan")
def medssd_okan(num_classes, **kw):
    """MedSSD + single original-KAN head (`medmamba_kan/MedSSD_okan.py:1242-1254`)."""
    return _build(num_classes, dict(depths=(2, 2, 4, 2),
                dims=(128, 256, 512, 1024), d_state=16, core="ssd",
                head="okan"), kw)


@register("medssd_kan")
def medssd_kan(num_classes, **kw):
    """MedSSD + 3 chained o-KAN head (`medmamba_kan/MedSSD_kan.py:1125-1165`)."""
    return _build(num_classes, dict(depths=(2, 2, 4, 2),
                dims=(128, 256, 512, 1024), d_state=16, core="ssd",
                head="kan_stack"), kw)


@register("medssd_kanmodule")
def medssd_kanmodule(num_classes, **kw):
    """MedSSD + KansModule head (`MedSSD_kan/MedSSD_kan.py:475-502,1155`)."""
    return _build(num_classes, dict(depths=(2, 2, 4, 2),
                dims=(128, 256, 512, 1024), d_state=16, core="ssd",
                head="kan_module"), kw)


@register("medssd_3kan")
def medssd_3kan(num_classes, **kw):
    """MedSSD + 3-KAN KansModule head (`MedSSD_kan/MedSSD_3kan.py:475-505`)."""
    return _build(num_classes, dict(depths=(2, 2, 4, 2),
                dims=(128, 256, 512, 1024), d_state=16, core="ssd",
                head="3kan"), kw)


# --- dual-input fusion / cross models (separate factory: two inputs) --------

_FUSION_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_fusion(name):
    def deco(fn):
        _FUSION_REGISTRY[name] = fn
        return fn
    return deco


def available_fusion_models():
    return sorted(_FUSION_REGISTRY)


def create_fusion_model(name: str, **kw):
    if name not in _FUSION_REGISTRY:
        raise KeyError(f"unknown fusion model '{name}'; "
                       f"available: {available_fusion_models()}")
    return _FUSION_REGISTRY[name](**kw)


@register_fusion("vfefm_2b2")
def vfefm_2b2(**kw):
    """CrossMamba fusion U-Net, dual decoder (`CrossMamba_fusion_2b2.py`)."""
    from medical_image_classification_tpu.models.crossmamba import FusionVFEFM
    return FusionVFEFM(**kw)


@register_fusion("vfefm_2c1")
def vfefm_2c1(**kw):
    """Single-decoder variant (`CrossMamba_fusion_2c1.py`)."""
    from medical_image_classification_tpu.models.crossmamba import FusionVFEFM
    return FusionVFEFM(single_decoder=True, **kw)


@register_fusion("cross_cls_stage3")
def cross_cls_stage3(num_classes=8, **kw):
    """Dual-branch classifier, fusion after stage 3
    (`CrossMamba_3e1f1eadd.py`)."""
    from medical_image_classification_tpu.models.crossmamba import (
        CrossVSSMClassifier)
    kw.setdefault("d_state", 128)        # reference classifier default
    return CrossVSSMClassifier(num_classes=num_classes, fuse_mode="stage3", **kw)


@register_fusion("cross_cls_4ef")
def cross_cls_4ef(num_classes=8, **kw):
    """Dual-branch classifier, fusion at every stage (`CrossMamba_4ef.py`)."""
    from medical_image_classification_tpu.models.crossmamba import (
        CrossVSSMClassifier)
    kw.setdefault("d_state", 128)        # reference classifier default
    return CrossVSSMClassifier(num_classes=num_classes, fuse_mode="all", **kw)


@register_fusion("cross_cls_3e1fadd1e")
def cross_cls_3e1fadd1e(num_classes=8, **kw):
    """Diagram-2 wiring: fused branches added, ONE shared downsample +
    shared stage 4 (`CrossMamba_3e1fadd1e.py:821-987`)."""
    from medical_image_classification_tpu.models.crossmamba import (
        CrossVSSMClassifier)
    kw.setdefault("d_state", 128)        # reference classifier default
    return CrossVSSMClassifier(num_classes=num_classes,
                               fuse_mode="stage3_merged", **kw)


@register_fusion("fusionmamba")
def fusionmamba(**kw):
    """FusionMamba VSSM_Fusion U-Net (`vmamba_Fusion_efficross.py`)."""
    from medical_image_classification_tpu.models.fusionmamba import VSSMFusion
    return VSSMFusion(**kw)
