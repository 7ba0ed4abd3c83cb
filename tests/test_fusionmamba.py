"""FusionMamba (EfficientScan) family tests on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_classification_tpu.models.fusionmamba import (
    BiAttn, CrossLayer, LDCConv, SS2DCrossEfficient, SS2DEfficient,
    VSSBlockCrossNew, VSSBlockNew, VSSMFusion,
)
from medical_image_classification_tpu.models.registry import (
    available_fusion_models, create_fusion_model,
)


def _apply(m, *x, has_train=True):
    kw = {"train": False} if has_train else {}
    v = m.init({"params": jax.random.PRNGKey(0)}, *x, **kw)
    v = {k: w for k, w in v.items() if k not in ("perturbations",)}
    return m.apply(v, *x, **kw), v


def test_ss2d_efficient_shapes():
    m = SS2DEfficient(d_model=8, d_state=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8))
    y, _ = _apply(m, x)
    assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))


def test_ss2d_cross_efficient():
    m = SS2DCrossEfficient(d_model=8, d_state=4)
    x1 = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8))
    y, v = _apply(m, x1, x2)
    assert y.shape == x1.shape
    # cross input matters
    y2 = m.apply(v, x1, x2 * 2.0, train=False)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_ldc_and_blocks():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 6))
    y, _ = _apply(LDCConv(6), x, has_train=False)
    assert y.shape == (1, 8, 8, 6)
    y, _ = _apply(BiAttn(), x, has_train=False)
    assert y.shape == x.shape
    f1, _ = _apply(CrossLayer(6), x, x, x, has_train=False)
    assert f1[0].shape == x.shape and f1[1].shape == x.shape


def test_vss_blocks():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8))
    y, _ = _apply(VSSBlockNew(8, d_state=4), x)
    assert y.shape == x.shape
    y, _ = _apply(VSSBlockCrossNew(8, d_state=4), x, x)
    assert y.shape == x.shape


def test_vssm_fusion_unet():
    m = VSSMFusion(depths=(1, 1), depths_decoder=(1, 1), dims=(8, 16),
                   dims_decoder=(16, 8), d_state=4, drop_path_rate=0.0)
    x1 = jnp.ones((1, 32, 32, 1)) * 0.4
    x2 = jnp.ones((1, 32, 32, 1)) * 0.6
    y, _ = _apply(m, x1, x2)
    assert y.shape == (1, 32, 32, 1)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_fusion_registry():
    names = available_fusion_models()
    for n in ["vfefm_2b2", "vfefm_2c1", "cross_cls_stage3", "cross_cls_4ef",
              "fusionmamba"]:
        assert n in names


def test_vssm_fusion_bf16_compute():
    """bf16 compute dtype on the FusionMamba U-Net: fp32 params, fp32 fused
    image, output tracks the fp32 result with the same weights."""
    m32 = VSSMFusion(depths=(1, 1), depths_decoder=(1, 1), dims=(8, 16),
                     dims_decoder=(16, 8), d_state=4, drop_path_rate=0.0)
    x1 = jnp.ones((1, 32, 32, 1)) * 0.4
    x2 = jnp.ones((1, 32, 32, 1)) * 0.6
    vars_ = m32.init({"params": jax.random.PRNGKey(0)}, x1, x2, train=False)
    out32 = m32.apply(vars_, x1, x2, train=False)
    m16 = VSSMFusion(depths=(1, 1), depths_decoder=(1, 1), dims=(8, 16),
                     dims_decoder=(16, 8), d_state=4, drop_path_rate=0.0,
                     dtype=jnp.bfloat16)
    out16 = m16.apply(vars_, x1, x2, train=False)
    assert out16.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out16)))
    # bf16 rounding compounds through the content-fuse (x1*x2+x1+x2) and
    # LDC/MLP stacks: assert agreement in distribution, not elementwise
    a = np.asarray(out32).ravel()
    b = np.asarray(out16).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.99
    assert float(np.mean(np.abs(a - b))) < 0.1 * (float(np.std(a)) + 1e-6)
