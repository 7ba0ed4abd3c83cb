"""CrossMamba fusion family tests (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_classification_tpu.models.crossmamba import (
    CrossMamba, CrossVSSMClassifier, FusionVFEFM,
)


def _init_apply(model, *inputs, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    vars_ = model.init(rngs, *inputs, train=False)
    vars_ = {k: v for k, v in vars_.items()
             if k not in ("perturbations", "intermediates")}
    if train:
        return model.apply(vars_, *inputs, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
    return model.apply(vars_, *inputs, train=False), vars_


def test_crossmamba_core_dual_output():
    m = CrossMamba(d_model=8, d_state=4, headdim=4)
    rng = jax.random.PRNGKey(0)
    u1 = jax.random.normal(rng, (2, 8, 8, 8))
    u2 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    cat = 0.5 * (u1 + u2)
    (o1, o2), vars_ = _init_apply(m, u1, u2, cat, cat)
    assert o1.shape == u1.shape and o2.shape == u2.shape
    assert bool(jnp.all(jnp.isfinite(o1))) and bool(jnp.all(jnp.isfinite(o2)))
    # branches share weights but see different inputs -> different outputs
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_crossmamba_cross_conditioning_matters():
    """(B,C,dt) come from the cross input: changing it must change out1."""
    m = CrossMamba(d_model=8, d_state=4, headdim=4)
    rng = jax.random.PRNGKey(0)
    u1 = jax.random.normal(rng, (1, 8, 8, 8))
    u2 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8))
    vars_ = m.init({"params": jax.random.PRNGKey(2)}, u1, u2, u2, u1,
                   train=False)
    o1a, _ = m.apply(vars_, u1, u2, u2, u1, train=False)
    o1b, _ = m.apply(vars_, u1, u2, u2 * 2.0, u1, train=False)
    assert not np.allclose(np.asarray(o1a), np.asarray(o1b))


FUSION_SMALL = dict(depths=(1, 1), dims=(8, 16), depths_decoder=(1, 1),
                    dims_decoder=(16, 8), d_state=4, ssd_headdim=4,
                    drop_path_rate=0.0)


def test_fusion_unet_output_shape():
    m = FusionVFEFM(**FUSION_SMALL)
    x1 = jnp.ones((1, 32, 32, 3)) * 0.5
    x2 = jnp.ones((1, 32, 32, 3)) * 0.3
    out, vars_ = _init_apply(m, x1, x2)
    assert out.shape == (1, 32, 32, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_fusion_unet_single_decoder():
    m = FusionVFEFM(**FUSION_SMALL, single_decoder=True)
    x1 = jnp.ones((1, 32, 32, 3)) * 0.5
    x2 = jnp.ones((1, 32, 32, 3)) * 0.3
    out, _ = _init_apply(m, x1, x2)
    assert out.shape == (1, 32, 32, 1)


@pytest.mark.parametrize("mode", ["stage3", "stage3_merged", "all"])
def test_cross_classifier(mode):
    m = CrossVSSMClassifier(num_classes=5, depths=(1, 1, 1, 1),
                            dims=(8, 16, 32, 64), d_state=4, ssd_headdim=4,
                            fuse_mode=mode, drop_path_rate=0.0)
    x1 = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out, _ = _init_apply(m, x1, x2)
    assert out.shape == (2, 5)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_fusion_grads_flow():
    m = FusionVFEFM(**FUSION_SMALL)
    x1 = jnp.ones((1, 32, 32, 3)) * 0.5
    x2 = jnp.ones((1, 32, 32, 3)) * 0.3
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, x1, x2, train=False)

    def loss(p):
        out = m.apply({"params": p, "batch_stats": vars_["batch_stats"]},
                      x1, x2, train=False)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(vars_["params"])
    fusion_g = g["layers_0"]["fusion"]["A_logs"]
    assert bool(jnp.any(fusion_g != 0))


def test_fusion_unet_four_stage_default_wiring():
    """4-stage decoder skip selection (the default depths) must build —
    regression for the skip-level indexing bug."""
    m = FusionVFEFM(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                    depths_decoder=(1, 1, 1, 1), dims_decoder=(64, 32, 16, 8),
                    d_state=4, ssd_headdim=4, drop_path_rate=0.0)
    x1 = jnp.ones((1, 64, 64, 3)) * 0.4
    x2 = jnp.ones((1, 64, 64, 3)) * 0.6
    out, _ = _init_apply(m, x1, x2)
    assert out.shape == (1, 64, 64, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_fusion_unet_bf16_compute():
    """bf16 compute dtype: params stay fp32, fused image comes back fp32,
    and the result tracks the fp32 output (same weights)."""
    x1 = jnp.ones((1, 32, 32, 3)) * 0.5
    x2 = jnp.ones((1, 32, 32, 3)) * 0.3
    m32 = FusionVFEFM(**FUSION_SMALL)
    vars_ = m32.init({"params": jax.random.PRNGKey(0)}, x1, x2, train=False)
    leaves = jax.tree_util.tree_leaves(vars_["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    out32 = m32.apply(vars_, x1, x2, train=False)
    m16 = FusionVFEFM(**FUSION_SMALL, dtype=jnp.bfloat16)
    out16 = m16.apply(vars_, x1, x2, train=False)
    assert out16.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out16)))
    # bf16 rounding compounds through the content-fuse/LDC stacks: assert
    # the fields agree in distribution, not elementwise
    a = np.asarray(out32).ravel()
    b = np.asarray(out16).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.99
    assert float(np.mean(np.abs(a - b))) < 0.1 * (float(np.std(a)) + 1e-6)


def test_cross_classifier_bf16_compute():
    m32 = CrossVSSMClassifier(num_classes=5, depths=(1, 1, 1, 1),
                              dims=(8, 16, 32, 64), d_state=4, ssd_headdim=4,
                              drop_path_rate=0.0)
    x1 = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    vars_ = m32.init({"params": jax.random.PRNGKey(0)}, x1, x2, train=False)
    out32 = m32.apply(vars_, x1, x2, train=False)
    m16 = CrossVSSMClassifier(num_classes=5, depths=(1, 1, 1, 1),
                              dims=(8, 16, 32, 64), d_state=4, ssd_headdim=4,
                              drop_path_rate=0.0, dtype=jnp.bfloat16)
    out16 = m16.apply(vars_, x1, x2, train=False)
    assert out16.shape == (2, 5)
    assert bool(jnp.all(jnp.isfinite(out16)))
    assert jnp.argmax(out16, -1).tolist() == jnp.argmax(out32, -1).tolist()
