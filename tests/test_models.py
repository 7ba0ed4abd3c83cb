"""Model smoke tests: init + forward on tiny shapes for every zoo entry.

Mirrors the reference's per-file smoke checks (`MedMamba.py:769-773`) but
actually runs in CI, on small inputs (32x32) so CPU tests stay fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_classification_tpu.models import create_model, available_models


def _init_and_forward(model, x, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    vars_ = model.init(rngs, x, train=False)
    extra = {}
    if train:
        out, updates = model.apply(
            vars_, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return out, vars_, updates
    out = model.apply(vars_, x, train=False)
    return out, vars_, extra


# small-shape configs: override dims/depths so CPU tests stay cheap
SMALL = dict(depths=(1, 1), dims=(16, 32), drop_path_rate=0.1,
             ssd_headdim=8)


@pytest.mark.parametrize("name,kw", [
    ("medmamba", dict(**SMALL, d_state=4)),
    ("medssd", dict(**SMALL, d_state=8)),
    ("cnn_mamba", dict(**SMALL, d_state=8)),
    ("cnn_mamba_mifa", dict(**SMALL, d_state=8)),
    ("st_ssd", dict(**SMALL, d_state=8, st_tokens=(8, 4))),
    ("kanin_ssd", dict(**SMALL, d_state=8)),
    ("kanout_ssd", dict(**SMALL, d_state=8)),
    ("medssd_ekan", dict(**SMALL, d_state=8)),
    ("medssd_okan", dict(**SMALL, d_state=8)),
    ("medssd_kan", dict(**SMALL, d_state=8)),
    ("medssd_kanmodule", dict(**SMALL, d_state=8)),
    ("medssd_3kan", dict(**SMALL, d_state=8)),
])
def test_model_forward(name, kw):
    # headdim must divide d_inner = dims[0]//2 * 2 = 16 for ssd
    if name != "medmamba":
        kw = dict(kw)
    model = create_model(name, num_classes=5, **kw)
    x = jnp.ones((2, 32, 32, 3))
    out, vars_, _ = _init_and_forward(model, x)
    assert out.shape == (2, 5)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_train_mode_updates_batch_stats():
    model = create_model("medmamba", num_classes=3, **SMALL, d_state=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    out, vars_, updates = _init_and_forward(model, x, train=True)
    assert "batch_stats" in updates
    # running stats must have moved away from init
    leaves = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(bool(jnp.any(l != 0) and jnp.any(l != 1)) for l in leaves)


def test_gradients_flow_to_scan_params():
    model = create_model("medmamba", num_classes=3, **SMALL, d_state=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    vars_ = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)

    def loss(p):
        out = model.apply({**vars_, "params": p}, x, train=False)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(vars_["params"])
    a_grad = g["layers_0"]["blocks_0"]["self_attention"]["A_logs"]
    assert bool(jnp.any(a_grad != 0)), "scan A_log got no gradient"
    dt_grad = g["layers_0"]["blocks_0"]["self_attention"]["dt_projs_bias"]
    assert bool(jnp.any(dt_grad != 0))


def test_remat_matches_no_remat():
    kw = dict(depths=(1, 1), dims=(16, 32), d_state=4, drop_path_rate=0.0)
    m1 = create_model("medmamba", num_classes=3, **kw)
    m2 = create_model("medmamba", num_classes=3, **kw, use_checkpoint=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    v = m1.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    y1 = m1.apply(v, x, train=False)
    y2 = m2.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5,
                               atol=1e-5)


def test_intermediates_for_gradcam():
    model = create_model("medmamba", num_classes=3, **SMALL, d_state=4)
    x = jnp.ones((1, 32, 32, 3))
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out, inter = model.apply(vars_, x, train=False, mutable=["intermediates"])
    stages = inter["intermediates"]
    assert "layers_0" in stages and "layers_1" in stages
    s0 = stages["layers_0"]["stage_out"][0]
    assert s0.shape == (1, 8, 8, 16)   # 32/4 patches, dim 16


def test_registry_lists_all():
    assert len(available_models()) >= 12


def test_pallas_fused_impl_degrades_gracefully():
    """scan_impl='pallas_fused' at shapes the fused kernel does not support
    must fall back to the normal dispatch ladder, not crash (regression:
    the raw impl string used to reach selective_scan() -> ValueError)."""
    model = create_model("medmamba", num_classes=5, d_state=4,
                         scan_impl="pallas_fused", **SMALL)
    x = jnp.ones((2, 32, 32, 3))
    out, _, _ = _init_and_forward(model, x)
    assert out.shape == (2, 5)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_wmf_merge_collapse_matches_explicit():
    """The production ST tail computes sum_k w_k STF(z, STL(y_k)) as
    sum(w)*weighted + Z @ (sum_k w_k U_k) — STF is affine in U, so the
    collapsed form (one [B,P,P] matmul instead of four) must match the
    explicit four-call merge (`/root/reference/st_mamba/ST_SSD.py:632-655`)."""
    from medical_image_classification_tpu.models.ss2d_modules import STL, STF
    B, L, C, Cin, p = 2, 16, 12, 6, 4
    rng = jax.random.PRNGKey(0)
    y4 = jax.random.normal(rng, (B, 4, L, C))
    z_feat = jax.random.normal(jax.random.PRNGKey(1), (B, L, Cin))
    kw = jax.random.normal(jax.random.PRNGKey(2), (4,))
    stl = STL(p=p, channels=C)
    stf = STF(p=p, channels=C)
    vl = stl.init(jax.random.PRNGKey(3), y4[:, 0])
    vf = stf.init(jax.random.PRNGKey(4), z_feat, jnp.zeros((B, p * p, C)))
    w = jax.nn.softmax(kw)
    explicit = sum(wi * stf.apply(vf, z_feat, stl.apply(vl, y4[:, k]))
                   for k, wi in enumerate(w))
    U4 = stl.apply(vl, y4.reshape(B * 4, L, C)).reshape(B, 4, p * p, C)
    U_m = jnp.einsum("k,bkpc->bpc", w, U4)
    collapsed = stf.apply(vf, z_feat, U_m, u_scale=jnp.sum(w))
    np.testing.assert_allclose(np.asarray(collapsed), np.asarray(explicit),
                               rtol=1e-5, atol=1e-5)


def test_st_ssd_bf16_compute_dtype():
    """The ST tail (STL/STF/o_linear) must run in the model compute dtype —
    fp32 params used to silently promote the quadratic [B, L, p^2] token
    matmuls to fp32 (2x MXU time + 2x HBM for the stage-0 mixer)."""
    kw = dict(**SMALL, d_state=8, st_tokens=(8, 4))
    m16 = create_model("st_ssd", num_classes=5, dtype=jnp.bfloat16, **kw)
    m32 = create_model("st_ssd", num_classes=5, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = m32.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    y16 = m16.apply(v, x, train=False)
    y32 = m32.apply(v, x, train=False)
    assert bool(jnp.all(jnp.isfinite(y16)))
    # same weights, bf16 compute: logits agree to bf16 tolerance
    np.testing.assert_allclose(np.asarray(y16, np.float32),
                               np.asarray(y32, np.float32),
                               rtol=0.12, atol=0.12)
