"""Interpret-mode golden tests for the fused STL token-mixer kernel.

Reference = the XLA formulation the kernel replaces (models/ss2d_modules.py
STL): U = softmax_P(w @ u1)^T @ (w @ u2).  Tolerance ladder follows the
reference kernel test style (`test_selective_scan.py:398-400`): fp32 tight,
bf16 loose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_classification_tpu.kernels import stl_mixer_pallas as smp


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(smp, "_INTERPRET", True)


def _ref(w, u1, u2):
    S = (w @ u1).astype(jnp.float32)
    A = jax.nn.softmax(S, axis=-1).astype(w.dtype)
    V = w @ u2
    return jnp.einsum("blp,blc->bpc", A, V)


def _make(rng, BB, L, P, C, dtype):
    kw, k1, k2 = jax.random.split(rng, 3)
    w = (jax.random.normal(kw, (BB, L, C)) * 0.5).astype(dtype)
    u1 = jax.random.uniform(k1, (C, P), minval=-0.08, maxval=0.08).astype(dtype)
    u2 = jax.random.uniform(k2, (C, C), minval=-0.08, maxval=0.08).astype(dtype)
    return w, u1, u2


@pytest.mark.parametrize("BB,L,P,C,dtype,rtol,atol", [
    (2, 256, 384, 128, jnp.float32, 2e-5, 2e-5),
    (1, 512, 256, 128, jnp.float32, 2e-5, 2e-5),   # multiple l-tiles
    (2, 256, 256, 128, jnp.bfloat16, 3e-2, 3e-2),
])
def test_stl_mixer_forward(BB, L, P, C, dtype, rtol, atol):
    w, u1, u2 = _make(jax.random.PRNGKey(0), BB, L, P, C, dtype)
    y = smp.stl_mixer(w, u1, u2)
    y_ref = _ref(w, u1, u2)
    assert y.dtype == w.dtype
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=rtol, atol=atol)


def test_stl_mixer_grads():
    w, u1, u2 = _make(jax.random.PRNGKey(1), 2, 256, 384, 128, jnp.float32)

    def loss(fn, args):
        return jnp.sum(jnp.sin(fn(*args)))

    g = jax.grad(lambda a: loss(smp.stl_mixer, a))((w, u1, u2))
    g_ref = jax.grad(lambda a: loss(_ref, a))((w, u1, u2))
    for gx, gr, name in zip(g, g_ref, ["w", "u1", "u2"]):
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_stl_mixer_grads_bf16_finite_and_close():
    w, u1, u2 = _make(jax.random.PRNGKey(2), 1, 256, 256, 128, jnp.bfloat16)

    def loss(fn, args):
        return jnp.sum(fn(*args).astype(jnp.float32) ** 2)

    g = jax.grad(lambda a: loss(smp.stl_mixer, a))((w, u1, u2))
    g_ref = jax.grad(lambda a: loss(_ref, a))((w, u1, u2))
    for gx, gr, name in zip(g, g_ref, ["w", "u1", "u2"]):
        gx, gr = np.asarray(gx, np.float32), np.asarray(gr, np.float32)
        assert np.all(np.isfinite(gx)), name
        scale = max(np.abs(gr).max(), 1e-3)
        np.testing.assert_allclose(gx / scale, gr / scale, atol=6e-2,
                                   err_msg=name)


def test_pick_lt_and_gate():
    # stage-0 ST-SSD shape: L = P = 3136, C = 256 (bf16)
    assert smp._pick_lt(3136, 3136, 256, 2, bwd=True) is not None
    assert smp.stl_mixer_supported(3136, 3136, 256)
    # stage-1: 784x784x512
    assert smp.stl_mixer_supported(784, 784, 512)
    # too small for the kernel to matter
    assert not smp.stl_mixer_supported(196, 196, 1024)
    # misaligned channels
    assert not smp.stl_mixer_supported(3136, 3136, 192)
