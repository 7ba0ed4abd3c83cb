"""Interpret-mode golden tests for the fused STF Z-gate kernel.

Reference = the XLA formulation it replaces (models/ss2d_modules.py STF):
Y = sigmoid(pooledT @ lz) @ U.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_classification_tpu.kernels import stf_zgate_pallas as szp


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(szp, "_INTERPRET", True)


def _ref(pooledT, lz, U):
    Z = jax.nn.sigmoid(pooledT @ lz)
    return jnp.einsum("bpq,bqc->bpc", Z, U.astype(Z.dtype))


def _make(rng, BB, P, C, dtype):
    kp, kl, ku = jax.random.split(rng, 3)
    pooledT = (jax.random.normal(kp, (BB, P, C)) * 0.5).astype(dtype)
    lz = jax.random.uniform(kl, (C, P), minval=-0.1, maxval=0.1).astype(dtype)
    U = (jax.random.normal(ku, (BB, P, C)) * 0.5).astype(dtype)
    return pooledT, lz, U


@pytest.mark.parametrize("BB,P,C,dtype,rtol,atol", [
    (2, 384, 128, jnp.float32, 2e-5, 2e-5),
    (1, 512, 256, jnp.float32, 2e-5, 2e-5),
    (2, 256, 128, jnp.bfloat16, 5e-2, 5e-1),   # sums over P=256 sigmoids
])
def test_stf_zgate_forward(BB, P, C, dtype, rtol, atol):
    pooledT, lz, U = _make(jax.random.PRNGKey(0), BB, P, C, dtype)
    y = szp.stf_zgate(pooledT, lz, U)
    y_ref = _ref(pooledT, lz, U)
    assert y.dtype == pooledT.dtype
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=rtol, atol=atol)


def test_stf_zgate_grads():
    pooledT, lz, U = _make(jax.random.PRNGKey(1), 2, 384, 128, jnp.float32)

    def loss(fn, args):
        return jnp.sum(jnp.sin(fn(*args)))

    g = jax.grad(lambda a: loss(szp.stf_zgate, a))((pooledT, lz, U))
    g_ref = jax.grad(lambda a: loss(_ref, a))((pooledT, lz, U))
    for gx, gr, name in zip(g, g_ref, ["pooledT", "lz", "U"]):
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_stf_zgate_multi_tile_grads():
    # P // pt > 1 exercises the dlz init-then-accumulate and dU scratch walk
    pooledT, lz, U = _make(jax.random.PRNGKey(2), 1, 1024, 128, jnp.float32)

    def loss(fn, args):
        return jnp.sum(fn(*args) ** 2)

    g = jax.grad(lambda a: loss(szp.stf_zgate, a))((pooledT, lz, U))
    g_ref = jax.grad(lambda a: loss(_ref, a))((pooledT, lz, U))
    for gx, gr, name in zip(g, g_ref, ["pooledT", "lz", "U"]):
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                                   rtol=1e-4, atol=1e-3, err_msg=name)


def test_gate():
    assert szp.stf_zgate_supported(3136, 256)     # stage 0
    assert szp.stf_zgate_supported(784, 512)      # stage 1
    assert not szp.stf_zgate_supported(196, 1024)  # too small
    assert not szp.stf_zgate_supported(3136, 192)  # C % 128
