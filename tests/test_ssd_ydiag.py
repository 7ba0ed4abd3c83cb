"""Golden tests for the fused Pallas Y_diag kernel (interpret mode).

Mirrors the reference's kernel-vs-trusted-implementation strategy
(`test_selective_scan.py`): forward values and all input gradients vs a
dense jnp reference, fp32 and bf16, including multi-head-block grids and
the full ssd_chunked integration path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import medical_image_classification_tpu.kernels.ssd as ssd_mod
import medical_image_classification_tpu.kernels.ssd_ydiag_pallas as yd


def _dense_ref(Cc, Bc, acum, dtx):
    """Dense einsum reference of the fused kernel's math (fp32)."""
    Cf = Cc.astype(jnp.float32)
    Bf = Bc.astype(jnp.float32)
    xf = dtx.astype(jnp.float32)
    l = Cc.shape[1]
    scores = jnp.einsum("bln,bsn->bls", Cf, Bf)
    seg = acum[..., :, None] - acum[..., None, :]           # [BC, H, l, l]
    mask = jnp.tril(jnp.ones((l, l), bool))
    E = jnp.where(mask, jnp.exp(seg), 0.0)
    M = scores[:, None] * E                                 # [BC, H, l, l]
    return jnp.einsum("bhls,bhsp->bhlp", M, xf)


def _inputs(BC=2, l=32, N=128, H=4, P=8, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    Cc = jnp.asarray(rng.randn(BC, l, N) * 0.3, dtype)
    Bc = jnp.asarray(rng.randn(BC, l, N) * 0.3, dtype)
    # realistic acum: inclusive cumsum of negative dtA
    dta = -jnp.asarray(rng.rand(BC, H, l) * 0.4, jnp.float32)
    acum = jnp.cumsum(dta, axis=-1)
    dtx = jnp.asarray(rng.randn(BC, H, l, P), dtype)
    return Cc, Bc, acum, dtx


@pytest.fixture(autouse=True)
def _interpret():
    yd._INTERPRET = True
    old_min = yd._MIN_L
    yd._MIN_L = 8            # exercise small interpret-mode shapes
    yield
    yd._INTERPRET = False
    yd._MIN_L = old_min


@pytest.mark.parametrize("dtype,rtol,atol", [
    (jnp.float32, 2e-5, 2e-5), (jnp.bfloat16, 3e-2, 5e-2)])
@pytest.mark.parametrize("l,H,P", [(32, 4, 8), (56, 8, 64), (64, 2, 16)])
def test_ydiag_forward_parity(dtype, rtol, atol, l, H, P):
    args = _inputs(l=l, H=H, P=P, dtype=dtype)
    got = yd.ydiag_fused(*args)
    want = _dense_ref(*args)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=rtol, atol=atol)


def test_ydiag_multi_head_block():
    """Force HB < H so the sequential head-grid accumulation runs."""
    args = _inputs(l=32, H=32, P=8)
    old = yd._VMEM_BUDGET
    try:
        yd._VMEM_BUDGET = 200_000   # tiny: forces HB=8 < H=32
        assert yd._pick_hb(32, 32, 128, 8, 4) == 8
        got = yd.ydiag_fused(*args)
    finally:
        yd._VMEM_BUDGET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(_dense_ref(*args)),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype,rtol,atol", [
    (jnp.float32, 1e-4, 1e-4), (jnp.bfloat16, 5e-2, 5e-2)])
def test_ydiag_grad_parity(dtype, rtol, atol):
    args = _inputs(l=32, H=4, P=8, dtype=dtype)

    def loss_fused(*a):
        return jnp.sum(yd.ydiag_fused(*a).astype(jnp.float32) ** 2)

    def loss_ref(*a):
        return jnp.sum(_dense_ref(*a) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for gf, gr, name in zip(g_fused, g_ref, ["dC", "dB", "dacum", "ddtx"]):
        np.testing.assert_allclose(
            np.asarray(gf, np.float32), np.asarray(gr, np.float32),
            rtol=rtol, atol=atol * max(1.0, float(jnp.abs(gr).max())),
            err_msg=name)


def test_ssd_chunked_uses_fused_kernel_parity():
    """Full ssd_chunked with the fused kernel vs the XLA Y_diag path."""
    rng = np.random.RandomState(3)
    B, L, H, P, N = 2, 96, 4, 8, 128
    x = jnp.asarray(rng.randn(B, L, H, P), jnp.float32)
    dt = jnp.asarray(rng.rand(B, L, H), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.randn(H), jnp.float32) * 0.5)
    Bm = jnp.asarray(rng.randn(B, L, 1, N) * 0.3, jnp.float32)
    Cm = jnp.asarray(rng.randn(B, L, 1, N) * 0.3, jnp.float32)
    D = jnp.ones((H,), jnp.float32)

    def run(x, dt, Bm, Cm):
        return ssd_mod.ssd_chunked(x, dt, A, Bm, Cm, chunk_size=32,
                                   D=D, dt_softplus=True,
                                   adaptive_chunk=False)

    old = ssd_mod._USE_YDIAG_PALLAS
    try:
        ssd_mod._USE_YDIAG_PALLAS = True
        assert yd.ydiag_supported(32, N, P, 1)
        y_fused, g_fused = jax.value_and_grad(
            lambda *a: jnp.sum(run(*a) ** 2), argnums=(0, 1, 2, 3))(
                x, dt, Bm, Cm)
        ssd_mod._USE_YDIAG_PALLAS = False
        y_xla, g_xla = jax.value_and_grad(
            lambda *a: jnp.sum(run(*a) ** 2), argnums=(0, 1, 2, 3))(
                x, dt, Bm, Cm)
    finally:
        ssd_mod._USE_YDIAG_PALLAS = old
    np.testing.assert_allclose(float(y_fused), float(y_xla), rtol=1e-5)
    for gf, gx in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=1e-4, atol=1e-4)
