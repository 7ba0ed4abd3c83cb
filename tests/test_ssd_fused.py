"""Golden tests for the fully fused Pallas SSD kernel (interpret mode).

Forward and all gradients vs the XLA ssd_chunked path and the sequential
golden reference, multi-chunk state handoff included.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import medical_image_classification_tpu.kernels.ssd as ssd_mod
import medical_image_classification_tpu.kernels.ssd_fused_pallas as sf
import medical_image_classification_tpu.kernels.ssd_ydiag_pallas as yd
from medical_image_classification_tpu.kernels.ssd import (
    ssd_chunked,
    ssd_seq_ref,
)


@pytest.fixture(autouse=True)
def _interpret():
    sf._INTERPRET = True
    old = sf._MIN_L
    sf._MIN_L = 8            # exercise small interpret-mode shapes
    yd._INTERPRET = True     # nc==1 fallback path in A/B comparisons
    yield
    sf._INTERPRET = False
    sf._MIN_L = old
    yd._INTERPRET = False


def _inputs(B=2, L=96, H=4, P=8, N=128, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, L, H, P), dtype)
    dt = jnp.asarray(rng.rand(B, L, H), dtype)
    A = -jnp.exp(jnp.asarray(rng.randn(H), jnp.float32) * 0.5)
    Bm = jnp.asarray(rng.randn(B, L, 1, N) * 0.3, dtype)
    Cm = jnp.asarray(rng.randn(B, L, 1, N) * 0.3, dtype)
    D = jnp.asarray(rng.rand(H), jnp.float32)
    bias = jnp.asarray(rng.rand(H), jnp.float32)
    return x, dt, A, Bm, Cm, D, bias


def _run(x, dt, A, Bm, Cm, D, bias, chunk, fused):
    old = ssd_mod._USE_SSD_FUSED
    oldy = ssd_mod._USE_YDIAG_PALLAS
    try:
        ssd_mod._USE_SSD_FUSED = fused
        ssd_mod._USE_YDIAG_PALLAS = False
        return ssd_chunked(x, dt, A, Bm, Cm, chunk_size=chunk, D=D,
                           dt_bias=bias, dt_softplus=True,
                           adaptive_chunk=False)
    finally:
        ssd_mod._USE_SSD_FUSED = old
        ssd_mod._USE_YDIAG_PALLAS = oldy


@pytest.mark.parametrize("dtype,rtol,atol", [
    (jnp.float32, 2e-5, 2e-5), (jnp.bfloat16, 3e-2, 5e-2)])
@pytest.mark.parametrize("L,chunk", [(96, 32), (100, 32), (64, 16)])
def test_fused_forward_vs_xla(dtype, rtol, atol, L, chunk):
    args = _inputs(L=L, dtype=dtype)
    assert sf.ssd_fused_supported(chunk, 128, 8, 1, -(-L // chunk), 4)
    got = _run(*args, chunk=chunk, fused=True)
    want = _run(*args, chunk=chunk, fused=False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=rtol, atol=atol)


def test_fused_small_state_n64(monkeypatch):
    """N=64 (ST-SSD / CNN-Mamba ref_flat) lane-pads to 128: the production
    gate now routes it to the pad-free chunked XLA path (measured 2x faster
    on-device, scripts/ssd_fused_parity.py), but the kernel itself must stay
    numerically exact — fwd and grads vs the XLA path — in case the gate is
    ever widened."""
    x, dt, A, Bm, Cm, D, bias = _inputs(L=96, H=8, P=16, N=64)
    assert not sf.ssd_fused_supported(32, 64, 16, 1, 3, 8)
    gate = sf.ssd_fused_supported
    monkeypatch.setattr(sf, "ssd_fused_supported",
                        lambda l, N, P, G, nc, H, itemsize=2:
                        gate(l, max(N, 128), P, G, nc, H, itemsize))

    def loss(fused):
        def f(x, dt, Bm, Cm):
            y = _run(x, dt, A, Bm, Cm, D, bias, chunk=32, fused=fused)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3))(x, dt, Bm, Cm)

    got = _run(x, dt, A, Bm, Cm, D, bias, chunk=32, fused=True)
    want = _run(x, dt, A, Bm, Cm, D, bias, chunk=32, fused=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    for gf, gx, name in zip(loss(True), loss(False),
                            ["dx", "ddt", "dB", "dC"]):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_fused_l196_window(dtype=jnp.float32):
    """l=196 (MedSSD stage 1: 784 = 4 x 196) joined the fused window in r3;
    parity at the real chunk length, reduced H/P/N."""
    args = _inputs(B=1, L=784, H=2, P=8, N=128, dtype=dtype)
    assert sf.ssd_fused_supported(196, 128, 8, 1, 4, 2)

    def loss(fused):
        x, dt, A, Bm, Cm, D, bias = args

        def f(x_, dt_):
            y = _run(x_, dt_, A, Bm, Cm, D, bias, chunk=196, fused=fused)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1))(x, dt)

    got = _run(*args, chunk=196, fused=True)
    want = _run(*args, chunk=196, fused=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    for gf, gx, name in zip(loss(True), loss(False), ["dx", "ddt"]):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_effective_chunk_fused_override(monkeypatch):
    """L=784 at large N picks single-chunk for XLA but 4 x 196 when the
    fused kernel is eligible; ineligible configs keep the XLA pick."""
    # the production gate, not the interpret-relaxed one from the fixture
    # (pretend-TPU backend so the gate's backend/itemsize checks apply)
    monkeypatch.setattr(sf.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(ssd_mod, "_FUSED_CHUNK_OVERRIDE", True)
    sf._INTERPRET = False
    sf._MIN_L = 196
    try:
        with_fused = ssd_mod._effective_chunk(784, 256, 512, 64, 1, 16, 2,
                                              True)
        assert with_fused == 196
        xla_only = ssd_mod._effective_chunk(784, 256, 512, 64, 1, 16, 2,
                                            False)
        assert xla_only == 784  # single chunk (8-aligned already)
        # N=64 (st_ssd): fused gate rejects (N % 128) -> XLA divisor pick
        small_n = ssd_mod._effective_chunk(784, 256, 64, 64, 1, 8, 2, True)
        assert small_n == 196  # same as _pick_chunk's small-N divisor search
        # fp32 stays on the XLA pick (fused gate rejects itemsize > 2)
        fp32 = ssd_mod._effective_chunk(784, 256, 512, 64, 1, 16, 4, True)
        assert fp32 == 784
        # stage 0 keeps its in-window pick untouched
        assert ssd_mod._effective_chunk(3136, 256, 512, 64, 1, 8, 2,
                                        True) == 224
    finally:
        sf._INTERPRET = True
        sf._MIN_L = 8


def test_fused_forward_vs_seq_ref():
    x, dt, A, Bm, Cm, D, bias = _inputs(L=80)
    got = _run(x, dt, A, Bm, Cm, D, bias, chunk=16, fused=True)
    want = ssd_seq_ref(x, dt, A, Bm, Cm, D=D, dt_bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("dtype,rtol,atol", [
    (jnp.float32, 1e-4, 1e-4), (jnp.bfloat16, 5e-2, 8e-2)])
def test_fused_grads_vs_xla(dtype, rtol, atol):
    x, dt, A, Bm, Cm, D, bias = _inputs(L=96, dtype=dtype)

    def loss(fused):
        def f(x, dt, Bm, Cm):
            y = _run(x, dt, A, Bm, Cm, D, bias, chunk=32, fused=fused)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3))(x, dt, Bm, Cm)

    g_fused = loss(True)
    g_xla = loss(False)
    for gf, gx, name in zip(g_fused, g_xla, ["dx", "ddt", "dB", "dC"]):
        gx32 = np.asarray(gx, np.float32)
        np.testing.assert_allclose(
            np.asarray(gf, np.float32), gx32,
            rtol=rtol, atol=atol * max(1.0, float(np.abs(gx32).max())),
            err_msg=name)


def test_fused_multi_head_block_grid():
    """Force HB < H so head-blocks share the scores/state scratches."""
    x, dt, A, Bm, Cm, D, bias = _inputs(L=64, H=32)
    old = yd._VMEM_BUDGET
    try:
        yd._VMEM_BUDGET = 200_000
        assert yd._pick_hb(32, 32, 128, 8, 4) == 8
        got = _run(x, dt, A, Bm, Cm, D, bias, chunk=32, fused=True)
    finally:
        yd._VMEM_BUDGET = old
    want = _run(x, dt, A, Bm, Cm, D, bias, chunk=32, fused=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_kernel_under_dp_sharding():
    """The fused kernel composes with GSPMD batch sharding (8-dev mesh).

    Interpret mode validates tracing/partitioning composition on the
    virtual mesh; real multi-chip custom-call partitioning can only be
    exercised on hardware (single chip here — see STATUS.md).
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    x, dt, A, Bm, Cm, D, bias = _inputs(B=8, L=96)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    xs, dts = jax.device_put(x, sh), jax.device_put(dt, sh)
    Bs, Cs = jax.device_put(Bm, sh), jax.device_put(Cm, sh)

    def loss(x, dt, Bm, Cm):
        y = _run(x, dt, A, Bm, Cm, D, bias, chunk=32, fused=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_sh = jax.jit(jax.grad(loss))(xs, dts, Bs, Cs)
    g_ref = jax.jit(jax.grad(loss))(x, dt, Bm, Cm)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_fused_gate_respects_state_args():
    """initial_state / return_final_state fall back to the XLA path."""
    x, dt, A, Bm, Cm, D, bias = _inputs(L=64)
    y, s = ssd_chunked(x, dt, A, Bm, Cm, chunk_size=16, D=D, dt_bias=bias,
                       return_final_state=True, adaptive_chunk=False)
    y2 = ssd_chunked(x, dt, A, Bm, Cm, chunk_size=16, D=D, dt_bias=bias,
                     initial_state=jnp.zeros_like(s), adaptive_chunk=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5,
                               atol=1e-5)
