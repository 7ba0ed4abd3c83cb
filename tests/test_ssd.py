"""Parity tests: chunked SSD (matmul form) vs sequential recurrence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_classification_tpu.kernels import ssd_chunked, ssd_seq_ref


def _make(rng, b, L, h, p, g, n, itype):
    ks = jax.random.split(rng, 6)
    x = jax.random.normal(ks[0], (b, L, h, p), dtype=itype)
    dt = jax.random.normal(ks[1], (b, L, h), dtype=itype) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (h,)) * 0.5)
    B = jax.random.normal(ks[3], (b, L, g, n), dtype=itype)
    C = jax.random.normal(ks[4], (b, L, g, n), dtype=itype)
    D = jax.random.normal(ks[5], (h,))
    dt_bias = jnp.full((h,), 0.1)
    return x, dt, A, B, C, D, dt_bias


@pytest.mark.parametrize("itype,rtol,atol", [
    (jnp.float32, 1e-3, 2e-3),
    (jnp.bfloat16, 3e-2, 5e-2),
])
@pytest.mark.parametrize("L,chunk", [(64, 16), (100, 32), (256, 64)])
@pytest.mark.parametrize("g,h", [(1, 2), (2, 4)])
def test_ssd_forward_parity(itype, rtol, atol, L, chunk, g, h):
    rng = jax.random.PRNGKey(L + h)
    x, dt, A, B, C, D, dt_bias = _make(rng, 2, L, h, 8, g, 4, itype)
    y_ref, s_ref = ssd_seq_ref(x, dt, A, B, C, D=D, dt_bias=dt_bias,
                               return_final_state=True)
    y, s = ssd_chunked(x, dt, A, B, C, chunk_size=chunk, D=D, dt_bias=dt_bias,
                       return_final_state=True)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(s, np.float32),
                               np.asarray(s_ref, np.float32),
                               rtol=rtol * 3, atol=atol * 3)


def test_ssd_initial_state_chaining():
    """Scanning 2L must equal scanning two L-halves with state passing."""
    rng = jax.random.PRNGKey(3)
    x, dt, A, B, C, D, dt_bias = _make(rng, 1, 128, 2, 8, 1, 4, jnp.float32)
    y_full = ssd_chunked(x, dt, A, B, C, chunk_size=32, dt_bias=dt_bias)
    y1, s1 = ssd_chunked(x[:, :64], dt[:, :64], A, B[:, :64], C[:, :64],
                         chunk_size=32, dt_bias=dt_bias, return_final_state=True)
    y2 = ssd_chunked(x[:, 64:], dt[:, 64:], A, B[:, 64:], C[:, 64:],
                     chunk_size=32, dt_bias=dt_bias, initial_state=s1)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([y1, y2], axis=1)),
                               np.asarray(y_full), rtol=1e-4, atol=1e-4)


def test_ssd_grads():
    rng = jax.random.PRNGKey(9)
    x, dt, A, B, C, D, dt_bias = _make(rng, 2, 96, 2, 8, 1, 4, jnp.float32)

    def loss(fn, args):
        x, dt, A, B, C = args
        return jnp.sum(jnp.sin(fn(x, dt, A, B, C)))

    args = (x, dt, A, B, C)
    g_ref = jax.grad(lambda a: loss(ssd_seq_ref, a))(args)
    g = jax.grad(lambda a: loss(
        lambda *z: ssd_chunked(*z, chunk_size=32), a))(args)
    for gr, gx, name in zip(g_ref, g, "x dt A B C".split()):
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                                   rtol=2e-3, atol=5e-3, err_msg=name)


def test_ssd_gated_z():
    rng = jax.random.PRNGKey(11)
    x, dt, A, B, C, D, dt_bias = _make(rng, 1, 64, 2, 8, 1, 4, jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    y_ref = ssd_seq_ref(x, dt, A, B, C, D=D, z=z, dt_bias=dt_bias)
    y = ssd_chunked(x, dt, A, B, C, chunk_size=16, D=D, z=z, dt_bias=dt_bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-3, atol=2e-3)


def test_pick_chunk_prefers_pad_free_divisor():
    """L=3136 must pick 224 (14 pad-free chunks) over 256 (13 chunks with a
    96-row pad copy of x/dt/B/C in fwd AND bwd); small L collapses to one
    8-aligned chunk; L with no near divisor keeps the caller's chunk."""
    from medical_image_classification_tpu.kernels.ssd import _pick_chunk
    assert _pick_chunk(3136, 256, N=512) == 224
    assert _pick_chunk(49, 256, N=512) == 56   # single 8-aligned chunk
    assert _pick_chunk(784, 256, N=512) == 784  # still <= 3.5x chunk
    assert _pick_chunk(3137, 256, N=512) == 256  # prime-ish: no divisor
    # small N (ST-SSD / CNN-Mamba): state path is trivial, l^2 dominates —
    # chunk everywhere L allows, preferring pad-free divisors
    assert _pick_chunk(3136, 256, N=64) == 224
    # largest pad-free divisor, NOT 8-stepped: only the fused kernel needs
    # l % 8 (its own gate re-checks); XLA at c=196 measured 2.4x faster
    # than the 8-aligned pick 112 (v5e b8 N=64)
    assert _pick_chunk(784, 256, N=64) == 196
    assert _pick_chunk(196, 256, N=64) == 200  # single chunk, 8-aligned
    assert _pick_chunk(49, 256, N=64) == 56
