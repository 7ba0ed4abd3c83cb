"""Parity tests for the selective-scan kernels.

Modeled on the reference's kernel-equivalence suite
(`/root/reference/CrossMamba/FusionMamba/mamba_ssm/ops/test_selective_scan.py`):
parametrized over dtype / seqlen / groups / has_D / has_z / delta_bias /
delta_softplus, asserting forward outputs, last_state, and all gradients
against the sequential golden model within a per-dtype tolerance ladder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_classification_tpu.kernels import (
    selective_scan_seq,
    selective_scan_xla,
    selective_state_update,
)

TOLS = {
    jnp.float32: dict(rtol=6e-4, atol=2e-3),
    jnp.bfloat16: dict(rtol=3e-2, atol=5e-2),
}


def _make_inputs(rng, batch, L, d, n, groups, itype, has_D, has_z, has_bias,
                 softplus=False):
    ks = list(jax.random.split(rng, 8))
    u = jax.random.normal(ks[0], (batch, L, d), dtype=itype)
    if softplus:
        delta = 0.5 * jax.random.normal(ks[1], (batch, L, d), dtype=itype)
    else:
        # raw delta acts as a rate: keep it positive (contractive recurrence),
        # matching the reference test's uniform draw.
        delta = jax.random.uniform(ks[1], (batch, L, d), dtype=itype)
    A = -jnp.exp(jax.random.normal(ks[2], (d, n), dtype=jnp.float32) * 0.5)
    if groups is None:
        B = jax.random.normal(ks[3], (batch, L, n), dtype=itype)
        C = jax.random.normal(ks[4], (batch, L, n), dtype=itype)
    else:
        B = jax.random.normal(ks[3], (batch, L, groups, n), dtype=itype)
        C = jax.random.normal(ks[4], (batch, L, groups, n), dtype=itype)
    D = jax.random.normal(ks[5], (d,), dtype=jnp.float32) if has_D else None
    z = jax.random.normal(ks[6], (batch, L, d), dtype=itype) if has_z else None
    db = 0.1 * jax.random.normal(ks[7], (d,), dtype=jnp.float32) if has_bias else None
    return u, delta, A, B, C, D, z, db


@pytest.mark.parametrize("itype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("L", [31, 64, 257, 512])
@pytest.mark.parametrize("groups", [None, 2])
@pytest.mark.parametrize("has_D,has_z,has_bias,softplus", [
    (False, False, False, False),
    (True, True, True, True),
])
def test_xla_matches_seq_forward(itype, L, groups, has_D, has_z, has_bias, softplus):
    rng = jax.random.PRNGKey(hash((L, groups is None)) % 2**31)
    u, delta, A, B, C, D, z, db = _make_inputs(
        rng, 2, L, 8, 4, groups, itype, has_D, has_z, has_bias, softplus)
    y_ref, s_ref = selective_scan_seq(u, delta, A, B, C, D, z, db, softplus,
                                      return_last_state=True)
    y, s = selective_scan_xla(u, delta, A, B, C, D, z, db, softplus,
                              return_last_state=True, chunk=64)
    tol = TOLS[itype]
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32), **tol)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=tol["rtol"] * 2, atol=tol["atol"] * 2)


@pytest.mark.parametrize("groups", [None, 2])
def test_xla_matches_seq_grads(groups):
    rng = jax.random.PRNGKey(0)
    u, delta, A, B, C, D, z, db = _make_inputs(
        rng, 2, 96, 8, 4, groups, jnp.float32, True, True, True, softplus=True)

    def loss(fn, args):
        u, delta, A, B, C, D, z, db = args
        y = fn(u, delta, A, B, C, D, z, db, True)
        return jnp.sum(jnp.sin(y))

    args = (u, delta, A, B, C, D, z, db)
    g_ref = jax.grad(lambda a: loss(selective_scan_seq, a))(args)
    g = jax.grad(lambda a: loss(lambda *x: selective_scan_xla(*x, chunk=32), a))(args)
    for gr, gx, name in zip(g_ref, g, "u delta A B C D z db".split()):
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                                   rtol=2e-3, atol=5e-3, err_msg=name)


def test_state_update_matches_scan_step():
    """A length-1 scan must equal one selective_state_update step."""
    rng = jax.random.PRNGKey(42)
    batch, d, n = 3, 16, 8
    ks = jax.random.split(rng, 6)
    state = jax.random.normal(ks[0], (batch, d, n))
    x = jax.random.normal(ks[1], (batch, d))
    dt = jax.random.normal(ks[2], (batch, d))
    A = -jnp.exp(jax.random.normal(ks[3], (d, n)) * 0.5)
    B = jax.random.normal(ks[4], (batch, n))
    C = jax.random.normal(ks[5], (batch, n))

    new_state, y = selective_state_update(state, x, dt, A, B, C, dt_softplus=True)
    # reference: run the seq scan for one step with the same initial state by
    # folding the initial state in manually.
    dA = jnp.exp(jax.nn.softplus(dt)[..., None] * A)
    y2, s2 = selective_scan_seq(x[:, None], dt[:, None], A, B[:, None],
                                C[:, None], delta_softplus=True,
                                return_last_state=True)
    s2 = s2 + dA * state
    y2 = y2[:, 0] + jnp.einsum("bdn,bn->bd", dA * state, C)
    np.testing.assert_allclose(np.asarray(new_state), np.asarray(s2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)


def test_scan_is_jittable_and_stable():
    """jit + odd length + long sequence; no NaNs with realistic magnitudes."""
    rng = jax.random.PRNGKey(7)
    u, delta, A, B, C, D, z, db = _make_inputs(
        rng, 1, 1000, 4, 16, None, jnp.float32, True, True, True, softplus=True)
    f = jax.jit(lambda *a: selective_scan_xla(*a, delta_softplus=True))
    y = f(u, delta, A, B, C, D, z, db)
    assert y.shape == (1, 1000, 4)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_long_sequence_2048():
    """Long-sequence parity (reference suite covers up to 4096)."""
    rng = jax.random.PRNGKey(13)
    u, delta, A, B, C, D, z, db = _make_inputs(
        rng, 1, 2048, 4, 8, None, jnp.float32, True, False, True,
        softplus=True)
    y_ref = selective_scan_seq(u, delta, A, B, C, D, None, db, True)
    y = selective_scan_xla(u, delta, A, B, C, D, None, db, True, chunk=128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-3, atol=3e-3)
