"""Golden tests for the Pallas selective-scan kernel (interpreter mode on
CPU — the TPU analogue of the reference's CUDA-vs-reference equivalence
suite, SURVEY §4/§5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import medical_image_classification_tpu.kernels.selective_scan_pallas as ssp
from medical_image_classification_tpu.kernels.selective_scan import (
    selective_scan_xla,
)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import medical_image_classification_tpu.kernels.selective_scan_pallas_bwd as sspb
    monkeypatch.setattr(ssp, "_INTERPRET", True)
    monkeypatch.setattr(sspb, "_INTERPRET", True)


def _make(rng, batch, K, L, Dm, N):
    ks = jax.random.split(rng, 7)
    G = batch * K
    u = jax.random.normal(ks[0], (G, L, Dm))
    delta = 0.5 * jax.random.normal(ks[1], (G, L, Dm))
    A = -jnp.exp(jax.random.normal(ks[2], (K, Dm, N)) * 0.5)
    B = jax.random.normal(ks[3], (G, L, N))
    C = jax.random.normal(ks[4], (G, L, N))
    D = jax.random.normal(ks[5], (K, Dm))
    bias = 0.1 * jax.random.normal(ks[6], (K, Dm))
    return u, delta, A, B, C, D, bias


@pytest.mark.parametrize("L", [64, 100, 196])
@pytest.mark.parametrize("Dm", [128, 96])
def test_pallas_fwd_matches_xla(L, Dm):
    rng = jax.random.PRNGKey(L + Dm)
    u, delta, A, B, C, D, bias = _make(rng, 1, 2, L, Dm, 8)
    y = ssp.selective_scan_pallas_folded(u, delta, A, B, C, D, bias)
    y_ref = ssp._xla_equivalent(u, delta, A, B, C, D, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_generic_entry_matches_xla():
    from medical_image_classification_tpu.kernels.selective_scan import (
        selective_scan_seq)
    rng = jax.random.PRNGKey(0)
    batch, K, L, Dm, N = 2, 4, 80, 32, 4
    ks = jax.random.split(rng, 6)
    u = jax.random.normal(ks[0], (batch, L, K * Dm))
    delta = 0.5 * jax.random.normal(ks[1], (batch, L, K * Dm))
    A = -jnp.exp(jax.random.normal(ks[2], (K * Dm, N)) * 0.5)
    B = jax.random.normal(ks[3], (batch, L, K, N))
    C = jax.random.normal(ks[4], (batch, L, K, N))
    D = jax.random.normal(ks[5], (K * Dm,))
    bias = jnp.full((K * Dm,), 0.05)
    y = ssp.selective_scan_pallas(u, delta, A, B, C, D=D, delta_bias=bias,
                                  delta_softplus=True)
    y_ref = selective_scan_seq(u, delta, A, B, C, D=D, delta_bias=bias,
                               delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_grads_match_xla_path():
    rng = jax.random.PRNGKey(7)
    u, delta, A, B, C, D, bias = _make(rng, 1, 2, 64, 32, 4)

    def loss(fn):
        return lambda args: jnp.sum(jnp.sin(fn(*args)))

    args = (u, delta, A, B, C, D, bias)
    g_pallas = jax.grad(loss(ssp.selective_scan_pallas_folded))(args)
    g_ref = jax.grad(loss(ssp._xla_equivalent))(args)
    for gp, gr, nm in zip(g_pallas, g_ref, "u delta A B C D bias".split()):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-3, atol=1e-3, err_msg=nm)


def test_tile_chooser():
    assert ssp._choose_tiles(3136, 384, 16) is not None
    T, Dt = ssp._choose_tiles(3136, 384, 16)
    assert 384 % Dt == 0
    assert ssp._choose_tiles(49, 768, 16)[1] in (128, 256, 384, 512)


def test_pallas_bwd_kernel_matches_xla(monkeypatch):
    """The dedicated Pallas backward kernel (interpret mode) must match the
    XLA-recompute gradients."""
    import medical_image_classification_tpu.kernels.selective_scan_pallas_bwd as sspb
    monkeypatch.setattr(sspb, "_INTERPRET", True)
    monkeypatch.setattr(ssp, "_BWD_IMPL", "pallas")
    rng = jax.random.PRNGKey(3)
    u, delta, A, B, C, D, bias = _make(rng, 2, 2, 100, 64, 8)
    args = (u, delta, A, B, C, D, bias)

    def loss(fn):
        return lambda a: jnp.sum(jnp.sin(fn(*a)))

    g_pallas = jax.grad(loss(ssp.selective_scan_pallas_folded))(args)
    g_ref = jax.grad(loss(ssp._xla_equivalent))(args)
    for gp, gr, nm in zip(g_pallas, g_ref, "u delta A B C D bias".split()):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)


def test_pallas_fwd_saves_boundary_states(monkeypatch):
    monkeypatch.setattr(ssp, "_INTERPRET", True)
    rng = jax.random.PRNGKey(5)
    u, delta, A, B, C, D, bias = _make(rng, 1, 2, 64, 32, 4)
    T, Dt = ssp._choose_tiles(64, 32, 4)
    y, xsave = ssp._fwd_folded(u, delta, A, B, C, D, bias, T, Dt)
    assert xsave.shape[0] == u.shape[0]
    # first chunk's incoming state is zero
    np.testing.assert_array_equal(np.asarray(xsave[:, 0]), 0.0)


def test_pallas_bf16_inputs(monkeypatch):
    """bf16 activations with fp32 params: output in bf16, tolerances bf16."""
    rng = jax.random.PRNGKey(21)
    u, delta, A, B, C, D, bias = _make(rng, 1, 2, 64, 32, 4)
    bf = jnp.bfloat16
    y = ssp.selective_scan_pallas_folded(
        u.astype(bf), delta.astype(bf), A, B.astype(bf), C.astype(bf),
        D, bias)
    assert y.dtype == bf
    y_ref = ssp._xla_equivalent(u, delta, A, B, C, D, bias)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=5e-2, atol=8e-2)


@pytest.mark.parametrize("L", [64, 100, 196])
def test_pallas_reverse_fwd_matches_xla(L):
    """reverse=True over unflipped memory == flip -> forward scan -> flip."""
    rng = jax.random.PRNGKey(11 + L)
    u, delta, A, B, C, D, bias = _make(rng, 1, 2, L, 96, 8)
    y = ssp.selective_scan_pallas_folded(u, delta, A, B, C, D, bias,
                                         reverse=True)
    y_ref = ssp._xla_equivalent(u, delta, A, B, C, D, bias, reverse=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_reverse_grads_match_xla(monkeypatch):
    import medical_image_classification_tpu.kernels.selective_scan_pallas_bwd_v2 as bwd2
    monkeypatch.setattr(bwd2, "_INTERPRET", True)
    monkeypatch.setattr(ssp, "_BWD_IMPL", "pallas")
    rng = jax.random.PRNGKey(13)
    u, delta, A, B, C, D, bias = _make(rng, 2, 2, 100, 64, 8)
    args = (u, delta, A, B, C, D, bias)

    def loss(fn):
        return lambda a: jnp.sum(jnp.sin(fn(*a)))

    fwd = lambda *a: ssp.selective_scan_pallas_folded(*a, reverse=True)
    ref = lambda *a: ssp._xla_equivalent(*a, reverse=True)
    g_pallas = jax.grad(loss(fwd))(args)
    g_ref = jax.grad(loss(ref))(args)
    for gp, gr, nm in zip(g_pallas, g_ref, "u delta A B C D bias".split()):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)


# ---- production-shape golden tests (VERDICT r1 missing-6) ----------------
# The shapes that actually run in training (MedMamba stages at 224²:
# L=3136/Dm=96, L=49/Dm=768) plus one long-sequence case, in both fp32 and
# bf16 — mirroring the reference matrix (`test_selective_scan.py:373-390`).

@pytest.mark.parametrize("L,Dm", [(3136, 96), (49, 768)])
@pytest.mark.parametrize("dtype", ["fp32", "bf16"])
def test_pallas_production_shapes(L, Dm, dtype):
    rng = jax.random.PRNGKey(L)
    u, delta, A, B, C, D, bias = _make(rng, 1, 2, L, Dm, 16)
    if dtype == "bf16":
        u, delta, B, C = (t.astype(jnp.bfloat16) for t in (u, delta, B, C))
    y = ssp.selective_scan_pallas_folded(u, delta, A, B, C, D, bias)
    y_ref = ssp._xla_equivalent(u, delta, A, B, C, D, bias)
    tol = dict(rtol=3e-2, atol=5e-2) if dtype == "bf16" else \
        dict(rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32), **tol)


@pytest.mark.parametrize("dtype", ["fp32", "bf16"])
def test_pallas_production_grads(dtype):
    """fwd+bwd parity at the stage-0 training shape (v2 bwd kernel path),
    fp32 and bf16 (the bf16 v2-bwd path had no interpret test in r1)."""
    import medical_image_classification_tpu.kernels.selective_scan_pallas_bwd_v2 as bwd2
    bwd2._INTERPRET = True
    rng = jax.random.PRNGKey(17)
    u, delta, A, B, C, D, bias = _make(rng, 1, 2, 392, 96, 16)
    if dtype == "bf16":
        u, delta, B, C = (t.astype(jnp.bfloat16) for t in (u, delta, B, C))
    args = (u, delta, A, B, C, D, bias)

    def loss(fn):
        return lambda a: jnp.sum(jnp.sin(fn(*a).astype(jnp.float32)))

    g_pallas = jax.grad(loss(ssp.selective_scan_pallas_folded), allow_int=True)(args)
    g_ref = jax.grad(loss(ssp._xla_equivalent), allow_int=True)(args)
    tol = dict(rtol=6e-2, atol=1e-1) if dtype == "bf16" else \
        dict(rtol=3e-3, atol=3e-3)
    for gp, gr, nm in zip(g_pallas, g_ref, "u delta A B C D bias".split()):
        np.testing.assert_allclose(np.asarray(gp, np.float32),
                                   np.asarray(gr, np.float32), err_msg=nm,
                                   **tol)


@pytest.mark.slow
def test_pallas_long_sequence():
    """L=4096 (the reference's largest parametrized seqlen)."""
    rng = jax.random.PRNGKey(4096)
    u, delta, A, B, C, D, bias = _make(rng, 1, 1, 4096, 128, 16)
    y = ssp.selective_scan_pallas_folded(u, delta, A, B, C, D, bias)
    y_ref = ssp._xla_equivalent(u, delta, A, B, C, D, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)


# ---- kernel capability flags: z-gate, last_state, non-softplus -----------
# (VERDICT r1 missing-3; matches `selective_scan_interface.py:83-158`)

def test_pallas_last_state_and_nonsoftplus():
    rng = jax.random.PRNGKey(21)
    u, delta, A, B, C, D, bias = _make(rng, 1, 2, 100, 64, 8)
    delta = jnp.abs(delta) + 0.05                   # raw dt > 0 (no softplus)
    y, last = ssp.selective_scan_pallas_folded(
        u, delta, A, B, C, D, bias, softplus=False, return_last_state=True)
    y_ref, last_ref = ssp._xla_equivalent(
        u, delta, A, B, C, D, bias, softplus=False, want_state=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(last), np.asarray(last_ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_last_state_grads(monkeypatch):
    """The final-state output participates in autodiff (the dlast adjoint
    seeds the backward kernel's carry)."""
    import medical_image_classification_tpu.kernels.selective_scan_pallas_bwd_v2 as bwd2
    monkeypatch.setattr(bwd2, "_INTERPRET", True)
    rng = jax.random.PRNGKey(23)
    # L=100 does not divide the chunk: exercises the pad masking too
    u, delta, A, B, C, D, bias = _make(rng, 1, 2, 100, 32, 8)
    args = (u, delta, A, B, C, D, bias)

    def loss_of(fn, want):
        def f(a):
            y, last = fn(*a)
            return jnp.sum(jnp.sin(y)) + 2.0 * jnp.sum(jnp.cos(last))
        return f

    fn_p = lambda *a: ssp.selective_scan_pallas_folded(
        *a, return_last_state=True)
    fn_x = lambda *a: ssp._xla_equivalent(*a, want_state=True)
    g_p = jax.grad(loss_of(fn_p, True))(args)
    g_x = jax.grad(loss_of(fn_x, True))(args)
    for gp, gr, nm in zip(g_p, g_x, "u delta A B C D bias".split()):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)


def test_pallas_generic_z_and_last_state():
    """Generic entry: 3D B/C (one group), z-gate, last state — the LM path
    (`models/mamba_lm.py:111`) previously fell back to the XLA scan."""
    from medical_image_classification_tpu.kernels.selective_scan import (
        selective_scan_seq)
    ks = jax.random.split(jax.random.PRNGKey(5), 7)
    batch, L, Dm, N = 2, 64, 32, 4
    u = jax.random.normal(ks[0], (batch, L, Dm))
    delta = 0.5 * jax.random.normal(ks[1], (batch, L, Dm))
    A = -jnp.exp(jax.random.normal(ks[2], (Dm, N)) * 0.5)
    B = jax.random.normal(ks[3], (batch, L, N))
    C = jax.random.normal(ks[4], (batch, L, N))
    D = jax.random.normal(ks[5], (Dm,))
    z = jax.random.normal(ks[6], (batch, L, Dm))
    bias = jnp.full((Dm,), 0.05)
    y, last = ssp.selective_scan_pallas(u, delta, A, B, C, D=D, z=z,
                                        delta_bias=bias, delta_softplus=True,
                                        return_last_state=True)
    y_ref, last_ref = selective_scan_seq(u, delta, A, B, C, D=D, z=z,
                                         delta_bias=bias, delta_softplus=True,
                                         return_last_state=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(last).reshape(last_ref.shape),
                               np.asarray(last_ref), rtol=2e-4, atol=2e-4)


# ---- multi-d-tile (nD > 1) gradient parity --------------------------------
# Dm=768 -> Dt=384, nD=2: the ONLY shape class where the bwd kernel's
# dB/dC cross-d-tile accumulation (fp32 VMEM scratch, deferred last-tile
# store) executes its dtile != 0 branches.  Production stage 3 runs this
# (L=49, Dm=768); every other grad test has nD == 1.

@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_grads_multi_dtile(monkeypatch, reverse):
    import medical_image_classification_tpu.kernels.selective_scan_pallas_bwd_v2 as bwd2
    monkeypatch.setattr(bwd2, "_INTERPRET", True)
    monkeypatch.setattr(ssp, "_BWD_IMPL", "pallas")
    assert ssp._choose_tiles(49, 768, 16)[1] == 384      # nD == 2
    rng = jax.random.PRNGKey(29)
    u, delta, A, B, C, D, bias = _make(rng, 1, 2, 49, 768, 16)
    args = (u, delta, A, B, C, D, bias)

    def loss(fn):
        return lambda a: jnp.sum(jnp.sin(fn(*a, reverse=reverse)))

    g_pallas = jax.grad(loss(ssp.selective_scan_pallas_folded))(args)
    g_ref = jax.grad(loss(ssp._xla_equivalent))(args)
    for gp, gr, nm in zip(g_pallas, g_ref, "u delta A B C D bias".split()):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)


# ---- flip-free SS2D path (TPU-gated in production) -------------------------
# The four-single-direction-kernel projection/scan path in ops/ss2d.py is
# gated on jax.default_backend() == "tpu", so the hermetic CPU suite never
# exercises it through the models.  Force it on in interpret mode and check
# output + all gradients against the trusted XLA cross-scan path.

@pytest.mark.parametrize("merge", [True, False])
def test_ss2d_flipfree_path_matches_xla(monkeypatch, merge):
    from medical_image_classification_tpu.ops.ss2d import ss2d_core_mamba1
    monkeypatch.setattr(ssp, "_INTERPRET", True)
    monkeypatch.setattr(
        ssp, "pallas_folded_supported",
        lambda L, Dm, N: ssp._choose_tiles(L, Dm, N) is not None)
    ks = jax.random.split(jax.random.PRNGKey(31), 6)
    Bb, H, W, Dm, N, q = 2, 14, 14, 32, 8, 4
    x = jax.random.normal(ks[0], (Bb, H, W, Dm))
    xw = 0.3 * jax.random.normal(ks[1], (4, q + 2 * N, Dm))
    dtw = 0.3 * jax.random.normal(ks[2], (4, Dm, q))
    dtb = 0.1 * jax.random.normal(ks[3], (4, Dm))
    A_log = jax.random.normal(ks[4], (4, Dm, N)) * 0.5
    Ds = jax.random.normal(ks[5], (4, Dm))

    def run(impl, args):
        x, xw, dtw, dtb, A_log, Ds = args
        return ss2d_core_mamba1(x, xw, dtw, dtb, A_log, Ds, d_state=N,
                                dt_rank=q, impl=impl, merge=merge)

    args = (x, xw, dtw, dtb, A_log, Ds)
    y_p = run("pallas", args)
    y_x = run("xla", args)
    assert y_p.shape == y_x.shape
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=2e-3, atol=2e-3)

    loss = lambda impl: (lambda a: jnp.sum(jnp.sin(run(impl, a))))
    g_p = jax.grad(loss("pallas"))(args)
    g_x = jax.grad(loss("xla"))(args)
    names = "x x_proj_w dt_proj_w dt_proj_b A_log Ds".split()
    for gp, gr, nm in zip(g_p, g_x, names):
        # weight grads sum over B*L with different matmul regroupings
        # (folded-Weff vs two-stage low-rank): tolerance scales with the
        # tensor's magnitude (entries reach O(1e2) here)
        scale = float(np.max(np.abs(np.asarray(gr)))) + 1e-6
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=3e-3, atol=1e-4 * scale, err_msg=nm)


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_initial_state(monkeypatch, reverse):
    """initial_state seeding (fwd + its gradient) vs the XLA scan, at an
    L that pads (the injected state must ride pad rows with decay 1)."""
    import medical_image_classification_tpu.kernels.selective_scan_pallas_bwd_v2 as bwd2
    import medical_image_classification_tpu.kernels.selective_scan_pallas_v2 as v2
    monkeypatch.setattr(v2, "_INTERPRET", True)
    monkeypatch.setattr(bwd2, "_INTERPRET", True)
    rng = jax.random.PRNGKey(11 + reverse)
    batch, K, L, Dm, N = 1, 2, 100, 96, 8
    u, delta, A, B, C, D, bias = _make(rng, batch, K, L, Dm, N)
    init = jax.random.normal(jax.random.PRNGKey(99), (batch * K, N, Dm))

    def f_pal(u_, init_):
        return ssp.selective_scan_pallas_folded(
            u_, delta, A, B, C, D, bias, reverse=reverse,
            initial_state=init_)

    def f_ref(u_, init_):
        return ssp._xla_equivalent(u_, delta, A, B, C, D, bias, init=init_,
                                   reverse=reverse)

    np.testing.assert_allclose(np.asarray(f_pal(u, init)),
                               np.asarray(f_ref(u, init)),
                               rtol=2e-5, atol=2e-5)

    def loss(f):
        return jax.grad(lambda u_, i_: jnp.sum(f(u_, i_) ** 2),
                        argnums=(0, 1))(u, init)

    for gp, gr, name in zip(loss(f_pal), loss(f_ref), ["du", "dinit"]):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_pallas_split_scan_consistency(monkeypatch):
    """Scanning [0:L1) then seeding [L1:L) with the returned last state
    must equal the single full scan — the chunked-prefill contract of
    `return_last_state` + `initial_state` together."""
    import medical_image_classification_tpu.kernels.selective_scan_pallas_v2 as v2
    monkeypatch.setattr(v2, "_INTERPRET", True)
    rng = jax.random.PRNGKey(5)
    batch, K, L, Dm, N = 1, 1, 128, 96, 8
    L1 = 48
    u, delta, A, B, C, D, bias = _make(rng, batch, K, L, Dm, N)
    y_full = ssp.selective_scan_pallas_folded(u, delta, A, B, C, D, bias)
    y1, s1 = ssp.selective_scan_pallas_folded(
        u[:, :L1], delta[:, :L1], A, B[:, :L1], C[:, :L1], D, bias,
        return_last_state=True)
    y2 = ssp.selective_scan_pallas_folded(
        u[:, L1:], delta[:, L1:], A, B[:, L1:], C[:, L1:], D, bias,
        initial_state=s1)
    got = jnp.concatenate([y1, y2], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(y_full),
                               rtol=2e-5, atol=2e-5)
