"""Golden tests for the flip-free direction-folded fused SSD path.

The dirs kernel must reproduce the materialised-4-direction path exactly
(it is the same math; directions 2/3 just ride mirrored chunk maps and an
exact permutation matmul instead of flipped HBM copies).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import medical_image_classification_tpu.kernels.ssd as ssd_mod
import medical_image_classification_tpu.kernels.ssd_fused_dirs_pallas as sfd
from medical_image_classification_tpu.ops import ss2d


@pytest.fixture(autouse=True)
def _interpret():
    sfd._INTERPRET = True
    old_min = sfd._MIN_L
    sfd._MIN_L = 8
    yield
    sfd._INTERPRET = False
    sfd._MIN_L = old_min


def _core_args(B=2, HW=8, d_state=32, nheads=4, headdim=8, seed=0):
    # d_state=32, nheads=4, headdim=8: d_ssm=32 == gn (the r4 stack5 block
    # cutting requires d_ssm % gn == 0 and nh % hpg == 0 — every real
    # model on this path has gn=128 and d_ssm a multiple of it); N=128
    # keeps the N%128 gate green and chunk 16 over L=64 gives nc=4,
    # exercising the mirrored-chunk maps.  The single-chunk (nc=1)
    # degenerate case has its own test below.
    d_ssm = nheads * headdim
    gn = d_state
    Cc = d_ssm + 2 * gn + nheads
    rng = np.random.RandomState(seed)
    xBCdt = jnp.asarray(rng.randn(B, HW, HW, Cc) * 0.5, jnp.float32)
    A_log = jnp.asarray(rng.rand(4, nheads) * 0.5, jnp.float32)
    dt_bias = jnp.asarray(rng.rand(4, nheads), jnp.float32)
    Ds = jnp.asarray(rng.rand(4, nheads), jnp.float32)
    kw = dict(d_ssm=d_ssm, ngroups=1, d_state=d_state, nheads=nheads,
              headdim=headdim, chunk_size=16)
    return xBCdt, A_log, dt_bias, Ds, kw


def _run_core(args, dirs: bool, monkeypatch):
    xBCdt, A_log, dt_bias, Ds, kw = args
    if not dirs:
        monkeypatch.setattr(ssd_mod, "ssd_dirs_chunk",
                            lambda *a, **k: None)
        # the branch imports locally — patch the source module attr
        import medical_image_classification_tpu.kernels.ssd as _s
        monkeypatch.setattr(_s, "ssd_dirs_chunk", lambda *a, **k: None)
    return ss2d.ss2d_core_ssd(xBCdt, A_log, dt_bias, Ds, **kw)


def test_dirs_gate_covers_test_shape():
    # N=128, d_ssm=32=gn: multi-chunk pick survives the gate (the parity
    # tests' config: d_state=32, nheads=4, headdim=8)
    assert ssd_mod.ssd_dirs_chunk(64, 16, 128, 8, 16, d_ssm=32) == 16
    # straddle / divisibility violations are rejected
    assert ssd_mod.ssd_dirs_chunk(64, 16, 128, 8, 16, d_ssm=40) is None
    # production MedSSD stage-0 shape passes in interpret mode
    assert ssd_mod.ssd_dirs_chunk(3136, 256, 512, 64, 8, d_ssm=128) == 224


def test_dirs_forward_parity(monkeypatch):
    args = _core_args()
    got = _run_core(args, True, monkeypatch)
    want = _run_core(args, False, monkeypatch)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_dirs_grad_parity(monkeypatch):
    args = _core_args(seed=3)
    xBCdt, A_log, dt_bias, Ds, kw = args

    def loss_fn(dirs):
        def f(x_, al_, db_, ds_):
            if not dirs:
                import medical_image_classification_tpu.kernels.ssd as _s
                orig = _s.ssd_dirs_chunk
                _s.ssd_dirs_chunk = lambda *a, **k: None
                try:
                    y = ss2d.ss2d_core_ssd(x_, al_, db_, ds_, **kw)
                finally:
                    _s.ssd_dirs_chunk = orig
            else:
                y = ss2d.ss2d_core_ssd(x_, al_, db_, ds_, **kw)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3))(xBCdt, A_log, dt_bias, Ds)

    g_dirs = loss_fn(True)
    g_ref = loss_fn(False)
    for gd, gr, name in zip(g_dirs, g_ref,
                            ["dxBCdt", "dA_log", "ddt_bias", "dDs"]):
        gr32 = np.asarray(gr, np.float32)
        np.testing.assert_allclose(
            np.asarray(gd, np.float32), gr32,
            rtol=1e-4, atol=1e-4 * max(1.0, float(np.abs(gr32).max())),
            err_msg=name)


def test_dirs_multi_head(monkeypatch):
    """nheads=8 per direction (d_ssm = 2*gn): multiple x sections per
    layout (SPL=2) and a B/C block index iB=2 — exercises the stack5
    block-cutting arithmetic beyond the d_ssm == gn base case."""
    args = _core_args(nheads=8, seed=7)
    got = _run_core(args, True, monkeypatch)
    want = _run_core(args, False, monkeypatch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_dirs_single_chunk(monkeypatch):
    """nc=1 (MedSSD stage-2 shape, reduced): mirror map degenerates to a
    pure within-chunk J reversal; fwd + grads vs the materialised path."""
    xBCdt, A_log, dt_bias, Ds, kw = _core_args(B=2, HW=4, d_state=32,
                                               seed=11)
    kw = dict(kw, chunk_size=16)          # L = 16 -> single chunk
    args = (xBCdt, A_log, dt_bias, Ds, kw)
    # production gate rejects nc=1 (measured loss); force it here to keep
    # the degenerate kernel path parity-tested in case the gate widens
    gate = sfd.ssd_fused_dirs_supported
    monkeypatch.setattr(
        sfd, "ssd_fused_dirs_supported",
        lambda l, N, P, nc, H4, itemsize=2, d_ssm=0: gate(
            l, N, P, max(nc, 2), H4, itemsize, d_ssm))
    assert ssd_mod.ssd_dirs_chunk(16, 16, 128, 8, 16, d_ssm=32) == 16
    got = _run_core(args, True, monkeypatch)
    want = _run_core(args, False, monkeypatch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def g(dirs):
        import medical_image_classification_tpu.kernels.ssd as _s
        orig = _s.ssd_dirs_chunk
        if not dirs:
            _s.ssd_dirs_chunk = lambda *a, **k: None
        try:
            return jax.grad(lambda x_: jnp.sum(ss2d.ss2d_core_ssd(
                x_, A_log, dt_bias, Ds, **kw).astype(jnp.float32) ** 2))(
                    xBCdt)
        finally:
            _s.ssd_dirs_chunk = orig

    np.testing.assert_allclose(np.asarray(g(True)), np.asarray(g(False)),
                               rtol=1e-4, atol=1e-4)


def test_dirs_bf16_parity(monkeypatch):
    xBCdt, A_log, dt_bias, Ds, kw = _core_args(seed=5)
    args = (xBCdt.astype(jnp.bfloat16), A_log, dt_bias, Ds, kw)
    got = _run_core(args, True, monkeypatch)
    want = _run_core(args, False, monkeypatch)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=5e-2)


def test_dirs_production_gate():
    """Production gate (pretend TPU): MedSSD stage 0 rides the dirs path
    at its pad-free 224 chunk; stage 1 (784, no in-window divisor with
    nc>=2... 196 divides) and small-N ST-SSD shapes stay off."""
    sfd._INTERPRET = False
    sfd._MIN_L = 196
    import unittest.mock as mock
    with mock.patch.object(sfd.jax, "default_backend", lambda: "tpu"):
        # MedSSD stage 0: L=3136, N=512, P=64, H4=8, d_ssm=128
        assert ssd_mod.ssd_dirs_chunk(3136, 256, 512, 64, 8,
                                      d_ssm=128) == 224
        # stage 1: L=784 -> 4 x 196 inside the widened window
        assert ssd_mod.ssd_dirs_chunk(784, 256, 512, 64, 16,
                                      d_ssm=256) == 196
        # stage 2: L=196 single chunk stays OFF (nc=1 measured loss)
        assert ssd_mod.ssd_dirs_chunk(196, 256, 512, 64, 32,
                                      d_ssm=512) is None
        # stage 3: L=49 has no pad-free chunk in the window -> off
        assert ssd_mod.ssd_dirs_chunk(49, 256, 512, 64, 64,
                                      d_ssm=1024) is None
        # ST-SSD small N: gate rejects N % 128
        assert ssd_mod.ssd_dirs_chunk(3136, 256, 64, 64, 8,
                                      d_ssm=128) is None
        # fp32 rejected on hardware
        assert ssd_mod.ssd_dirs_chunk(3136, 256, 512, 64, 8, 4,
                                      d_ssm=128) is None
        # gn=32 rejected on hardware: the role-major B/C slab blocks are
        # 2*gn=64 lanes — not tileable to 128 (gn=64 IS fine: 2*gn=128)
        assert ssd_mod.ssd_dirs_chunk(3136, 256, 128, 64, 8,
                                      d_ssm=128) is None
