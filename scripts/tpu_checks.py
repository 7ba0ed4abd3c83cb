#!/usr/bin/env python
"""On-device TPU validation suite (run manually; the pytest suite is
hermetic-CPU, so device-level checks live here).

Checks:
  1. Pallas scan fwd matches the XLA scan on real shapes (compiled).
  2. Pallas fwd+bwd gradients match the XLA recompute path.
  3. Full-model gradient parity: train-step grads via scan_impl='pallas'
     vs 'xla' (cosine + relative norm).

Last run (2026-08-16, v5e-1): all pass —
  scan fwd max err 1.1e-5; grads worst rel 5.6e-5;
  full-model cosine 1.00000012, relnorm 5.98e-09.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np


def check_scan():
    import medical_image_classification_tpu.kernels.selective_scan_pallas as ssp
    K, Dm, N = 4, 96, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    A = -jnp.exp(jax.random.normal(ks[2], (K, Dm, N)) * 0.5)
    D = jax.random.normal(ks[5], (K, Dm))
    bias = 0.1 * jax.random.normal(ks[6], (K, Dm))
    G, L = 8, 784
    u = jax.random.normal(ks[0], (G, L, Dm))
    delta = 0.5 * jax.random.normal(ks[1], (G, L, Dm))
    B = jax.random.normal(ks[3], (G, L, N))
    C = jax.random.normal(ks[4], (G, L, N))
    args = (u, delta, A, B, C, D, bias)
    y = ssp.selective_scan_pallas_folded(*args)
    y_ref = ssp._xla_equivalent(*args)
    err = float(jnp.max(jnp.abs(y - y_ref)))
    print(f"[1] scan fwd max err: {err:.2e}")
    assert err < 1e-3

    loss = lambda fn: (lambda a: jnp.sum(jnp.sin(fn(*a))))
    gp = jax.grad(loss(ssp.selective_scan_pallas_folded))(args)
    gr = jax.grad(loss(ssp._xla_equivalent))(args)
    worst = max(float(jnp.max(jnp.abs(p - r))) /
                (float(jnp.max(jnp.abs(r))) + 1e-9)
                for p, r in zip(gp, gr))
    print(f"[2] scan grads worst rel err: {worst:.2e}")
    assert worst < 1e-3


def check_model_grads():
    from medical_image_classification_tpu.models import create_model
    from medical_image_classification_tpu.train.train_state import (
        cross_entropy_loss)
    from medical_image_classification_tpu.data.image_folder import (
        normalize_batch)

    kw = dict(depths=(1, 1), dims=(32, 64), d_state=8, drop_path_rate=0.0)
    imgs = np.random.RandomState(0).randint(0, 256, (8, 64, 64, 3), np.uint8)
    labels = np.arange(8, dtype=np.int32) % 4

    def grads(impl):
        model = create_model("medmamba", num_classes=4, scan_impl=impl, **kw)
        x = normalize_batch(jnp.asarray(imgs))
        v = jax.jit(lambda r, xx: model.init({"params": r}, xx, train=False))(
            jax.random.PRNGKey(0), x)
        other = {k: w for k, w in v.items()
                 if k not in ("params", "perturbations")}

        def loss(p):
            out, _ = model.apply({"params": p, **other}, x, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(1)},
                                 mutable=["batch_stats"])
            return cross_entropy_loss(out, jnp.asarray(labels))

        return jax.jit(jax.grad(loss))(v["params"])

    gp, gx = grads("pallas"), grads("xla")
    fp = jnp.concatenate([l.ravel() for l in jax.tree_util.tree_leaves(gp)])
    fx = jnp.concatenate([l.ravel() for l in jax.tree_util.tree_leaves(gx)])
    cos = float(jnp.vdot(fp, fx) / (jnp.linalg.norm(fp) * jnp.linalg.norm(fx)))
    rel = float(jnp.linalg.norm(fp - fx) / jnp.linalg.norm(fx))
    print(f"[3] full-model grads: cosine={cos:.8f} relnorm={rel:.2e}")
    assert cos > 0.9999 and rel < 1e-2


def check_dirs_path():
    """Flip-free direction-folded fused SSD (r3) vs the materialised
    4-direction path: MedSSD logits + full-model grads, Mosaic-compiled.

    bf16 tolerances: the paths differ in accumulation order (stage 1
    XLA -> fused; interpret-mode fp32 parity is 1e-4,
    tests/test_ssd_fused_dirs.py); dt_bias/A_log leaves carry ~1e-8-norm
    gradients where bf16 noise dominates, so compare the global vectors.
    """
    import medical_image_classification_tpu.kernels.ssd as ssd_mod
    from medical_image_classification_tpu.data.image_folder import (
        normalize_batch)
    from medical_image_classification_tpu.models import create_model
    from medical_image_classification_tpu.train.train_state import (
        cross_entropy_loss)

    model = create_model("medssd", num_classes=4, dtype=jnp.bfloat16)
    imgs = np.random.RandomState(0).randint(0, 256, (4, 224, 224, 3),
                                            np.uint8)
    labels = np.arange(4, dtype=np.int32)
    x = normalize_batch(jnp.asarray(imgs))
    v = jax.jit(lambda r, xx: model.init({"params": r}, xx, train=False))(
        jax.random.PRNGKey(0), x)
    other = {k: w for k, w in v.items()
             if k not in ("params", "perturbations")}

    def run(dirs_on):
        orig = ssd_mod.ssd_dirs_chunk
        if not dirs_on:
            ssd_mod.ssd_dirs_chunk = lambda *a, **k: None
        try:
            logits = jax.jit(lambda p, xx: model.apply(
                {"params": p, **other}, xx, train=False))(v["params"], x)

            def loss(p):
                out = model.apply({"params": p, **other}, x, train=False)
                return cross_entropy_loss(out, jnp.asarray(labels))

            g = jax.jit(jax.grad(loss))(v["params"])
        finally:
            ssd_mod.ssd_dirs_chunk = orig
        flat = jnp.concatenate([l.astype(jnp.float32).ravel()
                                for l in jax.tree_util.tree_leaves(g)])
        return np.asarray(logits, np.float32), np.asarray(flat)

    (ly, gy), (ln_, gn_) = run(True), run(False)
    rel_y = float(np.max(np.abs(ly - ln_)) / (np.max(np.abs(ln_)) + 1e-30))
    cos = float(np.dot(gy, gn_) /
                (np.linalg.norm(gy) * np.linalg.norm(gn_) + 1e-30))
    print(f"[8] dirs-path medssd: logits rel={rel_y:.2e} grad cos={cos:.6f}")
    assert rel_y < 3e-2 and cos > 0.995


def check_st_kernels():
    """Compiled (Mosaic) parity for the ST-SSD fused kernels at the real
    stage-0 shape — interpret-mode tests can't catch lowering issues like
    the P=3136 non-128-multiple lane padding in the softmax reductions."""
    from medical_image_classification_tpu.kernels import stl_mixer_pallas as smp
    from medical_image_classification_tpu.kernels import stf_zgate_pallas as szp

    BB, L, P, C = 4, 3136, 3136, 256
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    # scale matters: at init-scale u1/u2 (~0.06) the mixer outputs are
    # ~5e-3, dU = cos(U) rounds to exactly 1.0 in bf16, and the softmax
    # jacobian annihilates a constant dU — the TRUE du1 (measured in f64)
    # is below BOTH implementations' noise floors and the comparison is
    # two noise fields.  0.6 puts the grad signal well above bf16 noise.
    w = (0.5 * jax.random.normal(ks[0], (BB, L, C))).astype(jnp.bfloat16)
    u1 = jax.random.uniform(ks[1], (C, P), minval=-0.6,
                            maxval=0.6).astype(jnp.bfloat16)
    u2 = jax.random.uniform(ks[2], (C, C), minval=-0.6,
                            maxval=0.6).astype(jnp.bfloat16)

    def stl_ref(w, u1, u2):
        A = jax.nn.softmax((w @ u1).astype(jnp.float32), -1).astype(w.dtype)
        return jnp.einsum("blp,blc->bpc", A, w @ u2)

    # grads are compared as VJPs against an EXPLICIT random cotangent:
    # a scalar loss like sum(sin(Y)) has dY = cos(Y), and |Y| here is
    # O(100) — bf16-level fwd differences between the two implementations
    # then fully decorrelate cos(Y), so a loss-based comparison measures
    # chaos, not kernel error (measured: 2.3e-1 "error" via sin-loss vs
    # 5e-3 true VJP disagreement at identical cotangents).
    def vjp_cmp(fn_k, fn_r, args, dY):
        _, vk = jax.vjp(fn_k, *args)
        _, vr = jax.vjp(fn_r, *args)
        gk = jax.jit(vk)(dY)
        gr = jax.jit(vr)(dY)
        return max(float(jnp.max(jnp.abs((p - r).astype(jnp.float32)))) /
                   (float(jnp.max(jnp.abs(r.astype(jnp.float32)))) + 1e-9)
                   for p, r in zip(gk, gr))

    assert smp.stl_mixer_supported(L, P, C)
    y = jax.jit(smp.stl_mixer)(w, u1, u2)
    y_ref = jax.jit(stl_ref)(w, u1, u2)
    scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-9
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32) -
                                y_ref.astype(jnp.float32)))) / scale
    print(f"[4] stl_mixer fwd max rel err (bf16): {err:.2e}")
    assert err < 5e-2
    dY = (0.5 * jax.random.normal(jax.random.PRNGKey(9),
                                  y_ref.shape)).astype(jnp.bfloat16)
    worst = vjp_cmp(smp.stl_mixer, stl_ref, (w, u1, u2), dY)
    print(f"[5] stl_mixer grads worst rel err (bf16): {worst:.2e}")
    assert worst < 5e-2

    pooledT = (0.5 * jax.random.normal(ks[3], (BB, P, C))).astype(jnp.bfloat16)
    U = y_ref

    def z_ref(pooledT, lz, U):
        Z = jax.nn.sigmoid(pooledT @ lz)
        return jnp.einsum("bpq,bqc->bpc", Z, U.astype(Z.dtype))

    assert szp.stf_zgate_supported(P, C)
    y2 = jax.jit(szp.stf_zgate)(pooledT, u1, U)
    y2_ref = jax.jit(z_ref)(pooledT, u1, U)
    scale = float(jnp.max(jnp.abs(y2_ref.astype(jnp.float32)))) + 1e-9
    err = float(jnp.max(jnp.abs(y2.astype(jnp.float32) -
                                y2_ref.astype(jnp.float32)))) / scale
    print(f"[6] stf_zgate fwd max rel err (bf16): {err:.2e}")
    assert err < 5e-2
    worst = vjp_cmp(szp.stf_zgate, z_ref, (pooledT, u1, U), dY)
    print(f"[7] stf_zgate grads worst rel err (bf16): {worst:.2e}")
    assert worst < 5e-2


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "run on a TPU host"
    check_scan()
    check_model_grads()
    check_st_kernels()
    check_dirs_path()
    print("ALL TPU CHECKS PASS")
