#!/usr/bin/env python
"""Generate FLOPS.json — analytic-exact FLOPs for every benched config.

Rebuilds the reference's FLOP-reporting philosophy (the analytic scan FLOP
counter at `/root/reference/MedMamba.py:28-143` and thop-based
`cal_params_flops`, `FusionMamba/utils.py:450-462`) the TPU way: lower the
ACTUAL jitted fwd / train-step programs on the CPU backend with every
Pallas path disabled (scan_impl="xla"; the Pallas gates are
backend-conditional, so the CPU lowering is pure countable XLA HLO) and
read XLA's own cost analysis.  FLOPs are layout-invariant, so the CPU
program's count applies to the TPU program modulo custom-call recompute
(the Pallas bwd kernels RECOMPUTE the fwd scan — model-level MFU from
these counts is therefore the algorithmic-useful-work fraction, the same
convention the reference uses).

bench.py reads the committed FLOPS.json to report per-model
{fwd_gflops_per_image, step_gflops_per_image, mfu_pct} next to img/s.
Regenerate (CPU-only, ~2 min) after any model change:

    python scripts/flops_report.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

# bench configs: key -> (kind, model_name, batch, size, dtype)
CONFIGS = {
    "medmamba": ("cls", "medmamba", 32, 224, "bf16"),
    "medssd": ("cls", "medssd", 32, 224, "bf16"),
    "st_ssd": ("cls", "st_ssd", 8, 224, "bf16"),
    "medssd_ekan": ("cls", "medssd_ekan", 16, 224, "bf16"),
    "cross_cls_stage3": ("cross", "cross_cls_stage3", 8, 224, "bf16"),
    "vfefm_2b2_bf16": ("fusion", "vfefm_2b2", 2, 256, "bf16"),
    "vfefm_2b2": ("fusion", "vfefm_2b2", 2, 256, "fp32"),
}


def _flops(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"])


def cls_flops(name, batch, size, dtype):
    from medical_image_classification_tpu.models import create_model
    from medical_image_classification_tpu.train.optim import make_optimizer
    from medical_image_classification_tpu.train.train_state import (
        init_train_state, make_train_step_fn)

    dt = {"bf16": jnp.bfloat16, "fp32": None}[dtype]
    model = create_model(name, num_classes=8, dtype=dt, scan_impl="xla")
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (batch, size, size, 3), dtype=np.uint8))
    labels = jnp.asarray(np.arange(batch, dtype=np.int32) % 8)
    state = init_train_state(model, rng, imgs, make_optimizer("adam", 1e-4))
    variables = {"params": state.params, **state.model_state}
    from medical_image_classification_tpu.data.image_folder import (
        normalize_batch)

    def fwd(v, x):
        return model.apply(v, normalize_batch(x), train=False)

    fwd_f = _flops(fwd, variables, imgs)
    raw_step = make_train_step_fn(model)

    def step(s):
        s2, _ = raw_step(s, imgs, labels, rng)
        return s2

    step_f = _flops(step, state)
    return fwd_f, step_f


def fusion_flops(name, batch, size, dtype):
    import functools
    import optax
    from medical_image_classification_tpu.models.registry import (
        create_fusion_model)
    from medical_image_classification_tpu.train.fusion_losses import (
        fusion_loss)
    from medical_image_classification_tpu.train.optim import make_optimizer

    channels = 1 if name == "fusionmamba" else 3
    # FusionVFEFM has no scan_impl plumb; on the CPU backend impl="auto"
    # resolves to the countable XLA path anyway (selective_scan.py:200)
    kw = {"dtype": jnp.bfloat16} if dtype == "bf16" else {}
    model = create_fusion_model(name, **kw)
    tx = make_optimizer("adam", 2e-4)
    rng = jax.random.PRNGKey(0)
    xa = jnp.asarray(np.random.RandomState(0).rand(
        batch, size, size, channels), jnp.float32)
    xb = jnp.asarray(np.random.RandomState(1).rand(
        batch, size, size, channels), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, xa, xb)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    def fwd(p, x):
        return model.apply({"params": p, "batch_stats": bstats}, x, xb,
                           train=False)

    fwd_f = _flops(fwd, params, xa)

    def train_carry(carry):
        params, bstats, opt_state = carry

        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": bstats}, xa, xb, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            gen = jnp.clip(out, 0.0, 1.0)
            total, *_ = fusion_loss(xa, xb, gen)
            return total, upd

        (_, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates),
                upd.get("batch_stats", bstats), opt_state2)

    step_f = _flops(train_carry, (params, bstats, tx.init(params)))
    return fwd_f, step_f


def cross_flops(name, batch, size, dtype):
    """Paired-input classifier (mirrors bench.bench_cross_cls)."""
    import functools
    import optax
    from medical_image_classification_tpu.models.registry import (
        create_fusion_model)
    from medical_image_classification_tpu.train.optim import make_optimizer

    # no scan_impl plumb on the classifier; impl="auto" resolves to the
    # countable XLA path on the CPU backend anyway (selective_scan.py:200)
    kw = {"dtype": jnp.bfloat16} if dtype == "bf16" else {}
    model = create_fusion_model(name, num_classes=8, **kw)
    tx = make_optimizer("adam", 1e-4)
    rng = jax.random.PRNGKey(0)
    xa = jnp.asarray(np.random.RandomState(0).rand(
        batch, size, size, 3), jnp.float32)
    xb = jnp.asarray(np.random.RandomState(1).rand(
        batch, size, size, 3), jnp.float32)
    labels = jnp.asarray(np.arange(batch, dtype=np.int32) % 8)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, xa, xb)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    def fwd(p, x):
        vin = {"params": p}
        if bstats:
            vin["batch_stats"] = bstats
        return model.apply(vin, x, xb, train=False)

    fwd_f = _flops(fwd, params, xa)

    def train_carry(carry):
        params, bstats, opt_state = carry

        def loss_fn(p):
            mut = ["batch_stats"] if bstats else []
            out = model.apply(
                {"params": p, **({"batch_stats": bstats} if bstats else {})},
                xa, xb, train=True, rngs={"dropout": rng}, mutable=mut)
            logits, upd = out if mut else (out, {})
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1)), upd

        (_, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates),
                upd.get("batch_stats", bstats), opt_state2)

    step_f = _flops(train_carry, (params, bstats, tx.init(params)))
    return fwd_f, step_f


def main():
    only = sys.argv[1:] or None
    path = os.path.join(os.path.dirname(__file__), "..", "FLOPS.json")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    for key, (kind, name, batch, size, dtype) in CONFIGS.items():
        if only and key not in only:
            continue
        fn = {"cls": cls_flops, "fusion": fusion_flops,
              "cross": cross_flops}[kind]
        fwd_f, step_f = fn(name, batch, size, dtype)
        out[key] = {
            "model": name, "batch": batch, "size": size, "dtype": dtype,
            "fwd_flops": fwd_f, "step_flops": step_f,
            "fwd_flops_per_image": fwd_f / batch,
            "step_flops_per_image": step_f / batch,
        }
        print(f"{key}: fwd {fwd_f / batch / 1e9:.2f} GF/img, "
              f"step {step_f / batch / 1e9:.2f} GF/img", file=sys.stderr)
        with open(path, "w") as f:             # incremental: compiles are
            json.dump(out, f, indent=1, sort_keys=True)  # minutes each
    print(f"wrote {os.path.abspath(path)}", file=sys.stderr)


if __name__ == "__main__":
    main()
