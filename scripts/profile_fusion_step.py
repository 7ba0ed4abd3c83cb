#!/usr/bin/env python
"""Trace a few fusion-model train steps (reference anchor config: batch 2,
256^2, Adam, SSIM+grad Fusionloss — `CrossMamba/train.py`) and print the
device-op attribution.  Mirrors scripts/profile_step.py for the fusion
family (bench.py::bench_fusion step semantics)."""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="vfefm_2b2")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"])
    p.add_argument("--logdir", default="/tmp/mic_fusion_trace")
    args = p.parse_args()

    from medical_image_classification_tpu.models.registry import (
        create_fusion_model)
    from medical_image_classification_tpu.train.fusion_losses import (
        fusion_loss)
    from medical_image_classification_tpu.train.optim import make_optimizer
    from medical_image_classification_tpu.utils import profiling

    channels = 1 if args.model == "fusionmamba" else 3
    kw = {"dtype": jnp.bfloat16} if args.dtype == "bf16" else {}
    model = create_fusion_model(args.model, **kw)
    tx = make_optimizer("adam", 2e-4)
    rng = jax.random.PRNGKey(0)
    xa = jnp.asarray(np.random.RandomState(0).rand(
        args.batch, args.size, args.size, channels), jnp.float32)
    xb = jnp.asarray(np.random.RandomState(1).rand(
        args.batch, args.size, args.size, channels), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, xa, xb)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    @jax.jit
    def step(carry):
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

    carry = (params, bstats, tx.init(params))
    for _ in range(2):
        carry = step(carry)
    jax.block_until_ready(carry)

    with profiling.trace(args.logdir):
        for _ in range(args.steps):
            carry = step(carry)
        jax.block_until_ready(carry)

    summary = profiling.summarize_trace(args.logdir, steps=args.steps)
    profiling.print_trace_summary(summary, top=20)


if __name__ == "__main__":
    main()
