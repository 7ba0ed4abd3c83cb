#!/usr/bin/env python
"""Trace a few train steps of any registry model and print the device-op
time breakdown (category / source line / op kind).

The TPU profiler works through the axon relay and names every XLA op with
its source line, so this is the ground truth for step-time attribution —
use it before guessing at optimizations.

Usage: python scripts/profile_step.py [--model medmamba] [--batch 32]
       [--size 224] [--steps 3] [--logdir /tmp/mic_trace]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="medmamba")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--logdir", default="/tmp/mic_trace")
    args = p.parse_args()

    from medical_image_classification_tpu.models import create_model
    from medical_image_classification_tpu.train.optim import make_optimizer
    from medical_image_classification_tpu.train.train_state import (
        init_train_state, make_train_step)
    from medical_image_classification_tpu.utils import profiling

    dt = {"bf16": jnp.bfloat16, "fp32": None}[args.dtype]
    model = create_model(args.model, num_classes=8, dtype=dt)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (args.batch, args.size, args.size, 3), dtype=np.uint8))
    labels = jnp.asarray(np.arange(args.batch, dtype=np.int32) % 8)
    state = init_train_state(model, rng, imgs, make_optimizer("adam", 1e-4))
    step = make_train_step(model, donate=False)

    for _ in range(2):                      # compile + warm
        state, m = step(state, imgs, labels, rng)
    jax.block_until_ready(m)

    with profiling.trace(args.logdir):
        for _ in range(args.steps):
            state, m = step(state, imgs, labels, rng)
        jax.block_until_ready(m)

    summary = profiling.summarize_trace(args.logdir, steps=args.steps)
    profiling.print_trace_summary(summary)


if __name__ == "__main__":
    main()
