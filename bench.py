#!/usr/bin/env python
"""Benchmark: MedMamba train+infer throughput (images/sec/chip) at 224x224.

The driver-defined north-star metric (BASELINE.json): images/sec/chip for
MedMamba classification, batch 32, Adam, CE — the `train.py` config of the
reference.  The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is computed against a documented nominal PyTorch-GPU anchor
until a measured torch baseline exists.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

# Nominal single-GPU PyTorch throughput anchor for MedMamba-T train at
# batch 32 / 224^2 (selective-scan-bound; no published reference number
# exists - see BASELINE.md).  Revised when a measured torch baseline lands.
REF_TORCH_IPS = 200.0


def bench(model_name: str = "medmamba", batch: int = 32, size: int = 224,
          warmup: int = 3, iters: int = 10, mode: str = "train"):
    from medical_image_classification_tpu.models import create_model
    from medical_image_classification_tpu.train.optim import make_optimizer
    from medical_image_classification_tpu.train.train_state import (
        init_train_state, make_train_step, make_eval_step)

    model = create_model(model_name, num_classes=8)
    tx = make_optimizer("adam", 1e-4)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (batch, size, size, 3), dtype=np.uint8))
    labels = jnp.asarray(np.arange(batch, dtype=np.int32) % 8)
    state = init_train_state(model, rng, imgs, tx)

    results = {}
    if mode in ("train", "both"):
        step = make_train_step(model, donate=False)
        for _ in range(warmup):
            state, m = step(state, imgs, labels, rng)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, imgs, labels, rng)
        jax.block_until_ready(m["loss"])
        results["train_ips"] = batch * iters / (time.perf_counter() - t0)
    if mode in ("infer", "both"):
        ev = make_eval_step(model)
        for _ in range(warmup):
            c, logits = ev(state, imgs, labels)
        jax.block_until_ready(logits)
        t0 = time.perf_counter()
        for _ in range(iters):
            c, logits = ev(state, imgs, labels)
        jax.block_until_ready(logits)
        results["infer_ips"] = batch * iters / (time.perf_counter() - t0)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="medmamba")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--mode", default="both", choices=["train", "infer", "both"])
    args = p.parse_args()

    n_dev = jax.local_device_count()
    res = bench(args.model, args.batch, args.size, iters=args.iters,
                mode=args.mode)
    train_ips = res.get("train_ips", 0.0)
    infer_ips = res.get("infer_ips", 0.0)
    headline = train_ips if train_ips else infer_ips
    out = {
        "metric": f"{args.model} train images/sec/chip @224 b{args.batch}",
        "value": round(headline / n_dev, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(headline / n_dev / REF_TORCH_IPS, 3),
        "extra": {
            "train_ips": round(train_ips, 2),
            "infer_ips": round(infer_ips, 2),
            "devices": n_dev,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
