#!/usr/bin/env python
"""End-to-end learnability check on TPU: full-size MedMamba (bf16 + Pallas
scan) trains an 8-class synthetic oriented-grating task to 100% held-out
accuracy in 150 steps.

Last runs (2026-08-18, v5e-1, fused Pallas SSD kernel path):
  medmamba: step 0 loss 2.2226 acc 0.156 ... step 149 loss 0.0002 acc 1.000;
            held-out acc 1.000
  medssd:   step 99 loss 0.0000 acc 1.000; held-out acc 1.000
Pass --model medssd to run the SSD core instead.
"""
import argparse
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from medical_image_classification_tpu.models import create_model
from medical_image_classification_tpu.train.optim import make_optimizer
from medical_image_classification_tpu.train.train_state import (
    init_train_state, make_train_step, make_eval_step)


def make_batch(rng, n=32):
    labels = rng.integers(0, 8, n).astype(np.int32)
    yy, xx = np.mgrid[0:224, 0:224].astype(np.float32) / 224.0
    imgs = np.empty((n, 224, 224, 3), np.uint8)
    for i, c in enumerate(labels):
        angle = (c % 4) * np.pi / 4
        freq = 6.0 if c < 4 else 14.0
        wave = np.sin(2 * np.pi * freq * (np.cos(angle) * xx
                                          + np.sin(angle) * yy))
        img = (127.5 + 80 * wave + rng.normal(0, 25, (224, 224))).clip(0, 255)
        imgs[i] = np.repeat(img[..., None], 3, -1).astype(np.uint8)
    return imgs, labels


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="medmamba")
    ap.add_argument("--steps", type=int, default=150)
    a = ap.parse_args()
    model = create_model(a.model, num_classes=8, dtype=jnp.bfloat16)
    tx = make_optimizer("adam", 1e-4)
    rng_np = np.random.default_rng(0)
    imgs0, labels0 = make_batch(rng_np)
    state = init_train_state(model, jax.random.PRNGKey(0),
                             jnp.asarray(imgs0), tx)
    step = make_train_step(model)
    ev = make_eval_step(model)
    key = jax.random.PRNGKey(1)
    for it in range(a.steps):
        imgs, labels = make_batch(rng_np)
        state, m = step(state, jnp.asarray(imgs), jnp.asarray(labels), key)
        if it % 30 == 0 or it == a.steps - 1:
            print(f"step {it}: loss {float(m['loss']):.4f} "
                  f"acc {float(m['accuracy']):.3f}", flush=True)
    rng_ho = np.random.default_rng(999)
    correct = total = 0
    for _ in range(4):
        imgs, labels = make_batch(rng_ho)
        c, _ = ev(state, jnp.asarray(imgs), jnp.asarray(labels))
        correct += int(c)
        total += 32
    acc = correct / total
    print(f"held-out acc: {acc:.3f}")
    assert acc > 0.95
