#!/usr/bin/env python
"""Bound the BASELINE.md torch anchor with a measured same-hardware ratio.

The reference publishes no throughput numbers and its CUDA kernels cannot
run here, so bench.py's ``vs_baseline`` divides by a documented nominal
constant (REF_TORCH_IPS=200).  This script replaces "guessed" with
"bounded": it times ONE identical tiny-config MedMamba train step (CE +
Adam, identical imported weights) in both stacks on the same CPU:

  torch side — the real reference model (`/root/reference/MedMamba.py`)
    with the sequential-scan stub (tests/reference_stubs.py), i.e. a
    per-timestep loop of vectorized torch ops: the best runnable CPU
    implementation of the reference here, but structurally slower than
    its CUDA kernel would be.
  jax side  — this repo's model, CPU backend, XLA scan path.

The resulting ratio therefore OVERSTATES the jax advantage wherever the
scan dominates and is reported as a bound, not an anchor: see the
BASELINE.md note this script's output updates.

Usage: python scripts/baseline_bound.py [--steps 3]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

REF = "/root/reference"
DEPTHS, DIMS = (1, 1, 1, 1), (96, 192, 384, 768)
BATCH, SIZE = 4, 64


def time_torch(steps):
    from reference_stubs import load_reference_module
    torch.manual_seed(0)
    mm = load_reference_module(f"{REF}/MedMamba.py", "ref_mm_baseline")
    ref = mm.VSSM(depths=list(DEPTHS), dims=list(DIMS), num_classes=8,
                  drop_path_rate=0.0)
    sd = {k: v.detach().clone().cpu() for k, v in ref.state_dict().items()}
    x = torch.from_numpy(np.random.RandomState(0).randn(
        BATCH, 3, SIZE, SIZE).astype(np.float32))
    labels = torch.from_numpy(np.arange(BATCH) % 8)
    opt = torch.optim.Adam(ref.parameters(), lr=1e-4)
    ref.train()

    def step():
        opt.zero_grad(set_to_none=True)
        loss = F.cross_entropy(ref(x), labels)
        loss.backward()
        opt.step()

    step()                                    # warm
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    return (time.perf_counter() - t0) / steps, sd


def time_jax(steps, sd):
    import optax
    from medical_image_classification_tpu.models import create_model
    from medical_image_classification_tpu.utils.torch_import import (
        import_medmamba_state_dict)
    params, stats = import_medmamba_state_dict(sd, depths=DEPTHS, dims=DIMS)
    model = create_model("medmamba", num_classes=8, depths=DEPTHS,
                         dims=DIMS, drop_path_rate=0.0)
    x = jnp.asarray(np.random.RandomState(0).randn(
        BATCH, 3, SIZE, SIZE).astype(np.float32).transpose(0, 2, 3, 1))
    labels = jnp.asarray(np.arange(BATCH, dtype=np.int32) % 8)
    tx = optax.adam(1e-4)

    def np_tree(t):
        return jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a)), t)

    p, bstats = np_tree(params), np_tree(stats)
    opt_state = tx.init(p)

    @jax.jit
    def step(p, bstats, opt_state):
        def loss_fn(pp, bs):
            out, upd = model.apply(
                {"params": pp, "batch_stats": bs}, x, train=True,
                rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"])
            logp = jax.nn.log_softmax(out)
            return (-jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1)),
                    upd)

        (loss, upd), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, bstats)
        updates, opt_state = tx.update(grads, opt_state, p)
        return (optax.apply_updates(p, updates), upd["batch_stats"],
                opt_state, loss)

    out = step(p, bstats, opt_state)          # compile + warm
    jax.block_until_ready(out[3])
    t0 = time.perf_counter()
    st = (p, bstats, opt_state)
    for _ in range(steps):
        *st, loss = step(*st)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()
    tt, sd = time_torch(args.steps)
    tj = time_jax(args.steps, sd)
    print(f"config: MedMamba depths={DEPTHS} dims={DIMS} b{BATCH} {SIZE}^2, "
          f"CE+Adam, fp32, same imported weights, 1 CPU")
    print(f"torch  (reference + sequential-scan stub): {tt*1e3:9.1f} ms/step")
    print(f"jax    (this repo, XLA scan path):         {tj*1e3:9.1f} ms/step")
    print(f"ratio torch/jax: {tt/tj:.1f}x  "
          f"(overstates the gap where the scan dominates — see BASELINE.md)")


if __name__ == "__main__":
    main()
