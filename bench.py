#!/usr/bin/env python
"""Benchmark: MedMamba train+infer throughput (images/sec/chip) at 224x224.

The driver-defined north-star metric (BASELINE.json): images/sec/chip for
MedMamba classification, batch 32, Adam, CE — the `train.py` config of the
reference.  The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is computed against a documented nominal PyTorch-GPU anchor
until a measured torch baseline exists.

Timing: N iterations inside one jitted fori_loop with a data-dependency
chain and a single host sync (plain block_until_ready loops mis-measure
through the axon relay — see utils/timing.py).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

import argparse
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

# Nominal single-GPU PyTorch throughput anchor for MedMamba-T train at
# batch 32 / 224^2 (selective-scan-bound; no published reference number
# exists - see BASELINE.md).  Revised when a measured torch baseline lands.
REF_TORCH_IPS = 200.0


def bench(model_name: str, batch: int, size: int, iters: int, mode: str,
          dtype: str):
    from medical_image_classification_tpu.models import create_model
    from medical_image_classification_tpu.train.optim import make_optimizer
    from medical_image_classification_tpu.train.train_state import (
        init_train_state, make_train_step_fn)
    from medical_image_classification_tpu.utils.timing import (
        chained_device_time)
    from medical_image_classification_tpu.data.image_folder import (
        normalize_batch)

    dt = {"bf16": jnp.bfloat16, "fp32": None}[dtype]
    model = create_model(model_name, num_classes=8, dtype=dt)
    tx = make_optimizer("adam", 1e-4)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (batch, size, size, 3), dtype=np.uint8))
    labels = jnp.asarray(np.arange(batch, dtype=np.int32) % 8)
    state = init_train_state(model, rng, imgs, tx)

    results = {}
    if mode in ("train", "both"):
        raw_step = make_train_step_fn(model)

        def train_carry(s):
            s2, _ = raw_step(s, imgs, labels, rng)
            return s2

        t = chained_device_time(train_carry, state, iters=iters)
        results["train_ips"] = batch / t
    if mode in ("infer", "both"):
        variables = {"params": state.params, **state.model_state}

        def infer_carry(x):
            logits = model.apply(variables, x, train=False)
            # feed a zero derived from logits back into the carry to chain
            bump = (0.0 * jnp.sum(logits)).astype(jnp.float32)
            return x + bump.astype(x.dtype)

        x0 = normalize_batch(imgs)
        t = chained_device_time(infer_carry, x0, iters=iters)
        results["infer_ips"] = batch / t
    return results


def bench_fusion(model_name: str, batch: int, size: int, iters: int,
                 dtype: str = "fp32"):
    """Fusion-family train throughput (pairs/sec): the reference anchor
    config (batch 2, 256^2, Adam, SSIM+grad loss — `CrossMamba/train.py`,
    fp32).  dtype="bf16" measures the compute-dtype override."""
    import optax
    from medical_image_classification_tpu.models.registry import (
        create_fusion_model)
    from medical_image_classification_tpu.train.fusion_losses import (
        fusion_loss)
    from medical_image_classification_tpu.train.optim import make_optimizer
    from medical_image_classification_tpu.utils.timing import (
        chained_device_time)

    channels = 1 if model_name == "fusionmamba" else 3
    kw = {"dtype": jnp.bfloat16} if dtype == "bf16" else {}
    model = create_fusion_model(model_name, **kw)
    tx = make_optimizer("adam", 2e-4)
    rng = jax.random.PRNGKey(0)
    xa = jnp.asarray(np.random.RandomState(0).rand(
        batch, size, size, channels), jnp.float32)
    xb = jnp.asarray(np.random.RandomState(1).rand(
        batch, size, size, channels), jnp.float32)
    import functools
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, xa, xb)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

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

    t = chained_device_time(train_carry, (params, bstats, tx.init(params)),
                            iters=iters)
    return {"train_ips": batch / t}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="medmamba")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--mode", default="both", choices=["train", "infer", "both"])
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--extra-models",
                   default="medssd:16,st_ssd:8,vfefm_2b2:2,vfefm_2b2:2:bf16",
                   help="comma list of model[:batch[:dtype]] also measured "
                        "and reported under extra (VERDICT r1: track medssd "
                        "+ one fusion model per round); '' disables")
    args = p.parse_args()

    n_dev = jax.local_device_count()
    res = bench(args.model, args.batch, args.size, args.iters, args.mode,
                args.dtype)
    train_ips = res.get("train_ips", 0.0)
    infer_ips = res.get("infer_ips", 0.0)
    headline = train_ips if train_ips else infer_ips
    out = {
        "metric": f"{args.model} train images/sec/chip @{args.size} "
                  f"b{args.batch} {args.dtype}",
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
    from medical_image_classification_tpu.models.registry import (
        available_fusion_models)
    for spec in filter(None, args.extra_models.split(",")):
        parts = spec.split(":")
        name = parts[0]
        b = int(parts[1]) if len(parts) > 1 and parts[1] else args.batch
        fdtype = parts[2] if len(parts) > 2 else "fp32"
        key = name if fdtype == "fp32" else f"{name}_{fdtype}"
        try:
            if name in available_fusion_models():
                r = bench_fusion(name, b, 256, max(args.iters // 2, 5),
                                 dtype=fdtype)
            else:
                r = bench(name, b, args.size, max(args.iters // 2, 5),
                          "both", args.dtype)
            out["extra"][f"{key}_train_ips"] = round(r.get("train_ips", 0), 2)
            out["extra"][f"{key}_infer_ips"] = round(r.get("infer_ips", 0), 2)
            out["extra"][f"{key}_batch"] = b
        except Exception as e:  # pragma: no cover — extras must not kill
            out["extra"][f"{key}_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
