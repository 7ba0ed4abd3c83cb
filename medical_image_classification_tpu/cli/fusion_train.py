"""CT/MRI fusion training CLI (`/root/reference/CrossMamba/train.py:73-190`).

  python -m medical_image_classification_tpu.cli.fusion_train \
      --data-path /data/CT_MRI --epochs 100 --batch-size 2 \
      [--single-decoder]   # the _2c1 variant (train2.py)

Defaults mirror the reference anchors: batch 2, Adam 2e-4, lr x 0.75^epoch,
256² grayscale pairs, output clamped to [0, 1].
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medical_image_classification_tpu.data.fusion_dataset import (
    FusionLoader, scan_fusion_pairs)
from medical_image_classification_tpu.models.crossmamba import FusionVFEFM
from medical_image_classification_tpu.train.checkpoint import (
    save_params_only)
from medical_image_classification_tpu.train.fusion_losses import fusion_loss
from medical_image_classification_tpu.train.optim import (
    make_optimizer, make_schedule)
from medical_image_classification_tpu.utils.logging_utils import get_logger


def main(args):
    log = get_logger()
    pairs = scan_fusion_pairs(args.data_path, args.dir_a, args.dir_b,
                              length=args.max_pairs)
    channels = 1 if args.model == "fusionmamba" else 3
    loader = FusionLoader(pairs, args.batch_size, args.image_size,
                          channels=channels, seed=args.seed)
    spe = loader.steps_per_epoch()
    log.info("%d pairs, %d steps/epoch", len(pairs), spe)

    kw = {}
    if getattr(args, "dtype", "fp32") == "bf16":
        # compute-dtype override (params stay fp32; fused image fp32).  The
        # reference anchor trains fp32, so fp32 remains the default.
        kw["dtype"] = jnp.bfloat16
    if args.depths:
        kw["depths"] = tuple(int(v) for v in args.depths.split(","))
        kw["depths_decoder"] = kw["depths"][::-1]
    if args.dims:
        kw["dims"] = tuple(int(v) for v in args.dims.split(","))
        kw["dims_decoder"] = kw["dims"][::-1]
    if args.model == "fusionmamba":
        # the `train_t.py` path: vendored VSSM_Fusion on 1-channel pairs
        # (`/root/reference/CrossMamba/train_t.py`)
        from medical_image_classification_tpu.models.fusionmamba import (
            VSSMFusion)
        model = VSSMFusion(d_state=args.d_state or 16, **kw)
    else:
        if args.headdim:
            kw["ssd_headdim"] = args.headdim
        model = FusionVFEFM(single_decoder=args.single_decoder,
                            d_state=args.d_state or 128,
                            cat_method=args.cat_method, **kw)
    sched = make_schedule("fusion_exp", args.lr, spe, args.epochs,
                          decay=args.lr_decay)
    tx = make_optimizer("adam", sched)

    rng = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((args.batch_size, args.image_size, args.image_size,
                    channels))
    import functools
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, x0, x0)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, bstats, opt_state, xa, xb, rng):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": bstats}, xa, xb, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            gen = jnp.clip(out, 0.0, 1.0)          # clamp (`train.py:125-128`)
            total, l_in, l_ssim, l_grad = fusion_loss(xa, xb, gen)
            return total, (upd, l_in, l_ssim, l_grad)

        (total, (upd, l_in, l_ssim, l_grad)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return (params2, upd.get("batch_stats", bstats), opt_state2,
                {"loss": total, "in": l_in, "ssim": l_ssim, "grad": l_grad})

    step_rng = jax.random.PRNGKey(args.seed + 1)
    gstep = 0
    for epoch in range(args.epochs):
        t0 = time.time()
        for xa, xb in loader.epoch(epoch):
            params, bstats, opt_state, m = train_step(
                params, bstats, opt_state, jnp.asarray(xa), jnp.asarray(xb),
                jax.random.fold_in(step_rng, gstep))
            gstep += 1
            if gstep % args.log_every == 0:
                eta = (time.time() - t0) / max(gstep % spe or spe, 1) * \
                      (spe - (gstep % spe))
                log.info("ep %d step %d loss %.4f (in %.4f ssim %.4f grad "
                         "%.4f) eta %.0fs", epoch, gstep, float(m["loss"]),
                         float(m["in"]), float(m["ssim"]), float(m["grad"]),
                         eta)
        log.info("epoch %d done in %.1fs", epoch, time.time() - t0)
        save_params_only(args.save_path, params)
    log.info("saved %s", args.save_path)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", required=True)
    p.add_argument("--dir-a", default="CT")
    p.add_argument("--dir-b", default="MRI")
    p.add_argument("--max-pairs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lr-decay", type=float, default=0.75)
    p.add_argument("--d-state", type=int, default=None,
                   help="default: 128 for vfefm, 16 for fusionmamba")
    p.add_argument("--cat-method", default="stack")
    p.add_argument("--model", default="vfefm",
                   choices=["vfefm", "fusionmamba"],
                   help="vfefm = CrossMamba/train.py; fusionmamba = the "
                        "train_t.py vendored VSSM_Fusion path")
    p.add_argument("--single-decoder", action="store_true")
    p.add_argument("--depths", default=None, help="comma ints, e.g. 2,2,4,2")
    p.add_argument("--dims", default=None, help="comma ints, e.g. 128,256,512,1024")
    p.add_argument("--headdim", type=int, default=None)
    p.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"],
                   help="compute dtype (reference anchor: fp32)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--save-path", default="runs/fusion.ckpt")
    main(p.parse_args())
