"""Classification training CLI.

Covers both reference entry points with one script:
  * `train.py` single-device loop (`/root/reference/train.py:14-109`)
  * `ddp_train.py --epochs --batch-size --data-path --resume`
    (`/root/reference/ddp_train.py:52-195`) — distribution is automatic:
    the step is GSPMD-sharded over all visible devices (use --tp N for
    tensor parallelism); on multi-host, initialize jax.distributed first.

Usage:
  python -m medical_image_classification_tpu.cli.train \
      --data-path /data/oct/train --model medmamba --epochs 100
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_classification_tpu.data.image_folder import (
    dump_class_indices, scan_image_folder)
from medical_image_classification_tpu.data.loader import BatchLoader
from medical_image_classification_tpu.models import create_model
from medical_image_classification_tpu.parallel.mesh import (
    batch_sharding, make_mesh)
from medical_image_classification_tpu.parallel.sharding import shard_state
from medical_image_classification_tpu.train.checkpoint import (
    restore_checkpoint, save_checkpoint, save_params_only)
from medical_image_classification_tpu.train.optim import (
    make_optimizer, make_schedule)
from medical_image_classification_tpu.train.train_state import (
    init_train_state, kan_grid_update, make_eval_step, make_train_step)
from medical_image_classification_tpu.utils.config import (
    TrainConfig, add_args, from_args)
from medical_image_classification_tpu.utils.logging_utils import get_logger


def main(cfg: TrainConfig):
    log = get_logger(log_file=os.path.join(
        os.path.dirname(cfg.save_path) or ".", "train.log"))
    log.info("devices: %s", jax.devices())

    train_ds = scan_image_folder(cfg.data_path)
    val_path = cfg.val_path or os.path.join(
        os.path.dirname(cfg.data_path.rstrip("/")), "val")
    val_ds = scan_image_folder(val_path) if os.path.isdir(val_path) else None
    dump_class_indices(train_ds)
    log.info("train images: %d  classes: %s", len(train_ds), train_ds.classes)

    nproc = jax.process_count()
    train_loader = BatchLoader(train_ds, cfg.batch_size // nproc,
                               cfg.image_size, train=True, seed=cfg.seed,
                               num_threads=cfg.num_workers,
                               shard_index=jax.process_index(),
                               shard_count=nproc)
    spe = train_loader.steps_per_epoch()

    model_kw = {}
    if cfg.sp > 1:
        # L-shard the SS2D scans over a 'seq' mesh axis (the reference's
        # sequence_parallel=True plumbing, `CNN_Mamba.py:354,365`); the
        # mesh is registered below before the first jitted step traces.
        model_kw["seq_axis"] = "seq"
    model = create_model(cfg.model, num_classes=cfg.num_classes,
                         use_checkpoint=cfg.use_checkpoint,
                         scan_impl=cfg.scan_impl, **model_kw)
    sched = make_schedule(cfg.schedule, cfg.lr, spe, cfg.epochs,
                          cfg.warmup_epochs)
    tx = make_optimizer(cfg.optimizer, sched, cfg.weight_decay,
                        grad_clip=cfg.grad_clip)

    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.zeros((cfg.batch_size, cfg.image_size, cfg.image_size, 3),
                       jnp.uint8)
    # mesh BEFORE the first trace: seq_axis scans look it up at trace time
    mesh = make_mesh(tp=cfg.tp, sp=cfg.sp, batch_size=cfg.batch_size)
    state = init_train_state(model, rng, sample, tx)
    state = shard_state(state, mesh)
    bsh = batch_sharding(mesh)

    start_epoch, best_acc = 0, 0.0
    if cfg.resume:
        state, ep, best_acc = restore_checkpoint(cfg.resume, state)
        start_epoch = ep + 1
        log.info("resumed from %s at epoch %d (best %.4f)",
                 cfg.resume, ep, best_acc)

    train_step = make_train_step(model, cfg.label_smoothing)
    eval_step = make_eval_step(model)
    step_rng = jax.random.PRNGKey(cfg.seed + 1)

    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        run_loss = run_acc = nstep = 0.0
        for imgs, labels in train_loader.epoch(epoch):
            imgs = jax.device_put(imgs, bsh)
            labels = jax.device_put(labels, bsh)
            state, m = train_step(state, imgs, labels, step_rng)
            run_loss += float(m["loss"])
            run_acc += float(m["accuracy"])
            nstep += 1
            if cfg.log_every and int(nstep) % cfg.log_every == 0:
                log.info("epoch %d step %d/%d loss %.4f acc %.4f",
                         epoch, int(nstep), spe, run_loss / nstep,
                         run_acc / nstep)
        dt = time.time() - t0
        ips = nstep * cfg.batch_size / max(dt, 1e-9)
        log.info("epoch %d done: loss %.4f acc %.4f (%.1f img/s)",
                 epoch, run_loss / max(nstep, 1), run_acc / max(nstep, 1), ips)

        if cfg.kan_update_grid_every and \
           (epoch + 1) % cfg.kan_update_grid_every == 0 and \
           "kan_state" in state.model_state:
            imgs0, _ = next(iter(train_loader.epoch(epoch)))
            state = kan_grid_update(model, state, jax.device_put(imgs0, bsh))
            log.info("KAN grids updated at epoch %d", epoch)

        if val_ds is not None:
            val_loader = BatchLoader(val_ds, cfg.batch_size, cfg.image_size,
                                     train=False)
            correct = total = 0
            for imgs, labels in val_loader.epoch(0):
                pad = cfg.batch_size - imgs.shape[0]
                if pad:
                    imgs = np.pad(imgs, ((0, pad), (0, 0), (0, 0), (0, 0)))
                    labels = np.pad(labels, (0, pad), constant_values=-1)
                c, _ = eval_step(state, jax.device_put(imgs, bsh),
                                 jax.device_put(labels, bsh))
                correct += int(c)
                total += int((labels >= 0).sum())
            acc = correct / max(total, 1)
            log.info("epoch %d val top-1: %.4f", epoch, acc)
            if acc > best_acc:
                best_acc = acc
                save_params_only(cfg.save_path + ".best", state.params)
        save_checkpoint(cfg.save_path, state, epoch, best_acc)
    log.info("training done; best val acc %.4f", best_acc)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    add_args(parser, TrainConfig())
    main(from_args(TrainConfig, parser.parse_args()))
