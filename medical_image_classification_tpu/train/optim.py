"""Optimizer / LR-schedule factory (optax).

TPU rebuild of the reference's string-keyed factory
(`/root/reference/CrossMamba/FusionMamba/utils.py:76-224`): 9 optimizers and
8 schedulers selected by name.  The classification defaults match
`train.py:59-60` (Adam, lr 1e-4) and the fusion default matches
`CrossMamba/train.py:114` (Adam 2e-4, lr×0.75^epoch).
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def make_schedule(name: str = "constant", base_lr: float = 1e-4,
                  steps_per_epoch: int = 1, epochs: int = 100,
                  warmup_epochs: int = 0, step_size: int = 30,
                  gamma: float = 0.1, milestones=(30, 60, 90),
                  min_lr: float = 0.0, decay: float = 0.75):
    """name: constant | step | multistep | exponential | cosine |
    warmup_cosine | warmup_constant | fusion_exp (lr*decay^epoch)."""
    spe = max(1, steps_per_epoch)
    if name == "constant":
        sched = optax.constant_schedule(base_lr)
    elif name == "step":
        sched = optax.exponential_decay(base_lr, step_size * spe, gamma,
                                        staircase=True)
    elif name == "multistep":
        sched = optax.piecewise_constant_schedule(
            base_lr, {int(m * spe): gamma for m in milestones})
    elif name == "exponential":
        sched = optax.exponential_decay(base_lr, spe, gamma, staircase=True)
    elif name == "cosine":
        sched = optax.cosine_decay_schedule(base_lr, epochs * spe,
                                            alpha=min_lr / max(base_lr, 1e-12))
    elif name == "warmup_cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup_epochs * spe, epochs * spe, end_value=min_lr)
    elif name == "warmup_constant":
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup_epochs * spe),
             optax.constant_schedule(base_lr)], [warmup_epochs * spe])
    elif name == "fusion_exp":
        # lr * decay^(epoch-1), stepped per epoch (CrossMamba/train.py:114-116)
        sched = optax.exponential_decay(base_lr, spe, decay, staircase=True)
    else:
        raise ValueError(f"unknown schedule: {name}")
    return sched


def make_optimizer(name: str = "adam", schedule=1e-4, weight_decay: float = 0.0,
                   momentum: float = 0.9, grad_clip: Optional[float] = None,
                   no_decay_mask=None, flatten: bool = False):
    """name: adam | adamw | sgd | momentum | nesterov | rmsprop | adagrad |
    lamb | lion.  ``no_decay_mask`` excludes params (A_logs, Ds, biases,
    norms — the reference's `_no_weight_decay` tags) from decay.

    ``flatten=True`` wraps the transform in ``optax.flatten``: the update
    runs on one ravelled vector instead of per-leaf, collapsing ~15 tiny
    XLA ops per parameter leaf into a handful of fused elementwise kernels.
    Mathematically identical for elementwise transforms (adam/sgd/...);
    do NOT combine with per-leaf-masked transforms (adamw/lamb/lion with a
    ``no_decay_mask`` — the mask structure doesn't survive the ravel).
    On deep trees (the fusion U-Nets carry ~700 leaves) this shrinks the
    serialized train-step graph ~11% — which also keeps it under the axon
    relay's remote-compile body limit (HTTP 413, BENCH_r04/r05)."""
    if name == "adam":
        tx = optax.adam(schedule)
    elif name == "adamw":
        tx = optax.adamw(schedule, weight_decay=weight_decay,
                         mask=no_decay_mask)
    elif name == "sgd":
        tx = optax.sgd(schedule)
    elif name == "momentum":
        tx = optax.sgd(schedule, momentum=momentum)
    elif name == "nesterov":
        tx = optax.sgd(schedule, momentum=momentum, nesterov=True)
    elif name == "rmsprop":
        tx = optax.rmsprop(schedule, momentum=momentum)
    elif name == "adagrad":
        tx = optax.adagrad(schedule)
    elif name == "lamb":
        tx = optax.lamb(schedule, weight_decay=weight_decay,
                        mask=no_decay_mask)
    elif name == "lion":
        tx = optax.lion(schedule, weight_decay=weight_decay,
                        mask=no_decay_mask)
    else:
        raise ValueError(f"unknown optimizer: {name}")
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if flatten:
        if no_decay_mask is not None:
            raise ValueError("flatten=True is incompatible with a per-leaf "
                             "no_decay_mask (mask structure doesn't survive "
                             "the ravel)")
        tx = optax.flatten(tx)
    return tx


def no_weight_decay_mask(params):
    """True = apply decay.  Excludes A_logs/Ds/dt bias/norm/bias params,
    mirroring the reference's `_no_weight_decay` tagging (`MedMamba.py:357-384`)."""
    import jax

    def decide(path, _):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        last = names[-1] if names else ""
        if last in ("A_logs", "Ds", "dt_projs_bias", "dt_bias", "bias",
                    "scale", "norm_weight", "k_weights"):
            return False
        if any("norm" in str(n).lower() for n in names[:-1]):
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)
