"""TrainState + jitted train/eval steps for the classifier family.

Replaces the reference training loops (`/root/reference/train.py:66-103`,
`ddp_train.py:152-195`): one jitted step closes over (model, optimizer),
carries params / optimizer state / BatchNorm stats / KAN grids, and computes
loss + top-1 inside the same XLA program.  Data parallelism is GSPMD: the
caller shards the batch over the mesh 'data' axis and (optionally) params
over 'model'; XLA inserts the gradient all-reduces that DDP/NCCL did.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from medical_image_classification_tpu.data.image_folder import normalize_batch


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    model_state: Any            # non-trainable collections (batch_stats, kan_state)
    opt_state: Any
    best_acc: jnp.ndarray
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, model_state, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   model_state=FrozenDict(model_state),
                   opt_state=tx.init(params),
                   best_acc=jnp.zeros(()), tx=tx)


def init_train_state(model, rng, sample_batch, tx):
    imgs = normalize_batch(sample_batch)
    # jit the init: eagerly it dispatches thousands of tiny ops, each a
    # separate (remote) XLA compile — ~10 min of wall clock per model on the
    # relay vs one ~20 s compiled program
    init_fn = jax.jit(functools.partial(model.init, train=False))
    variables = init_fn({"params": rng, "dropout": rng}, imgs)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items()
                   if k not in ("params", "perturbations", "intermediates")}
    return TrainState.create(params, model_state, tx)


def cross_entropy_loss(logits, labels, label_smoothing: float = 0.0):
    num = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / num
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def make_train_step_fn(model, label_smoothing: float = 0.0) -> Callable:
    """Raw (unjitted) train step: (state, images_u8, labels, rng) ->
    (state, metrics).  Use make_train_step for the jitted version; the raw
    function is composable into fori_loop timing harnesses."""

    def step_fn(state: TrainState, images, labels, rng):
        imgs = normalize_batch(images)
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params, **state.model_state}
            out = model.apply(variables, imgs, train=True,
                              rngs={"dropout": dropout_rng},
                              mutable=["batch_stats"])
            logits, updates = out
            loss = cross_entropy_loss(logits, labels, label_smoothing)
            return loss, (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_updates, new_opt = state.tx.update(grads, state.opt_state,
                                               state.params)
        new_params = optax.apply_updates(state.params, new_updates)
        model_state = dict(state.model_state)
        if "batch_stats" in updates:
            model_state["batch_stats"] = updates["batch_stats"]
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt,
                                  model_state=FrozenDict(model_state))
        return new_state, {"loss": loss, "accuracy": acc}

    return step_fn


def make_train_step(model, label_smoothing: float = 0.0,
                    donate: bool = True) -> Callable:
    """Returns jitted (state, images_u8, labels, rng) -> (state, metrics)."""
    step_fn = make_train_step_fn(model, label_smoothing)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model) -> Callable:
    """Returns jitted (state, images_u8, labels) -> (n_correct, logits)."""

    def eval_fn(state: TrainState, images, labels):
        imgs = normalize_batch(images)
        variables = {"params": state.params, **state.model_state}
        logits = model.apply(variables, imgs, train=False)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels).astype(jnp.int32))
        return correct, logits

    return jax.jit(eval_fn)


def kan_grid_update(model, state: TrainState, images, rng=None):
    """Host-driven adaptive KAN re-gridding (outside the jitted step),
    mirroring the reference's explicit hook (`MedSSD_ekan.py:1046-1047`).
    Returns a new TrainState with updated grids and refit spline weights."""
    imgs = normalize_batch(images)
    variables = {"params": state.params, **state.model_state}
    _, updated = model.apply(variables, imgs, train=False, update_grid=True,
                             mutable=["kan_state", "params"])
    params = state.params
    if "params" in updated:
        params = _merge(params, updated["params"])
    model_state = dict(state.model_state)
    if "kan_state" in updated:
        model_state["kan_state"] = updated["kan_state"]
    return state.replace(params=params, model_state=FrozenDict(model_state))


def _merge(base, overlay):
    """Deep-merge overlay into base (overlay wins where present)."""
    if not isinstance(base, (dict, FrozenDict)):
        return overlay
    out = dict(base)
    for k, v in overlay.items():
        out[k] = _merge(base[k], v) if k in base else v
    return out
