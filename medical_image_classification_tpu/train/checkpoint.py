"""Orbax checkpointing: {params, opt_state, model_state, step, best_acc}.

Covers both reference formats (SURVEY §5 checkpoint/resume): the best-model
weights-only save (`/root/reference/train.py:101-103`) and the composite
resume dict {epoch, model, optimizer, best_acc} with rank-0 write
(`ddp_train.py:142-150,186-195`).  Orbax handles sharded arrays natively, so
the same code path works single-chip and on a multi-host mesh.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(ckpt_dir: str, state, epoch: int, best_acc: float,
                    max_to_keep: int = 3):
    """Composite save (resume format). Safe to call from every process —
    orbax coordinates the write (the JAX analogue of the rank-0 guard)."""
    mgr = _manager(ckpt_dir, max_to_keep)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "model_state": jax.tree_util.tree_map(lambda x: x, state.model_state),
        "step": state.step,
        "epoch": epoch,
        "best_acc": best_acc,
    }
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(ckpt_dir: str, state, epoch: Optional[int] = None):
    """Restore into an existing (abstract or concrete) TrainState.
    Returns (state, epoch, best_acc); (state, -1, 0.0) if nothing found."""
    path = os.path.abspath(ckpt_dir)
    if not os.path.isdir(path):
        return state, -1, 0.0
    mgr = _manager(path)
    step = epoch if epoch is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        return state, -1, 0.0
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "model_state": jax.tree_util.tree_map(lambda x: x, state.model_state),
        "step": state.step,
        "epoch": 0,
        "best_acc": 0.0,
    }
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    from flax.core import FrozenDict
    new_state = state.replace(params=restored["params"],
                              opt_state=restored["opt_state"],
                              model_state=FrozenDict(restored["model_state"]),
                              step=restored["step"])
    return new_state, int(restored["epoch"]), float(restored["best_acc"])


def save_params_only(path: str, params):
    """Best-model weights-only save (`train.py:101-103` equivalent)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params_only(path: str, template):
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(path), template)
    ckptr.close()
    return out
