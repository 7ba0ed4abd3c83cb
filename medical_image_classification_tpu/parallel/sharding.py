"""GSPMD parameter-sharding rules: tensor parallelism for the SS2D family.

The reference threads ColumnParallelLinear / RowParallelLinear (+ a
sequence_parallel flag) through every SSD model (`CNN_Mamba.py:386-392,
433-439`; SURVEY §2.6).  On TPU this entire machinery is a set of
PartitionSpecs: shard the in-projection's *output* features and the
out-projection's *input* features over the 'model' axis, shard every
per-d_inner scan parameter the same way, replicate the rest.  XLA then
inserts exactly the all-reduce (row-parallel) / all-gather (sequence
parallel) collectives the reference issues by hand through NCCL.

Rules are matched on parameter path names produced by the Flax modules in
``models/``.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path_names, leaf) -> P:
    """Decide a PartitionSpec from the param path (innermost module + name)."""
    names = [str(n) for n in path_names]
    last = names[-1]
    parent = names[-2] if len(names) > 1 else ""

    inside_ss2d = any(n == "self_attention" for n in names)
    if not inside_ss2d:
        return P()                                    # replicate non-SS2D

    nd = leaf.ndim
    if parent == "in_proj" and last == "kernel":      # [d_model, d_in_proj]
        return P(None, "model")
    if parent == "out_proj" and last == "kernel":     # [d_inner, d_model]
        return P("model", None)
    if parent == "conv2d" and last == "kernel":       # [kh, kw, 1, C] depthwise
        return P(*([None] * (nd - 1) + ["model"]))
    if parent == "conv2d" and last == "bias":
        return P("model")
    if last == "x_proj_weight":                       # [K, R+2N, d_inner]
        return P(None, None, "model")
    if last == "dt_projs_weight":                     # [K, d_inner, R]
        return P(None, "model", None)
    if last in ("dt_projs_bias", "Ds") and nd == 2:   # [K, d_inner] / [K, nheads]
        return P(None, "model")
    if last == "A_logs":
        return P(None, "model") if nd == 2 else P(None, "model", None)
    if last == "dt_bias":
        return P(None, "model")
    if last == "norm_weight" or (parent == "out_norm"):
        return P("model") if nd == 1 else P()
    return P()


def param_shardings(params, mesh: Mesh):
    """PyTree of NamedShardings matching ``params``."""
    def f(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return NamedSharding(mesh, _spec_for(names, leaf))
    return jax.tree_util.tree_map_with_path(f, params)


def state_shardings(state, mesh: Mesh):
    """Shardings for a full TrainState: params + opt_state follow the param
    rules (Adam moments share the param layout), everything else replicated."""
    rep = NamedSharding(mesh, P())
    pspec = param_shardings(state.params, mesh)

    def match_params(tree):
        # optax states embed param-shaped pytrees (mu, nu); map by structure.
        def f(path, leaf):
            names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            return NamedSharding(mesh, _spec_for(names, leaf)) \
                if hasattr(leaf, "ndim") else rep
        return jax.tree_util.tree_map_with_path(f, tree)

    return type(state)(
        step=rep, params=pspec,
        model_state=jax.tree_util.tree_map(lambda _: rep, state.model_state),
        opt_state=match_params(state.opt_state),
        best_acc=rep, tx=state.tx)


def shard_state(state, mesh: Mesh):
    shardings = state_shardings(state, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s) if hasattr(x, "ndim") else x,
        state, shardings,
        is_leaf=lambda x: hasattr(x, "ndim"))
