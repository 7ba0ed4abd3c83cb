"""Reliable device timing under high-latency dispatch (axon relay).

Plain ``block_until_ready`` loops mis-measure through the relay (dispatch is
effectively fire-and-forget; per-call host syncs cost ~20-30ms RTT).  The
robust method: run N iterations inside ONE jitted ``lax.fori_loop`` with a
data dependency chaining iteration i's output into iteration i+1's input,
then do a single host read.  Device time per iteration = (t_total - RTT) / N.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def chained_device_time(step_like: Callable, init_carry, iters: int = 50,
                        warmup_reps: int = 2, reps: int = 3) -> float:
    """Time one iteration of ``carry -> carry`` on-device.

    step_like: function taking and returning a pytree carry of fixed shape.
    Returns seconds per iteration (compile excluded, RTT amortised).

    ``reps``: the (t_N, t_1) measurement pair is repeated and the MINIMUM
    per-iteration time returned — single pairs swing +-13% through the
    relay (host-side scheduling noise adds to either leg; the minimum is
    the least-contaminated estimate of device time).
    """

    @jax.jit
    def run(carry, n):
        # dynamic trip count -> ONE compilation for every n
        return lax.fori_loop(0, n, lambda i, c: step_like(c), carry,
                             unroll=False)

    # compile + warm
    out = run(init_carry, jnp.int32(1))
    _sync(out)
    for _ in range(warmup_reps):
        out = run(init_carry, jnp.int32(2))
        _sync(out)

    best = float("inf")
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        out = run(init_carry, jnp.int32(iters))
        _sync(out)
        t_n = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = run(init_carry, jnp.int32(1))
        _sync(out)
        t_1 = time.perf_counter() - t0
        best = min(best, (t_n - t_1) / max(iters - 1, 1))

    return max(best, 1e-9)


def _sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    # scalar host read — forces full completion through the relay
    float(jnp.sum(leaf))
