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


def per_dispatch_time(step_like: Callable, init_carry, iters: int = 20,
                      warmup_reps: int = 2, reps: int = 3) -> float:
    """Time ``carry -> carry`` WITHOUT the fori_loop wrapper.

    Fallback for graphs whose serialized fori_loop program exceeds the
    axon relay's remote-compile body limit (HTTP 413, BENCH_r04: the
    vfefm_2b2 train graph).  The single-step jit compiles where the loop
    wrapper does not; iterations are dispatched back-to-back WITHOUT
    per-call host syncs (async dispatch chains on-device through the data
    dependency) and a single host read closes each block, exactly like the
    chained method minus the device-side loop.  The (t_N, t_1) subtraction
    removes the one-off sync RTT; what it cannot remove is any per-dispatch
    issue gap the relay adds between steps, so callers should tag results
    from this path as ``timing: per-dispatch`` (an upper bound on device
    step time).
    """
    step = jax.jit(step_like)
    carry = step(init_carry)
    _sync(carry)
    for _ in range(warmup_reps):
        carry = step(step(init_carry))
        _sync(carry)

    best = float("inf")
    for _ in range(max(reps, 1)):
        carry = init_carry
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step(carry)
        _sync(carry)
        t_n = time.perf_counter() - t0

        t0 = time.perf_counter()
        carry = step(init_carry)
        _sync(carry)
        t_1 = time.perf_counter() - t0
        best = min(best, (t_n - t_1) / max(iters - 1, 1))
    return max(best, 1e-9)


def _sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    # scalar host read — forces full completion through the relay
    float(jnp.sum(leaf))
