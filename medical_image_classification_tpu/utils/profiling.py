"""Profiling helpers: jax.profiler traces + step timing.

The reference has no profiler integration (SURVEY §5 tracing note — only
analytic FLOP counts and wall-clock prints).  Here: one context manager for
TensorBoard-compatible device traces plus the analytic models in
``utils/flops.py`` and the relay-safe timer in ``utils/timing.py``.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str = "runs/profile") -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard / Perfetto.

    Host/Python tracers are disabled: the Chrome-trace export caps at 1M
    events, and at host_tracer_level>0 the Python-frame events alone fill
    the cap and crowd every XLA device op OUT of the export (measured:
    a 3-step st_ssd trace had 1,000,000 host events, 0 device events).
    """
    import jax
    os.makedirs(logdir, exist_ok=True)
    opts = jax.profiler.ProfileOptions()
    opts.host_tracer_level = 0
    opts.python_tracer_level = 0
    jax.profiler.start_trace(logdir, profiler_options=opts)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock + ETA logging (fusion-train style, `CrossMamba/train.py:138-161`)."""

    def __init__(self, total_steps: int):
        self.total = total_steps
        self.start = time.time()
        self.done = 0

    def step(self, n: int = 1) -> str:
        self.done += n
        elapsed = time.time() - self.start
        rate = self.done / max(elapsed, 1e-9)
        eta = (self.total - self.done) / max(rate, 1e-9)
        return f"{self.done}/{self.total} ({rate:.2f} it/s, ETA {eta:.0f}s)"


def summarize_trace(logdir: str, steps: int = 1):
    """Aggregate device-op time from a ``trace()`` capture.

    Parses the Chrome-trace JSON the TPU profiler writes (works through the
    axon relay, unlike naive timers) and returns a dict with total device
    time plus breakdowns by HLO category, source line, and op kind —
    everything needed for step-time attribution without TensorBoard.

    ``steps``: number of identical steps captured inside the trace; all
    durations are divided by it so results read as ms/step.
    """
    import collections
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    tids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")

    by_src = collections.Counter()
    by_cat = collections.Counter()
    by_op = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X":
            continue
        if tids.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        a = e.get("args", {})
        d = e["dur"] / 1e3 / max(steps, 1)          # ms/step
        total += d
        by_cat[a.get("hlo_category", "?")] += d
        by_src[a.get("source", "?")] += d
        by_op[e["name"].split(".")[0]] += d
    return {
        "total_ms": total,
        "by_category": dict(by_cat.most_common()),
        "by_source": dict(by_src.most_common()),
        "by_op": dict(by_op.most_common()),
    }


def print_trace_summary(summary, top: int = 15) -> None:
    print(f"== device op time: {summary['total_ms']:.2f} ms/step ==")
    for section in ("by_category", "by_source", "by_op"):
        print(f"\n-- {section} --")
        for k, v in list(summary[section].items())[:top]:
            print(f"{v:8.3f} ms  {k}")
