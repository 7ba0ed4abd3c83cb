"""Bench watchdog salvage logic (no device, no jax import).

The driver's bench run is the only perf evidence a round produces; round 2
lost its number to a driver timeout (BENCH_r02.json rc=124, parsed null).
These tests pin the salvage paths: partial checkpoints, the stale
last-good fallback, and the final-error line — every path must emit one
parseable JSON object on stdout.
"""

import importlib.util
import io
import json
import os
import sys

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


@pytest.fixture()
def benchmod():
    spec = importlib.util.spec_from_file_location("benchmod_test", _BENCH)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _capture(fn, *args):
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        fn(*args)
    finally:
        sys.stdout = old
    lines = [ln for ln in buf.getvalue().splitlines() if ln.startswith("{")]
    assert len(lines) == 1, f"expected exactly one JSON line, got: {buf.getvalue()!r}"
    return json.loads(lines[0])


def test_checkpoint_roundtrip(benchmod, tmp_path):
    out = {"metric": "m", "value": 1.5, "unit": "u", "vs_baseline": 0.1,
           "extra": {"train_ips": 1.5}}
    p = str(tmp_path / "partial.json")
    benchmod._checkpoint(out, p)
    assert json.load(open(p)) == out
    # atomic: no .tmp left behind
    assert not os.path.exists(p + ".tmp")


def test_checkpoint_disabled_without_path(benchmod):
    benchmod._checkpoint({"metric": "m"}, "")  # must not raise


def test_partial_preferred_over_last_good(benchmod, tmp_path):
    partial = {"metric": "m", "value": 2.0, "unit": "u", "vs_baseline": 0.2,
               "extra": {}}
    p = str(tmp_path / "partial.json")
    benchmod._checkpoint(partial, p)
    benchmod.LAST_GOOD_PATH = str(tmp_path / "last_good.json")
    json.dump({"measured_at": "x", "result": {"metric": "old", "value": 1.0}},
              open(benchmod.LAST_GOOD_PATH, "w"))
    got = _capture(benchmod._emit_partial_or_fallback, p, "worker died")
    assert got["value"] == 2.0
    assert got["extra"]["partial"] is True
    assert got["extra"]["partial_reason"] == "worker died"


def test_stale_fallback_marks_metric(benchmod, tmp_path):
    benchmod.LAST_GOOD_PATH = str(tmp_path / "last_good.json")
    rec = {"measured_at": "2026-08-20T13:56:00Z",
           "result": {"metric": "medmamba train images/sec/chip",
                      "value": 461.94, "unit": "images/sec/chip",
                      "vs_baseline": 2.31, "extra": {}}}
    json.dump(rec, open(benchmod.LAST_GOOD_PATH, "w"))
    got = _capture(benchmod._emit_partial_or_fallback,
                   str(tmp_path / "nope.json"), "relay down")
    assert got["value"] == 461.94
    assert got["extra"]["stale"] is True
    assert "STALE" in got["metric"]
    assert "2026-08-20T13:56:00Z" in got["metric"]


def test_error_line_when_nothing_recorded(benchmod, tmp_path):
    benchmod.LAST_GOOD_PATH = str(tmp_path / "absent.json")
    got = _capture(benchmod._emit_partial_or_fallback,
                   str(tmp_path / "nope.json"), "boom")
    assert got["value"] == 0.0
    assert got["extra"]["error"] == "boom"
    # the driver schema fields are always present
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in got


def test_corrupt_partial_falls_back(benchmod, tmp_path):
    p = str(tmp_path / "partial.json")
    open(p, "w").write("{not json")
    benchmod.LAST_GOOD_PATH = str(tmp_path / "absent.json")
    got = _capture(benchmod._emit_partial_or_fallback, p, "late")
    assert got["value"] == 0.0


def test_repo_last_good_schema():
    """The committed BENCH_LAST_GOOD.json must parse and carry the driver
    schema so a stale fallback is always well-formed."""
    path = os.path.join(os.path.dirname(_BENCH), "BENCH_LAST_GOOD.json")
    rec = json.load(open(path))
    assert "measured_at" in rec
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in rec["result"]
    assert rec["result"]["value"] > 0
