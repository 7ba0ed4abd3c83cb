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


def test_is_graph_too_big_classifier(benchmod):
    e413 = RuntimeError("INTERNAL: http://127.0.0.1:8093/remote_compile: "
                        "HTTP 413: Failed to buffer the request body: "
                        "length limit exceeded")
    assert benchmod._is_graph_too_big(e413)
    assert not benchmod._is_graph_too_big(
        RuntimeError("INTERNAL: response body closed"))
    assert not benchmod._is_graph_too_big(ValueError("shape mismatch 413x7"))


def test_mfu_fields_from_flops_table(benchmod):
    table = {"m": {"step_flops_per_image": 28.28e9,
                   "fwd_flops_per_image": 6.69e9}}
    f = benchmod._mfu_fields("m", 460.0, 1500.0, table)
    # 28.28e9 * 460 / 197e12 = 6.6%
    assert abs(f["train_mfu_pct"] - 6.6) < 0.1
    assert abs(f["infer_mfu_pct"] - 5.09) < 0.1
    assert f["step_gflops_per_image"] == 28.28
    assert benchmod._mfu_fields("absent", 1.0, 1.0, table) == {}
    assert benchmod._mfu_fields("m", 0.0, 0.0, table) == {}


def test_backfill_stale_extras(benchmod, tmp_path, monkeypatch):
    lg = {"measured_at": "2026-08-21T00:00:00Z",
          "result": {"extra": {
              "medssd_train_ips": 350.0, "medssd_infer_ips": 1084.0,
              "medssd_batch": 32, "medssd_train_mfu_pct": 9.9,
              "st_ssd_train_ips": 257.9, "st_ssd_infer_ips": 843.0,
              "st_ssd_batch": 8,
              # st_ssd was ITSELF stale in last-good: original date sticks
              "st_ssd_stale_measured_at": "2026-08-01T00:00:00Z"}}}
    p = tmp_path / "lg.json"
    p.write_text(json.dumps(lg))
    monkeypatch.setattr(benchmod, "LAST_GOOD_PATH", str(p))
    out = {"extra": {"st_ssd_train_ips": 0,  # falsy -> not "present"
                     "vfefm_2b2_bf16_error": "HTTP 413 ..."}}
    del out["extra"]["st_ssd_train_ips"]
    out["extra"]["medssd_ekan_train_ips"] = 123.0  # fresh: untouched
    benchmod._backfill_stale_extras(
        out, "medssd_ekan:16,medssd:32,st_ssd:8,vfefm_2b2:2:bf16")
    e = out["extra"]
    assert e["medssd_train_ips"] == 350.0 and e["medssd_stale"] is True
    assert e["medssd_stale_measured_at"] == "2026-08-21T00:00:00Z"
    assert e["medssd_train_mfu_pct"] == 9.9
    assert e["st_ssd_stale_measured_at"] == "2026-08-01T00:00:00Z"
    assert "medssd_ekan_stale" not in e          # fresh value not clobbered
    # vfefm never measured anywhere: no fabricated number
    assert "vfefm_2b2_bf16_train_ips" not in e


def test_backfill_no_last_good_is_noop(benchmod, tmp_path, monkeypatch):
    monkeypatch.setattr(benchmod, "LAST_GOOD_PATH",
                        str(tmp_path / "missing.json"))
    out = {"extra": {}}
    benchmod._backfill_stale_extras(out, "medssd:32")
    assert out == {"extra": {}}


def test_repo_flops_json_schema():
    """FLOPS.json (scripts/flops_report.py output) carries per-image FLOPs
    for the headline + every default extra key."""
    path = os.path.join(os.path.dirname(_BENCH), "FLOPS.json")
    with open(path) as f:
        table = json.load(f)
    for key in ("medmamba",):
        rec = table[key]
        assert rec["step_flops_per_image"] > rec["fwd_flops_per_image"] > 0
