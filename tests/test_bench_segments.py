"""Unit tests for bench.py's interleaved segment-canary math (round-6
verdict ask #1): per-segment normalization must correct exactly the
disturbed segment, the spread must flag instability, and unattributable
segments (failed canary marks) must fall back to raw wall — all pure
driver-side arithmetic, no Spark session."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path


def _bench(monkeypatch, sf_dir="/root/testdata/sf0.1"):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf_dir)
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", Path(__file__).resolve().parent.parent / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_segment_normalization_corrects_local_transient(monkeypatch):
    b = _bench(monkeypatch)
    ref = b.SEGMENT_REF_SEC
    # three segments of 10s raw; the middle one ran on a 2x-slowed host
    # (its bracketing canary marks are 2x the reference)
    marks = [ref, ref, 2 * ref, 2 * ref]  # seg1 bracketed ref..2ref -> 1.5x
    out = b._segment_summary([10.0, 10.0, 10.0], marks)
    assert out["factors"] == [1.0, 1.5, 2.0]
    assert abs(out["normalized_value"] - (10 + 10 / 1.5 + 10 / 2.0)) < 1e-3
    assert out["spread"] == 2.0
    assert out["stable"] is False
    assert "segment" in out["note"]


def test_segment_stable_run_flags_true(monkeypatch):
    b = _bench(monkeypatch)
    ref = b.SEGMENT_REF_SEC
    marks = [ref, 1.05 * ref, ref]
    out = b._segment_summary([10.0, 10.0], marks)
    assert out["stable"] is True
    assert out["spread"] < 1.1
    assert "note" not in out


def test_segment_missing_mark_falls_back_to_raw(monkeypatch):
    b = _bench(monkeypatch)
    ref = b.SEGMENT_REF_SEC
    out = b._segment_summary([10.0, 10.0], [ref, None, ref])
    assert out["factors"] == [None, None]
    assert out["normalized_value"] == 20.0  # both segments unattributable


def test_segment_normalization_skipped_off_reference_sf(monkeypatch):
    b = _bench(monkeypatch, sf_dir="/root/testdata/sf0.01")
    out = b._segment_summary([10.0], [0.1, 0.1])
    assert "normalized_value" not in out
    assert "frozen at sf0.1" in out["note"]
