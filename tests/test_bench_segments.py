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


def test_segment_failure_counts_surface_in_artifact(monkeypatch):
    """Round-7 ADVICE (bench.py): a segment whose wall includes
    failed-query runtime must be identifiable — failures_per_segment is
    carried whenever any segment had failures, omitted on clean runs."""
    b = _bench(monkeypatch)
    ref = b.SEGMENT_REF_SEC
    out = b._segment_summary([10.0, 10.0], [ref, ref, ref], [0, 2])
    assert out["failures_per_segment"] == [0, 2]
    clean = b._segment_summary([10.0, 10.0], [ref, ref, ref], [0, 0])
    assert "failures_per_segment" not in clean


def test_bracket_canary_retired(monkeypatch):
    """Round-7 verdict ask #7: the pre/post bracket canary is gone — no
    CANARY_REF_SEC, no _canary_summary; the warm-up trio remains."""
    b = _bench(monkeypatch)
    assert not hasattr(b, "CANARY_REF_SEC")
    assert not hasattr(b, "_canary_summary")
    assert b.WARMUP_QUERIES == (
        "q1_pricing_summary",
        "top_talkers",
        "text_token_stats",
    )


def _compare_mod():
    spec = importlib.util.spec_from_file_location(
        "bench_compare_under_test",
        Path(__file__).resolve().parent.parent / "contrib" / "bench_compare.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_compare_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def _run_compare(bc, tmp_path, old, new):
    import json
    import sys as _sys

    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    argv = _sys.argv
    _sys.argv = ["bench_compare", str(po), str(pn)]
    try:
        bc.main()
    finally:
        _sys.argv = argv


def test_bench_compare_rescales_cross_reference_runs(tmp_path, capsys):
    """Round-9 re-freeze: two runs segment-normalized against different
    frozen references sit on proportional axes (normalized = ref x
    sum(wall/mark)), so the compare re-expresses the old run against the
    new reference by the exact linear factor instead of refusing."""
    bc = _compare_mod()
    old = {
        "sf": 0.1,
        "value": 100.0,
        "queries": {"q": 1.0},
        "segments": {
            "ref_sec": 0.4,
            "factors": [1.0],
            "size": 20,
            "normalized_value": 100.0,
        },
    }
    new = {
        "sf": 0.1,
        "value": 100.0,
        "queries": {"q": 1.0},
        "segments": {
            "ref_sec": 0.2,
            "factors": [1.0],
            "size": 20,
            "normalized_value": 90.0,
        },
    }
    _run_compare(bc, tmp_path, old, new)
    out = capsys.readouterr().out
    assert "rescaling the old run" in out
    # old normalized total 100.0 re-expressed on the 0.2 axis: 50.0
    assert "segment_normalized_total=50.0s" in out
    # per-query: old q rescaled 1.0 -> 0.5, new 1.0 => shared ratio 2.0x
    assert "(2.000x)" in out

    # same reference: no rescale note, totals untouched
    new["segments"]["ref_sec"] = 0.4
    _run_compare(bc, tmp_path, old, new)
    out = capsys.readouterr().out
    assert "rescaling" not in out
    assert "segment_normalized_total=100.0s" in out


def test_bench_compare_emits_crosscheck_command_for_above_floor_deltas(
    tmp_path, capsys
):
    """Round-9 verdict ask #7: when a slower per-query delta clears the
    ~1.3x attribution floor, the comparison itself must print the
    ready-to-run delta_crosscheck command (query list pre-filled, worst
    ratio first) so the follow-up step cannot be skipped."""
    bc = _compare_mod()
    old = {"sf": 0.1, "value": 10.0, "timed_action": "noop_write",
           "queries": {"q_slow": 1.0, "q_worse": 1.0, "q_flat": 1.0}}
    new = {"sf": 0.1, "value": 10.0, "timed_action": "noop_write",
           "queries": {"q_slow": 1.4, "q_worse": 2.0, "q_flat": 1.05}}
    _run_compare(bc, tmp_path, old, new)
    out = capsys.readouterr().out
    assert "above-floor deltas (>= 1.3x)" in out
    assert "q_worse 2.00x, q_slow 1.40x" in out
    assert "contrib/delta_crosscheck.py q_worse q_slow" in out
    assert "q_flat" not in out.split("above-floor")[1]

    # below the floor: no command emitted
    new["queries"] = {"q_slow": 1.2, "q_worse": 1.1, "q_flat": 1.0}
    _run_compare(bc, tmp_path, old, new)
    out = capsys.readouterr().out
    assert "delta_crosscheck" not in out


def test_bench_compare_tags_mixed_scale_ratios(tmp_path, capsys):
    """Round-10 ADVICE: under a cross-reference compare where the old
    artifact lacks per-segment factors, its per-query values stay RAW
    while the new side is factor-corrected and ref-scaled — every printed
    ratio must carry the mixed-scale tag so it can't be read as
    code-attributable."""
    bc = _compare_mod()
    old = {"sf": 0.1, "value": 100.0, "timed_action": "noop_write",
           "queries": {"q": 1.0},
           "segments": {"ref_sec": 0.4, "normalized_value": 100.0}}
    new = {"sf": 0.1, "value": 100.0, "timed_action": "noop_write",
           "queries": {"q": 2.0},
           "segments": {"ref_sec": 0.2, "factors": [1.0], "size": 20,
                         "normalized_value": 90.0}}
    _run_compare(bc, tmp_path, old, new)
    out = capsys.readouterr().out
    assert "[MIXED SCALE: old=raw, new=normalized]" in out
    assert "raw-vs-normalized" in out
    # the same comparison with old-side factors present carries no tag
    old["segments"]["factors"] = [1.0]
    old["segments"]["size"] = 20
    _run_compare(bc, tmp_path, old, new)
    out = capsys.readouterr().out
    assert "MIXED SCALE" not in out


def test_bench_compare_refuses_cross_action_runs(tmp_path):
    """count-era runs (no timed_action field) timed a Catalyst-pruned
    plan; comparing them to noop-write runs stays refused — the walls
    measure different computations and no rescale can fix that."""
    import pytest

    bc = _compare_mod()
    old = {"sf": 0.1, "value": 100.0, "queries": {"q": 1.0}}
    new = {
        "sf": 0.1,
        "value": 100.0,
        "queries": {"q": 1.0},
        "timed_action": "noop_write",
    }
    with pytest.raises(SystemExit, match="different actions"):
        _run_compare(bc, tmp_path, old, new)


def test_bench_compare_unwrap_recovers_timed_action():
    """Round-9 ADVICE: a driver-wrapped (tail-recovered) round-8+
    artifact must not lose timed_action — a lost field defaults to
    'count' downstream and spuriously refuses comparison against a full
    noop-write artifact."""
    bc = _compare_mod()
    # carried in the parsed compact line (the normal round-8+ shape)
    out = bc._unwrap(
        {"tail": "", "parsed": {"value": 1.0, "timed_action": "noop_write"}}
    )
    assert out["timed_action"] == "noop_write"
    # parsed lost it (e.g. driver parse of a truncated line): tail fallback
    out = bc._unwrap(
        {
            "tail": '"q_real": 1.2, "timed_action": "noop_write", ',
            "parsed": {"value": 1.0},
        }
    )
    assert out["timed_action"] == "noop_write"
    assert "timed_action" not in out["queries"]
    # genuinely absent (count-era wrapper): field stays absent so the
    # downstream default of "count" applies honestly
    out = bc._unwrap({"tail": '"q_real": 1.2, ', "parsed": {"value": 1.0}})
    assert "timed_action" not in out


def test_bench_compare_unwrap_new_format_no_phantom_queries():
    """The driver-wrapped tail of a NEW-format artifact (no canary block)
    must cut at the segments block: factor/ref fields after it must not
    be recovered as phantom per-query timings."""
    bc = _compare_mod()
    tail = (
        '"q_real": 1.2345, "q_other": 0.5} , "segments": {"ref_sec": 0.3425,'
        ' "factors": [1.01, 1.02], "normalized_value": 107.9}, '
        '"segment_normalized_value": 107.9}\n'
        '{"metric": "total_query_wall_time", "value": 105.0, '
        '"segment_normalized_value": 107.9, "segment_ref_sec": 0.3425}'
    )
    out = bc._unwrap(
        {"tail": tail, "parsed": {"value": 105.0, "segment_ref_sec": 0.3425}}
    )
    assert set(out["queries"]) == {"q_real", "q_other"}
    assert out["segments"]["ref_sec"] == 0.3425


def test_bench_compare_data_axis_verdicts(tmp_path, capsys):
    """Round-11 ask #3, automated: when both artifacts carry the
    data_fingerprints stamp, the compare reports the data axis up front —
    identical, changed (naming the tables), or unchecked when a side
    predates the stamp."""
    bc = _compare_mod()
    base = {
        "sf": 0.1,
        "value": 100.0,
        "queries": {"q": 1.0},
        "segments": {
            "ref_sec": 0.4,
            "factors": [1.0],
            "size": 20,
            "normalized_value": 100.0,
        },
    }
    fp = {"events.parquet": {"md5": "a" * 32, "num_rows": 5}}
    old = dict(base, data_fingerprints=fp)
    new = dict(base, data_fingerprints=fp)
    _run_compare(bc, tmp_path, old, new)
    assert "md5-identical — comparison valid" in capsys.readouterr().out

    new = dict(
        base,
        data_fingerprints={"events.parquet": {"md5": "b" * 32, "num_rows": 6}},
    )
    _run_compare(bc, tmp_path, old, new)
    out = capsys.readouterr().out
    assert "CHANGED tables events.parquet" in out
    assert "NOT code-attributable" in out

    _run_compare(bc, tmp_path, base, new)  # old side lacks the stamp
    assert "data axis: unchecked" in capsys.readouterr().out


def test_bench_compare_resolves_round_refs():
    """A bare round ref resolves through git to the round-close commit's
    BENCH_LOCAL.json — the driver's own run with the FULL per-query map
    (the wrapper BENCH_r{N}.json tails recover only ~12 queries)."""
    import json as _json

    bc = _compare_mod()
    path = bc._resolve_round_ref("r10")
    data = _json.load(open(path))
    assert len(data["queries"]) == 190
    # spot-pin against the independently archived wrapper tail value
    assert data["queries"]["text_bm25_batch_topk"] == 2.105
    # non-refs and real paths pass through untouched
    assert bc._resolve_round_ref("BENCH_r10.json") == "BENCH_r10.json"
    assert bc._resolve_round_ref("/nope/missing.json") == "/nope/missing.json"
