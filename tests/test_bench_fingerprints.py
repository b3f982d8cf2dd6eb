"""The data-axis stamp in bench artifacts (round-11 ask #3).

Every BENCH artifact now carries per-table md5 fingerprints so the
"same data" assumption behind cross-round per-query comparison is
checkable from the artifact alone (the driver regenerates /root/testdata
each round). These tests pin the block's shape and its non-fatal failure
mode — a bench number must never be lost to a fingerprinting error.
"""

from __future__ import annotations

import bench


def test_fingerprints_cover_every_table():
    fps = bench._data_fingerprints("/root/testdata/sf0.001")
    assert "_error" not in fps
    assert set(fps) == {
        f"{t}.parquet"
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }
    for entry in fps.values():
        assert len(entry["md5"]) == 32
        assert entry["num_rows"] > 0


def test_fingerprints_are_deterministic_and_scale_distinct():
    a = bench._data_fingerprints("/root/testdata/sf0.001")
    assert a == bench._data_fingerprints("/root/testdata/sf0.001")
    b = bench._data_fingerprints("/root/testdata/sf0.01")
    assert a["documents.parquet"]["md5"] != b["documents.parquet"]["md5"]


def test_missing_dir_is_nonfatal():
    fps = bench._data_fingerprints("/nonexistent")
    assert "_error" in fps and len(fps) == 1


# --- per-round full-timings archive (round-11 verdict ask #1) ---------------


def test_local_archive_name_carries_round_and_cpus():
    """PERF_r11.per_query was empty because BENCH_LOCAL.json is overwritten
    by whoever ran bench.py last (the driver's 8-core scaling run clobbered
    its 32-core record). The per-round archive name must embed both the
    in-progress round (max driver-archived BENCH_r{N}.json + 1) and the
    core count so no later run at another core count or round overwrites
    it."""
    import glob
    import re
    from pathlib import Path

    here = Path(bench.__file__).resolve().parent
    rounds = [
        int(m.group(1))
        for p in glob.glob(str(here / "BENCH_r*.json"))
        if (m := re.match(r"BENCH_r(\d+)", Path(p).name))
    ]
    expect = (max(rounds) + 1) if rounds else 0
    assert bench._current_round() == expect
    assert bench.bench_local_archive_name("32") == (
        f"BENCH_LOCAL_r{expect:02d}_c32.json"
    )
    assert bench.bench_local_archive_name(" 8 ").endswith("_c8.json")


def test_local_archive_name_total_on_malformed_cpus():
    """A malformed $SPARK_GRAFT_CPUS must never sink the artifact write."""
    assert bench.bench_local_archive_name("not-a-number").endswith("_cx.json")
