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
