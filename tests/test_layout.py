"""Storage-layout operators: Z-order clustering pruning win (measured from
parquet footer statistics, the same stats real readers prune with) and
compaction content preservation."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from kafka_clickhouse_example_spark.operators.layout import compact_to_target, zorder_by
from kafka_clickhouse_example_spark.sources.catalog import load_compute_table


def _file_ranges(path: str, cols: list[str]):
    """Per-file (min, max) of each column, from parquet footers only."""
    out = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for i in range(row_group.num_columns):
                col = row_group.column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    if mins[name] is None or s.min < mins[name]:
                        mins[name] = s.min
                    if maxs[name] is None or s.max > maxs[name]:
                        maxs[name] = s.max
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def _files_hit(ranges, predicate: dict[str, tuple[float, float]]) -> int:
    """How many files a min/max-pruning reader must open for a box predicate."""
    hit = 0
    for r in ranges:
        ok = True
        for c, (lo, hi) in predicate.items():
            fmin, fmax = r[c]
            if fmax < lo or fmin > hi:
                ok = False
                break
        if ok:
            hit += 1
    return hit


N_FILES = 32


@pytest.fixture(scope="module")
def layouts(spark, sf_correctness_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    ev = load_compute_table(spark, sf_correctness_dir, "events").select(
        "event_id", "user_id", "value"
    )
    lin = str(base / "linear")
    zo = str(base / "zorder")
    # linear baseline: sorted by user_id only (what ORDER BY user_id gives)
    ev.repartitionByRange(N_FILES, "user_id").sortWithinPartitions(
        "user_id"
    ).write.parquet(lin)
    zorder_by(ev, ["user_id", "value"], N_FILES).write.parquet(zo)
    return ev, lin, zo


def test_zorder_preserves_content(spark, layouts):
    ev, lin, zo = layouts
    a = sorted(tuple(r) for r in spark.read.parquet(zo).collect())
    b = sorted(tuple(r) for r in ev.collect())
    assert a == b


def test_zorder_prunes_secondary_dimension(spark, layouts):
    """A value-only box predicate must prune files under Z-order; under the
    user_id-sorted layout every file spans the full value range, so ALL
    files are hit. This is footer-stat pruning, exactly what a parquet
    reader does."""
    ev, lin, zo = layouts
    lin_ranges = _file_ranges(lin, ["user_id", "value"])
    zo_ranges = _file_ranges(zo, ["user_id", "value"])
    assert len(lin_ranges) == len(zo_ranges) == N_FILES

    for a, b in ((0.1, 0.2), (0.4, 0.5), (0.6, 0.7)):
        stats = ev.selectExpr(
            f"percentile(value, {a}) lo", f"percentile(value, {b}) hi"
        ).first()
        pred = {"value": (stats.lo, stats.hi)}
        lin_hit = _files_hit(lin_ranges, pred)
        zo_hit = _files_hit(zo_ranges, pred)
        assert lin_hit == N_FILES, "baseline sanity: user_id sort can't prune on value"
        assert zo_hit <= N_FILES // 2, f"z-order pruned too little: {zo_hit}/{N_FILES}"


def test_zorder_still_prunes_primary_dimension(spark, layouts):
    """Z-order trades per-dimension locality down to ~sqrt of the files for
    2 dims — a 10% user_id box must still skip at least half the files
    (measured: 12/32 at every decile position)."""
    ev, lin, zo = layouts
    zo_ranges = _file_ranges(zo, ["user_id", "value"])
    for a, b in ((0.1, 0.2), (0.4, 0.5), (0.6, 0.7)):
        stats = ev.selectExpr(
            f"percentile(user_id, {a}) lo", f"percentile(user_id, {b}) hi"
        ).first()
        hit = _files_hit(zo_ranges, {"user_id": (stats.lo, stats.hi)})
        assert hit <= N_FILES // 2, f"z-order lost primary pruning: {hit}/{N_FILES}"


def test_compaction_preserves_content_and_reduces_files(spark, sf_dir, tmp_path):
    ev = load_compute_table(spark, sf_dir, "events")
    path = str(tmp_path / "frag")
    ev.repartition(64).write.parquet(path)  # the small-files problem
    assert len(glob.glob(path + "/*.parquet")) == 64
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())

    n = compact_to_target(spark, path, target_bytes=1 << 30)  # everything -> 1 file
    files = glob.glob(path + "/*.parquet")
    assert n == 1 and len(files) == 1
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before

    # idempotent: compacting a compacted dir keeps one file and all rows
    n2 = compact_to_target(spark, path, target_bytes=1 << 30)
    assert n2 == 1
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == before


def test_zorder_three_columns(spark, sf_correctness_dir, tmp_path):
    """ndims generalization: clustering on three columns still prunes on
    the third (each dim gets ~cube-root locality; a 10% box must skip
    SOME files, where a (user_id, value) layout could never prune on
    event_id)."""
    ev = load_compute_table(spark, sf_correctness_dir, "events").select(
        "event_id", "user_id", "value"
    )
    zo = str(tmp_path / "zo3")
    zorder_by(ev, ["user_id", "value", "event_id"], N_FILES).write.parquet(zo)
    ranges = _file_ranges(zo, ["user_id", "value", "event_id"])
    assert len(ranges) == N_FILES
    stats = ev.selectExpr(
        "percentile(event_id, 0.1) lo", "percentile(event_id, 0.2) hi"
    ).first()
    hit = _files_hit(ranges, {"event_id": (stats.lo, stats.hi)})
    assert hit < N_FILES, f"no pruning on the third dimension: {hit}/{N_FILES}"
    # content preserved
    assert spark.read.parquet(zo).count() == ev.count()


def test_retention_sweep_two_phase(spark, tmp_path):
    from kafka_clickhouse_example_spark.operators.layout import retention_sweep

    table = str(tmp_path / "events_lake")
    df = spark.createDataFrame(
        [(i, f"2024-01-{d:02d}") for d in range(10, 16) for i in range(20)],
        "v int, day string",
    )
    df.write.partitionBy("day").parquet(table)

    # dry run: reports, touches nothing
    rep = retention_sweep(spark, table, "day", "2024-01-13", dry_run=True)
    assert rep["expired"] == ["2024-01-10", "2024-01-11", "2024-01-12"]
    assert spark.read.parquet(table).select("day").distinct().count() == 6

    # sweep: expired partitions parked in trash, readers see only kept days
    rep = retention_sweep(spark, table, "day", "2024-01-13")
    # str(): partition-type inference reads ISO day strings back as DATEs
    kept = {str(r.day) for r in spark.read.parquet(table).select("day").distinct().collect()}
    assert kept == {"2024-01-13", "2024-01-14", "2024-01-15"}
    trash = table + "__trash"
    parked = spark.read.parquet(trash + "/day=2024-01-10")
    assert parked.count() == 20  # every byte recoverable before purge

    # idempotent re-run, then purge actually deletes; purged entries are
    # reported VERBATIM (dir names, not sliced values)
    rep = retention_sweep(spark, table, "day", "2024-01-13", purge_trash=True)
    assert rep["expired"] == []
    assert rep["purged"] == ["day=2024-01-10", "day=2024-01-11", "day=2024-01-12"]
    import os

    assert os.listdir(trash) == []


def test_retention_sweep_purge_keeps_own_sweep_recoverable(spark, tmp_path):
    """A single `--retention-sweep --purge-trash` call must NOT destroy the
    partitions it expires in that same call: purge runs before parking, so
    every invocation leaves the newest sweep's bytes recoverable."""
    from kafka_clickhouse_example_spark.operators.layout import retention_sweep

    table = str(tmp_path / "lake")
    spark.createDataFrame(
        [(i, f"2024-01-{d:02d}") for d in range(10, 14) for i in range(5)],
        "v int, day string",
    ).write.partitionBy("day").parquet(table)

    rep = retention_sweep(spark, table, "day", "2024-01-11", purge_trash=True)
    assert rep["expired"] == ["2024-01-10"]
    assert rep["purged"] == []  # nothing parked before this call
    # the just-expired partition is parked, not gone
    assert spark.read.parquet(table + "__trash/day=2024-01-10").count() == 5

    # next purge-sweep deletes the prior parking, parks the new expiration
    rep = retention_sweep(spark, table, "day", "2024-01-12", purge_trash=True)
    assert rep["expired"] == ["2024-01-11"]
    assert rep["purged"] == ["day=2024-01-10"]
    assert spark.read.parquet(table + "__trash/day=2024-01-11").count() == 5


def test_diff_tables_classifies_all_statuses(spark):
    from kafka_clickhouse_example_spark.operators.layout import diff_tables

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30)], "k long, s string, v int"
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", None), (4, "d", 40)], "k long, s string, v int"
    )
    got = {r.k: r.diff_status for r in diff_tables(old, new, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_diff_tables_null_vs_empty_string_distinct(spark):
    # the null sentinel must keep NULL and '' apart in the fingerprint
    from kafka_clickhouse_example_spark.operators.layout import diff_tables

    old = spark.createDataFrame([(1, None)], "k long, s string")
    new = spark.createDataFrame([(1, "")], "k long, s string")
    (row,) = diff_tables(old, new, ["k"]).collect()
    assert row.diff_status == "changed"


def test_diff_tables_fingerprint_unambiguous(spark):
    # review repro: separator bytes inside values must not collide, and a
    # NULL column must stay distinct from any sentinel-looking literal
    from kafka_clickhouse_example_spark.operators.layout import diff_tables

    old = spark.createDataFrame([(1, "a\x01b", "c")], "k long, c1 string, c2 string")
    new = spark.createDataFrame([(1, "a", "b\x01c")], "k long, c1 string, c2 string")
    (row,) = diff_tables(old, new, ["k"]).collect()
    assert row.diff_status == "changed"

    old2 = spark.createDataFrame([(1, None)], "k long, s string")
    new2 = spark.createDataFrame([(1, "\x00null")], "k long, s string")
    (row2,) = diff_tables(old2, new2, ["k"]).collect()
    assert row2.diff_status == "changed"


def test_diff_tables_null_keys_match_null_safely(spark):
    from kafka_clickhouse_example_spark.operators.layout import diff_tables

    old = spark.createDataFrame([(None, "a"), (1, "b")], "k string, s string")
    new = spark.createDataFrame([(None, "a"), (1, "B")], "k string, s string")
    got = {r.k: r.diff_status for r in diff_tables(old, new, ["k"]).collect()}
    assert got == {None: "unchanged", "1": "changed"}
