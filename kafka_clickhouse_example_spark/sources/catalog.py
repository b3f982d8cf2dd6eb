"""Batch table catalog over the driver-provided parquet directories.

``/root/testdata/sf*/`` holds one parquet file per table (TESTDATA.md).
Reads are plain ``spark.read.parquet`` — Catalyst handles column pruning and
predicate pushdown into the scan, which is the whole point at 100 TB: a query
touching 2 of lineitem's 11 columns reads 2 column chunks, not the table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The driver-generated parquet has shipped two physical timestamp encodings
# across rounds: TIMESTAMP(NANOS) (vectorized reader rejects it; read as
# LongType via the legacy conf set in session.configure_runtime, then
# `div 1000` — exact integer math) and TIMESTAMP(MICROS, isAdjustedToUTC=
# false) (Spark 4 infers TIMESTAMP_NTZ). Both are normalized to TimestampType
# in the UTC session so epoch functions (unix_millis etc.) and the DuckDB
# oracle (naive micros) see identical instants.
TIMESTAMP_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "lineitem": ["l_shipdate"],
    "orders": ["o_orderdate"],
}


_SIZE_SUFFIX = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}

# Lazy-DataFrame memo keyed (session id, sf_dir, table): spark.read.
# parquet + the timestamp-normalization projection costs ~80-130 ms of
# driver time PER CALL (file listing, footer schema read, py4j round
# trips), and the bench constructs every query fresh 3x per measurement —
# ~20-40 s of a full sweep was spent rebuilding identical scan plans
# (r11 measurement). The memo shares the immutable logical plan only:
# every execution still scans the parquet files (no data or results are
# cached), and split planning still reads session confs at execution
# time, so relayout tests and AQE behave identically.
#
# Keyed by id(spark), NOT applicationId (round-11 ADVICE): DataFrames are
# bound to the SparkSession that created them, and a sibling
# spark.newSession() shares the applicationId but has its own conf/view
# state — an appId key would hand the sibling the first session's
# DataFrame and skip its nanosAsLong conf-set. id() reuse after GC is not
# a hazard here: the memoized DataFrame holds a reference to its session,
# so a keyed session stays alive exactly as long as its entries do.
#
# A caller that REWRITES files under a memoized path must call
# clear_load_memo() (the captured file listing would go stale) — no
# production path rewrites; the relayout tests write to fresh dirs.
_LOAD_MEMO: dict[tuple[int, str, str], DataFrame] = {}


def clear_load_memo() -> None:
    """Drop every memoized scan plan — for callers that rewrite parquet
    under a previously-loaded path (the captured file listing and footer
    schema would be stale). Exposed per round-11 ADVICE instead of leaving
    invalidation as a comment-only caveat."""
    _LOAD_MEMO.clear()


def _parse_bytes(v: str, default: int = 134217728) -> int:
    """Spark size-string parser ('128m', '1g', '131072kb', '134217728b',
    plain int). A session configured with a suffixed value previously made
    int(...rstrip('b')) raise and fail every load_compute_table query."""
    s = str(v).strip().lower().removesuffix("b")
    try:
        if s and s[-1] in _SIZE_SUFFIX:
            return int(float(s[:-1]) * _SIZE_SUFFIX[s[-1]])
        return int(s)
    except ValueError:
        return default


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, min_partitions: int | None = None
) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (id(spark), sf_dir, name)
    df = _LOAD_MEMO.get(key)
    if df is None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        dtypes = dict(df.dtypes)
        for c in TIMESTAMP_COLS.get(name, []):
            if c in df.columns and dtypes[c] == "bigint":
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        for c, dt in dtypes.items():
            if dt == "timestamp_ntz":
                df = df.withColumn(c, F.col(c).cast("timestamp"))
        _LOAD_MEMO[key] = df
    if min_partitions:
        # Per-row-expensive pipelines (hashing, vector math) ask for a floor
        # on scan parallelism: the test corpus is one single-row-group file
        # (=> a 1-task scan that starves every other core), while a real
        # large table scans as thousands of splits and skips this branch —
        # the repartition only ever fires when the scan is pathologically
        # under-parallel, so the extra shuffle is a test-scale-only cost.
        # Scan split count is estimated from file bytes (cheap, pure-Python)
        # rather than df.rdd.getNumPartitions(), which materializes an RDD
        # plan per call — measurable across a 40-query bench.
        max_split = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
        est_splits = max(1, os.path.getsize(path) // max_split)
        if est_splits < min_partitions:
            df = df.repartition(min_partitions)
    return df


def load_compute_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """load_table with scan parallelism floored at the session's core count —
    for operators whose per-row cost (md5 chains, 64-dim fold kernels)
    dwarfs the scan itself."""
    return load_table(
        spark, sf_dir, name, min_partitions=spark.sparkContext.defaultParallelism
    )


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so queries can use spark.sql."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def table_info(spark: SparkSession, table: str) -> dict[str, str]:
    """The DESCRIBE TABLE EXTENDED metadata rows as a dict — the one
    place index-maintenance code reads catalog facts (Type, Location,
    Num Buckets) instead of trusting caller-remembered parameters."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    return {r.col_name: r.data_type for r in rows}


def table_location(spark: SparkSession, table: str) -> str | None:
    """The table's storage location (managed or external), or None."""
    return table_info(spark, table).get("Location")


def external_location(spark: SparkSession, table: str) -> str | None:
    """Location of ``table`` IF it is an external table, else None.

    An overwrite via saveAsTable drops and recreates the table; without
    re-supplying the path, a path-built (external) table would be
    silently recreated MANAGED in the warehouse, leaving stale parquet
    at the published location for any path-based consumer. Managed
    tables return None — recreating them managed is the status quo.
    """
    info = table_info(spark, table)
    if info.get("Type", "").upper() != "EXTERNAL":
        return None
    return info.get("Location")


def bucket_count(spark: SparkSession, table: str) -> int:
    """The bucket count of a bucketed table, read from the catalog — a
    rewrite that trusted a caller-remembered count could silently
    re-bucket the layout on a mismatch."""
    info = table_info(spark, table)
    if "Num Buckets" not in info:
        raise ValueError(
            f"bucket_count: table {table!r} is not bucketed (DESCRIBE has "
            "no 'Num Buckets') — a bucketed-layout rewrite must not guess "
            "a count; check the table name or rebuild the index"
        )
    return int(info["Num Buckets"])
