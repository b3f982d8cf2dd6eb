"""MERGE / upsert maintenance for partitioned parquet tables.

The reference pipeline is append-only (export_clickhouse.go buffers inserts);
real deployments also need UPDATE-shaped maintenance: late corrections, CDC
replays, dimension refreshes. Without a transactional table format the
engine-native way to merge into parquet is the Hive-style protocol every
lakehouse predates:

    touched partitions = distinct partition values in the updates
    read ONLY those partitions (partition pruning, not a table scan)
    upsert within them (latest row per key wins)
    dynamic-partition-overwrite exactly those partitions back

Cost is O(touched partitions + updates), not O(table) — at 100 TB a daily
CDC batch touching 3 days rewrites 3 day-directories. The rewrite itself is
all-or-nothing per partition under Spark's dynamic overwrite commit
protocol, and re-running the same updates is a content no-op (idempotent),
the same contract as ``backfill.overwrite_partitions``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def apply_upserts(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str | None = None,
) -> DataFrame:
    """SCD type-1 upsert: one row per key; an update supersedes the base
    row, inserts pass through, base rows with no update survive.

    Single-exchange shape: union both sides with a source tag and keep the
    top row per key by (source priority, ``version_col`` desc) — one
    shuffle on the key, no join. With ``version_col`` (e.g. a CDC sequence
    number), the newest update wins WITHIN the updates side too, so a
    replayed batch containing multiple versions of a key is handled in one
    pass; ties (same version) break toward updates deterministically.
    """
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    order = [F.col("_src").desc()]
    if version_col is not None:
        order.insert(0, F.col(version_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )


def merge_into_partitioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    partition_col: str,
    version_col: str | None = None,
) -> int:
    """MERGE ``updates`` into the ``partition_col``-partitioned parquet
    table at ``path``; returns the number of partitions rewritten.

    Reads only the touched partitions: the IN-filter on the partition
    column prunes at planning time (PartitionFilters, no data read from
    untouched directories — pinned by tests/test_merge.py which asserts
    untouched partition FILES are byte-identical afterwards). A key's
    partition value must be stable (a moved row would be an insert in the
    new partition and a stale survivor in the old — the classic
    partitioned-merge caveat; use a delete marker + compaction pass for
    repartitioning updates). Partition values that LOOK numeric get
    type-inferred by the hive reader — keep
    spark.sql.sources.partitionColumnTypeInference consistent between the
    writer and this reader, or use non-ambiguous (string) partition values
    as the tests do.
    """
    touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not touched:
        return 0
    base = spark.read.parquet(path).filter(F.col(partition_col).isin(touched))
    merged = apply_upserts(base, updates, keys, version_col=version_col)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return len(touched)


def start_upsert_sink(
    stream: DataFrame,
    path: str,
    keys: list[str],
    partition_col: str,
    checkpoint: str,
    version_col: str | None = None,
):
    """Streaming CDC upsert sink: each micro-batch MERGEs into the
    partitioned parquet table via :func:`merge_into_partitioned`.

    Delivery semantics: the checkpoint gives at-least-once batch delivery,
    and latest-version-wins merging makes a REPLAYED batch a content
    no-op — so with a ``version_col`` (any monotone CDC sequence) the
    table state is effectively exactly-once: replays cannot double-apply
    (upserts are idempotent) and stale records cannot clobber newer ones
    (version-wins). That is strictly stronger than the append sink's
    at-least-once, and it is the standard lakehouse CDC landing pattern.

    Cost per batch: O(touched partitions + batch), same as the batch
    MERGE; untouched partitions are never read or rewritten.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        from kafka_clickhouse_example_spark.sinks.backfill import _table_exists

        if not _table_exists(spark, path):
            if batch_df.isEmpty():
                return
            # bootstrap: the first batch may itself carry several versions
            # of a key — collapse to latest before the initial write
            first = apply_upserts(
                batch_df.filter(F.lit(False)), batch_df, keys, version_col=version_col
            )
            first.write.mode("overwrite").partitionBy(partition_col).parquet(path)
            return
        merge_into_partitioned(
            spark, path, batch_df, keys, partition_col, version_col=version_col
        )

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def forget_keys(
    spark: SparkSession,
    path: str,
    key_col: str,
    key_values: list,
    partition_col: str,
    *,
    purge: bool = False,
) -> dict:
    """Right-to-be-forgotten delete: remove every row whose ``key_col`` is
    in ``key_values`` from the ``partition_col``-partitioned parquet table,
    rewriting ONLY the partitions that actually contain those keys — the
    erasure primitive the PII/privacy family (pii scrub, k-anonymity
    audit) needs for post-hoc requests.

    Mechanics: ONE pruned pass over the table classifies every touched
    partition (subject rows, surviving rows — NULL keys survive: a NULL is
    never one of the subject's identifiers, and the naive ``~IN`` filter
    would silently destroy such rows); survivors rewrite via
    ``backfill.overwrite_partitions`` (the shared dynamic-overwrite
    protocol), and a partition left EMPTY — inexpressible by dynamic
    overwrite — parks by rename into ``<path>__forgotten``, raising if the
    rename fails (a silent false rename would report an erasure that did
    not happen). Untouched partition files stay byte-identical; repeating
    the call for absent keys rewrites nothing.

    Parked bytes are STILL READABLE at the sibling path, so the erasure is
    not complete until they are destroyed: pass ``purge=True`` to delete
    the entire ``__forgotten`` directory (this call's parkings plus any
    prior call's) after parking, or consume the returned ``parked_path``
    and finish the purge out of band — the report never claims more than
    what happened. Returns {"partitions_rewritten", "rows_deleted",
    "parked_path" (None unless bytes remain parked), "purged" (verbatim
    partition dir names deleted this call)}.
    """
    from kafka_clickhouse_example_spark.sinks.backfill import overwrite_partitions

    base = spark.read.parquet(path)
    subject = F.col(key_col).isin(key_values)
    keep = ~subject | F.col(key_col).isNull()
    per_part = (
        base.groupBy(partition_col)
        .agg(
            F.count(F.when(subject, 1)).alias("n_subject"),
            F.count(F.when(keep, 1)).alias("n_keep"),
        )
        .filter(F.col("n_subject") > 0)
        .collect()
    )
    if not per_part:
        return {
            "partitions_rewritten": 0,
            "rows_deleted": 0,
            "parked_path": None,
            "purged": [],
        }
    touched = [r[0] for r in per_part]
    rows_deleted = sum(r["n_subject"] for r in per_part)
    emptied = [r[0] for r in per_part if r["n_keep"] == 0]
    rewrite = [r[0] for r in per_part if r["n_keep"] > 0]
    if rewrite:
        kept = base.filter(F.col(partition_col).isin(rewrite)).filter(keep)
        overwrite_partitions(kept, path, [partition_col])
    trash_str = path.rstrip("/") + "__forgotten"
    purged: list[str] = []
    parked_path: str | None = None
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)
    trash = jvm.org.apache.hadoop.fs.Path(trash_str)
    if emptied:
        fs.mkdirs(trash)
        for pv in emptied:
            name = f"{partition_col}={pv}"
            src = jvm.org.apache.hadoop.fs.Path(hpath, name)
            dst = jvm.org.apache.hadoop.fs.Path(trash, name)
            fs.delete(dst, True)
            if not fs.rename(src, dst):
                raise IOError(
                    f"forget_keys: could not park emptied partition {name} "
                    f"(subject rows may still be readable at {path})"
                )
    if purge and fs.exists(trash):
        # complete the erasure: destroy every parked partition (this
        # call's and any earlier call's leftovers), then the dir itself —
        # report entry names verbatim, never sliced.
        for status in fs.listStatus(trash):
            purged.append(status.getPath().getName())
            if not fs.delete(status.getPath(), True):
                raise IOError(
                    f"forget_keys: could not purge parked {status.getPath()}"
                )
        fs.delete(trash, True)
    elif fs.exists(trash):
        parked_path = trash_str
    return {
        "partitions_rewritten": len(touched),
        "rows_deleted": int(rows_deleted),
        "parked_path": parked_path,
        "purged": purged,
    }


SCD2_BUCKETS = 32


def merge_scd2_into(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    buckets: int = SCD2_BUCKETS,
) -> int:
    """MERGE a batch of attribute changes into the SCD2 history at
    ``path``; returns the number of bucket partitions rewritten.

    Layout: TWO key-hash-bucket-partitioned parquet tables — the raw,
    deduplicated change log at ``<path>__changes`` (source of truth) and
    the derived interval view at ``path`` (operators/temporal.
    scd2_intervals rows). Intervals are NOT lossless for the change
    stream (consecutive equal values collapse, absorbing their
    timestamps), so rebuilding from intervals alone would diverge from a
    batch build once a LATE change lands before an absorbed one; keeping
    the change log makes every rebuild exact under ANY arrival order.

    Contract: (key, ts) uniquely identifies a change (the usual CDC
    sequence property). Per batch: dedup the union of the touched
    buckets' logged changes and the batch on (key, ts) — so replays are
    content no-ops (effectively exactly-once), late changes split the
    interval they land inside, equal-to-predecessor changes collapse —
    then rebuild intervals for exactly those buckets. Content always
    equals the one-shot batch build over every change ever delivered
    (pinned by tests, including out-of-order and replay).

    Scale: cost per batch is O(touched buckets + batch) — both reads are
    partition-pruned to the touched buckets, untouched buckets' files are
    never opened, and the rebuild is the same one-exchange window build
    as the batch operator, restricted to touched buckets.
    """
    from kafka_clickhouse_example_spark.operators.sampling import hash_bucket
    from kafka_clickhouse_example_spark.operators.temporal import scd2_intervals
    from kafka_clickhouse_example_spark.sinks.backfill import (
        _table_exists,
        overwrite_partitions,
    )

    log_path = path.rstrip("/") + "__changes"
    # partition column must NOT start with "_": `_kb=3` directories count
    # as hidden under the Hadoop convention, so _table_exists (and several
    # non-Spark parquet readers) would see an "empty" table and the next
    # batch would clobber the log via the bootstrap branch (found the hard
    # way; pinned by tests/test_scd2_stream.py)
    kb = hash_bucket(F.col(key_col), buckets).cast("bigint")
    batch = (
        changes.select(key_col, attr_col, ts_col)
        .withColumn("scd2_kb", kb)
        .dropDuplicates([key_col, ts_col])
    )
    if batch.isEmpty():
        return 0
    touched = [r[0] for r in batch.select("scd2_kb").distinct().collect()]
    if _table_exists(spark, log_path):
        from kafka_clickhouse_example_spark.operators.checkpointing import materialize

        old = spark.read.parquet(log_path).filter(F.col("scd2_kb").isin(touched))
        # materialize BEFORE the write: the plan reads the same path the
        # dynamic overwrite replaces (lazy self-overwrite silently drops
        # the old rows otherwise)
        merged_log = materialize(
            old.unionByName(batch).dropDuplicates([key_col, ts_col])
        )
        overwrite_partitions(merged_log, log_path, ["scd2_kb"])
    else:
        merged_log = batch
        merged_log.write.mode("overwrite").partitionBy("scd2_kb").parquet(log_path)
    # the log just rewritten is the rebuild input; re-read it so the
    # intervals derive from exactly what was committed
    log = spark.read.parquet(log_path).filter(F.col("scd2_kb").isin(touched))
    rebuilt = scd2_intervals(log, [key_col], attr_col, ts_col).withColumn("scd2_kb", kb)
    if _table_exists(spark, path):
        overwrite_partitions(rebuilt, path, ["scd2_kb"])
    else:
        rebuilt.write.mode("overwrite").partitionBy("scd2_kb").parquet(path)
    return len(touched)


def start_scd2_sink(
    stream: DataFrame,
    path: str,
    key_col: str,
    attr_col: str,
    ts_col: str,
    checkpoint: str,
    buckets: int = SCD2_BUCKETS,
):
    """Streaming SCD2 maintenance: each micro-batch of attribute changes
    MERGEs into the bucket-partitioned history via
    :func:`merge_scd2_into` — dimension history stays continuously
    current (open intervals close as successors arrive, late data splits
    in place), effectively exactly-once under replay (content no-op), and
    arrival-order independent (always equals the batch build over all
    changes delivered so far).
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        merge_scd2_into(
            batch_df.sparkSession, path, batch_df, key_col, attr_col, ts_col,
            buckets=buckets,
        )

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
