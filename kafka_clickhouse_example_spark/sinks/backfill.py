"""Idempotent batch backfill: dynamic partition overwrite into a
partitioned parquet table.

The streaming spine is exactly-once via checkpointed foreachBatch; the
BATCH side of a 100 TB pipeline needs the same property for reprocessing —
re-running yesterday's job must replace yesterday's output, not append a
second copy, and must not touch any other day. Spark's dynamic partition
overwrite (`partitionOverwriteMode=dynamic`) gives that: `overwrite` mode
rewrites ONLY the partitions present in the incoming DataFrame.

Scale notes:
- The overwrite granularity is the partition directory — pick partition
  columns whose daily/affected set is what a backfill naturally recomputes
  (day, day+lang). One job rewrites O(affected partitions), never the
  table.
- The write itself is a normal distributed parquet write; no driver-side
  data movement. Committing is file-level rename within each partition
  directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _table_exists(spark: SparkSession, path: str) -> bool:
    """True iff the table directory holds COMMITTED data, via Hadoop
    FileSystem — existence of the directory alone is not enough: a crash
    during the very first write leaves the directory (plus ``_temporary``)
    with zero committed part-files, and treating that as "table exists"
    poisons the stream permanently (every retry reads an empty-schema
    table and fails). So: exists AND contains at least one non-hidden
    file anywhere beneath (partitioned layouts nest files one level down).

    Used instead of try/except around the read: "view doesn't exist yet"
    is the ONLY condition that may legitimately skip the merge. A transient
    IO error, corrupt file, or schema drift must propagate and fail the
    batch loudly — swallowing it would commit a delta-only overwrite that
    silently drops the stored aggregates for the touched partitions.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return False

    def _has_data(p) -> bool:
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue  # _temporary, _SUCCESS, hidden files
            if st.isFile():
                return True
            if st.isDirectory() and _has_data(st.getPath()):
                return True
        return False

    return _has_data(jpath)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Write ``df`` into the partitioned parquet table at ``path``,
    replacing exactly the partitions present in ``df`` (dynamic partition
    overwrite) and leaving every other partition untouched. Re-running
    the same input is a no-op on the table's content — the idempotency
    contract backfills rely on.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def start_rollup_matview(flows: DataFrame, path: str, checkpoint: str):
    """Streaming materialized view: maintain a day-partitioned
    (day, src_namespace, dst_namespace) traffic rollup from the flow
    stream, merging each micro-batch into the stored view with dynamic
    partition overwrite.

    Per batch: roll up the batch, read back ONLY the affected day
    partitions of the view (partition pruning on the day filter), merge
    by re-aggregation (sum-of-sums — the same algebra certified by
    events_incremental_rollup_merge), and overwrite exactly those
    partitions. Cost per batch is O(delta) + O(view rows for touched
    days), never O(history).

    Delivery: at-least-once on crash-retry — a batch replayed after its
    overwrite committed would merge twice (read-merge-write over plain
    parquet is not transactional; an ACID table format is the upgrade
    path). The checkpointed source offsets make duplicates possible only
    across a failure boundary, matching the reference's own at-least-once
    Kafka semantics (SURVEY §2.9 T1 before the round-1 fix). For
    crash-replay-safe semantics over plain parquet use
    ``start_rollup_matview_exactly_once`` below, which lands per-batch
    deltas idempotently and recomputes touched days instead of merging
    the stored view.
    """
    from pyspark.sql import functions as F

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = (
            batch_df.withColumn(
                "day",
                F.date_format(
                    F.timestamp_millis(F.col("start").cast("long")), "yyyy-MM-dd"
                ),
            )
            .groupBy("day", "src_namespace", "dst_namespace")
            .agg(
                F.sum("bytes").alias("sum_bytes"),
                F.sum("packets").alias("sum_packets"),
                F.count("*").alias("n_flows"),
            )
        )
        days = [r["day"] for r in delta.select("day").distinct().collect()]
        if not days:
            return
        if _table_exists(spark, path):
            # Any failure reading the existing view (IO error, corruption,
            # schema drift) propagates: failing the batch keeps history
            # intact for the checkpointed retry, whereas treating it as
            # "first batch" would overwrite history with delta-only rows.
            existing = spark.read.parquet(path).filter(F.col("day").isin(days))
            existing = existing.select(
                F.col("day").cast("string").alias("day"),
                "src_namespace", "dst_namespace",
                "sum_bytes", "sum_packets", "n_flows",
            )
            merged_src = delta.unionByName(existing)
        else:  # first batch: view doesn't exist yet
            merged_src = delta
        merged = merged_src.groupBy("day", "src_namespace", "dst_namespace").agg(
            F.sum("sum_bytes").alias("sum_bytes"),
            F.sum("sum_packets").alias("sum_packets"),
            F.sum("n_flows").alias("n_flows"),
        )
        overwrite_partitions(merged, path, ["day"])

    return (
        flows.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _recompute_merge(
    batch_df: DataFrame, batch_id: int, raw_path: str, view_path: str
) -> None:
    """One exactly-once matview step (module-level so tests can replay it):

    1. Land the batch's rolled-up delta at ``raw_path/batch_id=<id>`` with
       per-directory overwrite — replaying the same batch rewrites the SAME
       directory with the SAME rows, a no-op on table content.
    2. Recompute the touched day partitions from ALL landed batch deltas
       (never from the current view), and dynamic-overwrite exactly those
       day partitions of the view.

    Both steps are idempotent and deterministic, so any crash/replay
    interleaving converges to the same view — unlike the read-merge-write
    in ``start_rollup_matview``, which double-counts a batch replayed
    across a crash boundary (its documented at-least-once caveat,
    ADVICE r2). Cost per batch: O(batch) for the landing write +
    O(stored deltas for touched days) for the recompute — the recompute
    reads day-pruned BATCH ROLLUPS (|namespace pairs| rows per batch per
    day), not raw flows.
    """
    from pyspark.sql import functions as F

    spark = batch_df.sparkSession
    delta = (
        batch_df.withColumn(
            "day",
            F.date_format(
                F.timestamp_millis(F.col("start").cast("long")), "yyyy-MM-dd"
            ),
        )
        .groupBy("day", "src_namespace", "dst_namespace")
        .agg(
            F.sum("bytes").alias("sum_bytes"),
            F.sum("packets").alias("sum_packets"),
            F.count("*").alias("n_flows"),
        )
    )
    days = [r["day"] for r in delta.select("day").distinct().collect()]
    if not days:
        return
    # (1) Idempotent landing: static overwrite of THIS batch's directory.
    delta.write.mode("overwrite").parquet(f"{raw_path}/batch_id={batch_id}")
    # (2) Recompute touched days from every landed delta. basePath keeps
    # the batch_id partition column out of the schema; the day filter
    # prunes to touched-day row groups.
    all_deltas = (
        spark.read.option("basePath", raw_path)
        .parquet(raw_path)
        .filter(F.col("day").isin(days))
    )
    recomputed = all_deltas.groupBy("day", "src_namespace", "dst_namespace").agg(
        F.sum("sum_bytes").alias("sum_bytes"),
        F.sum("sum_packets").alias("sum_packets"),
        F.sum("n_flows").alias("n_flows"),
    )
    overwrite_partitions(recomputed, view_path, ["day"])


def start_rollup_matview_exactly_once(
    flows: DataFrame, raw_path: str, view_path: str, checkpoint: str
):
    """Exactly-once streaming materialized view: same (day, src_namespace,
    dst_namespace) rollup as ``start_rollup_matview``, but crash-replay
    safe — see ``_recompute_merge``. Needs a second storage location for
    the per-batch landed deltas (``raw_path``); a deployment that wants
    single-location ACID semantics should use a transactional table format
    instead, which collapses the two paths into one MERGE."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        _recompute_merge(batch_df, batch_id, raw_path, view_path)

    return (
        flows.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_cms_matview(
    stream_df: DataFrame, key_col: str, partials_path: str, checkpoint: str
):
    """Incrementally-maintained Count-Min sketch over a stream — heavy-
    hitter frequencies without ever storing per-key state.

    Exactly-once by construction: each micro-batch's partial sketch lands
    under ``batch=<id>`` with mode("overwrite"), so a crash-replayed batch
    overwrites ITS OWN partial instead of double-counting (the idempotence
    trick the exactly-once rollup uses, applied to mergeable sketch
    state). The queryable sketch is the cell-wise sum of all partials —
    CMS merge is exact (tests/test_sketches.py), so the streamed sketch is
    bit-identical to one built over the full history in batch.

    Scale: each partial is <= depth*width (8,192) rows regardless of batch
    size; a year of 5-minute batches is ~10^5 partials x KBs — compact with
    ``compact_partials(spark, path, read_cms_matview)`` (manifest-pinned,
    crash-safe) when it grows.
    """
    from kafka_clickhouse_example_spark.operators.sketches import cms_build

    return _start_partial_matview(
        stream_df, lambda b: cms_build(b, key_col), partials_path, checkpoint
    )


def read_cms_matview(
    spark: SparkSession, partials_path: str, dirs: list[str] | None = None
) -> DataFrame:
    """The queryable sketch: cell-wise sum over the LIVE partials (the
    manifest-pinned set — orphans from an interrupted compaction are
    invisible). ``dirs`` restricts to a subset (compaction)."""
    from pyspark.sql import functions as F

    return (
        _read_live_partials(spark, partials_path, dirs)
        .groupBy("r", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )


# --- manifest-pinned partials ------------------------------------------------
#
# With per-batch landing alone, the partials directory grows without
# bound (a year of 5-minute batches is ~10^5 dirs) and a naive
# "merge + delete the old dirs" compaction has an unrecoverable crash
# window: merged dir landed + some old dirs still present = double
# counting, some old dirs deleted before the merge commits = data loss.
# The standard fix is the table-format device in miniature: a MANIFEST
# names the live directory set, readers read exactly that set, and
# compaction commits by atomically swapping the manifest — directory
# creation and deletion are then always either invisible (not yet in the
# manifest) or garbage (no longer in it), never half-visible.
#
# Filesystem notes: listing/reading/deleting go through the Hadoop
# FileSystem API (local glob/os is wrong for hdfs://, s3a://, or file:
# URI paths — the compact_to_target lesson, packing.py). The manifest
# SWAP dispatches on the RESOLVED FileSystem (never the raw URI scheme —
# a scheme-less path resolves against fs.defaultFS), because the rename
# that is atomic differs per filesystem: for the local FS it is POSIX
# os.rename (fsync'd file + dir), while Hadoop's FileContext
# rename(OVERWRITE) default is delete-then-rename — NOT atomic on the
# local FS (only Hdfs overrides the 3-arg renameInternal atomically;
# review finding, verified against
# Hadoop 3.4.2 bytecode). For hdfs:// the FileContext path IS atomic;
# an object-store deployment should swap _manifest_write for a
# conditional-put. Compaction runs in a maintenance window while the
# landing stream is stopped, like compact_term_index.

_MANIFEST = "_live.json"


def _hfs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any URI or local path."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _list_batch_dirs(spark: SparkSession, partials_path: str) -> list[str]:
    """Every batch=* directory physically present (live or orphan)."""
    fs, root = _hfs(spark, partials_path)
    if not fs.exists(root):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(root)
        if st.isDirectory() and st.getPath().getName().startswith("batch=")
    )


def _manifest_read(spark: SparkSession, partials_path: str) -> list[str] | None:
    """Manifest dir list, or None if no manifest exists yet."""
    import json as _json

    fs, _ = _hfs(spark, partials_path)
    mpath = spark._jvm.org.apache.hadoop.fs.Path(f"{partials_path}/{_MANIFEST}")
    if not fs.exists(mpath):
        return None
    stream = fs.open(mpath)
    try:
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return sorted(_json.loads(text)["dirs"])


def _local_path(spark: SparkSession, path: str) -> str | None:
    """The plain filesystem path when ``path`` RESOLVES to the local
    filesystem, else None — the manifest swap's atomicity dispatch.
    Dispatch must use the resolved FileSystem, not the raw URI scheme: a
    scheme-less path resolves against fs.defaultFS (hdfs:// on a real
    cluster), and raw-scheme dispatch would then write the manifest to
    the driver's local disk while every reader resolves HDFS — a
    permanently invisible manifest (review finding). makeQualified also
    absolutizes relative paths against the same working directory the
    JVM-side reads use."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.getUri().getScheme() == "file":
        return fs.makeQualified(jpath).toUri().getPath()
    return None


def _manifest_write(spark: SparkSession, partials_path: str, dirs) -> None:
    """Atomic manifest replace. Local paths: Python write + fsync(file)
    + POSIX os.rename + fsync(dir) — genuinely atomic AND durable (and
    no Hadoop checksum sidecar files). Remote paths: Hadoop create +
    hsync + FileContext rename(OVERWRITE), atomic on HDFS (an
    object-store deployment swaps this for a conditional-put)."""
    import json as _json

    payload = _json.dumps({"dirs": sorted(dirs)}).encode()
    local = _local_path(spark, partials_path)
    if local is not None:
        import os

        tmp = os.path.join(local, _MANIFEST + ".tmp")
        dst = os.path.join(local, _MANIFEST)
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o644)
        try:
            view = memoryview(payload)
            while view:  # short writes (ENOSPC-adjacent) must not reach
                view = view[os.write(fd, view) :]  # the rename truncated
            os.fsync(fd)
        finally:
            os.close(fd)
        os.rename(tmp, dst)
        try:  # dir fsync is best-effort durability (not allowed on some
            dfd = os.open(local, os.O_RDONLY)  # platforms/filesystems);
        except OSError:  # atomicity came from the rename above
            return
        try:
            os.fsync(dfd)
        except OSError:
            pass
        finally:
            os.close(dfd)
        return
    jvm = spark._jvm
    fs, _ = _hfs(spark, partials_path)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{partials_path}/{_MANIFEST}.tmp")
    dst = jvm.org.apache.hadoop.fs.Path(f"{partials_path}/{_MANIFEST}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(payload))
        try:
            out.hsync()
        except Exception:
            pass  # best-effort durability; not all FS streams support it
    finally:
        out.close()
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        spark._jsc.hadoopConfiguration()
    )
    rename = getattr(jvm.org.apache.hadoop.fs.Options, "Rename")
    opts = spark.sparkContext._gateway.new_array(rename, 1)
    opts[0] = rename.OVERWRITE
    fc.rename(tmp, dst, opts)


def _live_dirs(spark: SparkSession, partials_path: str) -> list[str]:
    """Live directory names (e.g. 'batch=7'). Manifest if present; else
    every visible batch=* dir (a read-only legacy tree written before the
    manifest existed — everything on disk is live by definition there;
    any WRITER seeds a manifest first via _ensure_manifest, so the
    fallback never coexists with compaction debris)."""
    dirs = _manifest_read(spark, partials_path)
    return dirs if dirs is not None else _list_batch_dirs(spark, partials_path)


def _ensure_manifest(
    spark: SparkSession, partials_path: str, fsroot=None
) -> list[str]:
    """Seed the manifest from disk if absent — the FIRST act of any
    writer on a legacy tree, so that from then on new directories are
    invisible until committed (without this, a crash between a merged-dir
    write and the manifest swap would make the orphan live through the
    glob fallback — the exact half-visibility the protocol forbids).
    Returns the live list (always sorted — both sources sort) so the
    caller needs no second manifest read (the landing hot path runs once
    per micro-batch). ``fsroot`` passes an already-resolved (fs, root)
    to skip re-resolving the FileSystem."""
    dirs = _manifest_read(spark, partials_path)
    if dirs is None:
        fs, root = fsroot if fsroot is not None else _hfs(spark, partials_path)
        if not fs.exists(root):
            fs.mkdirs(root)
        dirs = _list_batch_dirs(spark, partials_path)
        _manifest_write(spark, partials_path, dirs)
    return dirs


def _read_live_partials(
    spark: SparkSession, partials_path: str, dirs: list[str] | None = None
) -> DataFrame:
    """Read exactly the manifest-pinned directory set (basePath keeps the
    partition column out of the data columns as before). ``dirs``
    overrides the set — compaction uses it to merge a SUBSET of the live
    dirs (everything but the replayable newest batch)."""
    if dirs is None:
        dirs = _live_dirs(spark, partials_path)
    if not dirs:
        raise ValueError(
            f"no live partials under {partials_path!r} — the matview has "
            "never landed a batch (or the manifest names an empty set)"
        )
    return spark.read.option("basePath", partials_path).parquet(
        *[f"{partials_path}/{d}" for d in sorted(dirs)]
    )


def compact_partials(spark: SparkSession, partials_path: str, read_fn) -> None:
    """Compact the matview history: land the merged relation as one new
    ``batch=c<epoch>`` directory, commit by swapping the manifest, then
    garbage-collect every unreferenced dir. ``read_fn`` must accept
    ``(spark, partials_path, dirs=None)`` — dirs names the subset to
    merge (read_cms_matview / read_token_counts are the in-repo shapes).
    A nonexistent ``partials_path`` is a no-op (never created as a side
    effect — a mistyped path must keep failing loudly on reads).

    The HIGHEST-numbered stream batch is deliberately left OUT of the
    merge and kept live alongside the epoch dir: Structured Streaming
    may replay the last batch after a crash (its landing committed but
    the checkpoint offset didn't), and the replay overwrites that
    batch's own directory — if compaction had absorbed it into the
    epoch dir, the replay would re-add it and double-count. Older
    batches are checkpoint-committed and can never replay.

    Crash-safe at every point: the manifest is seeded first on legacy
    trees (_ensure_manifest); before the swap, the merged dir is an
    invisible orphan (a rerun writes c<epoch+1> and the GC sweeps both);
    after the swap, the stale dirs are invisible garbage (a rerun's GC
    sweeps them). Mergeability of the partial state (counts, sketch
    cells) is what makes the merged dir a valid partial.

    Run while the landing stream is stopped (maintenance window); the
    next stream batch appends its numeric dir to the manifest as usual.
    """
    import re

    fs, root = _hfs(spark, partials_path)
    if not fs.exists(root):
        return
    live = _ensure_manifest(spark, partials_path, fsroot=(fs, root))
    on_disk = _list_batch_dirs(spark, partials_path)  # one listing, reused
    numeric = [
        (int(m.group(1)), d)
        for d in live
        if (m := re.fullmatch(r"batch=(\d+)", d))
    ]
    keep_latest = [max(numeric)[1]] if numeric else []
    merge_set = [d for d in live if d not in keep_latest]
    if len(merge_set) > 1:
        epochs = [
            int(m.group(1))
            for d in on_disk
            if (m := re.fullmatch(r"batch=c(\d+)", d))
        ]
        new_dir = f"batch=c{max(epochs, default=0) + 1}"
        # Writing to a NEW dir never touches its lazily-read inputs; the
        # write action runs the merge plan before any state changes.
        read_fn(spark, partials_path, dirs=merge_set).write.mode(
            "overwrite"
        ).parquet(f"{partials_path}/{new_dir}")
        keep = {new_dir, *keep_latest}
        _manifest_write(spark, partials_path, keep)  # the commit point
        on_disk = sorted({*on_disk, new_dir})
    else:
        keep = set(live)
    # GC (also heals interrupted runs): drop every unreferenced batch dir
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    for d in on_disk:
        if d not in keep:
            fs.delete(jpath(f"{partials_path}/{d}"), True)


def _land_partial(partial_df: DataFrame, batch_id: int, partials_path: str) -> None:
    """THE exactly-once landing formula: a batch's partial goes under
    batch=<id> with overwrite, so a crash-replayed batch overwrites its
    own partial instead of double-counting, and the manifest gains the
    dir (idempotent set-add; _ensure_manifest seeds legacy trees first).
    A crash between write and manifest-append replays the whole batch —
    the rewrite is idempotent and the append then lands. One definition —
    the CMS and token-count matviews (and the replay tests) all write
    through it."""
    spark = partial_df.sparkSession
    d = f"batch={batch_id}"
    live = _ensure_manifest(spark, partials_path)  # one read per batch
    partial_df.write.mode("overwrite").parquet(f"{partials_path}/{d}")
    _manifest_write(spark, partials_path, {*live, d})


def _start_partial_matview(
    stream_df: DataFrame, build, partials_path: str, checkpoint: str
):
    """Shared per-batch-partial matview device: ``build(batch_df)`` maps a
    micro-batch to its mergeable partial relation; landing + replay
    semantics come from ``_land_partial``; availableNow + checkpoint make
    the run resumable."""

    def land(batch_df: DataFrame, batch_id: int) -> None:
        _land_partial(build(batch_df), batch_id, partials_path)

    return (
        stream_df.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _land_token_counts(
    batch_df: DataFrame,
    batch_id: int,
    partials_path: str,
    source_col: str,
    text_col: str,
) -> None:
    """One token-matview step, module-level so tests can replay a batch id
    (the same pattern as _recompute_merge)."""
    from kafka_clickhouse_example_spark.operators.text import token_counts

    _land_partial(
        token_counts(batch_df, source_col, text_col), batch_id, partials_path
    )


def start_token_count_matview(
    stream_df: DataFrame,
    partials_path: str,
    checkpoint: str,
    source_col: str = "source",
    text_col: str = "text",
):
    """Incrementally-maintained (source, term, n) token counts over a
    document stream — the mergeable sufficient statistic for the corpus
    diagnostics (token entropy, per-source KL, TTR), so each arriving
    corpus delta costs one vocab-sized partial instead of a full-corpus
    re-tokenization.

    Exactly-once by construction, the CMS-matview device: each
    micro-batch's counts land under ``batch=<id>`` with mode("overwrite"),
    so a crash-replayed batch overwrites ITS OWN partial instead of
    double-counting. Counts are additive, so the merged view
    (``read_token_counts``) is bit-identical to a batch build over the
    full history, and every downstream metric — being deterministic
    integer math over the counts — matches the batch query exactly
    (tests/test_streaming.py pins entropy served from the matview against
    the registered batch query).

    Scale: each partial is (batch vocab x sources) rows — KBs-MBs
    regardless of batch size; compact with ``compact_partials(spark,
    path, read_token_counts)`` (manifest-pinned, crash-safe) when the
    batch count grows.
    """

    from kafka_clickhouse_example_spark.operators.text import token_counts

    return _start_partial_matview(
        stream_df,
        lambda b: token_counts(b, source_col, text_col),
        partials_path,
        checkpoint,
    )


def read_token_counts(
    spark: SparkSession, partials_path: str, dirs: list[str] | None = None
) -> DataFrame:
    """The queryable counts: (source, term) sum over the live partials
    (``dirs`` restricts to a subset — compaction) — feed to
    operators/text.token_entropy_from_counts / token_kl_from_counts (or
    any counts consumer) for serving.

    Materialized eagerly (localCheckpoint): every serve function derives
    several relations from the counts (totals, vocabulary marginal, join
    probe — up to four for KL), and an unmaterialized return would
    re-list and re-aggregate the whole partials tree once per derivation
    — the same double-scan the batch queries avoid by checkpointing cnt.
    The materialized relation is sources x vocab, far below the partials'
    row count once history accumulates."""
    from pyspark.sql import functions as F

    return (
        _read_live_partials(spark, partials_path, dirs)
        .groupBy("source", "term")
        .agg(F.sum("n").alias("n"))
        .localCheckpoint(eager=True)
    )


def start_fanout_sink(
    stream_df: DataFrame, paths: list[str], checkpoint: str
):
    """One stream, several sinks, one checkpoint: the standard foreachBatch
    fan-out recipe. Each micro-batch persists (localCheckpoint) so the N
    writes share one computation, and every write is idempotent per batch
    (mode overwrite into batch=<id> subdirs), so a crash between sink 1 and
    sink 2 replays the batch WITHOUT double-landing in sink 1 — the
    documented way to get effectively-exactly-once across multiple
    destinations from a single stream.
    """

    def land(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        for path in paths:
            batch_df.write.mode("overwrite").parquet(f"{path}/batch={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def incremental_rollup_run(
    spark: SparkSession,
    table_path: str,
    view_path: str,
    state_path: str,
    partition_col: str,
    group_cols: list[str],
    agg_exprs: dict[str, str],
) -> dict:
    """Batch incremental computation with processed-partition bookkeeping:
    each run rolls up ONLY the partitions that appeared since the last run
    and dynamic-overwrites exactly those slices of the view — the batch
    complement of the streaming matview (a nightly job over an append-only
    day-partitioned lake should not rescan history).

    State is a text file of processed partition values, committed by
    write-temp-then-rename AFTER the view write: a crash between the two
    reprocesses those partitions next run, and since each partition's
    rollup is recomputed from raw (never merged into), the re-overwrite
    converges — effectively exactly-once. Returns
    {"processed": [...], "skipped": n_already_done}.

    ``agg_exprs`` maps output column -> SQL aggregate over the partition's
    rows (e.g. {"n": "count(*)", "total": "sum(v)"}).
    """
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    tpath = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = tpath.getFileSystem(hconf)
    prefix = f"{partition_col}="
    on_disk = sorted(
        st.getPath().getName()[len(prefix):]
        for st in fs.listStatus(tpath)
        if st.isDirectory() and st.getPath().getName().startswith(prefix)
    )
    spath = jvm.org.apache.hadoop.fs.Path(state_path)
    old_spath = jvm.org.apache.hadoop.fs.Path(state_path + "._old")
    # crash recovery: if a previous run died between parking the old state
    # and publishing the new one, the parked copy is still authoritative —
    # without this, a lost state file would re-process (and re-overwrite)
    # the ENTIRE history instead of just the new partitions
    read_from = spath if fs.exists(spath) else (
        old_spath if fs.exists(old_spath) else None
    )
    done: set[str] = set()
    if read_from is not None:
        stream = fs.open(read_from)
        try:
            done = {
                line
                for line in bytes(
                    jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
                ).decode("utf-8").splitlines()
                if line
            }
        finally:
            stream.close()
    new = [p for p in on_disk if p not in done]
    if new:
        from pyspark.sql import functions as F

        src = spark.read.parquet(table_path).filter(
            F.col(partition_col).isin(new)
        )
        rolled = src.groupBy(partition_col, *group_cols).agg(
            *[F.expr(sql).alias(name) for name, sql in agg_exprs.items()]
        )
        overwrite_partitions(rolled, view_path, [partition_col])
        # commit state AFTER the view, park-then-publish (the
        # compact_to_target two-rename protocol): write temp, park the
        # current state at ._old, publish temp, drop the parked copy — a
        # crash in any window leaves either the new state or a readable
        # parked copy (see recovery above), never zero state files
        tmp = jvm.org.apache.hadoop.fs.Path(state_path + "._tmp")
        out = fs.create(tmp, True)
        try:
            out.write(("\n".join(sorted(done | set(new))) + "\n").encode("utf-8"))
        finally:
            out.close()
        fs.delete(old_spath, False)
        if fs.exists(spath) and not fs.rename(spath, old_spath):
            raise IOError(f"incremental rollup: could not park state at {state_path}._old")
        if not fs.rename(tmp, spath):
            fs.rename(old_spath, spath)  # roll back; prior state intact
            raise IOError(f"incremental rollup: could not commit state at {state_path}")
        fs.delete(old_spath, False)
    return {"processed": new, "skipped": len(done)}
