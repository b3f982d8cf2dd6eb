"""Materialized IVF ANN index: cell-partitioned corpus layout served by
partition pruning — the vector-side analog of the prebuilt BM25 term
index (operators/retrieval.build_term_index).

The live path (operators/similarity.topk_ivf) re-assigns every corpus
vector to its cell on EVERY query batch — one full corpus scan per call.
Amortized serving writes the assignment once:

- ``<table>``: (id, vector) rows written PARTITIONED BY the IVF cell id,
  so a query batch probing ``nprobe`` cells reads only those partitions —
  partition pruning is metadata-only (PartitionFilters in the scan, no
  file of an unprobed cell is opened). At 1e9 vectors and k_cells=256,
  nprobe=2, a query batch touches ~0.8% of the corpus bytes;
- ``<table>_centroids``: the (k_cells x dim) coarse quantizer, stored so
  serving and incremental adds reuse the EXACT trained centroids (cell
  assignment must never drift from the layout);
- ``<table>_codebooks`` (pq=True): residual PQ codebooks; each row then
  also stores its M-byte code, and ``topk_pq_from_ann_index`` ADC-scans
  reading (id, cell, code) only — per-candidate IO is the code bytes,
  vectors are read just for the shortlist rerank (IVFADC);
- ``<table>_ids``: the indexed id set — the O(n) append-only guard,
  the same device as retrieval's ``<table>_docs``;
- ``<table>_deletes``: the tombstone id set — ``delete_vectors_from_
  ann_index`` appends O(delta), serving anti-joins it (deletes visible
  immediately), and ``compact_ann_index`` rewrites only the partitions
  that contain tombstoned rows before resetting it. Deletes are id-level
  metadata until a maintenance window — the Lucene/FAISS shape — which
  completes the documented "delete + re-add" update contract.

Incremental add is the asymmetric shape (dedup.incremental_minhash_pairs,
retrieval.update_term_index): assigning (and encoding) a delta is a
map-only pass over the DELTA against broadcast centroids/codebooks;
history is never rescanned or rewritten. ``start_ann_index_sink``
maintains the index from a stream with replay-idempotent landings: each
micro-batch dynamic-overwrites its own (cell, batch=b<id>) partitions,
so redelivery converges instead of duplicating.

Scale honesty: the cell layout freezes the quantizer (and codebooks). A
corpus whose distribution drifts far from the training sample degrades
recall and the fix is a rebuild (or a staged re-layout cell by cell) —
the standard IVF operational trade, documented rather than hidden.

No SQL oracle (k-means training is not SQL-expressible — same contract
as sim_topk_ivf/sim_topk_ivfpq); certified by row-for-row parity with
the live topk_ivf AND topk_ivfpq paths plus plan pins,
tests/test_ann_index.py.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.tombstones import (
    append_tombstones,
    mask_deleted,
    raise_if_pending_tombstone,
    reset_tombstones,
)
from kafka_clickhouse_example_spark.sources.catalog import table_location

from kafka_clickhouse_example_spark.operators.similarity import (
    IVF_NPROBE,
    IVF_SAMPLE,
    PQ_SHORTLIST_MULT,
    _adc_scan,
    _adc_tables,
    _ivf_cosine_scan,
    _md5_ordered_sample,
    _probe_members,
    _sq_dists,
    _sq_dists_sub,
    as_double,
    cosine,
    train_ivf_centroids,
    train_pq_codebooks_residual,
)


def _assign_cells(
    df: DataFrame, centroids, id_col: str, vec_col: str, codebooks=None
) -> DataFrame:
    """Map-only nearest-centroid assignment: one (batch x k_cells) BLAS
    distance matrix per Arrow batch against broadcast centroids — the
    same `_sq_dists` kernel topk_ivf scans with, so layout cells and live
    cells can never disagree. With ``codebooks`` the pass also PQ-encodes
    the residual (vector − centroid) with topk_ivfpq's `_sq_dists_sub`
    argmin and packs the M sub-codes as one BINARY value — the stored
    form of what topk_ivfpq derives in-pass on every scan."""
    cent = np.asarray(centroids, dtype=np.float64)
    cent_n2 = (cent * cent).sum(axis=1)
    books = None
    if codebooks is not None:
        books = np.asarray(codebooks, dtype=np.float64)  # (M, K, dsub)
        if books.shape[1] > 256:
            raise ValueError("PQ codebook_k > 256 does not fit 1-byte codes")
        cn2 = (books * books).sum(axis=2)
        n_sub, _, dsub = books.shape
    id_t = df.schema[id_col].dataType.simpleString()
    vec_t = df.schema[vec_col].dataType.simpleString()

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            cells = _sq_dists(m, cent, cent_n2).argmin(axis=1)
            out = {
                id_col: pdf[id_col].to_numpy(),
                vec_col: pdf[vec_col],
                "cell": cells.astype("int32"),
            }
            if books is not None:
                resid = (m - cent[cells]).reshape(len(m), n_sub, dsub)
                codes = _sq_dists_sub(resid, books, cn2).argmin(axis=2)
                out["code"] = [c.astype(np.uint8).tobytes() for c in codes]
            yield pd.DataFrame(out)

    schema = f"{id_col} {id_t}, {vec_col} {vec_t}, cell int"
    if books is not None:
        schema += ", code binary"
    return df.select(id_col, vec_col).mapInPandas(assign, schema=schema)


def build_ann_index(
    corpus: DataFrame,
    table: str,
    *,
    centroids=None,
    pq: bool = False,
    codebooks=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    path: str | None = None,
) -> None:
    """Materialize the cell-partitioned layout + centroid and id side
    tables. ``centroids`` defaults to a fresh deterministic train
    (similarity.train_ivf_centroids on the md5-ordered bounded sample);
    pass them explicitly to rebuild under a frozen quantizer (the
    incremental-vs-rebuild parity contract requires it).

    With ``pq=True`` (or explicit ``codebooks``) each row also stores its
    M-byte residual PQ code and the codebooks land in
    ``<table>_codebooks`` — the IVFADC serving layout: the ADC scan reads
    (id, cell, code) ONLY, never the vector column (column pruning), and
    full vectors are read just for the shortlist rerank."""
    spark = corpus.sparkSession
    # One bounded collect feeds both trainers (the sim_topk_ivfpq device:
    # "one collect, not two") — the values are bit-identical to each
    # trainer collecting its own sample, so live-path parity holds.
    sample = None
    if centroids is None or (pq and codebooks is None):
        sample = _md5_ordered_sample(corpus, id_col, vec_col, IVF_SAMPLE)
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, id_col=id_col, vec_col=vec_col, sample=sample
        )
    cent = np.asarray(centroids, dtype=np.float64)
    if pq and codebooks is None:
        codebooks = train_pq_codebooks_residual(
            corpus, cent, id_col=id_col, vec_col=vec_col, sample=sample
        )

    assigned = _assign_cells(
        corpus, cent, id_col, vec_col, codebooks=codebooks
    ).withColumn("batch", F.lit("base"))
    # "batch" is the SECOND partition level: cell pruning (the serving
    # path) is untouched, and a labeled ingest batch owns exactly the
    # (cell=*, batch=LABEL) partitions — dynamic overwrite of those makes
    # streamed appends replay-idempotent (see add_vectors_to_ann_index).
    w = (
        assigned.write.format("parquet")
        .mode("overwrite")
        .partitionBy("cell", "batch")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)

    cent_df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(cent)],
        "cell int, centroid array<double>",
    )
    cw = cent_df.write.format("parquet").mode("overwrite")
    if path is not None:
        cw = cw.option("path", path + "_centroids")
    cw.saveAsTable(table + "_centroids")

    if codebooks is not None:
        books = np.asarray(codebooks, dtype=np.float64)
        book_df = spark.createDataFrame(
            [
                (int(m), int(c), [float(x) for x in books[m, c]])
                for m in range(books.shape[0])
                for c in range(books.shape[1])
            ],
            "m int, k int, centroid array<double>",
        )
        bw = book_df.write.format("parquet").mode("overwrite")
        if path is not None:
            bw = bw.option("path", path + "_codebooks")
        bw.saveAsTable(table + "_codebooks")

    iw = (
        corpus.select(id_col)
        .withColumn("batch", F.lit("base"))
        .write.format("parquet")
        .mode("overwrite")
        .partitionBy("batch")
    )
    if path is not None:
        iw = iw.option("path", path + "_ids")
    iw.saveAsTable(table + "_ids")

    # <table>_deletes: the (initially empty) tombstone id set. Deletes
    # append here in O(delta); serving anti-joins it; compact_ann_index
    # physically removes the rows and resets it. Created at build time so
    # every serving/maintenance path can assume it exists.
    dw = corpus.select(id_col).limit(0).write.format("parquet").mode("overwrite")
    if path is not None:
        dw = dw.option("path", path + "_deletes")
    dw.saveAsTable(table + "_deletes")


def _load_centroids(spark: SparkSession, table: str) -> np.ndarray:
    """Bounded driver read: k_cells rows (256 by default), ordered by
    cell id so row index == cell id."""
    rows = spark.table(table + "_centroids").orderBy("cell").collect()
    return np.asarray([r.centroid for r in rows], dtype=np.float64)


def _without_tombstones(df: DataFrame, table: str, id_col: str) -> DataFrame:
    """Serving-time tombstone mask (tombstones.mask_deleted): applied to
    the partition-pruned scan BEFORE scoring, so a deleted vector can
    never occupy a per-batch top-k slot and shadow a live candidate."""
    return mask_deleted(df, table + "_deletes", id_col)


def topk_from_ann_index(
    spark: SparkSession,
    table: str,
    queries_pdf: pd.DataFrame,
    k: int,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve IVF top-k from the materialized layout: probe cells are
    computed driver-side from the stored centroids (queries are KB-scale
    by contract), the scan filters ``cell IN (probed)`` — partition
    pruning, no unprobed file opened — and scoring reuses topk_ivf's
    bit-identical elementwise cosine with the same per-batch top-k
    prefilter, so the served rows are row-for-row the live path's
    (tests pin it). The only shuffle is the final per-query window over
    <= partitions*Q*k prefiltered rows."""
    cent = _load_centroids(spark, table)
    cent_n2 = (cent * cent).sum(axis=1)
    qids = queries_pdf["qid"].to_numpy()
    qmat = np.stack(
        [np.asarray(v, dtype=np.float64) for v in queries_pdf["qvec"]]
    )
    qnorm = np.linalg.norm(qmat, axis=1)
    member, probed_cells = _probe_members(qmat, cent, cent_n2, nprobe)

    scan = _ivf_cosine_scan(
        qids, qmat, qnorm, member, k, id_col, vec_col,
        # served path: cells read from the materialized layout — no
        # re-assign; the scan body itself is literally topk_ivf's
        cells_of=lambda pdf, m: pdf["cell"].to_numpy(),
    )
    idx = spark.table(table)
    id_t = idx.schema[id_col].dataType.simpleString()
    live = _without_tombstones(
        idx.filter(F.col("cell").isin(probed_cells)), table, id_col
    )
    scored = (
        live.select(id_col, vec_col, "cell")
        .mapInPandas(scan, schema=f"qid long, {id_col} {id_t}, cosine_sim double")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "cosine_sim", "rank")
    )


def _load_codebooks(spark: SparkSession, table: str) -> np.ndarray:
    """Bounded driver read: M*K rows (8*16 by default), reshaped to the
    (M, K, dsub) array the ADC kernels take."""
    rows = spark.table(table + "_codebooks").orderBy("m", "k").collect()
    n_sub = max(r.m for r in rows) + 1
    book_k = max(r.k for r in rows) + 1
    dsub = len(rows[0].centroid)
    books = np.zeros((n_sub, book_k, dsub), dtype=np.float64)
    for r in rows:
        books[r.m, r.k] = r.centroid
    return books


def topk_pq_from_ann_index(
    spark: SparkSession,
    table: str,
    queries_pdf: pd.DataFrame,
    k: int,
    nprobe: int = IVF_NPROBE,
    shortlist_mult: int = PQ_SHORTLIST_MULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC serving from the materialized layout — the 1e9-vector IO
    shape topk_ivfpq's docstring promises ("cells + residual codes would
    be precomputed and STORED at production scale"): the ADC scan reads
    (id, cell, code) of the PROBED PARTITIONS ONLY — per-candidate IO is
    the M code bytes, the vector column is never touched (column
    pruning) — and scores with topk_ivfpq's exact LUT decomposition over
    the STORED codes; the approx shortlist is then exactly rescored with
    the fold-kernel cosine reading full vectors for shortlist rows alone.
    Stored codes == in-pass codes (same argmin kernels, pinned), so the
    served rows are row-for-row the live topk_ivfpq's."""
    cent = _load_centroids(spark, table)
    books = _load_codebooks(spark, table)
    qids = queries_pdf["qid"].to_numpy()
    qmat = np.stack(
        [np.asarray(v, dtype=np.float64) for v in queries_pdf["qvec"]]
    )
    qnorm = np.linalg.norm(qmat, axis=1)
    n_short = shortlist_mult * k
    adc = _adc_tables(qmat, cent, books)
    member, probed_cells = _probe_members(qmat, cent, adc["cent_n2"], nprobe)

    def stored_cells_codes(pdf):
        # served path: cells + codes READ from the layout (the live path
        # derives them in-pass with the same argmin kernels — pinned)
        cells = pdf["cell"].to_numpy()
        codes = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in pdf["code"]]
        ).astype(np.int64)
        return cells, codes

    scan = _adc_scan(qids, qnorm, member, n_short, id_col, adc, stored_cells_codes)
    idx = spark.table(table)
    id_t = idx.schema[id_col].dataType.simpleString()
    pruned = _without_tombstones(
        idx.filter(F.col("cell").isin(probed_cells)), table, id_col
    )
    approx = pruned.select(id_col, "cell", "code").mapInPandas(
        scan, schema=f"qid long, {id_col} {id_t}, approx_cos double"
    )
    aw = Window.partitionBy("qid").orderBy(F.col("approx_cos").desc(), F.col(id_col))
    shortlist = (
        approx.withColumn("arank", F.row_number().over(aw))
        .filter(F.col("arank") <= n_short)
        .select("qid", id_col)
    )
    qdf = spark.createDataFrame(queries_pdf[["qid", "qvec"]])
    # exact rerank: vectors read for shortlist rows of probed partitions
    # only (partition pruning again; broadcast semi-shaped equi-join)
    rescored = (
        pruned.select(id_col, vec_col)
        .join(F.broadcast(shortlist), id_col)
        .join(F.broadcast(qdf), "qid")
        .select(
            "qid",
            F.col(id_col),
            cosine(as_double(F.col(vec_col)), as_double(F.col("qvec"))).alias(
                "cosine_sim"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "cosine_sim", "rank")
    )


def _insert_dynamic(df: DataFrame, table: str) -> None:
    """Dynamic partition overwrite into a metastore table: replaces
    exactly the partitions present in ``df`` (same idempotency device as
    sinks/backfill.overwrite_partitions, via insertInto because the
    layout lives in the metastore). insertInto binds BY POSITION —
    reorder to the table's column order first."""
    spark = df.sparkSession
    cols = spark.table(table).columns
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.select(*cols).write.insertInto(table, overwrite=True)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def add_vectors_to_ann_index(
    delta: DataFrame,
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    check_new_ids: bool = True,
    batch_label: str | None = None,
) -> None:
    """Merge a delta of NEW vectors: assign against the STORED centroids
    (map-only over the delta — the quantizer is frozen with the layout,
    so merged cells are identical to a rebuild under the same centroids;
    a PQ layout also encodes under the stored codebooks), land the rows
    in the existing cell partitions, and roll the id relation forward.
    O(delta) compute and write; history files untouched.

    Two landing modes:
    - ``batch_label=None`` (curated batch merge): plain append under the
      "delta" batch partition, guarded by ``check_new_ids`` — a broadcast
      semi-join of the delta ids against the O(n) ``<table>_ids``
      relation.
    - ``batch_label="..."`` (streaming/replayable merge): DYNAMIC
      PARTITION OVERWRITE of exactly the (cell=*, batch=label)
      partitions — re-running the same labeled delta (micro-batch replay
      after a crash, a partially-written batch) converges to the same
      content instead of duplicating it. Labels must be unique per
      logical batch (the streaming sink uses the micro-batch id). The id
      guard and replay cannot compose (a replay IS a re-add), so labeled
      merges force ``check_new_ids=False`` semantics upstream: dedupe
      ids before the sink (pipelines/ingest_dedup's gate shape) if the
      source can repeat them.
    """
    if batch_label in ("base", "delta"):
        raise ValueError(
            f"add_vectors_to_ann_index: batch_label {batch_label!r} is "
            "reserved ('base' = the build layout, 'delta' = curated "
            "appends) — a labeled merge dynamic-overwrites its own "
            "partitions, so reusing a reserved label would silently "
            "destroy previously landed vectors"
        )
    if batch_label is not None and not re.fullmatch(r"[A-Za-z0-9._-]+", batch_label):
        raise ValueError(
            f"add_vectors_to_ann_index: batch_label {batch_label!r} must "
            "match [A-Za-z0-9._-]+ — the label becomes a partition "
            "directory name and a DROP PARTITION literal at compaction, "
            "so quotes/slashes/spaces would corrupt both"
        )
    spark = delta.sparkSession
    delta_ids = delta.select(id_col)
    if check_new_ids and batch_label is None:
        # A pending tombstone would mask the re-added row at serve time
        # (tombstones are id-level): the documented delete + re-add flow
        # is delete -> compact -> add.
        raise_if_pending_tombstone(
            delta_ids,
            table + "_deletes",
            id_col,
            "add_vectors_to_ann_index",
            "compact_ann_index",
        )
        clash = (
            spark.table(table + "_ids")
            .join(F.broadcast(delta_ids.distinct()), id_col, "left_semi")
            .limit(1)
            .collect()
        )
        if clash:
            raise ValueError(
                f"add_vectors_to_ann_index: delta contains {id_col} "
                f"{clash[0][id_col]} already present in the index — the "
                "merge is append-only; handle updates as delete + re-add"
            )

    cent = _load_centroids(spark, table)
    # a PQ layout must stay PQ: encode the delta under the stored books
    books = (
        _load_codebooks(spark, table)
        if "code" in spark.table(table).columns
        else None
    )
    label = batch_label if batch_label is not None else "delta"
    assigned = _assign_cells(
        delta, cent, id_col, vec_col, codebooks=books
    ).withColumn("batch", F.lit(label))
    ids_out = delta_ids.withColumn("batch", F.lit(label))
    if batch_label is not None:
        _insert_dynamic(assigned, table)
        _insert_dynamic(ids_out, table + "_ids")
    else:
        (
            assigned.write.format("parquet")
            .mode("append")
            .partitionBy("cell", "batch")
            .saveAsTable(table)
        )
        (
            ids_out.write.format("parquet")
            .mode("append")
            .partitionBy("batch")
            .saveAsTable(table + "_ids")
        )


def delete_vectors_from_ann_index(
    ids: DataFrame, table: str, *, id_col: str = "vec_id"
) -> None:
    """Tombstone deletion — the missing half of the documented
    "delete + re-add" update contract. O(delta): the distinct,
    actually-indexed subset of ``ids`` (semi-join against the O(n)
    ``<table>_ids`` relation — deleting an unknown id is a no-op, not an
    error) APPENDS into ``<table>_deletes``; no index file is touched.
    Serving masks tombstoned ids before scoring
    (:func:`_without_tombstones`), so the delete is visible immediately;
    :func:`compact_ann_index` later rewrites only the partitions that
    contain tombstoned rows. Re-running the same delete appends duplicate
    tombstone rows — semantically idempotent (anti-join), physically
    deduped at compaction.

    The Lucene/FAISS shape: deletes at 1e9-vector scale are id-level
    metadata until a maintenance window, never synchronous rewrites of a
    cell-partitioned layout.
    """
    append_tombstones(ids, table + "_deletes", table + "_ids", id_col)


def compact_ann_index(
    spark: SparkSession, table: str, *, id_col: str = "vec_id"
) -> None:
    """Physically remove tombstoned rows and reset the tombstone set.

    Rewrites ONLY the (cell, batch) partitions that actually contain a
    tombstoned row — dynamic partition overwrite, O(affected partitions),
    history elsewhere untouched — and the affected batch partitions of
    ``<table>_ids`` the same way. A partition whose every row is
    tombstoned cannot be replaced by a zero-row dynamic overwrite, so
    fully-emptied partitions are dropped with ALTER TABLE .. DROP
    PARTITION (bounded loop, one DDL per emptied partition). Frames that
    read a table are localCheckpoint'ed before overwriting it
    (self-referential overwrite rule). After compaction the deleted ids
    are gone from ``<table>_ids`` too, so they may be re-added.
    """
    if not spark.catalog.tableExists(table + "_deletes"):
        return
    dels = (
        spark.table(table + "_deletes")
        .select(id_col)
        .distinct()
        .localCheckpoint(eager=True)
    )
    if dels.isEmpty():
        return

    def rewrite(tbl: str, part_cols: list[str]) -> None:
        frame = spark.table(tbl)
        hit = (
            frame.join(F.broadcast(dels), id_col, "left_semi")
            .select(*part_cols)
            .distinct()
        )
        affected = hit.collect()  # bounded: O(partitions containing a tombstone)
        if not affected:
            return
        keep = (
            frame.join(F.broadcast(hit), part_cols, "left_semi")
            .join(F.broadcast(dels), id_col, "left_anti")
            .localCheckpoint(eager=True)
        )
        _insert_dynamic(keep, tbl)
        kept = {
            tuple(r) for r in keep.select(*part_cols).distinct().collect()
        }
        emptied = [r for r in affected if tuple(r) not in kept]
        if not emptied:
            return
        # DROP PARTITION on an EXTERNAL table removes only catalog
        # metadata; the parquet files stay on disk, and a later append
        # that re-creates the same partition would list them again —
        # deleted rows resurrecting AFTER the tombstones were reset
        # (review finding). Delete each dropped directory through the
        # Hadoop FS too, and VERIFY it is gone: a silent delete failure
        # reopens the hole, so it must raise here — before the tombstone
        # reset, leaving the rows safely masked. Location and FS are
        # invariant per table: resolved once, not per partition. Values
        # are path- and DDL-safe: cell is an int, batch labels are
        # charset-validated at add time.
        loc = table_location(spark, tbl)
        jfs = None
        if loc is not None:
            root = spark._jvm.org.apache.hadoop.fs.Path(loc)
            jfs = root.getFileSystem(spark._jsc.hadoopConfiguration())
        for r in emptied:
            spec_pairs = [(c, r[c]) for c in part_cols]
            spec = ", ".join(
                f"{c}='{v}'" if isinstance(v, str) else f"{c}={v}"
                for c, v in spec_pairs
            )
            spark.sql(f"ALTER TABLE {tbl} DROP PARTITION ({spec})")
            if jfs is None:
                continue
            part_dir = loc.rstrip("/") + "/" + "/".join(
                f"{c}={v}" for c, v in spec_pairs
            )
            jpath = spark._jvm.org.apache.hadoop.fs.Path(part_dir)
            jfs.delete(jpath, True)
            if jfs.exists(jpath):
                raise RuntimeError(
                    f"compact_ann_index: could not remove dropped "
                    f"partition files at {part_dir} — stale parquet would "
                    "resurface if the partition is re-created; tombstones "
                    "were NOT reset, so the rows remain masked"
                )

    rewrite(table, ["cell", "batch"])
    rewrite(table + "_ids", ["batch"])

    # Remove exactly the compacted tombstones (mid-compaction appends
    # survive); keeps a path-built side table at its published location.
    reset_tombstones(spark, table + "_deletes", dels, id_col)


def start_ann_index_sink(
    stream: DataFrame,
    table: str,
    checkpoint: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Streaming ANN index maintenance: each micro-batch of new vectors
    is assigned (and PQ-encoded if the layout stores codes) against the
    frozen quantizer and landed under ``batch=b<id>`` via dynamic
    partition overwrite — effectively exactly-once, because a replayed
    micro-batch overwrites its own partitions with identical content
    (the same convergence device as sinks/backfill's matviews). Serving
    sees new vectors as soon as the batch lands; cell pruning is
    unaffected (cell stays the leading partition level). Upstream owns
    id uniqueness (compose with pipelines/ingest_dedup's gate when the
    source can repeat ids — a replay is indistinguishable from a re-add,
    so the in-merge guard is structurally off here)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        add_vectors_to_ann_index(
            batch_df,
            table,
            id_col=id_col,
            vec_col=vec_col,
            batch_label=f"b{batch_id}",
        )

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
