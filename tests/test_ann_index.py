"""Materialized IVF ANN index: partition-pruned serving parity with the
live topk_ivf path, incremental add == fresh rebuild, append-only guard."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import similarity as S
from kafka_clickhouse_example_spark.operators.ann_index import (
    add_vectors_to_ann_index,
    build_ann_index,
    topk_from_ann_index,
)
from kafka_clickhouse_example_spark.sources.catalog import load_compute_table

TOP_K = 10
NPROBE = 2


def _emb(spark, sf_dir):
    return load_compute_table(spark, sf_dir, "embeddings")


def _queries(emb):
    return (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        .toPandas()
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def ann_index(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("ann_index")
    emb = _emb(spark, sf_dir)
    cent = S.train_ivf_centroids(emb)
    build_ann_index(emb, "ann_idx", centroids=cent, path=str(base / "idx"))
    yield "ann_idx", cent
    for suffix in ("", "_centroids", "_ids", "_deletes"):
        spark.sql(f"DROP TABLE IF EXISTS ann_idx{suffix}")


def test_served_topk_matches_live_ivf(spark, sf_dir, ann_index):
    """The materialized layout must serve row-for-row what the live path
    computes scanning the whole corpus: same centroids -> same cells ->
    same candidates -> bit-identical cosines (the elementwise kernel is
    shared) -> identical (qid, id, score, rank) rows."""
    table, cent = ann_index
    emb = _emb(spark, sf_dir)
    q = _queries(emb)
    served = topk_from_ann_index(spark, table, q, TOP_K, nprobe=NPROBE)
    live = S.topk_ivf(emb, q, TOP_K, cent, nprobe=NPROBE)
    assert _rows(served) == _rows(live)
    assert served.count() > 0


def test_served_scan_is_partition_pruned(spark, sf_dir, ann_index):
    """The probe must reach the scan as a partition filter on the cell
    id — metadata-only pruning, no unprobed cell's files opened."""
    table, _ = ann_index
    emb = _emb(spark, sf_dir)
    q = _queries(emb)
    plan = (
        topk_from_ann_index(spark, table, q, TOP_K, nprobe=NPROBE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1) and "IN" in m.group(1), plan[:2000]
    # and the pruned scan must not re-filter rows: no Filter on cell
    # below the scan (pruning happened at the partition level)


@pytest.mark.slow
def test_incremental_add_matches_fresh_rebuild(spark, sf_dir, tmp_path):
    """Appending a delta under the frozen quantizer must yield an index
    (rows, cells, ids) identical to a rebuild over the concatenated
    corpus with the same centroids — and serve identical top-k."""
    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") < 400)
    delta = emb.filter(F.col("vec_id") >= 400)
    assert base.count() > 0 and delta.count() > 0
    cent = S.train_ivf_centroids(base)
    q = _queries(emb)
    try:
        build_ann_index(base, "inc_ann", centroids=cent, path=str(tmp_path / "inc"))
        add_vectors_to_ann_index(delta, "inc_ann")
        build_ann_index(emb, "full_ann", centroids=cent, path=str(tmp_path / "full"))

        def snap(t):
            return {
                "rows": sorted(
                    (r.vec_id, int(r.cell), tuple(r.embedding))
                    for r in spark.table(t).collect()
                ),
                "ids": sorted(r.vec_id for r in spark.table(t + "_ids").collect()),
                "cent": _rows(spark.table(t + "_centroids")),
            }

        merged, fresh = snap("inc_ann"), snap("full_ann")
        assert merged["cent"] == fresh["cent"]
        assert merged["ids"] == fresh["ids"]
        assert merged["rows"] == fresh["rows"]
        assert _rows(topk_from_ann_index(spark, "inc_ann", q, TOP_K)) == _rows(
            topk_from_ann_index(spark, "full_ann", q, TOP_K)
        )
    finally:
        for t in ("inc_ann", "full_ann"):
            for suffix in ("", "_centroids", "_ids", "_deletes"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{suffix}")


def test_incremental_add_rejects_existing_ids(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir).limit(50)
    try:
        build_ann_index(emb, "dup_ann", path=str(tmp_path / "dup"))
        with pytest.raises(ValueError, match="append-only"):
            add_vectors_to_ann_index(emb.limit(5), "dup_ann")
    finally:
        for suffix in ("", "_centroids", "_ids", "_deletes"):
            spark.sql(f"DROP TABLE IF EXISTS dup_ann{suffix}")


@pytest.mark.slow
def test_delete_masks_serving_and_compact_removes(spark, sf_dir, tmp_path):
    """The delete half of the "delete + re-add" contract: a tombstoned
    vector disappears from served results IMMEDIATELY (row-for-row parity
    with a frozen-quantizer rebuild over the corpus minus the victim),
    stays physically present until compaction, and after compact_ann_index
    the rows/ids are gone, tombstones reset, and the id is re-addable —
    restoring the original serving exactly."""
    from kafka_clickhouse_example_spark.operators.ann_index import (
        compact_ann_index,
        delete_vectors_from_ann_index,
    )

    emb = _emb(spark, sf_dir)
    cent = S.train_ivf_centroids(emb)
    q = _queries(emb)
    try:
        build_ann_index(emb, "del_ann", centroids=cent, path=str(tmp_path / "del"))
        served0 = _rows(topk_from_ann_index(spark, "del_ann", q, TOP_K, nprobe=NPROBE))
        victim = int(served0[0][1])  # an id that IS currently served
        victims = emb.filter(F.col("vec_id") == victim)
        n_all = emb.count()

        delete_vectors_from_ann_index(victims.select("vec_id"), "del_ann")
        served1 = _rows(topk_from_ann_index(spark, "del_ann", q, TOP_K, nprobe=NPROBE))
        assert all(r[1] != victim for r in served1)
        rest = emb.filter(F.col("vec_id") != victim)
        build_ann_index(rest, "del_ref", centroids=cent, path=str(tmp_path / "ref"))
        assert served1 == _rows(
            topk_from_ann_index(spark, "del_ref", q, TOP_K, nprobe=NPROBE)
        )
        # tombstone only: rows still on disk until the maintenance window
        assert spark.table("del_ann").count() == n_all

        compact_ann_index(spark, "del_ann")
        assert spark.table("del_ann").count() == n_all - 1
        assert (
            spark.table("del_ann_ids").filter(F.col("vec_id") == victim).count()
            == 0
        )
        assert spark.table("del_ann_deletes").count() == 0
        assert served1 == _rows(
            topk_from_ann_index(spark, "del_ann", q, TOP_K, nprobe=NPROBE)
        )
        # compaction cleared the id, so delete + re-add round-trips
        add_vectors_to_ann_index(victims, "del_ann")
        assert served0 == _rows(
            topk_from_ann_index(spark, "del_ann", q, TOP_K, nprobe=NPROBE)
        )
    finally:
        for t in ("del_ann", "del_ref"):
            for suffix in ("", "_centroids", "_ids", "_deletes"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{suffix}")


def test_readd_before_compact_raises(spark, sf_dir, tmp_path):
    """A pending tombstone would mask a re-added row at serve time, so
    the curated merge must refuse the id until compaction runs."""
    from kafka_clickhouse_example_spark.operators.ann_index import (
        delete_vectors_from_ann_index,
    )

    emb = _emb(spark, sf_dir).limit(50)
    try:
        build_ann_index(emb, "tomb_ann", path=str(tmp_path / "tomb"))
        one = emb.limit(1)
        delete_vectors_from_ann_index(one.select("vec_id"), "tomb_ann")
        with pytest.raises(ValueError, match="tombstone"):
            add_vectors_to_ann_index(one, "tomb_ann")
    finally:
        for suffix in ("", "_centroids", "_ids", "_deletes"):
            spark.sql(f"DROP TABLE IF EXISTS tomb_ann{suffix}")


def test_compact_drops_emptied_partitions(spark, sf_dir, tmp_path):
    """Deleting EVERY row of a (cell, batch) partition: a zero-row dynamic
    overwrite cannot replace it, so compaction must DROP the partition —
    otherwise the tombstoned rows silently resurface once the tombstone
    set is reset."""
    from kafka_clickhouse_example_spark.operators.ann_index import (
        compact_ann_index,
        delete_vectors_from_ann_index,
    )

    emb = _emb(spark, sf_dir)
    try:
        build_ann_index(emb, "empt_ann", path=str(tmp_path / "empt"))
        idx = spark.table("empt_ann")
        cell = idx.groupBy("cell").count().orderBy("count", "cell").first().cell
        members = idx.filter(F.col("cell") == cell).select("vec_id")
        n_members, n_all = members.count(), idx.count()
        assert n_members > 0
        delete_vectors_from_ann_index(members, "empt_ann")
        compact_ann_index(spark, "empt_ann")
        after = spark.table("empt_ann")
        assert after.count() == n_all - n_members
        assert after.filter(F.col("cell") == cell).count() == 0
        assert spark.table("empt_ann_ids").count() == n_all - n_members
        assert spark.table("empt_ann_deletes").count() == 0
        # EXTERNAL table: DROP PARTITION alone leaves the files on disk,
        # and a later append re-creating the partition would resurface
        # the deleted rows AFTER the tombstones were reset — the dropped
        # partition's directory must be physically gone.
        import os

        assert not os.path.exists(
            str(tmp_path / "empt" / f"cell={cell}" / "batch=base")
        )
    finally:
        for suffix in ("", "_centroids", "_ids", "_deletes"):
            spark.sql(f"DROP TABLE IF EXISTS empt_ann{suffix}")


def test_labeled_merge_rejects_reserved_labels(spark, sf_dir):
    """'base' (the build layout) and 'delta' (curated appends) are internal
    partition labels; a labeled merge dynamic-overwrites its own
    partitions, so reusing them would silently destroy landed vectors
    (review finding) — must raise before touching any table."""
    emb = _emb(spark, sf_dir).limit(5)
    for label in ("base", "delta"):
        with pytest.raises(ValueError, match="reserved"):
            add_vectors_to_ann_index(emb, "no_such_ann", batch_label=label)
    # labels become partition dir names AND DROP PARTITION literals at
    # compaction: quotes/slashes/spaces must be rejected at add time
    for label in ("it's-2026", "a/b", "a b", ""):
        with pytest.raises(ValueError, match="must"):
            add_vectors_to_ann_index(emb, "no_such_ann", batch_label=label)


# --- PQ (IVFADC) layout ------------------------------------------------------


def _drop(spark, *tables):
    for t in tables:
        for suffix in ("", "_centroids", "_codebooks", "_ids", "_deletes"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{suffix}")


def test_pq_served_matches_live_ivfpq(spark, sf_dir, tmp_path):
    """Stored codes must serve row-for-row what topk_ivfpq derives
    in-pass: same centroids + codebooks -> same cells and codes (shared
    argmin kernels) -> same ADC shortlist -> identical exact rerank."""
    from kafka_clickhouse_example_spark.operators.ann_index import (
        topk_pq_from_ann_index,
    )

    emb = _emb(spark, sf_dir)
    cent = S.train_ivf_centroids(emb)
    books = S.train_pq_codebooks_residual(emb, cent)
    q = _queries(emb)
    try:
        build_ann_index(
            emb, "pq_ann", centroids=cent, codebooks=books,
            path=str(tmp_path / "pq"),
        )
        served = topk_pq_from_ann_index(spark, "pq_ann", q, TOP_K, nprobe=NPROBE)
        live = S.topk_ivfpq(emb, q, TOP_K, cent, books, nprobe=NPROBE)
        assert _rows(served) == _rows(live)
        assert served.count() > 0
    finally:
        _drop(spark, "pq_ann")


def test_pq_adc_scan_reads_codes_not_vectors(spark, sf_dir, tmp_path):
    """The ADC branch's file scan must read (id, cell, code) ONLY — the
    vector column stays unread until the shortlist rerank, which is the
    whole IO point of storing codes (M bytes vs dim*4 per candidate)."""
    import re

    from kafka_clickhouse_example_spark.operators.ann_index import (
        topk_pq_from_ann_index,
    )

    emb = _emb(spark, sf_dir)
    q = _queries(emb)
    try:
        build_ann_index(emb, "pqp_ann", pq=True, path=str(tmp_path / "pqp"))
        plan = (
            topk_pq_from_ann_index(spark, "pqp_ann", q, TOP_K, nprobe=NPROBE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        adc = [s for s in schemas if "code" in s]
        assert adc and all("embedding" not in s for s in adc), schemas
        # both scans partition-pruned to the probed cells
        assert len(re.findall(r"PartitionFilters: \[[^\]]*cell[^\]]*IN", plan)) >= 2
    finally:
        _drop(spark, "pqp_ann")


def test_labeled_merge_is_replay_idempotent(spark, sf_dir, tmp_path):
    """A labeled merge must converge under replay: landing the SAME
    logical batch twice (micro-batch redelivery after a crash) leaves the
    index content — rows AND ids — exactly as after the first landing,
    because the batch dynamic-overwrites its own (cell, batch) partitions
    instead of appending."""
    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") < 400)
    delta = emb.filter(F.col("vec_id") >= 400)
    try:
        build_ann_index(base, "rep_ann", path=str(tmp_path / "rep"))

        def snap():
            return {
                "rows": sorted(
                    (r.vec_id, int(r.cell), r.batch)
                    for r in spark.table("rep_ann").collect()
                ),
                "ids": sorted(
                    (r.vec_id, r.batch)
                    for r in spark.table("rep_ann_ids").collect()
                ),
            }

        add_vectors_to_ann_index(delta, "rep_ann", batch_label="b7")
        first = snap()
        assert any(b == "b7" for _, _, b in first["rows"])
        add_vectors_to_ann_index(delta, "rep_ann", batch_label="b7")  # replay
        assert snap() == first
    finally:
        _drop(spark, "rep_ann")


@pytest.mark.slow
def test_streaming_sink_maintains_index(spark, sf_dir, tmp_path):
    """File-source stream of new vectors through start_ann_index_sink:
    the maintained index must serve row-for-row what a batch build over
    the full corpus serves (same frozen centroids)."""
    from kafka_clickhouse_example_spark.operators.ann_index import (
        start_ann_index_sink,
    )

    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") < 400)
    delta = emb.filter(F.col("vec_id") >= 400)
    cent = S.train_ivf_centroids(base)
    q = _queries(emb)
    src = str(tmp_path / "src")
    delta.select("vec_id", "embedding").write.parquet(src)
    try:
        build_ann_index(base, "str_ann", centroids=cent, path=str(tmp_path / "str"))
        stream = (
            spark.readStream.schema("vec_id bigint, embedding array<float>")
            .option("maxFilesPerTrigger", 1)  # several micro-batches
            .parquet(src)
        )
        qy = start_ann_index_sink(
            stream, "str_ann", str(tmp_path / "ckpt")
        )
        qy.awaitTermination()
        build_ann_index(emb, "strf_ann", centroids=cent, path=str(tmp_path / "strf"))
        assert sorted(
            (r.vec_id, int(r.cell)) for r in spark.table("str_ann").collect()
        ) == sorted(
            (r.vec_id, int(r.cell)) for r in spark.table("strf_ann").collect()
        )
        assert _rows(topk_from_ann_index(spark, "str_ann", q, TOP_K)) == _rows(
            topk_from_ann_index(spark, "strf_ann", q, TOP_K)
        )
    finally:
        _drop(spark, "str_ann", "strf_ann")


def test_pq_incremental_add_matches_fresh_rebuild(spark, sf_dir, tmp_path):
    """Appending under frozen centroids AND codebooks must reproduce the
    rebuilt layout byte-for-byte, stored code bytes included."""
    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") < 400)
    delta = emb.filter(F.col("vec_id") >= 400)
    cent = S.train_ivf_centroids(base)
    books = S.train_pq_codebooks_residual(base, cent)
    try:
        build_ann_index(
            base, "ipq_ann", centroids=cent, codebooks=books,
            path=str(tmp_path / "ipq"),
        )
        add_vectors_to_ann_index(delta, "ipq_ann")
        build_ann_index(
            emb, "fpq_ann", centroids=cent, codebooks=books,
            path=str(tmp_path / "fpq"),
        )

        def snap(t):
            return sorted(
                (r.vec_id, int(r.cell), bytes(r.code), tuple(r.embedding))
                for r in spark.table(t).collect()
            )

        assert snap("ipq_ann") == snap("fpq_ann")
    finally:
        _drop(spark, "ipq_ann", "fpq_ann")


@pytest.mark.slow
def test_ann_index_random_lifecycle_matches_rebuild(spark, tmp_path_factory):
    """Property test over the ANN index lifecycle: under ANY interleaving
    of curated adds, labeled (replay-idempotent) merges, tombstone
    deletes (live, unknown, and everything-at-once), refused duplicate /
    pending re-adds, and compactions, the masked id relation always
    equals the model's live set, serving never returns a deleted id, and
    every compaction leaves (vec_id, cell) row-identical to a fresh
    build over the surviving vectors under the same frozen centroids.
    The hand-written tests above pin single sequences; this pins their
    composition (including compacting down to an EMPTY index)."""
    import tempfile

    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from kafka_clickhouse_example_spark.operators.ann_index import (
        compact_ann_index,
        delete_vectors_from_ann_index,
    )

    CENT = [[0.0, 0.0, 0.0, 0.0], [4.0, 4.0, 4.0, 4.0]]
    counter = {"n": 0}

    def vec_df(items):  # [(id, vec)]
        return spark.createDataFrame(
            items, "vec_id long, embedding array<double>"
        )

    @settings(
        max_examples=5,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.data())
    def run(data):
        counter["n"] += 1
        t = f"ann_prop_{counter['n']}"
        ref = t + "_ref"
        next_id = {"v": 0}

        def fresh_vecs(n):
            out = []
            for _ in range(n):
                i = next_id["v"]
                next_id["v"] += 1
                out.append(
                    (
                        i,
                        data.draw(
                            st.lists(
                                st.sampled_from([0.0, 1.0, 3.0, 5.0]),
                                min_size=4,
                                max_size=4,
                            ),
                            label="vec",
                        ),
                    )
                )
            return out

        def masked_ids():
            return {
                r.vec_id
                for r in spark.table(t + "_ids")
                .join(
                    F.broadcast(spark.table(t + "_deletes")),
                    "vec_id",
                    "left_anti",
                )
                .collect()
            }

        with tempfile.TemporaryDirectory() as d:
            try:
                live = dict(fresh_vecs(data.draw(st.integers(2, 4), label="n0")))
                build_ann_index(
                    vec_df(list(live.items())), t, centroids=CENT, path=d + "/i"
                )
                pending: set[int] = set()
                for step in range(data.draw(st.integers(3, 6), label="n_ops")):
                    op = data.draw(
                        st.sampled_from(
                            [
                                "add",
                                "add_labeled",
                                "delete",
                                "dup_add",
                                "readd_pending",
                                "compact",
                            ]
                        ),
                        label="op",
                    )
                    if op == "add":
                        delta = fresh_vecs(data.draw(st.integers(1, 2), label="k"))
                        add_vectors_to_ann_index(vec_df(delta), t)
                        live.update(delta)
                    elif op == "add_labeled":
                        delta = fresh_vecs(data.draw(st.integers(1, 2), label="k"))
                        for _ in range(
                            2 if data.draw(st.booleans(), label="replay") else 1
                        ):
                            add_vectors_to_ann_index(
                                vec_df(delta),
                                t,
                                batch_label=f"b{counter['n']}_{step}",
                            )
                        live.update(delta)
                    elif op == "delete" and live:
                        ids = data.draw(
                            st.lists(
                                st.sampled_from(sorted(live)),
                                min_size=1,
                                max_size=len(live),  # may empty the index
                                unique=True,
                            ),
                            label="del_ids",
                        )
                        rows = [(i, [0.0] * 4) for i in ids]
                        if data.draw(st.booleans(), label="unknown"):
                            rows.append((10**6, [0.0] * 4))  # never indexed
                        delete_vectors_from_ann_index(
                            vec_df(rows).select("vec_id"), t
                        )
                        for i in ids:
                            del live[i]
                        pending |= set(ids)  # unknown id is NOT tombstoned
                    elif op == "dup_add" and live:
                        victim = sorted(live)[0]
                        with pytest.raises(ValueError, match="append-only"):
                            add_vectors_to_ann_index(
                                vec_df([(victim, [0.0] * 4)]), t
                            )
                    elif op == "readd_pending" and pending:
                        victim = sorted(pending)[0]
                        with pytest.raises(ValueError, match="tombstone"):
                            add_vectors_to_ann_index(
                                vec_df([(victim, [0.0] * 4)]), t
                            )
                    elif op == "compact":
                        compact_ann_index(spark, t)
                        pending.clear()
                        assert spark.table(t + "_deletes").isEmpty()
                        got = sorted(
                            (r.vec_id, r.cell)
                            for r in spark.table(t).select("vec_id", "cell").collect()
                        )
                        if live:
                            build_ann_index(
                                vec_df(list(live.items())),
                                ref,
                                centroids=CENT,
                                path=d + f"/r{step}",
                            )
                            want = sorted(
                                (r.vec_id, r.cell)
                                for r in spark.table(ref)
                                .select("vec_id", "cell")
                                .collect()
                            )
                            assert got == want
                        else:
                            assert got == []
                    assert masked_ids() == set(live)
                    if live:
                        topk = topk_from_ann_index(
                            spark,
                            t,
                            pd.DataFrame({"qid": [0], "qvec": [[1.0] * 4]}),
                            k=3,
                            nprobe=2,
                        ).collect()
                        assert {r.vec_id for r in topk} <= set(live)
            finally:
                for tbl in (t, ref):
                    for s in ("", "_centroids", "_ids", "_deletes"):
                        spark.sql(f"DROP TABLE IF EXISTS {tbl}{s}")

    run()
