"""Streaming ingest dedup gate: within-batch dupes collapse, cross-batch
near-dups are quarantined with their match, novel docs land, and a full
crash-replay cannot double-land documents (the gate self-rejects replayed
copies)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.pipelines.ingest_dedup import start_dedup_gate

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)
NOVEL = (
    "one two three four five six seven eight nine ten "
    "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
)
OTHER = (
    "red orange yellow green blue indigo violet black white gray "
    "cyan magenta maroon olive navy teal silver gold bronze copper"
)


def _doc(i: int, text: str) -> str:
    return json.dumps({"doc_id": i, "text": text})


@pytest.fixture()
def paths(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return {
        "src": src,
        "corpus": str(tmp_path / "corpus"),
        "report": str(tmp_path / "report"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _run(spark, p, ckpt):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(p["src"]))
    )
    q = start_dedup_gate(stream, p["corpus"], p["report"], ckpt)
    q.awaitTermination(180)


@pytest.mark.slow
def test_gate_lands_novel_and_quarantines_dups(spark, paths):
    # batch 1: one doc + an exact in-batch copy; batch 2: a near-dup of
    # batch 1's doc (one word changed), plus a genuinely novel doc
    near = BASE.replace("kappa", "kappa2")
    short = "tiny doc"  # 2 tokens: zero 3-gram shingles, invisible to LSH
    (paths["src"] / "b1.json").write_text(
        "\n".join([_doc(1, BASE), _doc(2, BASE), _doc(3, OTHER), _doc(4, short)])
    )
    (paths["src"] / "b2.json").write_text(
        "\n".join([_doc(10, near), _doc(11, NOVEL), _doc(12, short)])
    )
    _run(spark, paths, paths["ckpt"])

    corpus = {r.doc_id for r in spark.read.parquet(paths["corpus"]).collect()}
    # 2 = exact in-batch dup, 10 = near-dup of 1, 12 = exact copy of the
    # SHORT doc 4 — caught by the content-hash leg, not LSH
    assert corpus == {1, 3, 4, 11}
    report = {
        (r.doc_id, r.matched_doc_id)
        for r in spark.read.parquet(paths["report"]).collect()
    }
    assert report == {(10, 1), (12, 4)}

    # crash-replay: re-run the whole stream with a FRESH checkpoint — every
    # replayed doc self-rejects against its landed copy; corpus unchanged
    _run(spark, paths, paths["ckpt"] + "2")
    corpus2 = [r.doc_id for r in spark.read.parquet(paths["corpus"]).collect()]
    assert sorted(corpus2) == [1, 3, 4, 11], "replay double-landed documents"
    # replayed self-matches (incl. the un-shingle-able short doc) were
    # quarantined at jaccard 1.0
    rr = spark.read.parquet(paths["report"])
    self_hits = rr.filter(F.col("doc_id") == F.col("matched_doc_id")).collect()
    assert {r.doc_id for r in self_hits} == {1, 3, 4, 11}
    assert all(r.jaccard == 1.0 for r in self_hits)


# --- served mode: the materialized dedup store ------------------------------

from kafka_clickhouse_example_spark.operators import dedup as D
from kafka_clickhouse_example_spark.operators import dedup_store as DS
from kafka_clickhouse_example_spark.pipelines.ingest_dedup import (
    gate_batch,
    gate_batch_served,
    start_dedup_gate_served,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _gate_result_key(survivors, rejects):
    return (
        sorted((r.doc_id, r.text) for r in survivors.collect()),
        sorted(
            (r.doc_id, r.matched_doc_id, round(r.jaccard, 9))
            for r in rejects.collect()
        ),
    )


@pytest.mark.slow
def test_served_gate_matches_live_gate(spark, tmp_path):
    """Row-for-row parity: gating against the materialized store must equal
    gating against the corpus text — exact leg, near leg, short docs, NULL
    text, ties."""
    corpus = _df(
        spark,
        [(1, BASE), (2, OTHER), (3, "tiny doc"), (4, None)],
    )
    store = str(tmp_path / "store")
    DS.build_dedup_store(corpus, store)
    batch = _df(
        spark,
        [
            (10, BASE),                       # exact dup of 1
            (11, BASE.replace("kappa", "q")), # near dup of 1
            (12, "tiny doc"),                 # exact dup of short 3 (hash leg)
            (13, NOVEL),                      # novel
            (14, None),                       # NULL text: always lands
            (15, NOVEL),                      # in-batch exact dup of 13
        ],
    )
    live = gate_batch(batch, corpus, 0.3)
    served = gate_batch_served(batch, store, 0.3)
    assert _gate_result_key(*served) == _gate_result_key(*live)


def test_served_gate_empty_store(spark, tmp_path):
    batch = _df(spark, [(1, BASE), (2, BASE), (3, NOVEL)])
    survivors, rejects = gate_batch_served(batch, str(tmp_path / "nostore"), 0.3)
    assert sorted(r.doc_id for r in survivors.collect()) == [1, 3]
    assert rejects.count() == 0


@pytest.mark.slow
def test_store_update_is_replay_idempotent(spark, tmp_path):
    """Landing the same labeled delta twice leaves every relation
    row-identical to landing it once."""
    store = str(tmp_path / "store")
    DS.build_dedup_store(_df(spark, [(1, BASE)]), store)
    delta = _df(spark, [(2, OTHER), (3, NOVEL)])

    def snapshot():
        out = {}
        for rel in DS.RELATIONS:
            rows = spark.read.parquet(f"{store}/{rel}").collect()
            out[rel] = sorted(str(sorted(r.asDict().items())) for r in rows)
        return out

    DS.update_dedup_store(delta, store, "b7")
    once = snapshot()
    DS.update_dedup_store(delta, store, "b7")
    assert snapshot() == once


@pytest.mark.slow
def test_served_gate_excludes_own_crash_debris(spark, tmp_path):
    """A replayed batch must gate as if its own half-landed store rows do
    not exist: with exclude_label they are invisible; without it the
    batch's docs would self-reject and vanish (hash present, text absent)."""
    store = str(tmp_path / "store")
    DS.build_dedup_store(_df(spark, [(1, BASE)]), store)
    batch = _df(spark, [(20, NOVEL)])
    # simulate the crash: the batch's store rows landed, its corpus row did not
    DS.update_dedup_store(batch, store, "b3")

    survivors, rejects = gate_batch_served(batch, store, 0.3, exclude_label="b3")
    assert [r.doc_id for r in survivors.collect()] == [20]
    assert rejects.count() == 0

    # and the hazard is real: without the exclusion the doc self-rejects
    s2, r2 = gate_batch_served(batch, store, 0.3)
    assert s2.count() == 0 and r2.count() == 1


@pytest.mark.slow
def test_served_stream_matches_live_stream_and_fresh_build(spark, paths, tmp_path):
    """End-to-end: the served streaming gate lands the same corpus content
    as the live gate on the same input; afterwards the incrementally
    maintained store equals a fresh build from the final corpus; and a full
    replay with a fresh checkpoint leaves corpus CONTENT unchanged
    (exactly-once via labeled overwrite, not self-rejection)."""
    near = BASE.replace("kappa", "kappa2")
    short = "tiny doc"
    (paths["src"] / "b1.json").write_text(
        "\n".join([_doc(1, BASE), _doc(2, BASE), _doc(3, OTHER), _doc(4, short)])
    )
    (paths["src"] / "b2.json").write_text(
        "\n".join([_doc(10, near), _doc(11, NOVEL), _doc(12, short)])
    )
    store = str(tmp_path / "store2")
    corpus_path = str(tmp_path / "corpus_served")

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(paths["src"]))
        )
        q = start_dedup_gate_served(
            stream, corpus_path, store, paths["report"], ckpt
        )
        q.awaitTermination(180)

    run(paths["ckpt"] + "_served")
    corpus = spark.read.parquet(corpus_path)
    assert {r.doc_id for r in corpus.collect()} == {1, 3, 4, 11}

    # store == fresh rebuild from the final corpus (content, ignoring kb)
    fresh = str(tmp_path / "fresh")
    DS.build_dedup_store(corpus.select("doc_id", "text"), fresh)
    for rel in DS.RELATIONS:
        got = sorted(
            str(sorted(r.asDict().items()))
            for r in spark.read.parquet(f"{store}/{rel}").drop("kb").collect()
        )
        want = sorted(
            str(sorted(r.asDict().items()))
            for r in spark.read.parquet(f"{fresh}/{rel}").drop("kb").collect()
        )
        assert got == want, f"incrementally maintained {rel} != fresh rebuild"

    # full replay, fresh checkpoint: labeled overwrite keeps content
    # exactly-once — same doc set, no duplicate rows
    run(paths["ckpt"] + "_served2")
    rows = spark.read.parquet(corpus_path).collect()
    assert sorted(r.doc_id for r in rows) == [1, 3, 4, 11]


def test_served_gate_refuses_half_built_store(spark, tmp_path):
    """A crashed build (live hash rows, missing sibling relation) must be
    refused loudly — serving it would silently disable the near leg."""
    import shutil

    store = str(tmp_path / "halfstore")
    DS.build_dedup_store(_df(spark, [(1, BASE)]), store)
    shutil.rmtree(f"{store}/bands")
    with pytest.raises(ValueError, match="half-built"):
        gate_batch_served(_df(spark, [(9, NOVEL)]), store, 0.3)


def test_served_gate_refuses_key_profile_mismatch(spark, tmp_path, monkeypatch):
    """A store built under a different (ngram, perms, band_rows) profile
    must be refused: its stored band keys can never collide with batch
    keys — the near leg would return nothing, silently."""
    store = str(tmp_path / "oldstore")
    DS.build_dedup_store(_df(spark, [(1, BASE)]), store)
    monkeypatch.setattr(D, "MINHASH_PERMS", 16)
    with pytest.raises(ValueError, match="rebuild"):
        gate_batch_served(_df(spark, [(9, NOVEL)]), store, 0.3)
    # update must refuse too: appending un-matchable keys corrupts the store
    with pytest.raises(ValueError, match="rebuild"):
        DS.update_dedup_store(_df(spark, [(9, NOVEL)]), store, "b9")


def test_served_gate_refuses_crashed_bulk_build(spark, tmp_path):
    """A bulk build that crashed after writing ANY state (even before meta
    or hashes landed) must be refused: the corpus it was indexing exists,
    and serving 'empty store = empty corpus' would silently land every
    duplicate of it. Before the state marker this window was byte-identical
    to the legitimate streaming first-batch crash."""
    store = str(tmp_path / "crashedbuild")
    DS._write_state(spark, store, DS.STATE_BUILDING)
    DS._write_meta(spark, store)  # crash after meta, before relations
    with pytest.raises(ValueError, match="unfinished bulk build"):
        gate_batch_served(_df(spark, [(9, NOVEL)]), store, 0.3)
    # merging a delta into a mid-build store must refuse too: the build's
    # static-overwrite landing would clobber it
    with pytest.raises(ValueError, match="unfinished bulk build"):
        DS.update_dedup_store(_df(spark, [(9, NOVEL)]), store, "b1")


def test_streaming_first_batch_crash_window_served_empty(spark, tmp_path):
    """The ONE meta-present/hashes-absent window that is genuinely an empty
    corpus: update_dedup_store wrote meta, crashed before landing the first
    batch's relations, and no bulk build ever touched the store (no state
    relation). Replay must gate against an empty corpus, not error."""
    store = str(tmp_path / "firstbatchcrash")
    DS._write_meta(spark, store)
    survivors, rejects = gate_batch_served(_df(spark, [(1, BASE)]), store, 0.3)
    assert [r.doc_id for r in survivors.collect()] == [1]
    assert rejects.count() == 0


def test_profile_mismatch_loud_even_before_data_lands(spark, tmp_path, monkeypatch):
    """check_store_meta must fire whenever meta exists — BEFORE the
    hashes-is-None early return — so a direct caller pointing at an empty
    store with a mismatched key profile gets the documented loud refusal,
    not silent empty-store gating."""
    store = str(tmp_path / "emptymismatch")
    DS._write_meta(spark, store)  # meta only: no hashes yet
    monkeypatch.setattr(D, "MINHASH_PERMS", 16)
    with pytest.raises(ValueError, match="rebuild"):
        gate_batch_served(_df(spark, [(9, NOVEL)]), store, 0.3)


def test_complete_store_with_lost_data_refused(spark, tmp_path):
    """state=complete but the hashes relation is gone: data was removed
    out-of-band after a successful build — refuse, don't serve empty."""
    import shutil

    store = str(tmp_path / "lostdata")
    DS.build_dedup_store(_df(spark, [(1, BASE)]), store)
    shutil.rmtree(f"{store}/hashes")
    with pytest.raises(ValueError, match="marked complete"):
        gate_batch_served(_df(spark, [(9, NOVEL)]), store, 0.3)


def test_null_text_docs_never_dedup_against_each_other(spark, tmp_path):
    """NULL-text docs are invisible to the exact leg EVERYWHERE: two in one
    micro-batch both survive within-batch dedup (previously groupBy treated
    their NULL hashes as equal and silently collapsed them), mirroring
    their always-lands behavior against the corpus."""
    batch = _df(spark, [(1, None), (2, None), (3, BASE), (4, BASE)])
    survivors, rejects = gate_batch(batch, None, 0.3)
    assert sorted(r.doc_id for r in survivors.collect()) == [1, 2, 3]
    assert rejects.count() == 0
    # and identically through the served path against an empty store
    s2, _ = gate_batch_served(batch, str(tmp_path / "ns"), 0.3)
    assert sorted(r.doc_id for r in s2.collect()) == [1, 2, 3]


@pytest.mark.slow
def test_unified_gate_serves_from_store_without_corpus_rescan(
    spark, paths, tmp_path, monkeypatch
):
    """start_dedup_gate with store_path (the production default): against a
    corpus ≫ batch, every micro-batch gates purely from the materialized
    store — the corpus parquet is never opened for READ during the run
    (asserted by spying every DataFrameReader.parquet call), so per-batch
    cost is independent of corpus size. Results still match the live gate's
    semantics: near-dups and exact dups of corpus docs are quarantined,
    novel docs land."""
    from pyspark.sql.readwriter import DataFrameReader

    from kafka_clickhouse_example_spark.pipelines.ingest_dedup import (
        start_dedup_gate,
    )

    # corpus of 400 distinct long docs — two orders of magnitude over the
    # 2-doc batches below
    corpus_rows = [
        (i, f"{BASE} filler{i} pad{i} row{i} tail{i}") for i in range(400)
    ]
    corpus = _df(spark, corpus_rows)
    corpus_path = str(tmp_path / "bigcorpus")
    store = str(tmp_path / "bigstore")
    corpus.withColumn("kb", F.lit("seed")).write.partitionBy("kb").parquet(
        corpus_path
    )
    DS.build_dedup_store(corpus, store)

    (paths["src"] / "b1.json").write_text(
        "\n".join(
            [
                _doc(1000, corpus_rows[7][1]),  # exact dup of corpus doc 7
                _doc(1001, NOVEL),              # novel
            ]
        )
    )
    (paths["src"] / "b2.json").write_text(
        "\n".join(
            [
                # near dup of corpus doc 3 (one token changed)
                _doc(1002, corpus_rows[3][1].replace("kappa", "q")),
                _doc(1003, OTHER),              # novel
            ]
        )
    )

    reads: list[str] = []
    real_parquet = DataFrameReader.parquet

    def spy(self, *paths_):
        reads.extend(paths_)
        return real_parquet(self, *paths_)

    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(paths["src"]))
    )
    q = start_dedup_gate(
        stream,
        corpus_path,
        paths["report"],
        paths["ckpt"] + "_unified",
        store_path=store,
    )
    q.awaitTermination(180)
    monkeypatch.undo()

    assert not any(
        corpus_path in r for r in reads
    ), f"gate re-read the corpus despite the store: {reads}"
    assert any(store in r for r in reads), "gate never consulted the store"

    landed = {
        r.doc_id
        for r in spark.read.parquet(corpus_path)
        .filter(F.col("doc_id") >= 1000)
        .collect()
    }
    assert landed == {1001, 1003}
    report = {
        (r.doc_id, r.matched_doc_id)
        for r in spark.read.parquet(paths["report"]).collect()
    }
    assert report == {(1000, 7), (1002, 3)}


def test_hashes_lost_with_live_siblings_refused(spark, tmp_path):
    """A streaming-built store (no state relation) whose hashes relation
    is lost out-of-band while bands/shingles still hold live rows must be
    refused: the siblings prove a corpus exists, and serving 'empty store
    = empty corpus' would land every duplicate of it."""
    import shutil

    store = str(tmp_path / "lostsiblings")
    # streaming-shaped store: created by update, never bulk-built
    DS.update_dedup_store(_df(spark, [(1, BASE)]), store, "b0")
    shutil.rmtree(f"{store}/hashes")
    with pytest.raises(ValueError, match="lost out-of-band"):
        gate_batch_served(_df(spark, [(9, NOVEL)]), store, 0.3)
    # but the genuine first-batch crash window (only the crashed label's
    # own rows in the siblings) still serves as empty under exclusion
    store2 = str(tmp_path / "firstbatch")
    DS.update_dedup_store(_df(spark, [(7, NOVEL)]), store2, "b0")
    shutil.rmtree(f"{store2}/hashes")
    survivors, rejects = gate_batch_served(
        _df(spark, [(7, NOVEL)]), store2, 0.3, exclude_label="b0"
    )
    assert [r.doc_id for r in survivors.collect()] == [7]
    assert rejects.count() == 0


@pytest.mark.slow
def test_check_store_servable_covers_sibling_consistency_directly(
    spark, tmp_path
):
    """Round-7 ADVICE: the sibling-consistency refusals live in
    check_store_servable itself, not only in gate_batch_served — a direct
    caller pairing check_store_servable with read_relation can no longer
    serve a half-broken store as empty."""
    import shutil

    # live siblings, missing hashes → refuse from the check alone
    store = str(tmp_path / "direct_lostsiblings")
    DS.update_dedup_store(_df(spark, [(1, BASE)]), store, "b0")
    shutil.rmtree(f"{store}/hashes")
    with pytest.raises(ValueError, match="lost out-of-band"):
        DS.check_store_servable(spark, store)
    # exclusion makes the same store's crash window servable
    DS.check_store_servable(spark, store, exclude_label="b0")
    # live hashes, missing sibling → refuse from the check alone
    store2 = str(tmp_path / "direct_halfbuilt")
    DS.build_dedup_store(_df(spark, [(1, BASE)]), store2)
    shutil.rmtree(f"{store2}/bands")
    with pytest.raises(ValueError, match="half-built"):
        DS.check_store_servable(spark, store2)


def test_empty_state_relation_reads_as_none(spark, tmp_path):
    """Round-7 ADVICE: a committed-but-empty state relation (zero rows)
    must read as None — same serving posture as no lifecycle record —
    not crash with AttributeError on NoneType."""
    store = str(tmp_path / "emptystate")
    spark.createDataFrame([], "state string").coalesce(1).write.parquet(
        f"{store}/state"
    )
    assert DS.read_store_state(spark, store) is None
    # and the store remains servable-as-empty through the full check
    DS.check_store_servable(spark, store)
