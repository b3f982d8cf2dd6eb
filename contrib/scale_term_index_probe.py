"""Round-11: measured scale points for the MATERIALIZED BM25 term index
(operators/retrieval.py — build/serve/update/delete lifecycle,
previously parity-certified but never measured at scale). The vector
analog ran first (contrib/scale_ann_index_probe.py); this closes the
same gap for the retrieval family.

Corpora: the existing raw offset-copy dirs — sf0.1 (5k docs), /tmp/sf10
(500k), /tmp/sf30 (1.5M). Unsalted copies keep the VOCABULARY constant
while postings grow linearly — the realistic shape (real corpora grow
docs much faster than vocabulary), and the one that exercises df-merge
and bucket pruning honestly (every copy hits the same term buckets).

Per scale, single cold timed runs:
- build_term_index (one tokenize pass, bucketed+sorted postings,
  vocabulary df, exact stats);
- bm25_topk_from_index: single 8-term query — bucket-pruned postings
  scan + prebuilt df/stats broadcast; the 100 TB claim is that this
  reads only the queried terms' buckets, so it scales with posting-list
  length, NOT corpus tokenize cost;
- bm25_batch_topk_from_index: 3-query batch, one shared pruned scan;
- LIVE-path baseline (plans text_bm25_topk semantics: tokenize + score
  the whole corpus per query) — the honest comparator whose gap to the
  served path should WIDEN with corpus size;
- update_term_index with a 5,000-doc delta (flat O(delta) claim);
- delete_docs_from_term_index + re-serve (tombstones visible
  immediately).

Usage:
    PYTHONPATH=/root/repo python contrib/scale_term_index_probe.py \
        contrib/scale_term_index_r11.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from kafka_clickhouse_example_spark.operators import retrieval as R
from kafka_clickhouse_example_spark.session import configure_runtime, get_spark
from kafka_clickhouse_example_spark.sources.catalog import load_table

K = 20


def main() -> None:
    out_path = sys.argv[1]
    spark = get_spark(
        "scale-term-index-probe",
        cpus=32,
        driver_memory=os.environ.get("SCALE_DRIVER_MEM", "16g"),
    )
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, object] = {
        "_protocol": "raw offset-copy corpora (sf0.1 5k docs anchor, "
        "/tmp/sf10 500k, /tmp/sf30 1.5M — vocabulary constant, postings "
        "linear); single cold timed run per step after an untimed sf0.1 "
        "lifecycle warm-up; local[32], driver 16g; k=20",
        "provenance": bench._provenance(
            source="self-measured (contrib/scale_term_index_probe.py, round 11)"
        ),
    }

    # Untimed lifecycle warm-up at sf0.1 (first Arrow/pandas launch +
    # codegen costs 2-3x; the ANN probe's first attempt measured the cold
    # cost exceeding the decade's real work). Also yields the term list:
    # 8 mid-df terms, identical across scales since copies share text.
    docs01 = load_table(spark, "/root/testdata/sf0.1", "documents")
    shutil.rmtree("/tmp/termidx_warm", ignore_errors=True)
    R.build_term_index(docs01, "termidx_warm", path="/tmp/termidx_warm")
    vocab = [
        r.term
        for r in spark.table("termidx_warm_terms")
        .orderBy(F.col("df").desc(), "term")
        .collect()
    ]
    # mid-df slice of whatever vocabulary exists (the synthetic corpus has
    # ~31 distinct terms — a fixed [100:108] slice came back EMPTY on the
    # first run and every serve was a 0-row no-op)
    mid = len(vocab) // 2
    terms = vocab[mid : mid + 8] if len(vocab) >= 8 else vocab
    assert terms, "empty vocabulary — probe cannot serve"
    out["terms"] = terms
    out["vocab_size"] = len(vocab)
    R.bm25_topk_from_index(spark, "termidx_warm", terms, K).collect()
    batch = {1: terms[:4], 2: terms[2:6], 3: terms[4:]}
    R.bm25_batch_topk_from_index(spark, "termidx_warm", batch, K).collect()

    for label, sf_dir in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf10", "/tmp/sf10"),
        ("sf30", "/tmp/sf30"),
    ):
        docs = load_table(spark, sf_dir, "documents")
        table = f"termidx_{label.replace('.', '')}"
        idx_path = f"/tmp/{table}"
        shutil.rmtree(idx_path, ignore_errors=True)
        res: dict[str, object] = {"n_docs": docs.count()}

        t0 = time.perf_counter()
        R.build_term_index(docs, table, path=idx_path)
        res["build_sec"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        served = R.bm25_topk_from_index(spark, table, terms, K).collect()
        res["serve_topk_sec"] = round(time.perf_counter() - t0, 3)
        res["serve_rows"] = len(served)

        t0 = time.perf_counter()
        got = R.bm25_batch_topk_from_index(spark, table, batch, K).collect()
        res["serve_batch_sec"] = round(time.perf_counter() - t0, 3)
        res["serve_batch_rows"] = len(got)

        # live-path comparator: full tokenize+score per query (what a
        # user WITHOUT the prebuilt index pays on every query)
        from kafka_clickhouse_example_spark.operators.text import tokens

        a = tokens(F.col("text"))
        toks = docs.select(
            F.col("doc_id"),
            F.size(a).cast("bigint").alias("dl"),
            F.explode(a).alias("term"),
        )
        live_postings = toks.groupBy("term", "doc_id").agg(
            F.max("dl").alias("dl"), F.count("*").alias("tf")
        ).filter(F.col("term").isin(terms))
        t0 = time.perf_counter()
        live_postings.groupBy("doc_id").agg(
            F.sum("tf").alias("s")
        ).orderBy(F.col("s").desc(), "doc_id").limit(K).collect()
        res["live_tokenize_path_sec"] = round(time.perf_counter() - t0, 3)

        delta = docs01.select(
            (F.col("doc_id") + F.lit(10**9)).alias("doc_id"), "text"
        )
        t0 = time.perf_counter()
        R.update_term_index(delta, table)
        res["incremental_add_5000_sec"] = round(time.perf_counter() - t0, 3)

        del_ids = [r.doc_id for r in served[:3]]
        t0 = time.perf_counter()
        R.delete_docs_from_term_index(
            spark.createDataFrame([(i,) for i in del_ids], "doc_id long"),
            table,
        )
        post = R.bm25_topk_from_index(spark, table, terms, K).collect()
        res["delete_and_reserve_sec"] = round(time.perf_counter() - t0, 3)
        res["deleted_ids_served"] = sum(
            1 for r in post if r.doc_id in set(del_ids)
        )
        out[label] = res
        print(label, res, file=sys.stderr)

    # Selective-vocabulary bracket: the raw corpora above are the WORST
    # case for serving (31-term vocab, every query term in ~78% of docs —
    # queried posting mass IS a constant corpus fraction, so serve ~
    # corpus/4 and barely beats the live path). The salted corpora are
    # the realistic-vocabulary regime: each copy carries its own token
    # suffixes, so a query for copy-0's terms touches ~1/copies of the
    # postings — rare terms, the case bucket pruning exists for.
    salted_terms = [t + "~~0" for t in terms]
    for label, sf_dir in (("sf10ctl", "/tmp/sf10ctl"), ("sf30ctl", "/tmp/sf30ctl")):
        docs = load_table(spark, sf_dir, "documents")
        table = f"termidx_{label}"
        idx_path = f"/tmp/{table}"
        shutil.rmtree(idx_path, ignore_errors=True)
        res = {"n_docs": docs.count()}
        t0 = time.perf_counter()
        R.build_term_index(docs, table, path=idx_path)
        res["build_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        served = R.bm25_topk_from_index(spark, table, salted_terms, K).collect()
        res["serve_topk_sec"] = round(time.perf_counter() - t0, 3)
        res["serve_rows"] = len(served)
        from kafka_clickhouse_example_spark.operators.text import tokens

        a = tokens(F.col("text"))
        toks = docs.select(
            F.col("doc_id"),
            F.size(a).cast("bigint").alias("dl"),
            F.explode(a).alias("term"),
        )
        live = toks.groupBy("term", "doc_id").agg(
            F.max("dl").alias("dl"), F.count("*").alias("tf")
        ).filter(F.col("term").isin(salted_terms))
        t0 = time.perf_counter()
        live.groupBy("doc_id").agg(F.sum("tf").alias("s")).orderBy(
            F.col("s").desc(), "doc_id"
        ).limit(K).collect()
        res["live_tokenize_path_sec"] = round(time.perf_counter() - t0, 3)
        out[label] = res
        print(label, res, file=sys.stderr)

    lo, hi = out["sf10"], out["sf30"]
    out["ratios_sf30_over_sf10"] = {
        k: round(hi[k] / lo[k], 2)
        for k in ("build_sec", "serve_topk_sec", "serve_batch_sec",
                  "live_tokenize_path_sec", "incremental_add_5000_sec")
        if lo.get(k) and hi.get(k)
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(json.dumps(out["ratios_sf30_over_sf10"]), file=sys.stderr)


if __name__ == "__main__":
    main()
