"""Round-11: first measured scale decade for the MATERIALIZED ANN index
(operators/ann_index.py — the IVF/IVFADC serving path, previously
certified by parity tests only, never measured at scale).

Two corpus sizes from the same device as every other decade here —
offset copies of the sf0.1 embeddings table (vectors repeated with fresh
vec_ids; fine for wall/pruning measurements, ties are irrelevant to
timing): 200k vectors (100 copies) and 2M (1000 copies), 64-dim floats.

Per scale, single cold timed runs of the index LIFECYCLE:

- build (IVF + residual-PQ layout: train on the md5-ordered 4096 sample,
  assign + encode every vector, write partitioned by (cell, batch));
- serve: 8-query batch, k=10, nprobe=2 of 16 cells — the partition-
  pruned path that should read ~2/16 of the corpus bytes regardless of
  corpus size;
- ADC serve (topk_pq_from_ann_index): reads (id, cell, code) only;
- brute-force baseline over the same corpus (the honest comparator —
  O(corpus) per batch by design);
- incremental add of a 2,000-vector delta (must be O(delta): assign
  against STORED centroids, land in existing partitions);
- tombstone delete of 100 ids + re-serve (deletes visible via anti-join
  before any compaction).

The 100 TB claims under test: build scales linearly (one pass + write),
serve scales with nprobe/k_cells x corpus (NOT full corpus — the gap to
brute force should WIDEN with scale), incremental add does not scale
with the corpus at all.

Usage:
    PYTHONPATH=/root/repo python contrib/scale_ann_index_probe.py \
        contrib/scale_ann_index_r11.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from pyspark.sql import functions as F

import bench
from kafka_clickhouse_example_spark.operators import ann_index as A
from kafka_clickhouse_example_spark.operators import similarity as S
from kafka_clickhouse_example_spark.session import configure_runtime, get_spark
from kafka_clickhouse_example_spark.sources.catalog import load_table

SRC = "/root/testdata/sf0.1"
K = 10
NQUERIES = 8


def _gen_embeddings(spark, dst: str, copies: int) -> None:
    if os.path.exists(dst):
        return
    base = load_table(spark, SRC, "embeddings")
    span = base.agg(F.max("vec_id")).collect()[0][0] + 1
    k = F.col("__copy")
    (
        base.crossJoin(spark.range(copies).select(F.col("id").alias("__copy")))
        .select(
            (F.col("vec_id") + k * F.lit(span)).alias("vec_id"),
            "embedding",
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(dst)
    )
    print(f"generated {dst} ({copies} copies)", file=sys.stderr)


def main() -> None:
    out_path = sys.argv[1]
    spark = get_spark(
        "scale-ann-index-probe",
        cpus=32,
        driver_memory=os.environ.get("SCALE_DRIVER_MEM", "16g"),
    )
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, object] = {
        "_protocol": "offset-copy embeddings corpora (100 / 1000 copies of "
        "sf0.1's 2000 x 64-dim vectors); single cold timed run per step "
        "via time.perf_counter around the materializing action; "
        "local[32], driver 16g; k=10, nprobe=2/16 cells, 8-query batch",
        "provenance": bench._provenance(
            source="self-measured (contrib/scale_ann_index_probe.py, round 11)"
        ),
    }

    qbase = load_table(spark, SRC, "embeddings").orderBy("vec_id").limit(NQUERIES)
    qrows = qbase.collect()
    queries_pdf = pd.DataFrame(
        {"qid": [int(r.vec_id) for r in qrows],
         "qvec": [list(r.embedding) for r in qrows]}
    )
    queries_df = spark.createDataFrame(
        [(int(r.vec_id), list(map(float, r.embedding))) for r in qrows],
        "qid long, qvec array<double>",
    )

    # Untimed lifecycle warm-up on a throwaway 2k-vector index: the first
    # Arrow/pandas-UDF launch + codegen costs 2-3x (bench.py's documented
    # cold effect) and would otherwise inflate the SMALL point — the first
    # run of this probe measured build 30.2 s at 200k vs 13.3 s at 2M,
    # i.e. the cold cost exceeded the decade's real work.
    warm_tbl, warm_path = "annprobe_warm", "/tmp/annidx_warm"
    shutil.rmtree(warm_path, ignore_errors=True)
    A.build_ann_index(
        load_table(spark, SRC, "embeddings"), warm_tbl, pq=True, path=warm_path
    )
    A.topk_from_ann_index(spark, warm_tbl, queries_pdf, K).collect()
    A.topk_pq_from_ann_index(spark, warm_tbl, queries_pdf, K).collect()
    S.topk_bruteforce(
        load_table(spark, SRC, "embeddings"), queries_df, K
    ).collect()

    for label, copies in (("200k", 100), ("2M", 1000)):
        dst = f"/tmp/emb_{label}"
        _gen_embeddings(spark, dst, copies)
        corpus = spark.read.parquet(dst)
        n = corpus.count()
        table = f"annprobe_{label}"
        idx_path = f"/tmp/annidx_{label}"
        shutil.rmtree(idx_path, ignore_errors=True)
        res: dict[str, object] = {"n_vectors": n}

        t0 = time.perf_counter()
        A.build_ann_index(
            corpus, table, pq=True, path=idx_path
        )
        res["build_ivfpq_sec"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        served = topk = A.topk_from_ann_index(
            spark, table, queries_pdf, K
        ).collect()
        res["serve_ivf_sec"] = round(time.perf_counter() - t0, 3)
        res["serve_rows"] = len(served)

        t0 = time.perf_counter()
        adc = A.topk_pq_from_ann_index(spark, table, queries_pdf, K).collect()
        res["serve_ivfadc_sec"] = round(time.perf_counter() - t0, 3)
        res["serve_adc_rows"] = len(adc)

        t0 = time.perf_counter()
        brute = S.topk_bruteforce(corpus, queries_df, K).collect()
        res["brute_force_sec"] = round(time.perf_counter() - t0, 3)
        res["brute_rows"] = len(brute)

        delta = (
            load_table(spark, SRC, "embeddings")
            .select(
                (F.col("vec_id") + F.lit(10**9)).alias("vec_id"),
                "embedding",
                "label",
            )
        )
        t0 = time.perf_counter()
        A.add_vectors_to_ann_index(delta, table)
        res["incremental_add_2000_sec"] = round(time.perf_counter() - t0, 3)

        del_ids = [int(r.vec_id) for r in qrows[:4]]
        t0 = time.perf_counter()
        A.delete_vectors_from_ann_index(
            spark.createDataFrame([(i,) for i in del_ids], "vec_id long"),
            table,
        )
        res["tombstone_delete_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        post = A.topk_from_ann_index(spark, table, queries_pdf, K).collect()
        res["serve_after_delete_sec"] = round(time.perf_counter() - t0, 3)
        res["deleted_ids_served"] = sum(
            1 for r in post if r.vec_id in set(del_ids)
        )
        out[label] = res
        print(label, res, file=sys.stderr)

    a, b = out["200k"], out["2M"]
    out["ratios_2M_over_200k"] = {
        k: round(b[k] / a[k], 2)
        for k in ("build_ivfpq_sec", "serve_ivf_sec", "serve_ivfadc_sec",
                  "brute_force_sec", "incremental_add_2000_sec")
        if a.get(k) and b.get(k)
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(json.dumps(out["ratios_2M_over_200k"]), file=sys.stderr)


if __name__ == "__main__":
    main()
