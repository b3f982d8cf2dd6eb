"""Round-11: measured scale points for the MATERIALIZED dedup-gate store
(operators/dedup_store.py + pipelines/ingest_dedup.gate_batch_served) —
completing the serving-store trilogy after the ANN index and the BM25
term index probes.

Corpora: raw /tmp/sf10 (500k docs) and /tmp/sf30 (1.5M) — offset copies,
so a 5,000-doc sf0.1-shaped batch is a WORST-CASE ingest batch: every
batch doc has ~copies exact duplicates in the corpus, exercising the
reject path at full fan-out.

Per scale, single cold timed runs after an untimed sf0.1 lifecycle
warm-up:
- build_dedup_store (the ONE corpus scan the pipeline ever pays);
- gate_batch_served: the 5,000-doc batch against the STORE — O(delta +
  column-pruned stored-key scan) per batch;
- gate_batch (live): same batch recomputing hashes + band keys over the
  whole corpus — the per-batch cost the store exists to amortize; the
  gap should widen with corpus size;
- update_dedup_store: land the batch, O(delta).

Usage:
    PYTHONPATH=/root/repo python contrib/scale_dedup_store_probe.py \
        contrib/scale_dedup_store_r11.json
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
from kafka_clickhouse_example_spark.operators import dedup_store as DS
from kafka_clickhouse_example_spark.pipelines import ingest_dedup as G
from kafka_clickhouse_example_spark.plans.queries_dedup import JACCARD_THRESHOLD
from kafka_clickhouse_example_spark.session import configure_runtime, get_spark
from kafka_clickhouse_example_spark.sources.catalog import load_table


def main() -> None:
    out_path = sys.argv[1]
    spark = get_spark(
        "scale-dedup-store-probe",
        cpus=32,
        driver_memory=os.environ.get("SCALE_DRIVER_MEM", "16g"),
    )
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, object] = {
        "_protocol": "raw offset-copy corpora (/tmp/sf10 500k docs, "
        "/tmp/sf30 1.5M); batch = the 5,000 sf0.1 docs with offset ids "
        "(worst case: ~copies exact dups per batch doc); single cold "
        "timed runs after an untimed sf0.1 lifecycle warm-up; "
        "local[32], driver 16g",
        "provenance": bench._provenance(
            source="self-measured (contrib/scale_dedup_store_probe.py, round 11)"
        ),
    }

    docs01 = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    batch = docs01.select(
        (F.col("doc_id") + F.lit(10**9)).alias("doc_id"), "text"
    ).localCheckpoint(eager=True)

    # untimed lifecycle warm-up (first Arrow kernel launch costs 2-3x)
    warm = "/tmp/dedupstore_warm"
    shutil.rmtree(warm, ignore_errors=True)
    DS.build_dedup_store(docs01, warm)
    G.gate_batch_served(batch, warm, JACCARD_THRESHOLD)[0].count()
    G.gate_batch(batch, docs01, JACCARD_THRESHOLD)[0].count()

    for label, sf_dir in (("sf10", "/tmp/sf10"), ("sf30", "/tmp/sf30")):
        corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        path = f"/tmp/dedupstore_{label}"
        shutil.rmtree(path, ignore_errors=True)
        res: dict[str, object] = {"n_docs": corpus.count()}

        t0 = time.perf_counter()
        DS.build_dedup_store(corpus, path)
        res["build_sec"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        survivors, rejects = G.gate_batch_served(
            batch, path, JACCARD_THRESHOLD
        )
        n_surv, n_rej = survivors.count(), rejects.count()
        res["gate_served_sec"] = round(time.perf_counter() - t0, 3)
        res["served_survivors"] = n_surv
        res["served_rejects"] = n_rej

        t0 = time.perf_counter()
        s_live, r_live = G.gate_batch(batch, corpus, JACCARD_THRESHOLD)
        n_surv_l, n_rej_l = s_live.count(), r_live.count()
        res["gate_live_sec"] = round(time.perf_counter() - t0, 3)
        res["live_survivors"] = n_surv_l
        res["live_rejects"] = n_rej_l
        res["parity"] = (n_surv == n_surv_l and n_rej == n_rej_l)

        t0 = time.perf_counter()
        DS.update_dedup_store(batch, path, "b1")
        res["update_store_sec"] = round(time.perf_counter() - t0, 3)

        out[label] = res
        print(label, res, file=sys.stderr)

    lo, hi = out["sf10"], out["sf30"]
    out["ratios_sf30_over_sf10"] = {
        k: round(hi[k] / lo[k], 2)
        for k in ("build_sec", "gate_served_sec", "gate_live_sec",
                  "update_store_sec")
        if lo.get(k) and hi.get(k)
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(json.dumps(out["ratios_sf30_over_sf10"]), file=sys.stderr)


if __name__ == "__main__":
    main()
