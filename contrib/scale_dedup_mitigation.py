"""The corpus_prep mitigation measured at sf10: exact dedup BEFORE pair
emitters.

The offset-copy sf10 corpus gives every document 99 exact copies, so the
pair-emitting dedup queries legitimately produce ~C(100,2)/C(10,2) = 110x
sf1's pairs — output-bound walls (SCALE.md round-6/7). The documented
100 TB mitigation is pipelines/corpus_prep.py's stage order: exact dedup
first collapses multiplicity to 1, and every downstream pair emitter sees
a dup-free corpus. This script measures that composed shape at sf10:

    load sf10 documents -> exact_duplicate_groups -> keep canonicals
    -> jaccard_pairs / containment / simhash over the survivors

Expected: survivor count ~= sf0.1's unique-doc count, pair walls back to
sf0.1-scale — the whole point of the stage order.

Round 9 adds the two GRAPH CONSUMERS (duplicate_clusters connected
components, pagerank_q30) over the survivors' pair graph — the last two
sf10 walls (16 GiB OOM on the raw pair graph, SCALE.md). Timing note:
both operators materialize every propagation round eagerly
(localCheckpoint inside the loop), so the measured wall covers the real
iterative work; the trailing count() only consumes the final labels —
count-pruning (the round-8 instrument bug) cannot hide work here.

Usage: PYTHONPATH=/root/repo python contrib/scale_dedup_mitigation.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import dedup as D
from kafka_clickhouse_example_spark.session import configure_runtime, get_spark
from kafka_clickhouse_example_spark.sources.catalog import load_table

SF10 = os.environ.get("SCALE_DIR", "/tmp/sf10")
THRESHOLD = 0.3


def main() -> None:
    spark = get_spark("scale-mitigation", cpus=32, driver_memory="16g")
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SF10, "documents").select("doc_id", "text")
    out: dict = {}

    t0 = time.perf_counter()
    canon = D.exact_duplicate_groups(docs).select(
        F.col("canonical_id").alias("doc_id")
    )
    survivors = docs.join(canon, "doc_id", "left_semi").localCheckpoint(eager=True)
    n_in, n_out = docs.count(), survivors.count()
    out["exact_dedup"] = {
        "sec": round(time.perf_counter() - t0, 3),
        "rows_in": n_in,
        "rows_out": n_out,
    }
    print("exact dedup:", out["exact_dedup"], file=sys.stderr)

    for name, fn in (
        ("jaccard_pairs", lambda d: D.jaccard_pairs(d, THRESHOLD)),
        ("containment_pairs", lambda d: D.containment_pairs(d, THRESHOLD)),
        ("simhash_pairs", lambda d: D.simhash_hamming_pairs(d)),
    ):
        try:
            t0 = time.perf_counter()
            rows = fn(survivors).count()
            out[name] = {"sec": round(time.perf_counter() - t0, 3), "rows": rows}
        except Exception as exc:
            out[name] = {"sec": -1.0, "err": str(exc)[:200]}
        print(name, out[name], file=sys.stderr)

    # Round-9 (round-8 verdict ask #1): the two GRAPH CONSUMERS of the
    # pair graph — the sf10 walls. On the RAW sf10 corpus both OOM at
    # 16 GiB because the shingle-pair graph is output-quadratic in
    # duplicate multiplicity (~25M dup-cluster edges before the first
    # iteration). Under the corpus_prep stage order (this script's whole
    # premise) they consume the post-exact-dedup pair graph instead —
    # measured here end-to-end: pair memo BUILD included above
    # (jaccard_pairs), then each consumer timed over a localCheckpointed
    # pair graph, mirroring queries_dedup's _jaccard_pairs_cached memo.
    def _heap_mb(jvm) -> int:
        rt = jvm.java.lang.Runtime.getRuntime()
        return int((rt.totalMemory() - rt.freeMemory()) / (1 << 20))

    from kafka_clickhouse_example_spark.operators.graph import pagerank_q30

    jvm = spark.sparkContext._jvm
    try:
        pairs = D.jaccard_pairs(survivors, THRESHOLD).localCheckpoint(eager=True)

        t0 = time.perf_counter()
        n_labels = D.duplicate_clusters(pairs).count()
        out["duplicate_clusters"] = {
            "sec": round(time.perf_counter() - t0, 3),
            "rows": n_labels,
            "driver_heap_used_mb": _heap_mb(jvm),
        }
        print("duplicate_clusters:", out["duplicate_clusters"], file=sys.stderr)

        edges = (
            pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
            .union(
                pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
            )
            .distinct()
        )
        t0 = time.perf_counter()
        n_ranked = pagerank_q30(edges, iters=3).count()
        out["pagerank_q30"] = {
            "sec": round(time.perf_counter() - t0, 3),
            "rows": n_ranked,
            "driver_heap_used_mb": _heap_mb(jvm),
        }
        print("pagerank_q30:", out["pagerank_q30"], file=sys.stderr)
    except Exception as exc:
        out["graph_consumers_err"] = str(exc)[:300]
        print("graph consumers FAILED:", str(exc)[:300], file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
