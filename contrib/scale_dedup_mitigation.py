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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
