"""Round-11 sf300ctl retry: parquet-backed shingle memo (the production
shape) after the localCheckpoint memo killed the first attempt.

What the first probe (contrib/scale_sf300_r11.json) found at 15M docs:
the sizing rule correctly prescribed 1024 shuffle partitions (per-task
SMJ state 328 MB at 32 parts vs the 40 MB bound), but BOTH queries still
died — `UNABLE_TO_ACQUIRE_MEMORY ... got 0` inside ShuffleExternalSorter
*write* paths, with spill() itself failing. That signature is NOT the
per-task sort/hash state class partitions can fix: the _shingled memo is
a `localCheckpoint` whose ~15M deserialized shingle-array rows (>heap at
this scale) sit in the unified pool's storage region; storage at/below
spark.memory.storageFraction cannot be evicted by execution, so 32
concurrent shuffle writers starve no matter how many partitions the
shuffle has. A NEW wall class, one decade past where the memo shape is
fine (sf100ctl's 5M-doc memo fit and both queries completed).

The fix is the shape the engine already ships for production
(operators/dedup_store.py materializes shingles to parquet at ingest):
write the (doc_id, sh) relation to parquet ONCE, read it back — zero
storage-pool footprint, columnar-compressed scans, and the memo becomes
a table other jobs share. This retry runs the same two queries off the
parquet memo with the rule-prescribed partitions.

Usage:
    PYTHONPATH=/root/repo python contrib/scale_sf300_retry.py \
        > contrib/scale_sf300_retry_r11.json
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from kafka_clickhouse_example_spark.operators import dedup as D
from kafka_clickhouse_example_spark.operators import planning as P
from kafka_clickhouse_example_spark.operators import sampling as SP
from kafka_clickhouse_example_spark.plans.queries_dedup import JACCARD_THRESHOLD
from kafka_clickhouse_example_spark.session import configure_runtime, get_spark
from kafka_clickhouse_example_spark.sources.catalog import load_table

DST = "/tmp/sf300ctl"
SH_PARQUET = f"{DST}/shingles.parquet"


def main() -> None:
    spark = get_spark(
        "scale-sf300-retry",
        cpus=32,
        driver_memory=os.environ.get("SCALE_DRIVER_MEM", "16g"),
    )
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, object] = {
        "_protocol": "same 15M-doc sf300ctl corpus as scale_sf300_r11.json; "
        "shingle memo materialized to PARQUET (untimed, wall recorded) "
        "instead of localCheckpoint; single cold run per query via "
        "bench._execute; local[32], driver 16g",
        "provenance": bench._provenance(
            source="self-measured (contrib/scale_sf300_retry.py, round 11)"
        ),
    }

    t0 = time.perf_counter()
    if not os.path.exists(SH_PARQUET):
        docs = load_table(spark, DST, "documents").select("doc_id", "text")
        D.with_shingles(docs).write.mode("overwrite").parquet(SH_PARQUET)
    out["memo_parquet_sec"] = round(time.perf_counter() - t0, 1)
    sh = spark.read.parquet(SH_PARQUET)
    n_docs = sh.count()
    out["n_docs"] = n_docs
    out["memo_parquet_gb"] = round(
        sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(SH_PARQUET)
            for f in fs
        )
        / 2**30,
        2,
    )

    hit = P.per_task_state_overflow(
        n_docs,
        P.SHINGLE_ARRAY_ROW_BYTES,
        shuffle_partitions=int(spark.conf.get("spark.sql.shuffle.partitions")),
        heap_bytes=P._jvm_max_heap_bytes(spark),
        task_slots=spark.sparkContext.defaultParallelism,
    )
    parts = (
        2 ** math.ceil(math.log2(2 * hit["partitions_floor"]))
        if hit
        else int(spark.conf.get("spark.sql.shuffle.partitions"))
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    out["sizing_rule"] = {
        "overflow_at_default_32": hit,
        "prescribed_shuffle_partitions": parts,
    }
    print(json.dumps(out["sizing_rule"]), file=sys.stderr)

    b = SP.hash_bucket(F.col("doc_id"))
    runs = {
        "dedup_minhash_lsh_pairs": lambda: D.minhash_lsh_pairs(
            None, JACCARD_THRESHOLD, shingles=sh
        ),
        "dedup_split_leakage_audit": lambda: D.incremental_minhash_pairs(
            None,
            None,
            JACCARD_THRESHOLD,
            new_shingles=sh.filter(b >= 90),
            corpus_shingles=sh.filter(b < 80),
            strategy="shuffle",
        ),
    }
    for name, build in runs.items():
        free_gb = shutil.disk_usage("/tmp").free / 2**30
        try:
            t0 = time.perf_counter()
            bench._execute(build())
            sec = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            out[name] = {"sec": -1.0, "rows": -1, "err": str(exc)[:300]}
            print(name, out[name], file=sys.stderr)
            continue
        # separate try: the count is a RE-execution for the output size;
        # its failure must not discard the measured wall (the first probe
        # lost minhash's timed number exactly this way)
        try:
            rows = build().count()
        except Exception as exc:
            rows = -1
            out[name + "_count_err"] = str(exc)[:300]
        out[name] = {
            "sec": sec,
            "rows": rows,
            "disk_free_gb_before": round(free_gb, 1),
        }
        print(name, out[name], file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
