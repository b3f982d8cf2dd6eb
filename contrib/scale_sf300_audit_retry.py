"""Round-11, sf300ctl split-leakage audit — third attempt, isolating the
scan-decode axis.

Attempt 1 (scale_sf300_r11.json): localCheckpoint memo starves execution
memory — both queries die in shuffle writers ("got 0", spill fails).
Attempt 2 (scale_sf300_retry_r11.json): parquet memo fixes minhash
(225.5 s / 767,690 pairs, linear output) but the audit dies decoding the
7.6 GB shingle-array parquet with 32 concurrent ~128 MB splits (Java
heap OOM + GCLocker retry warnings): decoded shingle-array batches are
several times their on-disk size, and the audit scans BOTH filtered
sides of the corpus in one stage wave where minhash's banding stage
projects the arrays away immediately.

This attempt turns down the one knob that governs that axis —
spark.sql.files.maxPartitionBytes 128m -> 32m (4x more, 4x smaller read
splits; same total work, quarter the per-task decode working set) — in a
fresh JVM, with the sizing rule's 1024 shuffle partitions. If it
completes, the scale story is: shuffle state is owned by
shuffle.partitions (the round's executable rule), scan-decode memory by
files.maxPartitionBytes, and both scale with the cluster, not the data.

Writes JSON straight to the output path (the JVM prints GC warnings on
stdout at this memory pressure, which polluted attempt 2's artifact).

Usage:
    PYTHONPATH=/root/repo python contrib/scale_sf300_audit_retry.py \
        contrib/scale_sf300_audit_r11.json
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

SH_PARQUET = "/tmp/sf300ctl/shingles.parquet"
MAX_PARTITION_BYTES = "33554432"  # 32m


def main() -> None:
    out_path = sys.argv[1]
    spark = get_spark(
        "scale-sf300-audit",
        cpus=32,
        driver_memory=os.environ.get("SCALE_DRIVER_MEM", "16g"),
    )
    configure_runtime(spark)
    spark.conf.set("spark.sql.files.maxPartitionBytes", MAX_PARTITION_BYTES)
    spark.sparkContext.setLogLevel("ERROR")

    sh = spark.read.parquet(SH_PARQUET)
    n_docs = sh.count()
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

    out: dict[str, object] = {
        "_protocol": "sf300ctl audit-only retry: fresh JVM, parquet memo, "
        f"files.maxPartitionBytes={MAX_PARTITION_BYTES} (32m), "
        f"shuffle.partitions={parts} (sizing rule), local[32], driver 16g",
        "n_docs": n_docs,
        "sizing_rule": {"overflow_at_default_32": hit,
                        "prescribed_shuffle_partitions": parts},
        "provenance": bench._provenance(
            source="self-measured (contrib/scale_sf300_audit_retry.py, round 11)"
        ),
    }

    b = SP.hash_bucket(F.col("doc_id"))

    def build():
        return D.incremental_minhash_pairs(
            None,
            None,
            JACCARD_THRESHOLD,
            new_shingles=sh.filter(b >= 90),
            corpus_shingles=sh.filter(b < 80),
            strategy="shuffle",
        )

    free_gb = shutil.disk_usage("/tmp").free / 2**30
    try:
        t0 = time.perf_counter()
        bench._execute(build())
        sec = round(time.perf_counter() - t0, 3)
    except Exception as exc:
        out["dedup_split_leakage_audit"] = {
            "sec": -1.0, "rows": -1, "err": str(exc)[:300],
        }
        json.dump(out, open(out_path, "w"), indent=1)
        print("FAILED", str(exc)[:200], file=sys.stderr)
        return
    try:
        rows = build().count()
    except Exception as exc:
        rows = -1
        out["count_err"] = str(exc)[:300]
    out["dedup_split_leakage_audit"] = {
        "sec": sec, "rows": rows, "disk_free_gb_before": round(free_gb, 1),
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print("audit", out["dedup_split_leakage_audit"], file=sys.stderr)


if __name__ == "__main__":
    main()
