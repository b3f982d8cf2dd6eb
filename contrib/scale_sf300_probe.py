"""Round-11 extension decade: sf300ctl = 3000 token-salted offset copies
of sf0.1 (15M docs) — one more controlled point past round 10's 5M-doc
sf100ctl, and the FIRST probe where the partition-sizing rule
(operators/planning.per_task_state_overflow, round-11 ask #5) is applied
PRESCRIPTIVELY before the run instead of diagnostically after a death:

1. generate the corpus (untimed; the salted bijection keeps cross-copy
   Jaccard exactly 0, so pair output stays linear in copies — device
   contract-pinned in tests/test_scale_corpus_control.py);
2. materialize the shingle memo untimed and COUNT it (the posting/array
   row count the rule needs is a cached-block count);
3. ask the rule for the shuffle-partition floor at this corpus size on
   this rig (16 GiB heap / 32 slots) for the SMJ sort-state shape —
   at 15M rows x ~700 B it must prescribe >32 (32 OOMed the 5M-doc
   audit in round 10) — set spark.sql.shuffle.partitions to the next
   power of two at-or-above 2x the floor (headroom per the rule's own
   guidance: measured-good configs sat 3-4x above the floor);
4. run the two SMJ-shape walls (dedup_minhash_lsh_pairs,
   dedup_split_leakage_audit) single-cold via bench._execute.

If both complete, the rule graduates from post-mortem arithmetic to a
working sizing procedure, and the controlled trend gains a 4th decade:
500k -> 1.5M -> 5M -> 15M docs.

Usage:
    PYTHONPATH=/root/repo python contrib/scale_sf300_probe.py \
        > contrib/scale_sf300_r11.json
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from kafka_clickhouse_example_spark.operators import planning as P
from kafka_clickhouse_example_spark.session import configure_runtime, get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf300ctl"
COPIES = 3000


def main() -> None:
    from contrib.scale_sf30_probe import _gen  # same generator, same device

    spark = get_spark(
        "scale-sf300-probe",
        cpus=32,
        driver_memory=os.environ.get("SCALE_DRIVER_MEM", "16g"),
    )
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")

    os.makedirs(DST, exist_ok=True)
    _gen(spark, DST, "documents", ["doc_id"], COPIES, salt_text=True)

    from kafka_clickhouse_example_spark.plans import queries_dedup
    from kafka_clickhouse_example_spark.registry import all_queries

    # Step 2: memo untimed + the row count the sizing rule consumes.
    t0 = time.perf_counter()
    n_docs = queries_dedup._shingled(spark, DST).count()
    memo_sec = round(time.perf_counter() - t0, 1)

    # Step 3: the rule, prescriptively.
    heap = P._jvm_max_heap_bytes(spark)
    slots = spark.sparkContext.defaultParallelism
    hit = P.per_task_state_overflow(
        n_docs,
        P.SHINGLE_ARRAY_ROW_BYTES,
        shuffle_partitions=int(spark.conf.get("spark.sql.shuffle.partitions")),
        heap_bytes=heap,
        task_slots=slots,
    )
    if hit:
        parts = 2 ** math.ceil(math.log2(2 * hit["partitions_floor"]))
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    else:
        parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    out: dict[str, object] = {
        "_protocol": f"sf300ctl = {COPIES} token-salted offset copies of "
        "sf0.1 (15M docs); single cold run per query via bench._execute; "
        "shingle memo pre-materialized untimed; local[32], driver 16g",
        "n_docs": n_docs,
        "memo_materialize_sec": memo_sec,
        "sizing_rule": {
            "heap_bytes": heap,
            "task_slots": slots,
            "overflow_at_default_32": hit,
            "prescribed_shuffle_partitions": parts,
            "note": "rule applied BEFORE the run (round-11 ask #5 "
            "prescriptive use): next power of two >= 2x the floor",
        },
        "provenance": bench._provenance(
            source="self-measured (contrib/scale_sf300_probe.py, round 11)"
        ),
    }
    print(json.dumps(out["sizing_rule"]), file=sys.stderr)

    queries = all_queries()
    for name in ("dedup_minhash_lsh_pairs", "dedup_split_leakage_audit"):
        free_gb = shutil.disk_usage("/tmp").free / 2**30
        fn = queries[name]
        try:
            t0 = time.perf_counter()
            bench._execute(fn(spark, DST))
            sec = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # record, never sink the probe
            out[name] = {"sec": -1.0, "rows": -1, "err": str(exc)[:300]}
            print(name, out[name], file=sys.stderr)
            continue
        # separate try: the count re-executes for the output size; its
        # failure must not discard the measured wall
        try:
            rows = fn(spark, DST).count()
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
