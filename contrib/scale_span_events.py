"""Span-scaled events decade proof for the banded range join.

The offset-copy sf10 corpus (contrib/scale_proof_docs.py) keeps the
events table's TIME SPAN fixed while multiplying rows 100x, so in-band
density — and with it the banded range join's candidate volume
(rows x density) — grows QUADRATICALLY per decade: a generator artifact,
not an operator property (measured: the sf10-density run held one stage
at 240G candidate rows). A real 100x corpus covers ~100x the time at
comparable event rates, holding density constant, where the operator's
work is LINEAR in rows.

This script builds that realistic shape: /tmp/sf10span/events.parquet =
SCALE_COPIES time-shifted copies (event_id/user_id offset as usual, ts
shifted by copy_index * (span + 1h) so copies never share a band), then
measures events_recent_activity_count at sf0.1 vs the span-scaled sf10
with the bench protocol (warm + best-of-2). Expected: wall grows ~linearly
with rows because per-event in-band counts are unchanged.

Usage: PYTHONPATH=/root/repo python contrib/scale_span_events.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from kafka_clickhouse_example_spark.session import configure_runtime, get_spark
from kafka_clickhouse_example_spark.sources.catalog import load_table

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SCALE_SPAN_DIR", "/tmp/sf10span")
COPIES = int(os.environ.get("SCALE_COPIES", "100"))
HOUR_MS = 3_600_000


def _gen_span_events(spark) -> None:
    out = os.path.join(DST, "events.parquet")
    if os.path.exists(out):
        return
    base = load_table(spark, SRC, "events")
    lo, hi, id_span, uid_span = base.select(
        F.min(F.unix_millis("ts")),
        F.max(F.unix_millis("ts")),
        F.max("event_id") + 1,
        F.max("user_id") + 1,
    ).first()
    shift_ms = (hi - lo) + HOUR_MS  # +1 band width: copies never overlap a band
    copies = None
    for k in range(COPIES):
        c = base.select(
            (F.col("event_id") + k * id_span).alias("event_id"),
            F.timestamp_millis(F.unix_millis("ts") + k * shift_ms).alias("ts"),
            (F.col("user_id") + k * uid_span).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        copies = c if copies is None else copies.unionByName(c)
    copies.repartition(32).write.mode("overwrite").parquet(out)
    print(f"generated {out}", file=sys.stderr)


def main() -> None:
    spark = get_spark("scale-span", cpus=32, driver_memory="16g")
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    _gen_span_events(spark)

    from kafka_clickhouse_example_spark.registry import all_queries

    fn = all_queries()["events_recent_activity_count"]
    out = {}
    for sf_dir, label in [(SRC, "sf0.1"), (DST, "sf10span")]:
        rows = fn(spark, sf_dir).count()
        best = float("inf")
        # Timed runs use bench._execute — THE timed action, imported so
        # this sweep can never silently diverge from what bench.py times
        # (round-9 ADVICE; the round-8 inline copy was already identical,
        # but one definition beats two that merely agree today).
        for _ in range(2):
            t0 = time.perf_counter()
            bench._execute(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        out[f"{label}:events_recent_activity_count"] = {
            "sec": round(best, 3),
            "rows": rows,
        }
        print(label, round(best, 3), "s", rows, "rows", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
