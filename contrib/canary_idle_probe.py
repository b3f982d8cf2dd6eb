"""Instrument validation for the interleaved segment canary.

Question: the full-sweep runs show intra-run segment-factor spreads of
1.3-1.4x — is that genuine host-speed variation, or does the canary's own
mark drift with JVM state accumulated by the sweep (heap growth, GC,
code-cache churn)? This probe measures the canary WITHOUT a sweep: after
the standard warm-up, it takes N marks (median-of-3 of the segment canary
query) separated by idle sleeps matching a segment's duration. If idle
marks hold spread ~1.0x, the sweep-time spread is real host/sweep-state
variation; if idle marks drift too, part of the spread is instrument.

Usage: PYTHONPATH=/root/repo python contrib/canary_idle_probe.py [N]
Prints one JSON line {"marks": [...], "spread": x, "idle_sec": s}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_clickhouse_example_spark.registry import all_queries
from kafka_clickhouse_example_spark.session import configure_runtime, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
IDLE_SEC = float(os.environ.get("CANARY_IDLE_SEC", "10"))


def main() -> None:
    n_marks = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    spark = get_spark("canary-idle-probe", cpus=32, driver_memory="16g")
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    queries = all_queries()
    fn = queries[bench.SEGMENT_CANARY]
    # bench._execute, not count(): the probe characterizes the canary
    # INSTRUMENT, so it must run the exact action the canary runs
    # (noop write since round 8 — count() timed a pruned plan)
    bench._execute(fn(spark, SF_DIR))  # warm
    marks = []
    for i in range(n_marks):
        times = []
        for _ in range(bench.SEGMENT_CANARY_RUNS):
            t0 = time.perf_counter()
            bench._execute(fn(spark, SF_DIR))
            times.append(time.perf_counter() - t0)
        marks.append(round(sorted(times)[len(times) // 2], 4))
        print(f"mark {i}: {marks[-1]}", file=sys.stderr)
        if i < n_marks - 1:
            time.sleep(IDLE_SEC)
    print(
        json.dumps(
            {
                "marks": marks,
                "spread": round(max(marks) / min(marks), 4),
                "idle_sec": IDLE_SEC,
                "ref_sec": bench.SEGMENT_REF_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
