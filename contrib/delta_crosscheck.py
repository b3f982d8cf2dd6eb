"""Segment-factor cross-check for above-floor per-query bench deltas.

When bench_compare shows a per-query round-over-round ratio above the
~1.3x host-noise attribution floor (contrib/canary_idle_probe.py), the
protocol (SCALE.md, round-8 cross-check section) is one focused
re-measurement rather than a shrug: median-of-5 timed runs of the query
under interleaved median-of-3 canary marks, local factor = mean of the
bracketing canary medians over the frozen SEGMENT_REF_SEC, corrected
wall = median / factor. A delta that was host noise corrects back to the
old round's value (or below the floor); a code-attributable regression
survives the correction.

Round 8 ran this ad-hoc for the two r7 flags (commit 9c24ca7); this is
the same arithmetic as a reusable tool. Uses bench._execute (THE timed
action) and bench's canary query/reference so it can never diverge from
the instrument it cross-checks.

Usage: PYTHONPATH=/root/repo python contrib/delta_crosscheck.py q1 q2 ...
       PYTHONPATH=/root/repo python contrib/delta_crosscheck.py --streaming

--streaming (round-11 verdict ask #4) applies the identical protocol to
the streaming-spine headline: median-of-5 streaming_throughput runs
(each already warm-up + best-of-2 internally) under bracketing canary
marks; corrected rows/s = median_raw x factor (a slow host UNDERSTATES
rows/s, so the correction multiplies — same convention as bench.py's
streaming host_factor). The spine's single bench.py measurement is a
~1.4 s wall bracketed by one mark pair; this mode exists because that
resolution cannot adjudicate a round-over-round delta by itself.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
from kafka_clickhouse_example_spark.registry import all_queries
from kafka_clickhouse_example_spark.session import configure_runtime, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 5


def _mark(spark, queries) -> float:
    fn = queries[bench.SEGMENT_CANARY]
    times = []
    for _ in range(bench.SEGMENT_CANARY_RUNS):
        t0 = time.perf_counter()
        bench._execute(fn(spark, SF_DIR))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def _streaming_crosscheck(spark, queries) -> None:
    """Median-of-RUNS streaming-spine throughput under bracketing canary
    marks. Mirrors bench.py's normalization direction: rows/s on a slow
    host reads LOW, so corrected = median_raw * factor."""
    from kafka_clickhouse_example_spark.streaming.microbench import (
        streaming_throughput,
    )

    lo = _mark(spark, queries)
    results = []
    for _ in range(RUNS):
        results.append(streaming_throughput(spark, SF_DIR))
    hi = _mark(spark, queries)
    factor = ((lo + hi) / 2) / bench.SEGMENT_REF_SEC
    rates = sorted(r["rows_per_sec"] for r in results)
    med = statistics.median(rates)
    out = {
        "sf_dir": SF_DIR,
        "ref_sec": bench.SEGMENT_REF_SEC,
        "protocol": f"median-of-{RUNS} streaming_throughput (each warm-up + "
        f"best-of-2 internally) under bracketing median-of-"
        f"{bench.SEGMENT_CANARY_RUNS} canary marks; corrected = raw x factor",
        "provenance": bench._provenance(
            source="self-measured (contrib/delta_crosscheck.py --streaming)"
        ),
        "streaming": {
            "median_rows_per_sec": round(med, 1),
            "factor": round(factor, 4),
            "corrected_rows_per_sec": round(med * factor, 1),
            "rates": [round(r, 1) for r in rates],
            "walls": sorted(round(r["wall_sec"], 4) for r in results),
            "rows": results[0]["rows"],
        },
    }
    print("streaming", out["streaming"], file=sys.stderr)
    print(json.dumps(out))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit(
            "usage: delta_crosscheck.py QUERY [QUERY ...] | --streaming"
        )
    spark = get_spark("delta-crosscheck", cpus="32", driver_memory="16g")
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    bench._warm_up(spark, queries)
    if names == ["--streaming"]:
        _streaming_crosscheck(spark, queries)
        return

    out: dict = {
        "sf_dir": SF_DIR,
        "ref_sec": bench.SEGMENT_REF_SEC,
        "timed_action": bench.TIMED_ACTION,
        "protocol": f"median-of-{RUNS} under bracketing median-of-"
        f"{bench.SEGMENT_CANARY_RUNS} canary marks",
        "provenance": bench._provenance(
            source="self-measured (contrib/delta_crosscheck.py)"
        ),
    }
    lo = _mark(spark, queries)
    for name in names:
        fn = queries[name]
        bench._execute(fn(spark, SF_DIR))  # warm-up run
        walls = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            bench._execute(fn(spark, SF_DIR))
            walls.append(time.perf_counter() - t0)
        hi = _mark(spark, queries)
        factor = ((lo + hi) / 2) / bench.SEGMENT_REF_SEC
        med = statistics.median(walls)
        out[name] = {
            "median_sec": round(med, 4),
            "factor": round(factor, 4),
            "corrected_sec": round(med / factor, 4),
            "walls": [round(w, 4) for w in sorted(walls)],
        }
        print(name, out[name], file=sys.stderr)
        lo = hi  # next query's leading bracket
    print(json.dumps(out))


if __name__ == "__main__":
    main()
