"""Per-query shuffle/spill profile over the whole registry.

Wall-clock (bench.py) says how long a query takes; it does not say WHY, or
whether the plan's data movement would survive a 100x scale-up. This tool
measures, for every registry query at $SPARK_GRAFT_SF_DIR:

  shuffle_write_bytes  bytes written to shuffle (the cross-node movement a
                       real cluster pays for — the 100 TB bottleneck metric)
  shuffle_read_bytes   bytes read back from shuffle
  mem/disk spill       nonzero spill means a partition outgrew its task
  input_bytes          reported for completeness; Spark's vectorized
                       parquet reader under-reports stage inputBytes, so
                       trust shuffle/spill, not this

Attribution is by jobId timeline, not job group: queries run sequentially,
and after each one a tiny marker job (job group `__end__<name>`) closes its
window — every job whose id precedes the marker belongs to the query. This
is thread-proof where jobGroup tagging is not: materialize_all and the
recall-report ladder submit jobs from pool threads, which do NOT inherit
the driver thread's thread-local job group and would otherwise go
unattributed. A stage reused by a later job (exchange reuse) is charged to
the job that executed it, never double-counted. The UI store's retention
is raised far above the run's job/stage count — the defaults (1000) evict
the earliest ~40 queries' metrics silently.

Usage: python contrib/shuffle_profile.py [query ...]   # default: all
Writes SHUFFLE_LOCAL.json and prints a top-movers table to stderr, one
JSON line (totals + top movers) to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
UI_PORT = os.environ.get("SPARK_GRAFT_UI_PORT", "4097")

STAGE_METRICS = (
    "inputBytes",
    "outputBytes",
    "shuffleWriteBytes",
    "shuffleReadBytes",
    "shuffleWriteRecords",
    "shuffleReadRecords",
    "memoryBytesSpilled",
    "diskBytesSpilled",
)

MARKER = "__end__"


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as resp:
        return json.load(resp)


def main() -> None:
    from kafka_clickhouse_example_spark.registry import all_queries
    from kafka_clickhouse_example_spark.session import configure_runtime, get_spark

    spark = get_spark(
        "kce-spark-shuffle-profile",
        cpus=CPUS,
        driver_memory="16g",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": UI_PORT,
            "spark.ui.retainedJobs": "100000",
            "spark.ui.retainedStages": "100000",
        },
    )
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    queries = all_queries()
    names = sys.argv[1:] or sorted(queries)
    for name in names:
        try:
            queries[name](spark, SF_DIR).count()
        except Exception as exc:
            print(f"shuffle_profile: {name} failed: {exc}", file=sys.stderr)
        # window-closing marker: everything up to this job belongs to `name`
        sc.setJobGroup(f"{MARKER}{name}", "profile window marker")
        spark.range(1).count()
        sc.setJobGroup("", "")

    base = sc.uiWebUrl
    appid = _api(base, "applications")[0]["id"]
    stages = {
        s["stageId"]: s
        for s in _api(base, f"applications/{appid}/stages")
        if s.get("status") in ("COMPLETE", "FAILED")
    }
    jobs = sorted(_api(base, f"applications/{appid}/jobs"), key=lambda j: j["jobId"])

    per_query: dict[str, dict[str, int]] = {}
    claimed: set[int] = set()
    # walk the timeline: jobs accumulate into `window` until their marker
    window: list[dict] = []
    for job in jobs:
        group = job.get("jobGroup") or ""
        if not group.startswith(MARKER):
            window.append(job)
            continue
        name = group[len(MARKER):]
        acc = per_query.setdefault(name, {m: 0 for m in STAGE_METRICS})
        for j in window:
            for sid in j["stageIds"]:
                if sid in claimed or sid not in stages:
                    continue
                claimed.add(sid)
                for m in STAGE_METRICS:
                    acc[m] += stages[sid].get(m, 0)
        window = []

    totals = {m: sum(q[m] for q in per_query.values()) for m in STAGE_METRICS}
    payload = {
        "sf_dir": SF_DIR,
        "queries_profiled": len(per_query),
        "totals": totals,
        "per_query": per_query,
    }
    Path(__file__).resolve().parent.parent.joinpath("SHUFFLE_LOCAL.json").write_text(
        json.dumps(payload, indent=1) + "\n"
    )

    movers = sorted(
        per_query.items(), key=lambda kv: -kv[1]["shuffleWriteBytes"]
    )[:15]
    print(
        f"{'query':44s} {'shufW':>10s} {'shufR':>10s} {'spill':>8s}",
        file=sys.stderr,
    )
    mb = 1024 * 1024
    for name, q in movers:
        spill = q["memoryBytesSpilled"] + q["diskBytesSpilled"]
        print(
            f"{name:44s} {q['shuffleWriteBytes']/mb:9.2f}M"
            f" {q['shuffleReadBytes']/mb:9.2f}M {spill/mb:7.1f}M",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "queries_profiled": len(per_query),
                "totals": totals,
                "top_shuffle_writers": {
                    n: q["shuffleWriteBytes"] for n, q in movers
                },
                "full": "SHUFFLE_LOCAL.json",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
