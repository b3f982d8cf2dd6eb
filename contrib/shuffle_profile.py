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
the job that executed it, never double-counted; for a retried stage only
the highest COMPLETE attempt counts (a FAILED attempt's partial movement
is wasted work, and counting it would make per-query numbers
non-deterministic under task retries). The UI store's retention is raised
far above the run's job/stage count — the defaults (1000) evict the
earliest ~40 queries' metrics silently.

Attribution caveat for memo-building families (dedup/flows/similarity):
per-session localCheckpoint memos charge the build cost to the
alphabetically-first consumer (e.g. dedup_candidates_editdist carries the
shingle/pair-graph build; later dedup queries read the memo for ~free),
and a single-query argv run therefore measures MORE movement for that
query than the full-registry run does. The JSON carries this note.

Usage: python contrib/shuffle_profile.py [query ...]   # default: all
Full-registry runs at the default sf0.1 write the committed artifact
SHUFFLE_LOCAL.json; any other SF or an argv subset writes
SHUFFLE_<sf>[_partial].json instead so a diagnostic run can never
silently clobber the published 190-query profile. Prints a top-movers
table to stderr, one JSON line (totals + top movers) to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402 — the ONE timed-action definition

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
    failed: dict[str, str] = {}
    for name in names:
        try:
            # bench._execute — THE timed action, imported rather than
            # re-implemented so the profile can never silently diverge
            # from what bench.py times (round-9 ADVICE). count() let
            # Catalyst prune unreferenced windows/UDF projections/final
            # sorts AND their shuffles out of the measured plan — e.g.
            # customer_order_running_total profiled 59 shuffle bytes
            # (1 record) when the real query exchanges every order row
            # for its window (contrib/count_plan_audit.py).
            bench._execute(queries[name](spark, SF_DIR))
        except Exception as exc:
            failed[name] = str(exc)[:200]
            print(f"shuffle_profile: {name} failed: {exc}", file=sys.stderr)
        # window-closing marker: everything up to this job belongs to `name`
        sc.setJobGroup(f"{MARKER}{name}", "profile window marker")
        spark.range(1).count()
        sc.setJobGroup("", "")

    base = sc.uiWebUrl
    appid = _api(base, "applications")[0]["id"]
    # keep only the newest COMPLETE attempt per stage: FAILED attempts are
    # wasted movement and counting them is retry-nondeterministic
    stages: dict[int, dict] = {}
    for s in _api(base, f"applications/{appid}/stages"):
        if s.get("status") != "COMPLETE":
            continue
        cur = stages.get(s["stageId"])
        if cur is None or s.get("attemptId", 0) > cur.get("attemptId", 0):
            stages[s["stageId"]] = s
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

    for name, err in failed.items():
        # a failed query's window still holds the jobs that ran before the
        # crash — mark it so the partial metrics are never read as a clean
        # low-shuffle run
        per_query.setdefault(name, {m: 0 for m in STAGE_METRICS})["failed"] = err

    totals = {m: sum(q[m] for q in per_query.values()) for m in STAGE_METRICS}
    from bench import _provenance

    payload = {
        "provenance": _provenance(
            source="self-measured (contrib/shuffle_profile.py)",
            authoritative="driver-archived BENCH_r{N}.json (wall times only; "
            "the driver records no shuffle profile — this artifact is the "
            "only source for it and is self-measured)",
        ),
        "sf_dir": SF_DIR,
        "timed_action": f"{bench.TIMED_ACTION} via bench._execute (round 8+; earlier profiles ran count())",
        "queries_profiled": len(per_query),
        "queries_failed": sorted(failed),
        "note": (
            "memo-building families charge the shared build to their "
            "alphabetically-first consumer; see module docstring"
        ),
        "totals": totals,
        "per_query": per_query,
    }
    sf_label = os.path.basename(SF_DIR.rstrip("/"))
    is_canonical = not sys.argv[1:] and sf_label == "sf0.1"
    out_name = (
        "SHUFFLE_LOCAL.json"
        if is_canonical
        else f"SHUFFLE_{sf_label}{'_partial' if sys.argv[1:] else ''}.json"
    )
    Path(__file__).resolve().parent.parent.joinpath(out_name).write_text(
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
                "queries_failed": sorted(failed),
                "top_shuffle_writers": {
                    n: q["shuffleWriteBytes"] for n, q in movers
                },
                "full": out_name,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
