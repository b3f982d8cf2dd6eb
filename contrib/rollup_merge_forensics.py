"""Round-10 forensics for the events_incremental_rollup_merge floor shift.

Round 9 proved the shift real (15-sample min 1.237 s exceeds every r8
reading, 0.64-0.81 s across three r8 sessions) and parked it with no
mechanism. The round-9 verdict (ask #2) demands the suspects be bisected
with EVIDENCE rather than eliminated by assertion:

- plan shape:   `capture` dumps the query's formatted physical plan (plan
                ids normalized); run once from this tree and once with
                PYTHONPATH pointing at an r8-commit worktree, then diff.
                (git already shows every file in the query's import
                closure byte-identical r8..r10 — the capture makes the
                consequence executable instead of inferred.)
- confs:        `capture` also dumps every session conf after
                configure_runtime, same double-run + diff.
- data:         `measure` fingerprints the sf0.1 parquet (md5 + pyarrow
                row-group/page metadata). The driver REGENERATES
                /root/testdata each round (mtime = container start), so
                the r8-era physical layout is unrecoverable — recording
                today's fingerprint makes the data axis checkable from
                round 11 on, and closes the "same data" assertion to the
                extent the evidence still exists.
- environment:  `measure` re-runs the round-9 protocol (15 warm samples
                under bracketing canary marks) a third measurement epoch
                later, plus a per-stage wall breakdown of one execution
                from the SQL status store — an overhead-dominated query
                (sf0.1 events is 2 MB; the wall is stage scheduling, not
                data) shifts with host scheduling latency, and the stage
                breakdown shows WHERE the floor sits.

Usage:
    PYTHONPATH=/root/repo       python contrib/rollup_merge_forensics.py capture
    PYTHONPATH=/tmp/r8tree      python contrib/rollup_merge_forensics.py capture
    PYTHONPATH=/root/repo       python contrib/rollup_merge_forensics.py measure
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import statistics
import sys
import time

# NOTE: resolve the package/bench from PYTHONPATH (the tree under test),
# NOT from this file's location — `capture` must work against the r8
# worktree's code.
import bench
from kafka_clickhouse_example_spark.registry import all_queries
from kafka_clickhouse_example_spark.session import configure_runtime, get_spark

QUERY = "events_incremental_rollup_merge"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 15


def _normalize_plan(plan: str) -> str:
    """Strip run-variant identifiers so two captures of the same logical
    plan compare byte-equal: plan/codegen/exchange ids, scan path hashes,
    statistics annotations."""
    plan = re.sub(r"#\d+", "#N", plan)
    plan = re.sub(r"\[plan_id=\d+\]", "[plan_id=N]", plan)
    plan = re.sub(r"\(\d+\)", "(N)", plan)
    plan = re.sub(r"wholestagecodegen_id=\d+", "wholestagecodegen_id=N", plan)
    plan = re.sub(r"subquery\d+", "subqueryN", plan)
    return plan


def _session():
    spark = get_spark("rollup-forensics", cpus="32", driver_memory="16g")
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def capture() -> None:
    spark = _session()
    fn = all_queries()[QUERY]
    df = fn(spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = _normalize_plan(df._jdf.queryExecution().explainString(mode))
    confs = dict(spark.sparkContext.getConf().getAll())
    # session-level SQL confs that matter to planning; getAll misses
    # runtime SET values
    for k in sorted(
        [
            "spark.sql.adaptive.enabled",
            "spark.sql.shuffle.partitions",
            "spark.sql.session.timeZone",
            "spark.sql.ansi.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.files.maxPartitionBytes",
            "spark.sql.execution.arrow.pyspark.enabled",
            "spark.sql.codegen.wholeStage",
            "spark.sql.legacy.parquet.nanosAsLong",
        ]
    ):
        try:
            confs[k] = spark.conf.get(k)
        except Exception:
            confs[k] = None
    # drop run-variant driver confs (ports, app ids, dirs)
    for k in list(confs):
        if any(t in k for t in ("app.id", "app.startTime", "driver.port", "driver.host", "app.name")):
            confs.pop(k)
    print(json.dumps({"tree": sys.path[0] if sys.path else "?",
                      "plan": plan, "confs": confs}, sort_keys=True))


def _fingerprints() -> dict:
    import pyarrow.parquet as pq

    out = {}
    for name in sorted(os.listdir(SF_DIR)):
        if not name.endswith(".parquet"):
            continue
        p = os.path.join(SF_DIR, name)
        md5 = hashlib.md5(open(p, "rb").read()).hexdigest()
        meta = pq.ParquetFile(p).metadata
        out[name] = {
            "md5": md5,
            "bytes": os.path.getsize(p),
            "mtime_utc": time.strftime(
                "%Y-%m-%dT%H:%M:%S", time.gmtime(os.path.getmtime(p))
            ),
            "num_rows": meta.num_rows,
            "num_row_groups": meta.num_row_groups,
            "created_by": str(meta.created_by),
        }
    return out


def _stage_breakdown(spark, fn) -> list[dict]:
    """Per-stage wall of ONE noop-write execution, from the status store."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm

    def _stages():
        # AppStatusStore.stageList(statuses, details, withSummaries,
        # unsortedQuantiles, taskStatus) — empty statuses = all stages
        empty = jvm.java.util.ArrayList()
        quantiles = sc._gateway.new_array(jvm.double, 0)
        return _as_list(
            store.stageList(empty, False, False, quantiles, jvm.java.util.ArrayList())
        )

    before = {s.stageId() for s in _stages()}
    bench._execute(fn(spark, SF_DIR))
    sc._jsc.sc().listenerBus().waitUntilEmpty()
    stages = []
    for s in _stages():
        if s.stageId() in before:
            continue
        sub = s.submissionTime()
        comp = s.completionTime()
        dur = None
        if sub.isDefined() and comp.isDefined():
            dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        stages.append(
            {
                "stage": s.stageId(),
                "name": str(s.name()).split("\n")[0][:80],
                "tasks": s.numCompleteTasks(),
                "wall_sec": dur,
            }
        )
    return sorted(stages, key=lambda x: -(x["wall_sec"] or 0))


def _as_list(scala_seq):
    it = scala_seq.iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


def measure() -> None:
    spark = _session()
    queries = all_queries()
    fn = queries[QUERY]
    bench._warm_up(spark, queries)

    def mark() -> float:
        cfn = queries[bench.SEGMENT_CANARY]
        times = []
        for _ in range(bench.SEGMENT_CANARY_RUNS):
            t0 = time.perf_counter()
            bench._execute(cfn(spark, SF_DIR))
            times.append(time.perf_counter() - t0)
        return statistics.median(times)

    bench._execute(fn(spark, SF_DIR))  # warm
    lo = mark()
    walls = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        bench._execute(fn(spark, SF_DIR))
        walls.append(time.perf_counter() - t0)
    hi = mark()
    factor = ((lo + hi) / 2) / bench.SEGMENT_REF_SEC
    walls.sort()
    out = {
        "query": QUERY,
        "n": RUNS,
        "min": round(walls[0], 4),
        "p50": round(statistics.median(walls), 4),
        "max": round(walls[-1], 4),
        "factor": round(factor, 4),
        "min_corrected": round(walls[0] / factor, 4),
        "p50_corrected": round(statistics.median(walls) / factor, 4),
        "walls": [round(w, 4) for w in walls],
        "ref_sec": bench.SEGMENT_REF_SEC,
        "timed_action": bench.TIMED_ACTION,
        "stage_breakdown_one_run": _stage_breakdown(spark, fn),
        "data_fingerprints": _fingerprints(),
        "provenance": bench._provenance(
            source="self-measured (contrib/rollup_merge_forensics.py, round 10)"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    {"capture": capture, "measure": measure}[sys.argv[1]]()
