"""Audit: which registry queries does a `.count()` timing action UNDER-measure?

ARCHIVAL (round 9): this was the one-shot round-8 discovery instrument;
its output is frozen in COUNT_PLAN_AUDIT.json. The invariant it guarded
is now pinned in CI at registration granularity by
tests/test_plan_integrity.py, which asserts — for EVERY registry query,
against the plan the bench action ACTUALLY executed (SQL status store) —
that no prunable-class node of the query's own plan is lost, plus the
action-level pins in tests/test_bench_action.py. Keep this script for
re-running the historical count-vs-full comparison; nothing depends on
it operationally.

bench.py and contrib/scale_proof_docs.py historically timed each query with
`df.count()`. Catalyst's ColumnPruning + RemoveNoopOperators + EliminateSorts
rewrite the count plan: any deterministic computed column nobody downstream
consumes — a window with no rank filter, a map-only Arrow/text transform, the
final global sort — is deleted before execution. For such queries the "wall
time" was a parquet scan-count, not the query (discovered round 8 when
customer_order_running_total measured 0.22 s FLAT from sf0.1 to sf10 while
emitting 15M window rows).

This tool compiles, for every registry query, the physical plan of
(a) `df.groupBy().count()` (what the old timing action executed) and
(b) `df` itself (what a noop-sink write executes), counts the expensive
node classes in each, and flags every query where (a) lost nodes. No query
is executed; memo-building families still pay their pipeline-construction
cost, so run at a small SF.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python contrib/count_plan_audit.py
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Node classes whose disappearance under count() means the timed action
# skipped real query work. Sort is listed separately: EliminateSorts
# removing a FINAL orderBy is expected for count but the noop write pays
# it, so it is reported but tallied apart from the silent-prune classes.
PRUNABLE = (
    "Window",
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "Generate",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
)
# Caveat: heavy JVM expressions pruned out of a surviving Project node
# (e.g. a regexp chain whose output column count() never reads) change no
# node class and are invisible to this audit — the action fix catches
# them even though this report cannot enumerate them.
SORT = ("Sort",)
JOINS = ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin")


def _counts(plan: str, classes: tuple[str, ...]) -> dict[str, int]:
    return {c: len(re.findall(rf"\b{c}\b", plan)) for c in classes}


def main() -> None:
    from kafka_clickhouse_example_spark.registry import all_queries
    from kafka_clickhouse_example_spark.session import configure_runtime, get_spark

    spark = get_spark("count-plan-audit", cpus=8)
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    def plan_of(df) -> str:
        return df._jdf.queryExecution().explainString(mode)

    out: dict[str, dict] = {}
    flagged: list[str] = []
    for name, fn in sorted(all_queries().items()):
        try:
            df = fn(spark, SF_DIR)
            full = plan_of(df)
            cnt = plan_of(df.groupBy().count())
        except Exception as exc:  # construction failure: report, keep going
            out[name] = {"error": str(exc)[:160]}
            continue
        f_all = _counts(full, PRUNABLE + SORT + JOINS)
        c_all = _counts(cnt, PRUNABLE + SORT + JOINS)
        lost = {k: f_all[k] - c_all[k] for k in f_all if f_all[k] > c_all[k]}
        silent = {k: v for k, v in lost.items() if k in PRUNABLE}
        if lost:
            out[name] = {"lost_under_count": lost}
            if silent:
                flagged.append(name)
    summary = {
        "sf_dir": SF_DIR,
        "queries": len(all_queries()),
        "queries_losing_nodes_under_count": len(out),
        "silently_underplanned": sorted(flagged),
        "silently_underplanned_n": len(flagged),
        "per_query": out,
    }
    print(json.dumps(summary, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
