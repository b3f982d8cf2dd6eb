"""Registry-wide broadcast-valley audit (round 10).

The round-10 probe established the failure criterion for Catalyst's
static broadcast choice: a join side whose REAL materialized size can
outgrow the driver/broadcast caps while its size ESTIMATE stays under
the autoBroadcastJoinThreshold — which happens when a UDF / explode /
memoized-RDD boundary widens rows invisibly (real/estimate ~16-128x; the
minhash shingle-array verify died exactly there at 1.5M docs), and does
NOT happen for relations whose bytes-on-disk track their rows (the
embeddings bucket join, the KL vocabulary aggregate — see SCALE.md
"valley criterion").

This audit makes the criterion executable over the whole registry: for
every query's physical plan, every BroadcastExchange subtree is scanned
for expansion markers — ArrowEvalPython / BatchEvalPython (Python UDF
output width unknown to Catalyst), Generate (explode fan-out), and
Scan ExistingRDD (localCheckpoint memo whose estimate is inherited, not
re-measured). A broadcast whose subtree carries a marker is a FLAG for
human triage: either the relation is bounded by contract (an explicit
F.broadcast of a delta/eval-set/top-k — document it) or it is the next
sf30-class wall.

Usage:
    PYTHONPATH=/root/repo python contrib/broadcast_valley_audit.py \
        > contrib/broadcast_valley_audit_r10.json

Plans are taken at $SPARK_GRAFT_SF_DIR (default sf0.01) WITHOUT running
the queries (construction only — memo families do execute their eager
localCheckpoints). The static plan is the right surface here: the
hazard IS the static planner's choice; AQE re-planning at runtime can
only replace broadcasts, not introduce the cap-killing ones this hunts.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKERS = ("ArrowEvalPython", "BatchEvalPython", "Generate ", "Scan ExistingRDD")


def _indent(line: str) -> int:
    """Tree-string indentation depth: count chars before the node name
    (toString uses ':'/'+- '/'   ' prefixes; the first alpha char of the
    operator name marks the depth)."""
    for i, ch in enumerate(line):
        if ch.isalpha() and line[i : i + 2] != "- ":
            return i
    return len(line)


def broadcast_subtrees(plan: str) -> list[str]:
    """Return the subtree text of every BroadcastExchange node in a
    physical-plan tree string (lines deeper-indented than the node)."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        depth = _indent(line)
        sub = [line]
        for nxt in lines[i + 1 :]:
            if not nxt.strip():
                break
            if _indent(nxt) <= depth:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


def flags_in_plan(plan: str) -> list[dict]:
    found = []
    for sub in broadcast_subtrees(plan):
        hit = [m.strip() for m in MARKERS if m in sub]
        if hit:
            head = sub.splitlines()
            # first two operators under the exchange identify the relation
            found.append({"markers": hit, "subtree_head": head[: min(4, len(head))]})
    return found


def main() -> None:
    from kafka_clickhouse_example_spark.registry import all_queries
    from kafka_clickhouse_example_spark.session import configure_runtime, get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("broadcast-valley-audit", cpus=8, driver_memory="8g")
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, object] = {}
    n_flagged = 0
    for name, fn in sorted(all_queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            flags = flags_in_plan(plan)
            if flags:
                n_flagged += 1
                out[name] = flags
                print(name, "FLAG", [f["markers"] for f in flags], file=sys.stderr)
        except Exception as exc:
            out[name] = {"err": str(exc)[:200]}
            print(name, "ERR", str(exc)[:120], file=sys.stderr)
    out["_summary"] = {
        "queries_scanned": len(all_queries()),
        "flagged": n_flagged,
        "sf_dir": sf_dir,
        "markers": list(MARKERS),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
