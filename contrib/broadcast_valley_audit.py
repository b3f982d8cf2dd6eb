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

# Parser + markers live in the package (operators/planning.py) so the
# regression pytest and this sweep can never drift apart (round-11 ask #6).
from kafka_clickhouse_example_spark.operators.planning import (  # noqa: E402
    VALLEY_MARKERS as MARKERS,
    broadcast_subtrees,
    valley_flags as flags_in_plan,
)


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
