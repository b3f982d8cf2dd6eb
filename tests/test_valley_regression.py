"""Registry-wide broadcast-valley regression gate (round-11 ask #6).

The round-10 audit (contrib/broadcast_valley_audit.py) swept every
registered query's physical plan for BroadcastExchange subtrees carrying
expansion markers — Python UDF output, explode fan-out, localCheckpoint
memos — the shapes whose REAL size can outgrow the driver/broadcast caps
while Catalyst's estimate stays under the threshold (the class that
killed the minhash verify at 1.5M docs). All 25 flags it found were
human-triaged (artifact `_triage`: bounded-by-contract broadcasts and
skinny-tracking relations whose estimates follow rows).

That sweep ran once; a query added later could reintroduce a valley
broadcast silently. This test re-runs the sweep (sf0.001, AQE off so the
static planner's choice — the hazard itself — is what's inspected) and
fails on any flagged query NOT in the triaged allowlist. Verified at
round 11: the sf0.001 flag set is name-identical to the artifact's
sf0.01 set, so the allowlist needs no scale-specific extension.

A newly flagged query here is not necessarily wrong — it is UNTRIAGED.
Either restructure the plan (corpus_side / join elimination, see
operators/planning.py) or, if the broadcast side is bounded by contract,
document it and add the name to the artifact's triage + this allowlist.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

AUDIT_ARTIFACT = (
    Path(__file__).resolve().parent.parent
    / "contrib"
    / "broadcast_valley_audit_r10.json"
)


def _triaged_allowlist() -> set[str]:
    data = json.loads(AUDIT_ARTIFACT.read_text())
    names = {k for k in data if not k.startswith("_")}
    # every artifact flag must actually be triaged — a name present in the
    # flag map but absent from both triage buckets would make the
    # allowlist silently wider than the human review
    triage = data["_triage"]
    triaged_text = json.dumps(
        {k: v for k, v in triage.items() if not k.startswith("_")}
    )
    untriaged = {n for n in names if n.split(" ")[0] not in triaged_text}
    assert not untriaged, f"artifact flags never triaged: {sorted(untriaged)}"
    return names


_SYNTHETIC_PLAN = """AdaptiveSparkPlan isFinalPlan=false
+- BroadcastHashJoin [id#1L], [id#2L], Inner, BuildRight, false
   :- Filter isnotnull(id#1L)
   :  +- FileScan parquet [id#1L]
   +- BroadcastExchange HashedRelationBroadcastMode(List(input[0, bigint, false])), [plan_id=42]
      +- Generate explode(sh#9), [id#2L], false
         +- ArrowEvalPython [shingles(text#7)#8], [sh#9], 200
            +- Scan ExistingRDD[id#2L,text#7]
"""


def test_valley_parser_detects_the_hazard_shape():
    """Negative control: the gate must actually see the round-10 failure
    shape (broadcast over UDF->explode->memo), else an empty offender map
    proves nothing."""
    from kafka_clickhouse_example_spark.operators.planning import (
        broadcast_parent_joins,
        valley_flags,
    )

    flags = valley_flags(_SYNTHETIC_PLAN)
    assert len(flags) == 1
    assert set(flags[0]["markers"]) == {
        "ArrowEvalPython", "Generate", "Scan ExistingRDD",
    }
    # and the parent-join walker ties the exchange to its consuming join
    parents = broadcast_parent_joins(_SYNTHETIC_PLAN)
    assert parents == ["BroadcastHashJoin [id#1L], [id#2L], Inner, BuildRight, false"]
    # a plan whose only exchange is shuffle-side carries no flags
    assert valley_flags(_SYNTHETIC_PLAN.replace("BroadcastExchange", "Exchange hashpartitioning")) == []


@pytest.mark.slow
def test_no_new_valley_broadcasts(spark):
    from kafka_clickhouse_example_spark.operators.planning import valley_flags
    from kafka_clickhouse_example_spark.registry import all_queries

    allow = _triaged_allowlist()
    sf_dir = "/root/testdata/sf0.001"
    prior_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    offenders: dict[str, list] = {}
    errors: dict[str, str] = {}
    try:
        for name, fn in sorted(all_queries().items()):
            try:
                df = fn(spark, sf_dir)
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception as exc:  # construction must not break silently
                errors[name] = str(exc)[:200]
                continue
            flags = valley_flags(plan)
            if flags and name not in allow:
                offenders[name] = [f["markers"] for f in flags]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior_aqe)
    assert not errors, f"queries failed to construct: {errors}"
    assert not offenders, (
        "NEW broadcast-valley flags (untriaged — restructure the plan or "
        f"document bounded-by-contract and triage): {offenders}"
    )
