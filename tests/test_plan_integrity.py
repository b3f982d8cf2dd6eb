"""Registry-wide bench-action plan integrity (round-8 verdict ask #7).

contrib/count_plan_audit.py was the one-shot instrument that discovered
the count()-era under-measurement: Catalyst deleted windows / Arrow-UDF
projections / aggregates / final sorts that the timed action never read,
so 31 of 190 queries benched a parquet scan-count instead of the query.
The noop-write action fixed it, and tests/test_bench_action.py pins the
action-level property on the flagship query. This sweep pins it PER
REGISTERED QUERY, so a future registration whose plan collapses under
the bench action — or a Spark upgrade that starts pruning beneath V2
write commands — is caught at test time instead of seven rounds later:

for every registry query at sf0.001, the plan the noop write ACTUALLY
executed (SQL status store, final-plan section) must retain every
prunable-class node of the query's own physical plan, and a query whose
optimized logical plan ends in Sort must pay a top-of-plan physical sort.

Cost: one execution of each registry query at sf0.001 (~5 min total) —
which doubles as an every-query-executes-under-the-bench-action smoke.
"""

from __future__ import annotations

import re

import pytest

import bench
from kafka_clickhouse_example_spark.registry import all_queries

# If executed_plan cannot find the noop-write execution it falls back to
# the newest execution, which can be an inner UnionLoop iteration — an
# assertion against that plan would be an assertion against the WRONG
# plan. Escalate the fallback's warning to a hard failure here (round-10
# ADVICE): plan-honesty tests must never silently assert on a fallback.
pytestmark = pytest.mark.filterwarnings(
    "error::bench.PlanLookupWarning"
)

# Node classes Catalyst provably pruned under count() (the audit's list).
# Their counts are AQE-stable: runtime re-planning converts join
# strategies (which adds/removes SMJ Sorts — excluded here) but never
# drops windows, python evals, generates, or aggregates.
PRUNABLE = (
    "Window",
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "MapInArrow",  # printed bare in formatted plans, PythonMapInArrow in some modes
    "PythonMapInArrow",
    "FlatMapGroupsInPandas",
    "Generate",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
)


def _counts(plan: str) -> dict[str, int]:
    return {c: len(re.findall(rf"\b{c}\b", plan)) for c in PRUNABLE}


def _ends_in_sort(df) -> bool:
    """True when the optimized LOGICAL plan's root (descending through
    output-shaping unaries) is Sort — the node EliminateSorts would
    delete if it ever fired beneath the write command. Logical-level on
    purpose: physical Sort counts are polluted by SMJ/window sorts that
    AQE legitimately adds and removes."""
    node = df._jdf.queryExecution().optimizedPlan()
    while True:
        name = node.getClass().getSimpleName()
        if name in ("Project", "SubqueryAlias", "WithCTE"):
            node = node.children().apply(0)
            continue
        return name == "Sort"


@pytest.mark.slow
def test_every_registry_query_keeps_its_plan_under_the_bench_action(spark, sf_dir):
    simple = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    violations: list[str] = []
    for name, fn in sorted(all_queries().items()):
        try:
            df = fn(spark, sf_dir)  # construction re-enables AQE (configure_runtime)
            # AQE OFF for plan capture + execution: the defect class under
            # test is STATIC optimizer pruning beneath the write command
            # (what count() did, at every SF). With AQE on, runtime
            # re-optimization legitimately diverges from df's static plan
            # using actual statistics — exchange reuse executes a
            # self-join's Arrow kernel once, EmptyRelation propagation
            # swallows whole subtrees at this tiny SF, a 1-row shuffle
            # drops its sort — all real work-avoidance, none of it
            # action-induced, and all of it false-positives a static-vs-
            # final comparison (measured: 23 spurious flags at sf0.001).
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                want = _counts(df._jdf.queryExecution().explainString(simple))
                executed = bench.executed_plan(df)
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", "true")
            got = _counts(executed)
        except Exception as exc:  # noqa: BLE001 — collect, report all at once
            violations.append(f"{name}: failed to execute under bench action: {exc!r}"[:300])
            continue
        lost = {c: (want[c], got[c]) for c in PRUNABLE if got[c] < want[c]}
        if lost:
            violations.append(f"{name}: bench action lost nodes {lost}")
        if _ends_in_sort(df):
            # The declared final sort must sit at the top of the executed
            # plan (Sort, or TakeOrderedAndProject when a limit fused it).
            head = "\n".join(executed.splitlines()[:10])
            if not re.search(r"\bSort\b|\bTakeOrderedAndProject\b", head):
                violations.append(
                    f"{name}: final orderBy missing from executed plan head:\n{head}"
                )
    assert not violations, (
        f"{len(violations)} queries under-planned by the bench action:\n"
        + "\n".join(violations)
    )
