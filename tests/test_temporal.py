"""As-of join and banded range join: edge semantics + plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, 0)


def test_asof_join_edge_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(1)), (3, 10, _ts(7)), (4, 20, _ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(2)), (10, _ts(5)), (30, _ts(0))],
        "user_id long, ts timestamp",
    )
    out = {
        r["event_id"]: r["ts_asof"]
        for r in asof_join(left, right, key="user_id").collect()
    }
    assert out[1] == _ts(5)  # same-instant right row IS included
    assert out[2] is None  # left row precedes every right row -> NULL
    assert out[3] == _ts(5)  # latest at-or-before wins
    assert out[4] is None  # key with no right rows at all


def test_asof_join_no_nested_loop(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame([(10, _ts(2))], "user_id long, ts timestamp")
    plan = (
        asof_join(left, right, key="user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan, f"as-of join degraded to a nested loop:\n{plan[:1500]}"
    assert "Join" not in plan  # union+window form: no join operator at all


def test_range_join_binned_counts(spark):
    def sec(s: int) -> dt.datetime:
        return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)

    # band 60_000 ms = 1 minute, half-open (t-60s, t]: an exactly-60s-older
    # point is OUT (strict >), a 50s-older one is IN; crossing a bin
    # boundary (30s vs 80s sit in different bins) must still match.
    pts = spark.createDataFrame(
        [(1, sec(0)), (2, sec(30)), (3, sec(80)), (4, sec(140)), (5, sec(1000))],
        "event_id long, ts timestamp",
    )
    out = {
        r["event_id"]: r["n_in_band"]
        for r in range_join_binned(pts, 60_000).collect()
    }
    # 3 @80s: band (20,80] -> {30,80}; 4 @140s: band (80,140] -> exactly-60s
    # older point 80 excluded -> {140}.
    assert out == {1: 1, 2: 2, 3: 2, 4: 1, 5: 1}


def test_range_join_matches_naive(spark, sf_dir):
    from kafka_clickhouse_example_spark.sources.catalog import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "ts").limit(500)
    events = events.localCheckpoint(eager=True)
    fast = {
        (r["event_id"], r["n_in_band"])
        for r in range_join_binned(events, 3_600_000).collect()
    }
    a, b = events.alias("a"), events.alias("b")
    naive = {
        (r["event_id"], r["n"])
        for r in a.join(
            b,
            (F.unix_millis(F.col("b.ts")) > F.unix_millis(F.col("a.ts")) - 3_600_000)
            & (F.unix_millis(F.col("b.ts")) <= F.unix_millis(F.col("a.ts"))),
        )
        .groupBy(F.col("a.event_id").alias("event_id"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert fast == naive


def test_asof_join_matches_naive_on_random_data(spark):
    # Seeded adversarial fixture: duplicate keys, duplicate timestamps,
    # keys missing from either side. Naive spec: per left row, the max
    # right.ts <= left.ts for the key (theta-join + groupBy) — exactly what
    # the union+window plan must reproduce.
    import random

    rng = random.Random(42)
    left = spark.createDataFrame(
        [(i, rng.randrange(12), _ts(rng.randrange(60))) for i in range(300)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(rng.randrange(14), _ts(rng.randrange(60))) for _ in range(200)],
        "user_id long, ts timestamp",
    )
    got = {
        r["event_id"]: r["ts_asof"]
        for r in asof_join(left, right, key="user_id").collect()
    }
    l, r = left.alias("l"), right.alias("r")
    naive_rows = (
        l.join(
            r,
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") <= F.col("l.ts")),
            "left",
        )
        .groupBy("event_id")
        .agg(F.max("r.ts").alias("want"))
        .collect()
    )
    want = {row["event_id"]: row["want"] for row in naive_rows}
    assert got == want


class TestScd2Intervals:
    def test_runs_collapse_and_bounds_chain(self, spark):
        """Consecutive equal values collapse into one interval; intervals
        chain exactly (valid_to == next valid_from); NULL attr is a
        distinct state, not a crash."""
        from datetime import datetime

        from kafka_clickhouse_example_spark.operators.temporal import scd2_intervals

        t = lambda s: datetime(2024, 1, s)
        rows = [
            (1, 1, t(1), "a"),
            (1, 2, t(2), "a"),   # same run: collapses
            (1, 3, t(3), "b"),
            (1, 4, t(4), None),  # NULL state
            (1, 5, t(5), None),  # same NULL run: collapses
            (1, 6, t(6), "a"),   # back to a: NEW version, not merged
            (2, 7, t(1), "x"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, event_type string"
        )
        got = scd2_intervals(
            df, ["user_id"], "event_type", "ts", tiebreak_cols=["event_id"]
        ).collect()
        u1 = sorted((r for r in got if r.user_id == 1), key=lambda r: r.version_no)
        assert [r.event_type for r in u1] == ["a", "b", None, "a"]
        assert [r.version_no for r in u1] == [1, 2, 3, 4]
        for prev, nxt in zip(u1, u1[1:]):
            assert prev.valid_to == nxt.valid_from
        assert u1[-1].is_current and u1[-1].valid_to is None
        assert all(not r.is_current for r in u1[:-1])
        u2 = [r for r in got if r.user_id == 2]
        assert len(u2) == 1 and u2[0].is_current

    def test_single_exchange_plan(self, spark):
        """Both windows must share one partitioning: exactly one shuffle
        Exchange in the whole build (scale contract of the docstring)."""
        from kafka_clickhouse_example_spark.operators.temporal import scd2_intervals

        df = spark.createDataFrame(
            [(1, 1, None, "a")],
            "user_id long, event_id long, ts timestamp, event_type string",
        )
        plan = (
            scd2_intervals(df, ["user_id"], "event_type", "ts", ["event_id"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re

        shuffles = len(re.findall(r"Exchange hashpartitioning", plan))
        assert shuffles == 1, plan


def test_pit_state_never_leaks_future(spark, sf_dir):
    """Feature-store law: every resolved state must begin AT OR BEFORE the
    purchase ts (no future leakage), and purchases with no prior state get
    NULLs, not a later interval."""
    from kafka_clickhouse_example_spark.plans.queries_temporal import (
        events_pit_state_at_purchase,
    )

    rows = events_pit_state_at_purchase(spark, sf_dir).collect()
    assert rows
    with_state = [r for r in rows if r.state_at_ts is not None]
    assert with_state, "no purchase resolved a state at this SF"
    for r in with_state:
        assert r.state_since <= r.ts
        assert r.state_version >= 1
    for r in rows:
        if r.state_at_ts is None:
            assert r.state_since is None and r.state_version is None


def test_pit_tied_timestamp_changes_resolve_deterministically(spark):
    """Two state changes at the same (user, ts): the first becomes a
    zero-length interval. The PIT composition drops zero-length intervals,
    so valid_from is unique per user and the as-of resolve is deterministic
    — the state at ts is the change that actually survived the instant."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from kafka_clickhouse_example_spark.operators.temporal import (
        asof_join,
        scd2_intervals,
    )

    t = lambda s: datetime(2024, 1, s)
    changes = spark.createDataFrame(
        [(1, 1, t(1), "a"), (1, 2, t(2), "b"), (1, 3, t(2), "c")],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    hist = scd2_intervals(
        changes, ["user_id"], "event_type", "ts", tiebreak_cols=["event_id"]
    )
    # the tied pair produced a zero-length 'b' interval
    zero = [r for r in hist.collect() if r.valid_to == r.valid_from]
    assert [r.event_type for r in zero] == ["b"]
    lively = hist.filter(
        F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from"))
    ).select("user_id", "version_no", "event_type", "valid_from")
    froms = [r.valid_from for r in lively.collect()]
    assert len(froms) == len(set(froms)), "valid_from must be unique after the drop"
    facts = spark.createDataFrame(
        [(10, 1, t(2)), (11, 1, t(3))], "event_id long, user_id long, ts timestamp"
    )
    got = {
        r.event_id: r.event_type_asof
        for r in asof_join(
            facts, lively, key="user_id", left_ts="ts", right_ts="valid_from",
            right_payload=["event_type"],
        ).collect()
    }
    assert got == {10: "c", 11: "c"}


def test_scd2_null_ts_does_not_fake_a_change(spark):
    """A NULL-ts row sorts first; its successor must NOT be flagged as a
    first row — same-value successors collapse into the run."""
    from datetime import datetime

    from kafka_clickhouse_example_spark.operators.temporal import scd2_intervals

    rows = [(1, 1, None, "a"), (1, 2, datetime(2024, 1, 2), "a"),
            (1, 3, datetime(2024, 1, 3), "b")]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = sorted(
        scd2_intervals(df, ["user_id"], "event_type", "ts", ["event_id"]).collect(),
        key=lambda r: r.version_no,
    )
    # 'a' run (NULL-ts head + same-value successor) is ONE interval
    assert [r.event_type for r in got] == ["a", "b"]
    assert got[0].valid_from is None and got[0].valid_to == datetime(2024, 1, 3)
