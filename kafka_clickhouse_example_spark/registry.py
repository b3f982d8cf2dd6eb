"""Query registry: the single source of truth for the engine's query surface.

Every operator/query claimed in SURVEY.md §2 registers here as
(spark_callable, oracle_sql) so the driver's correctness gate — and our own
``tests/test_oracle_parity.py`` — compare the Spark plan against DuckDB on
identical parquet inputs.

Conventions (driver contract, see /root/repo/__spark_entry__.py):
- callable signature: (spark, sf_dir) -> DataFrame
- every computed column aliased identically in Spark and SQL
- deterministic results: total ORDER BY before any LIMIT; doubles rounded;
  money-like aggregates in DECIMAL so sums are order-independent and exact.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query (and its DuckDB oracle SQL, if
    SQL-expressible)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for side effects: each module registers its queries. Imports
    # must RAISE on failure — a swallowed ImportError would silently remove
    # a whole query family from the driver's gate (reported as "missing"
    # instead of "broken"), which is strictly worse than failing loudly.
    from kafka_clickhouse_example_spark.plans import (  # noqa: F401
        queries_analytics,
        queries_behavior,
        queries_corpus,
        queries_dedup,
        queries_diagnostics,
        queries_flows,
        queries_multimodal,
        queries_pii,
        queries_sampling,
        queries_similarity,
        queries_temporal,
        queries_text,
        queries_timeseries,
        queries_tpch_extra,
    )


_loaded = False


def _green_tiers(root: Path | None = None) -> tuple[set[str], set[str]]:
    """(hash_green, rows_only_green) from the driver CORRECTNESS_r*.json
    artifacts at repo root (or ``root`` when given, so tier membership and
    the recheck rotation always derive from the SAME artifact set —
    round-7 ADVICE: previously only _recheck_window honored the override
    and tests had to monkeypatch this function to compensate).

    hash_green = a hash_match:true row exists in any round (oracle-verified
    values). rows_only_green = a completed rows-only check exists
    (err == "no_oracle" with a recorded spark row count) — the weaker
    certification for queries that had no oracle when sampled. Used purely
    for enumeration ordering: the driver's per-round gate samples a prefix
    of the registry, so (a) queries still waiting for their first green row
    must enumerate first or they can wait forever behind already-certified
    ones, and (b) queries whose oracle landed AFTER their rows-only row
    must re-enumerate ahead of the fully-done cohort, or a semantics
    upgrade could never earn a hash row (round-5 verdict ask #1).
    Reading the artifacts makes the priority self-maintaining round over
    round; if none exist (fresh clone), ordering falls back to registration
    order.
    """
    hash_green: set[str] = set()
    rows_only_green: set[str] = set()
    for _rnd, rows in sorted(_artifact_rounds(root).items()):
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                hash_green.add(name)
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                rows_only_green.add(name)
    return hash_green, rows_only_green


def _gate_priority() -> dict[str, int]:
    """Frozen priority ranks for pending queries (lower = earlier).

    gate_priority.json snapshots the queries that were awaiting their
    first driver row when round 3 shipped. Keeping that cohort ahead of
    any LATER-ADDED (also-uncertified) queries means new features can't
    crowd the long-waiting ones out of the driver's ~50-slot sample
    window; once a query earns a green row it drops out of the pending
    group entirely, so the file never needs updating to shrink.
    """
    path = Path(__file__).resolve().parent / "gate_priority.json"
    try:
        cohorts = json.loads(path.read_text())
    except (OSError, ValueError):
        return {}
    import re

    def cohort_order(key: str) -> tuple:
        # numeric round order, NOT lexicographic: "r10_..." must rank
        # AFTER "r4_..." or a future cohort would jump the frozen queue
        m = re.match(r"r(\d+)", key)
        return (int(m.group(1)) if m else 1 << 30, key)

    ranks: dict[str, int] = {}
    for rank, key in enumerate(sorted(cohorts, key=cohort_order)):
        for name in cohorts[key]:
            ranks.setdefault(name, rank)
    return ranks


# Re-verification rotation (round-6 verdict ask #4): without it the done
# cohort is never re-sampled — the driver's gate re-queues only pending/
# upgraded queries, so a regression in an already-certified query would be
# invisible to the hard signal forever (caught only by the local parity
# test). Each round, a window of hash-certified queries moves to the front
# of the done tier, chosen deterministically from the artifacts on disk:
# the pool is ordered oldest-certification-first, and the window advances
# by the slots consumed in each prior round since _RECHECK_EPOCH (the
# round the rotation shipped), so the whole cohort recycles in
# ~ceil(len(pool)/RECHECK_SLOTS) rounds.
#
# Round-8 widening (round-7 verdict ask #1): with the pending and upgraded
# tiers empty, a 5-slot window left ~45 of the driver's ~50 sample slots
# frozen on the registration-order head every round, and the 180-query
# cohort recycled only every ~36 rounds. RECHECK_SLOTS is now 45 — sized
# so recheck fills every sample slot not consumed by pending/upgraded
# queries (which should stay <=5 in steady state) and the full cohort
# recycles in 4 rounds. _RECHECK_HISTORY freezes the slot count of the
# rounds that ran BEFORE the widening, so the offset arithmetic stays
# reproducible from constants alone: round 8 starts at offset 5 (exactly
# where round 7's window ended), not at a recomputed 45-multiple that
# would skip queries 5..44 for a full cycle.
RECHECK_SLOTS = 45
_RECHECK_EPOCH = 7
_RECHECK_HISTORY = {7: 5}  # slots consumed per round before the widening


def _recheck_slots(rnd: int) -> int:
    """Window size used by a given round (frozen history, else current)."""
    return _RECHECK_HISTORY.get(rnd, RECHECK_SLOTS)


def _artifact_rounds(root: Path | None = None) -> dict[int, dict]:
    """{round_number: parsed CORRECTNESS rows} for every readable driver
    artifact — the on-disk state both the tier split and the recheck
    rotation derive from."""
    import re

    if root is None:
        root = Path(__file__).resolve().parent.parent
    out: dict[int, dict] = {}
    for artifact in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", artifact.name)
        if not m:
            continue
        try:
            rows = json.loads(artifact.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            out[int(m.group(1))] = rows
    return out


def _recheck_window(
    done: list[str], hash_green: set[str], root: Path | None = None
) -> list[str]:
    """The current round's re-verification picks: _recheck_slots(round)
    queries from the hash-certified done cohort, oldest first
    certification first, window offset = sum of the slots consumed by
    every prior round since the epoch (frozen 5 for round 7, 45 from
    round 8 on — see _RECHECK_HISTORY). Current round = newest artifact
    round + 1 (the artifacts the driver wrote are exactly the rounds
    already graded). Only oracle-backed hash-green queries re-enter —
    re-sampling a rows-only query would just repeat the weak check."""
    rounds = _artifact_rounds(root)
    if not rounds:
        return []
    first_round: dict[str, int] = {}
    for rnd in sorted(rounds):
        for name, row in rounds[rnd].items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                first_round.setdefault(name, rnd)
    pool = [n for n in done if n in hash_green and n in ORACLES]
    pool.sort(key=lambda n: (first_round.get(n, 1 << 30), done.index(n)))
    if not pool:
        return []
    current_round = max(rounds) + 1
    slots = _recheck_slots(current_round)
    offset = sum(
        _recheck_slots(r) for r in range(_RECHECK_EPOCH, current_round)
    ) % len(pool)
    window = pool[offset : offset + slots]
    if len(window) < slots:
        # wrap around the cohort end; pool[:offset] can't overlap the
        # window, and capping at offset keeps a small pool duplicate-free
        window += pool[: min(slots - len(window), offset)]
    return window


def _certification_order(names: list[str], root: Path | None = None) -> list[str]:
    """Four tiers, each internally in stable registration order:

    1. pending — no green driver row at all (frozen gate_priority ranks
       keep the long-waiting cohort ahead of later additions);
    2. upgraded — certified rows-only, but an oracle has since been
       registered: the green row predates the oracle and certifies only
       row counts, so the query must re-enter the sample window to earn
       a real hash row;
    3. recheck — this round's deterministic rotation through the
       hash-certified cohort (see _recheck_window), so regressions in
       long-done queries re-enter the driver's hard signal;
    4. done — the rest of the certified cohort.
    """
    hash_green, rows_only_green = _green_tiers(root)
    certified = hash_green | rows_only_green
    priority = _gate_priority()
    fallback = len(priority) + 1
    pending = [n for n in names if n not in certified]
    pending.sort(key=lambda n: priority.get(n, fallback))  # stable: keeps reg order
    upgraded = [
        n
        for n in names
        if n in rows_only_green and n not in hash_green and n in ORACLES
    ]
    done = [n for n in names if n in certified and n not in upgraded]
    recheck = _recheck_window(done, hash_green, root)
    rest = [n for n in done if n not in recheck]
    return pending + upgraded + recheck + rest


def all_queries() -> dict[str, QueryFn]:
    global _loaded
    if not _loaded:
        _load_all()
        _loaded = True
    order = _certification_order(list(QUERIES))
    return {name: QUERIES[name] for name in order}


def all_oracles() -> dict[str, str]:
    all_queries()
    order = _certification_order([n for n in QUERIES if n in ORACLES])
    return {name: ORACLES[name] for name in order}
