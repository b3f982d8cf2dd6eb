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

from collections.abc import Callable

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
        queries_flows,
        queries_multimodal,
        queries_sampling,
        queries_similarity,
        queries_temporal,
        queries_text,
        queries_timeseries,
        queries_tpch_extra,
    )


_loaded = False


def all_queries() -> dict[str, QueryFn]:
    global _loaded
    if not _loaded:
        _load_all()
        _loaded = True
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    all_queries()
    return dict(ORACLES)
