"""Data-contract enforcement: validate a DataFrame's schema against an
expected contract and report drift — the admission check a pipeline runs
before accepting an upstream table whose producer may have evolved it.

Purely metadata (no data scan): the report compares the resolved Spark
schema to the contract's DDL. Paired with the mergeSchema evolution test
(tests/test_formats.py) this covers both sides of schema change: reading
across old+new files, and deciding whether a new shape is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def schema_drift(df: DataFrame, expected_ddl: str) -> list[dict]:
    """Compare ``df``'s schema to the contract; return drift records
    [{"column", "kind", "expected", "actual"}, ...] where kind is one of
    ``missing`` (contract column absent), ``extra`` (unexpected column),
    ``type_changed``, or ``nullability_tightened`` (contract says NOT NULL
    but the data may be null — the only nullability direction that breaks
    a consumer). Empty list == contract satisfied.
    """
    expected = StructType.fromDDL(expected_ddl)
    # Match Spark's own resolution rules: column names compare
    # case-insensitively (spark.sql.caseSensitive defaults false) and types
    # compare by simpleString, which ignores nested containsNull/
    # valueContainsNull — an array<int> that cannot hold nulls is a
    # strictly-safer shape, not breaking drift.
    #
    # Case-collision guard: under spark.sql.caseSensitive=true a schema may
    # legally hold columns differing only by case; folding them into one
    # dict key would silently drop one side from the comparison and let
    # real drift on it pass unreported. Such a schema is ambiguous under
    # THIS comparator's case-insensitive rules, so refuse it loudly.
    for side, fields in (("actual", df.schema.fields), ("contract", expected.fields)):
        seen: dict[str, str] = {}
        for f in fields:
            low = f.name.lower()
            if low in seen:
                # ANY collision — case-differing OR exact duplicates
                # (select(lit(1).alias('a'), lit(2).alias('a')) is legal
                # Spark) — would fold into one dict key and silently drop
                # a side from the comparison. Refuse both loudly.
                raise ValueError(
                    f"schema_drift: {side} schema has colliding column "
                    f"names ({seen[low]!r} vs {f.name!r}); the dict-based "
                    "comparison would silently drop one — deduplicate or "
                    "rename upstream"
                )
            seen[low] = f.name
    actual = {f.name.lower(): f for f in df.schema.fields}
    exp = {f.name.lower(): f for f in expected.fields}
    drift: list[dict] = []
    for name, f in exp.items():
        if name not in actual:
            drift.append(
                {"column": name, "kind": "missing", "expected": f.dataType.simpleString(), "actual": None}
            )
            continue
        a = actual[name]
        if a.dataType.simpleString() != f.dataType.simpleString():
            drift.append(
                {
                    "column": name,
                    "kind": "type_changed",
                    "expected": f.dataType.simpleString(),
                    "actual": a.dataType.simpleString(),
                }
            )
        if not f.nullable and a.nullable:
            drift.append(
                {
                    "column": name,
                    "kind": "nullability_tightened",
                    "expected": "NOT NULL",
                    "actual": "nullable",
                }
            )
    for name, a in actual.items():
        if name not in exp:
            drift.append(
                {"column": name, "kind": "extra", "expected": None, "actual": a.dataType.simpleString()}
            )
    return sorted(drift, key=lambda d: (d["column"], d["kind"]))


def enforce_contract(df: DataFrame, expected_ddl: str) -> DataFrame:
    """Admission gate: raise with the full drift report if the contract is
    violated; otherwise return ``df`` projected to the contract's columns
    in contract order (dropping benign extras), so downstream code sees
    exactly the agreed shape."""
    drift = schema_drift(df, expected_ddl)
    breaking = [d for d in drift if d["kind"] != "extra"]
    if breaking:
        raise ValueError(f"schema contract violated: {breaking}")
    expected = StructType.fromDDL(expected_ddl)
    return df.select(*[f.name for f in expected.fields])
