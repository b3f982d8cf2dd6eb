"""Batch query runner CLI: run any registered query by name.

    python -m kafka_clickhouse_example_spark <query> [--sf-dir DIR]
        [--limit N] [--explain]
    python -m kafka_clickhouse_example_spark --list
    python -m kafka_clickhouse_example_spark --prepare-corpus OUT_DIR [--sf-dir DIR]
    python -m kafka_clickhouse_example_spark --retention-sweep DIR COL CUTOFF
        [--dry-run] [--purge-trash]
    python -m kafka_clickhouse_example_spark --forget DIR KEY_COL V1,V2 PART_COL

Prints result rows as JSON lines on stdout (timestamps ISO-8601), so the
output composes with jq/duckdb the way the reference's clickhouse-client
output does. `--explain` prints the formatted physical plan instead of
running the query.
"""

from __future__ import annotations

import argparse
import sys

from kafka_clickhouse_example_spark.registry import all_queries
from kafka_clickhouse_example_spark.session import get_spark
from kafka_clickhouse_example_spark.sources.catalog import DEFAULT_SF_DIR


def run(argv: list[str] | None = None, out=sys.stdout) -> int:
    ap = argparse.ArgumentParser(prog="kafka_clickhouse_example_spark")
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--list", action="store_true", dest="list_queries")
    ap.add_argument(
        "--prepare-corpus",
        metavar="OUT_DIR",
        help="run the end-to-end corpus-preparation pipeline, write the "
        "prepared corpus to OUT_DIR, print per-stage counts as JSON",
    )
    ap.add_argument(
        "--shard-corpus",
        nargs=2,
        metavar=("CORPUS_DIR", "OUT_DIR"),
        help="shard a prepared corpus's train split into shuffle-ordered training shards",
    )
    ap.add_argument(
        "--retention-sweep",
        nargs=3,
        metavar=("TABLE_DIR", "PARTITION_COL", "CUTOFF"),
        help="expire partitions below CUTOFF into <dir>__trash (two-phase; "
        "add --purge-trash to delete parked bytes); prints the report as JSON",
    )
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--purge-trash", action="store_true")
    ap.add_argument(
        "--forget",
        nargs=4,
        metavar=("TABLE_DIR", "KEY_COL", "VALUES_CSV", "PARTITION_COL"),
        help="right-to-be-forgotten: delete rows whose KEY_COL is in the "
        "comma-separated VALUES_CSV, rewriting only containing partitions; "
        "prints the report as JSON (parked_path is non-null while any "
        "emptied-partition bytes remain readable; add --purge-forgotten "
        "to destroy them and complete the erasure)",
    )
    ap.add_argument("--purge-forgotten", action="store_true")
    args = ap.parse_args(argv)

    if args.forget:
        import json

        from kafka_clickhouse_example_spark.sinks.merge import forget_keys

        table_dir, key_col, values_csv, part_col = args.forget
        spark = get_spark()
        # Coerce CSV literals to the key column's ACTUAL type (read from
        # the table schema), never by guessing int-vs-string from the
        # literal: a digit string in a STRING column must stay a string,
        # or isin(int) forces an implicit cast that can error under ANSI
        # mode on non-numeric keys or silently change match semantics.
        schema = spark.read.parquet(table_dir).schema
        try:
            kind = schema[key_col].dataType.typeName()
        except KeyError:
            print(f"--forget: no column {key_col} in {table_dir}", file=sys.stderr)
            return 2
        raw = [v for v in values_csv.split(",") if v != ""]
        # an erasure CLI must never GUESS: a literal that doesn't parse in
        # the key column's type exits 2 instead of silently matching the
        # wrong rows (review finding: 'yes' coerced to False would delete
        # the False rows — the opposite subject set)
        try:
            if kind in ("byte", "short", "integer", "long"):
                values: list = [int(v) for v in raw]
            elif kind in ("float", "double"):
                values = [float(v) for v in raw]
            elif kind == "decimal":
                from decimal import Decimal

                values = [Decimal(v) for v in raw]
            elif kind == "boolean":
                truthy = {"true", "1", "t"}
                falsy = {"false", "0", "f"}
                values = []
                for v in raw:
                    low = v.lower()
                    if low not in truthy | falsy:
                        raise ValueError(f"not a boolean literal: {v!r}")
                    values.append(low in truthy)
            else:  # string/date/timestamp: pass literals through; Spark
                values = raw  # compares them in the column's own type
        except (ValueError, ArithmeticError) as exc:
            print(
                f"--forget: value does not parse as {kind} for {key_col}: {exc}",
                file=sys.stderr,
            )
            return 2
        report = forget_keys(
            spark, table_dir, key_col, values, part_col, purge=args.purge_forgotten
        )
        print(json.dumps(report), file=out)
        return 0

    if args.retention_sweep:
        import json

        from kafka_clickhouse_example_spark.operators.layout import retention_sweep

        table_dir, col, cutoff = args.retention_sweep
        report = retention_sweep(
            get_spark(),
            table_dir,
            col,
            cutoff,
            dry_run=args.dry_run,
            purge_trash=args.purge_trash,
        )
        print(json.dumps(report), file=out)
        return 0

    if args.shard_corpus:
        import json

        from kafka_clickhouse_example_spark.pipelines.corpus_prep import (
            shard_training_corpus,
        )

        from kafka_clickhouse_example_spark.session import configure_runtime

        spark = configure_runtime(get_spark())
        counts = shard_training_corpus(spark, args.shard_corpus[0], args.shard_corpus[1])
        print(
            json.dumps({"shards": {str(k): v for k, v in sorted(counts.items())}}),
            file=out,
        )
        return 0

    if args.prepare_corpus:
        import json

        from kafka_clickhouse_example_spark.pipelines.corpus_prep import prepare_corpus
        from kafka_clickhouse_example_spark.session import configure_runtime
        from kafka_clickhouse_example_spark.sources.catalog import load_compute_table

        spark = configure_runtime(get_spark())
        docs = load_compute_table(spark, args.sf_dir, "documents")
        stats = prepare_corpus(spark, docs, args.prepare_corpus)
        print(json.dumps(stats), file=out)
        return 0

    queries = all_queries()
    if args.list_queries or not args.query:
        for name in sorted(queries):
            print(name, file=out)
        return 0
    if args.query not in queries:
        print(f"unknown query: {args.query} (see --list)", file=sys.stderr)
        return 2

    spark = get_spark()
    df = queries[args.query](spark, args.sf_dir)
    if args.explain:
        print(
            df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ),
            file=out,
        )
        return 0
    if args.limit is not None:
        df = df.limit(args.limit)
    for row in df.toJSON().toLocalIterator():
        print(row, file=out)
    return 0


if __name__ == "__main__":
    sys.exit(run())
