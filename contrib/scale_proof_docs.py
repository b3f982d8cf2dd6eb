"""Reproducible 10x scale proofs (SCALE.md round-4 batches).

Generates offset-copy sf1 tables (documents: doc_id offset; events:
event_id/user_id offset; orders/lineitem/customer: key offsets, see
/tmp/scale_proof.py of round 3) under $SCALE_DIR (default /tmp/sf1), then
measures any registered queries at sf0.1 vs sf1 with the bench
methodology (warm-up + best-of-2 on local[32]).

Usage:
    PYTHONPATH=/root/repo python contrib/scale_proof_docs.py q1 q2 ...

Offset-copying preserves the value distributions but makes the corpus
10x DUP-HEAVY (every doc has 9 exact copies) — fine for map/agg-shaped
queries, and a deliberate stress for pair-emitting dedup ops (output
itself is quadratic in duplication; see SCALE.md for the stop-cut
interaction).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from kafka_clickhouse_example_spark.session import configure_runtime, get_spark
from kafka_clickhouse_example_spark.sources.catalog import load_table

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SCALE_DIR", "/tmp/sf1")
# SCALE_COPIES=100 with SCALE_DIR=/tmp/sf10 generates the sf10 decade
# (round-6 verdict ask #5) with the same offset-copy construction; note
# the dup-multiplicity caveat in the module docstring scales with it
# (99 exact copies per doc at 100 copies).
COPIES = int(os.environ.get("SCALE_COPIES", "10"))
# Extra already-generated dirs to measure alongside (comma-separated),
# e.g. SCALE_COMPARE_DIRS=/tmp/sf1 when measuring /tmp/sf10 — all scales
# then run in ONE session for thermal comparability.
COMPARE_DIRS = [d for d in os.environ.get("SCALE_COMPARE_DIRS", "").split(",") if d]
# SCALE_RUNS=1 drops the warm-up + best-of-2 protocol to a single timed
# run — for the sf10 pair emitters whose single execution is tens of
# minutes, where a 3x protocol would cost hours for a second significant
# digit. Artifacts record which protocol measured each number.
RUNS = int(os.environ.get("SCALE_RUNS", "2"))


def _gen(spark, name: str, offsets: dict[str, bool]) -> None:
    """Write COPIES key-offset copies of SRC/<name> to DST/<name>.
    offsets: column -> True for columns to shift by copy_index * max+1."""
    out = os.path.join(DST, f"{name}.parquet")
    if os.path.exists(out):
        return
    base = load_table(spark, SRC, name)
    spans = {
        c: base.agg(F.max(c)).collect()[0][0] + 1 for c in offsets
    }
    copies = None
    for k in range(COPIES):
        cols = [
            (F.col(c) + k * spans[c]).alias(c) if c in offsets else F.col(c)
            for c in base.columns
        ]
        c = base.select(*cols)
        copies = c if copies is None else copies.unionByName(c)
    copies.repartition(32).write.mode("overwrite").parquet(out)
    print(f"generated {out}", file=sys.stderr)


def _copy_dims(spark) -> None:
    """Dimension tables copy through UNSCALED (1 copy): region/nation are
    fixed-cardinality by TPC-H construction, and part/supplier keys are
    referenced unchanged by the offset lineitem copies — scaling them
    would break referential integrity of the joins under test."""
    import shutil

    for name in ("region", "nation", "part", "supplier"):
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(DST, f"{name}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)
            print(f"copied {dst}", file=sys.stderr)


def _measurement_dirs(candidates: list[str]) -> list[tuple[str, str]]:
    """(dir, label) pairs for the sweep. De-duplicates by resolved path
    (DST listed again in SCALE_COMPARE_DIRS would be measured twice) and
    fails loudly when DISTINCT dirs share a basename label — one would
    silently overwrite the other in the output dict (round-7 ADVICE)."""
    dirs: list[tuple[str, str]] = []
    seen_paths: set[str] = set()
    labels: dict[str, str] = {}
    for d in candidates:
        real = os.path.realpath(d)
        if real in seen_paths:
            continue
        seen_paths.add(real)
        label = os.path.basename(d.rstrip("/"))
        if label in labels:
            raise SystemExit(
                f"distinct measurement dirs share the label {label!r}: "
                f"{labels[label]} and {real} — results would silently "
                "overwrite each other; rename one directory"
            )
        labels[label] = real
        dirs.append((d, label))
    return dirs


def main() -> None:
    # SCALE_DRIVER_MEM: the sf10 pair emitters' common-count aggregation
    # holds ~100x sf1's pair state — 16g OOMs (measured round 7); the
    # 128 GiB box allows a bigger single-JVM heap for the stress shapes.
    spark = get_spark(
        "scale-proof",
        cpus=32,
        driver_memory=os.environ.get("SCALE_DRIVER_MEM", "16g"),
    )
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    _gen(spark, "documents", {"doc_id": True})
    _gen(spark, "events", {"event_id": True, "user_id": True})
    _gen(spark, "orders", {"o_orderkey": True, "o_custkey": True})
    _gen(spark, "lineitem", {"l_orderkey": True})
    _gen(spark, "customer", {"c_custkey": True})
    _gen(spark, "embeddings", {"vec_id": True})
    _copy_dims(spark)

    from kafka_clickhouse_example_spark.registry import all_queries

    queries = all_queries()
    # --all (round-5 verdict ask #5): sweep the ENTIRE registry so
    # super-linear tails that hand-picking misses show up in the ratio
    # distribution. Per-query failures record -1 and never sink the sweep.
    if sys.argv[1:] == ["--all"]:
        names = sorted(queries)
    else:
        names = sys.argv[1:] or ["text_bm25_topk"]
    out = {}
    dirs = _measurement_dirs([SRC, *COMPARE_DIRS, DST])
    for sf_dir, label in dirs:
        for name in names:
            fn = queries[name]
            # Timed runs use bench._execute — THE timed action, imported
            # rather than re-implemented so this sweep can never silently
            # diverge from what bench.py times (round-9 ADVICE). count()
            # let Catalyst prune unreferenced windows/UDF projections/
            # sorts out of the timed plan (round-8 audit,
            # contrib/count_plan_audit.py — customer_order_running_total
            # "measured" 0.22 s flat from sf0.1 to sf10 under count
            # because the count plan never windowed anything). Row counts
            # still come from an untimed count().
            def run_once():
                bench._execute(fn(spark, sf_dir))

            try:
                if RUNS <= 1:
                    t0 = time.perf_counter()
                    run_once()
                    best = time.perf_counter() - t0
                    rows = fn(spark, sf_dir).count()
                    out[f"{label}:{name}"] = {
                        "sec": round(best, 3),
                        "rows": rows,
                        "protocol": "single cold run (SCALE_RUNS=1), noop-write action",
                    }
                else:
                    rows = fn(spark, sf_dir).count()
                    best = float("inf")
                    for _ in range(RUNS):
                        t0 = time.perf_counter()
                        run_once()
                        best = min(best, time.perf_counter() - t0)
                    out[f"{label}:{name}"] = {"sec": round(best, 3), "rows": rows}
                print(label, name, round(best, 3), "s", rows, "rows", file=sys.stderr)
            except Exception as exc:
                out[f"{label}:{name}"] = {"sec": -1.0, "rows": -1, "err": str(exc)[:200]}
                print(label, name, "FAILED:", str(exc)[:200], file=sys.stderr)
    out["_timed_action"] = (
        f"{bench.TIMED_ACTION} via bench._execute (round 8+; earlier sweeps "
        "timed count())"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
