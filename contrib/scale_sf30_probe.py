"""Round-10 verdict ask #5: one more decade-class point (sf30 = 300
offset copies of sf0.1, 3x the sf10 decade) for the r9 sweep's three
absolute-wall queries — `dedup_minhash_lsh_pairs` (110.8 s at sf10),
`orders_revenue_bootstrap_ci` (60.6 s) and `dedup_split_leakage_audit`
(52.0 s) — confirming the per-decade trend beyond sf10.

Two corpus constructions, because the offset-copy corpus makes pair
emitters OUTPUT-quadratic in copy multiplicity (SCALE.md round-7), which
at some size stops being a plan property and becomes a disk fact:

- RAW (``/tmp/sf10`` / ``/tmp/sf30``): the exact scale_proof_docs
  construction — key-offset copies with text UNCHANGED, so every doc has
  (copies-1) exact copies. Used for the linear-output queries
  (bootstrap_ci) and for the split-leakage audit's SMJ shape (its
  straddle-pair output grows ~copies^2; the probe measures whether the
  sort-merge shuffle itself stays linear around that output term). The
  arithmetic that reproduces r9's measured raw-sf10 minhash output
  exactly (5000*C(100,2) + 256*100^2 = 27,310,000 pairs) forecasts
  247,290,000 pairs at 300 copies, whose verify-join shuffle
  (~9.06x the sf10 run's) exceeds this node's free disk — that refusal
  is recorded WITH the numbers instead of run (ask #5's "if it doesn't
  fit, record the refusal as r7 did").

- MULTIPLICITY-CONTROLLED (``/tmp/sf10ctl`` / ``/tmp/sf30ctl``): same
  offset copies, but every whitespace token in ``text`` gets a
  copy-unique suffix (``tok`` -> ``tok~~<k>``). The token map is a
  bijection per copy, so each copy's INTERNAL shingle structure — token
  counts, distinctness, within-copy Jaccard — is byte-for-byte
  isomorphic to sf0.1's, while CROSS-copy shingle overlap is exactly
  zero (every shingle carries the copy suffix; Jaccard 0 < the 0.3
  threshold). Pair output therefore scales LINEARLY (copies x sf0.1's
  pairs), isolating the plan's scaling from the artifact's
  output-quadratic term — the "duplicate-multiplicity-controlled
  corpus" the round-9 verdict ask names.

Protocol: ONE session (thermal comparability, as scale_proof_docs);
single cold timed run per (dir, query) via bench._execute — the honest
noop-write action — with the shingle memo (_shingled's localCheckpoint)
pre-materialized UNTIMED per dir and that fact recorded: the timed
number is the query's own plan, not corpus tokenization, uniformly
across all dirs (the r9 sweep's per-dir first-dedup-query paid the memo
implicitly; in-session ratios here are self-consistent either way
because sf0.1/sf10/sf30 all run memo-warm in this same session).

Usage:
    PYTHONPATH=/root/repo python contrib/scale_sf30_probe.py \
        > contrib/scale_sf30_r10.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from kafka_clickhouse_example_spark.session import configure_runtime, get_spark
from kafka_clickhouse_example_spark.sources.catalog import load_table

SRC = "/root/testdata/sf0.1"

# Raw-sf30 minhash refusal arithmetic (see module docstring). The model —
# pairs(m) = N_DOCS*C(m,2) exact-copy pairs + SF01_PAIRS*m^2 cross-copy
# near-dup pairs — reproduces the r9 measured sf10 output exactly.
N_DOCS_SF01 = 5000
SF01_MINHASH_PAIRS = 256
R9_SF10_MINHASH = {"sec": 110.758, "rows": 27_310_000}


def forecast_minhash_pairs(copies: int) -> int:
    return N_DOCS_SF01 * copies * (copies - 1) // 2 + SF01_MINHASH_PAIRS * copies**2


def salted_text(k):
    """The multiplicity-control bijection: every whitespace token in
    ``text`` gets a copy-unique ``~~<k>`` suffix. Per copy this maps
    token -> token+suffix bijectively (equal tokens stay equal, distinct
    stay distinct, token COUNT unchanged), so within-copy shingle
    structure is isomorphic to the base corpus; across copies every
    shingle differs in its suffix, so cross-copy Jaccard is exactly 0.
    Contract-pinned in tests/test_scale_corpus_control.py."""
    return F.regexp_replace(
        F.col("text"), F.lit(r"(\S+)"), F.concat(F.lit("$1~~"), k.cast("string"))
    )


def _gen(spark, dst: str, name: str, offsets: list[str], copies: int,
         salt_text: bool = False) -> None:
    """Write `copies` key-offset copies of SRC/<name> to dst/<name> via a
    single range cross-join (one scan; generation is untimed scaffolding).
    salt_text: suffix every whitespace token with ~~<copy index> — the
    multiplicity-control bijection described in the module docstring."""
    out = os.path.join(dst, f"{name}.parquet")
    if os.path.exists(out):
        return
    base = load_table(spark, SRC, name)
    spans = {c: base.agg(F.max(c)).collect()[0][0] + 1 for c in offsets}
    k = F.col("__copy")
    cols = []
    for c in base.columns:
        if c in offsets:
            cols.append((F.col(c) + k * F.lit(spans[c])).alias(c))
        elif salt_text and c == "text":
            cols.append(salted_text(k).alias("text"))
        else:
            cols.append(F.col(c))
    (
        base.crossJoin(spark.range(copies).select(F.col("id").alias("__copy")))
        .select(*cols)
        .repartition(32)
        .write.mode("overwrite")
        .parquet(out)
    )
    print(f"generated {out}", file=sys.stderr)


def main() -> None:
    spark = get_spark(
        "scale-sf30-probe",
        cpus=32,
        driver_memory=os.environ.get("SCALE_DRIVER_MEM", "16g"),
    )
    configure_runtime(spark)
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {
        "sf10": ("/tmp/sf10", 100, False),
        "sf30": ("/tmp/sf30", 300, False),
        "sf10ctl": ("/tmp/sf10ctl", 100, True),
        "sf30ctl": ("/tmp/sf30ctl", 300, True),
    }
    for _, (dst, copies, salted) in dirs.items():
        os.makedirs(dst, exist_ok=True)
        _gen(spark, dst, "documents", ["doc_id"], copies, salt_text=salted)
        if not salted:  # bootstrap_ci needs orders only on the raw dirs
            _gen(spark, dst, "orders", ["o_orderkey", "o_custkey"], copies)

    from kafka_clickhouse_example_spark.plans import queries_dedup
    from kafka_clickhouse_example_spark.registry import all_queries

    queries = all_queries()
    plan = [
        # (label, sf_dir, query) — raw chain for the linear-output wall
        # and the SMJ audit; controlled chain for the pair emitters.
        ("sf0.1", SRC, "orders_revenue_bootstrap_ci"),
        ("sf10", "/tmp/sf10", "orders_revenue_bootstrap_ci"),
        ("sf30", "/tmp/sf30", "orders_revenue_bootstrap_ci"),
        ("sf0.1", SRC, "dedup_minhash_lsh_pairs"),
        ("sf0.1", SRC, "dedup_split_leakage_audit"),
        ("sf10", "/tmp/sf10", "dedup_minhash_lsh_pairs"),
        ("sf10", "/tmp/sf10", "dedup_split_leakage_audit"),
        ("sf30", "/tmp/sf30", "dedup_split_leakage_audit"),
        ("sf10ctl", "/tmp/sf10ctl", "dedup_minhash_lsh_pairs"),
        ("sf10ctl", "/tmp/sf10ctl", "dedup_split_leakage_audit"),
        ("sf30ctl", "/tmp/sf30ctl", "dedup_minhash_lsh_pairs"),
        ("sf30ctl", "/tmp/sf30ctl", "dedup_split_leakage_audit"),
    ]
    out: dict[str, object] = {}
    warmed: set[str] = set()
    for label, sf_dir, name in plan:
        if name.startswith("dedup_") and sf_dir not in warmed:
            # untimed shingle-memo materialization (module docstring)
            queries_dedup._shingled(spark, sf_dir).count()
            warmed.add(sf_dir)
        free_gb = shutil.disk_usage("/tmp").free / 2**30
        fn = queries[name]
        try:
            t0 = time.perf_counter()
            bench._execute(fn(spark, sf_dir))
            sec = time.perf_counter() - t0
            rows = fn(spark, sf_dir).count()
            out[f"{label}:{name}"] = {
                "sec": round(sec, 3),
                "rows": rows,
                "disk_free_gb_before": round(free_gb, 1),
            }
            print(label, name, round(sec, 3), "s", rows, "rows", file=sys.stderr)
        except Exception as exc:  # record, never sink the probe
            out[f"{label}:{name}"] = {"sec": -1.0, "rows": -1, "err": str(exc)[:300]}
            print(label, name, "FAILED:", str(exc)[:300], file=sys.stderr)

    f30 = forecast_minhash_pairs(300)
    f10 = forecast_minhash_pairs(100)
    assert f10 == R9_SF10_MINHASH["rows"], f10
    out["sf30_raw_minhash_refusal"] = {
        "forecast_pairs": f30,
        "model": "5000*C(m,2) exact-copy + 256*m^2 cross-copy pairs; "
        f"reproduces the r9 measured raw-sf10 output exactly ({f10:,})",
        "verify_shuffle_forecast": "the verify join shuffles each candidate "
        "row with its shingle array (~500 B/row measured-scale at sf10 "
        "~13 GB, fit); 247.3M pairs -> ~9.06x = ~120 GB, over this node's "
        f"free disk ({shutil.disk_usage('/tmp').free / 2**30:.0f} GB) — the "
        "same DiskBlockObjectWriter wall r7 measured for the jaccard "
        "candidate shuffle at sf10 (SCALE.md round-7). Refused with "
        "numbers per ask #5; the multiplicity-controlled sf30ctl point "
        "above carries the plan-scaling trend instead.",
    }
    out["_protocol"] = (
        "one session, local[32], driver 16g; single cold timed run per "
        "(dir, query) via bench._execute (noop-write action); shingle memo "
        "pre-materialized untimed per dir; generation untimed"
    )
    out["_timed_action"] = bench.TIMED_ACTION
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
