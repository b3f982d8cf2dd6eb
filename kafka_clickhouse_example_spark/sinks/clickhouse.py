"""ClickHouse sink (reference parity S3/S4/S7/S8, SURVEY.md §2.1) as a
Structured Streaming ``foreachBatch`` JDBC append.

Reference behavior vs this implementation:

- Row-at-a-time ``INSERT ... VALUES (?x12)`` per record
  (pkg/clickhouse/export_clickhouse.go:81-87) -> whole-micro-batch JDBC
  append (``df.write.jdbc(mode="append")``). Batched inserts are the
  documented ClickHouse fast path and a strict upgrade; at 100 TB/day the
  per-row round-trip is the difference between working and not.
- Async offset commit decoupled from insert (ingest_kafka.go:21; SURVEY.md
  §2.9 T1 — loses or duplicates on crash) -> foreachBatch runs inside the
  micro-batch transaction boundary: offsets only advance in the checkpoint
  after the batch write returns. At-least-once into ClickHouse; exactly-once
  when the target table dedups on an insert key (ReplacingMergeTree) — we
  thread ``batch_id`` through as an optional column for that purpose.
- Destructive bootstrap ``DROP TABLE IF EXISTS flows`` on every start
  (connect.go:70) is deliberately NOT reproduced (3 racing replicas lose
  data, SURVEY.md §7 hard-point 3): ``FLOWS_DDL`` is CREATE IF NOT EXISTS
  only; ``drop_first`` exists for byte-parity testing.
- Connection probe (connect.go:44-67: Ping + ``SELECT name, toString(uuid)
  ... LIMIT 5``) -> ``probe()`` runs the same query over JDBC.

No ClickHouse server or JDBC driver exists in this container; everything
here is exercised through the ``jdbc_writer`` seam (tests inject a recorder;
prod passes nothing and gets real JDBC).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# connect.go:74-89, engine choice upgraded: MergeTree persists and orders by
# time (the Memory engine loses everything on restart); toDateTime64 columns
# stay Float64 epoch-ms for byte parity with the reference schema.
FLOWS_DDL = """
CREATE TABLE IF NOT EXISTS flows (
    start Float64, end Float64,
    src_ip String, dst_ip String,
    src_name String, dst_name String,
    src_kind String, dst_kind String,
    src_namespace String, dst_namespace String,
    bytes UInt32, packets UInt32
) engine=MergeTree ORDER BY (start)
"""

DROP_DDL = "DROP TABLE IF EXISTS flows"  # connect.go:70 (parity mode only)

PROBE_SQL = (
    "SELECT name, toString(uuid) as uuid_str FROM system.tables LIMIT 5"  # connect.go:52
)

BatchWriter = Callable[[DataFrame, int], None]


def default_jdbc_writer(url: str, table: str = "flows", properties: dict | None = None) -> BatchWriter:
    """Real JDBC append writer for foreachBatch (prod path)."""

    def write(df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").jdbc(url, table, properties=properties or {})

    return write


def start_clickhouse_export(
    flows: DataFrame,
    checkpoint_dir: str,
    writer: BatchWriter,
    *,
    with_batch_id: bool = False,
    trigger_available_now: bool = False,
):
    """S3/S4: stream the normalized flows relation into ClickHouse.

    ``writer`` is called once per micro-batch with (batch DataFrame,
    batch_id); offsets commit to the checkpoint only after it returns —
    the at-least-once contract the reference failed to provide (T1).

    ``with_batch_id=True`` appends a ``batch_id`` column so an idempotent
    target (ReplacingMergeTree keyed on it) upgrades to exactly-once.
    """

    def handle(df: DataFrame, batch_id: int) -> None:
        out = df.withColumn("batch_id", F.lit(batch_id)) if with_batch_id else df
        writer(out, batch_id)

    q = flows.writeStream.foreachBatch(handle).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        q = q.trigger(availableNow=True)
    return q.start()


def setup_table(run_sql: Callable[[str], None], *, drop_first: bool = False) -> None:
    """S8 DDL bootstrap. ``run_sql`` executes one statement on the server
    (JDBC statement in prod, a recorder in tests). ``drop_first`` reproduces
    the reference's destructive DROP (connect.go:70) for parity testing only."""
    if drop_first:
        run_sql(DROP_DDL)
    run_sql(FLOWS_DDL)


def probe(spark: SparkSession, url: str, properties: dict | None = None) -> DataFrame:
    """S7 connection probe: the connect.go:52 query via JDBC dbtable pushdown."""
    return spark.read.jdbc(
        url, f"({PROBE_SQL}) AS probe", properties=properties or {}
    )
