"""Reference-parity query surface over the flows relation (SURVEY.md §2.8, §3.3).

Two queries define the reference's demonstrated analytical capability:

1. The README verification query (/root/reference/README.md:91-107):
   ``SELECT fromUnixTimestamp(intDiv(start,1000)) AS start, ... FROM flows
   LIMIT 100`` — projection, aliasing (F4), integer division (F1),
   epoch->timestamp (F2), LIMIT (L2).
2. The connection probe (/root/reference/pkg/clickhouse/connect.go:52):
   ``SELECT name, toString(uuid) AS uuid_str FROM system.tables LIMIT 5`` —
   cast-to-string (F3), LIMIT (L1).

Determinism note: the reference's LIMIT has no ORDER BY (ClickHouse returns
arbitrary rows). For oracle-checkable results we impose a total order over all
output columns before LIMIT — same rows every run, in Spark and DuckDB alike.

The ``events_to_flow_json`` adapter turns the driver's ``events`` table into
NetObserv-shaped JSON messages so the *entire* reference hot path
(bytes -> decode -> project/default/cast -> query) is exercised on driver
data. The mapping is deterministic and mirrored in the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.schemas import FLOWS_COLUMNS


def events_to_flow_json(events: DataFrame) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) -> one JSON
    flow message per row (column ``value``, string).

    Deterministic field mapping (documented for the oracle):
      TimeFlowStartMs = epoch_ms(ts)                  (double)
      TimeFlowEndMs   = start + floor(value*1000)     (double)
      SrcAddr         = '10.0.<user_id%256>.1'
      DstAddr         = '10.0.<props.k%256>.2'
      SrcK8S_Name     = 'user-<user_id>'   DstK8S_Name = event_type
      SrcK8S_Type     = 'Pod'              DstK8S_Type = 'Service'
      SrcK8S_Namespace= NULL when event_type='error' else 'ns-<user_id%10>'
                        (NULL -> key absent in JSON -> exercises the
                        missing-field default path, P2)
      DstK8S_Namespace= event_type
      Bytes           = floor(value*100)   Packets = floor(value)

    ``props`` is a JSON string like '{"k": 87}'; extracting k exercises the
    schemaless-JSON decode the reference does on every message.
    """
    k = F.coalesce(F.get_json_object(F.col("props"), "$.k").cast("long"), F.lit(0))
    start_ms = F.unix_millis(F.col("ts")).cast("double")
    flow = F.struct(
        start_ms.alias("TimeFlowStartMs"),
        (start_ms + F.floor(F.col("value") * 1000)).alias("TimeFlowEndMs"),
        F.concat(F.lit("10.0."), (F.col("user_id") % 256).cast("string"), F.lit(".1")).alias(
            "SrcAddr"
        ),
        F.concat(F.lit("10.0."), (k % 256).cast("string"), F.lit(".2")).alias("DstAddr"),
        F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("SrcK8S_Name"),
        F.col("event_type").alias("DstK8S_Name"),
        F.lit("Pod").alias("SrcK8S_Type"),
        F.lit("Service").alias("DstK8S_Type"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("ns-"), (F.col("user_id") % 10).cast("string")))
        .alias("SrcK8S_Namespace"),
        F.col("event_type").alias("DstK8S_Namespace"),
        F.floor(F.col("value") * 100).cast("double").alias("Bytes"),
        F.floor(F.col("value")).cast("double").alias("Packets"),
    )
    # to_json omits NULL fields -> absent JSON keys, exactly the shape the
    # reference sees for Node flows with no namespace (README.md:115-117).
    return events.select(F.to_json(flow).alias("value"))


def readme_verification(flows: DataFrame, limit: int = 100) -> DataFrame:
    """The README.md:91-107 verification query, Spark-native.

    fromUnixTimestamp(intDiv(start,1000)) ≙ timestamp_seconds(floor(start/1000));
    output columns are named start_ts/end_ts ("end" is reserved in several SQL
    dialects — SURVEY.md §7 hard-point 4). A total ORDER BY over all columns
    makes LIMIT deterministic (see module docstring).
    """
    projected = flows.select(
        F.timestamp_seconds(F.floor(F.col("start") / 1000).cast("long")).alias("start_ts"),
        F.timestamp_seconds(F.floor(F.col("end") / 1000).cast("long")).alias("end_ts"),
        *FLOWS_COLUMNS[2:],
    )
    return projected.orderBy(*projected.columns).limit(limit)


def probe_query(df: DataFrame, name_col: str, id_col: str, limit: int = 5) -> DataFrame:
    """connect.go:52 shape: two-column projection, cast-to-string, LIMIT 5."""
    out = df.select(
        F.col(name_col).alias("name"), F.col(id_col).cast("string").alias("uuid_str")
    )
    return out.orderBy("name", "uuid_str").limit(limit)
