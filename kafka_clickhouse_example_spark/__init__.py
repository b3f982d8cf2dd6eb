"""kafka_clickhouse_example_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of jotak/kafka-clickhouse-example.

The reference (/root/reference, Go, 358 LoC) is a streaming ETL connector:
Kafka JSON flow records -> 12-column projection with defaults/casts ->
ClickHouse append (or stdout). This package re-expresses that surface
Spark-first (Structured Streaming + DataFrame/SQL, zero custom Catalyst work
needed for parity — see SURVEY.md §4), and adds the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layout
------
- ``session``      SparkSession factory with scale-aware defaults (AQE on).
- ``schemas``      NetObserv flow input schema + the 12-col flows table schema.
- ``operators``    normalize (projection/defaults/casts), dedup, similarity,
                   text analysis, multimodal plumbing.
- ``sources``      Kafka readStream builder, file/batch readers, table catalog.
- ``sinks``        console, ClickHouse/JDBC foreachBatch, parquet.
- ``plans``        query library: reference-parity flows queries + the
                   analytics layer (joins/aggs/windows/set-ops/top-k).
- ``streaming``    the end-to-end pipeline wiring (source -> normalize -> sink).
"""

__version__ = "0.1.0"
