from kafka_clickhouse_example_spark.sources.catalog import load_tables, register_views  # noqa: F401
