from kafka_clickhouse_example_spark.operators.normalize import (  # noqa: F401
    decode_flows,
    normalize_flows,
)
