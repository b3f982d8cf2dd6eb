"""Partition-pruned layout: writing a hive-partitioned table and proving the
scan touches only the matching directories — the storage-layout half of the
100 TB story (bucketing covers the join side, this covers selective scans).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.sources.catalog import load_table


def test_partition_pruning_on_lang(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    docs.write.partitionBy("lang").parquet(out)

    pruned = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()

    # The lang predicate must be a partition filter (directory pruning),
    # not a data filter evaluated after reading every file.
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "lang" in pf, f"lang not pruned at partition level: {pf}"

    want = docs.filter(F.col("lang") == "en").count()
    assert pruned.count() == want

    # Files actually listed for the scan are only the en partition's.
    files = [r["file"] for r in pruned.select(F.input_file_name().alias("file")).distinct().collect()]
    assert files and all("lang=en" in f for f in files)
