"""The catalog scan-plan memo's keying and invalidation contract.

Round-11 ADVICE: the memo was keyed by applicationId, but DataFrames are
bound to the SparkSession that created them — a sibling spark.newSession()
(same appId, separate conf/view state) received the first session's
DataFrame and skipped its own nanosAsLong conf-set. The memo is now keyed
by session identity, and invalidation is an exposed helper rather than a
comment-only caveat.
"""

from __future__ import annotations

from kafka_clickhouse_example_spark.sources import catalog


def test_memo_hits_within_one_session(spark, sf_dir):
    a = catalog.load_table(spark, sf_dir, "region")
    b = catalog.load_table(spark, sf_dir, "region")
    assert a is b  # same session, same dir, same table -> memo hit


def test_sibling_session_gets_its_own_entry(spark, sf_dir):
    sib = spark.newSession()
    a = catalog.load_table(spark, sf_dir, "region")
    b = catalog.load_table(sib, sf_dir, "region")
    # Same applicationId, different sessions: the appId keying handed `a`
    # to the sibling; session-identity keying must not.
    assert a is not b
    assert b.sparkSession is sib
    # and the sibling's own conf-set ran (nanosAsLong is per-session)
    assert sib.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert b.count() == a.count()


def test_clear_load_memo_invalidates(spark, sf_dir):
    a = catalog.load_table(spark, sf_dir, "region")
    catalog.clear_load_memo()
    b = catalog.load_table(spark, sf_dir, "region")
    assert a is not b  # fresh scan plan after invalidation
