"""Interpreter-startup shim for Spark Python workers.

Python's ``site`` module imports ``sitecustomize`` (if importable from
``sys.path``) in every interpreter — including the worker and pre-init
driver-worker processes Spark spawns. ``session.get_spark`` puts this
directory (plus the repo root) on ``spark.executorEnv.PYTHONPATH``, so each
spawned interpreter runs :func:`ensure_protobuf` at startup, making a real
``google.protobuf`` resolvable there (required by transformWithState's
state-server protocol) even when protobuf was never pip-installed.

Must never break interpreter startup: any failure degrades to "protobuf
stays unavailable", which callers already handle.
"""

try:  # repo root must also be on PYTHONPATH (get_spark arranges both)
    from kafka_clickhouse_example_spark.compat.protobuf_compat import ensure_protobuf

    ensure_protobuf()
except Exception:  # noqa: BLE001 — startup shim must be failure-proof
    pass
