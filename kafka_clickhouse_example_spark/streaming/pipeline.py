"""The streaming application: source -> decode/normalize -> sink, the Spark
equivalent of the reference's entire process (cmd/main.go:16-42).

Parity mapping (SURVEY.md §3.1-3.2):

- sink selection on empty -clickhouseurl (cmd/main.go:37-41, S6) ->
  ``build_pipeline(sink=...)`` branch.
- unbuffered channel backpressure (cmd/main.go:34, T5) -> micro-batch flow
  control; bound per-batch work with maxOffsetsPerTrigger/maxFilesPerTrigger.
- graceful shutdown on SIGINT/SIGTERM (pkg/utils/exit.go:28-37, T4) ->
  ``run_until_signal``: signal handler calls ``query.stop()``; checkpoint
  resume replaces the reference's lossy async-commit restart (T1).

Beyond parity, this module carries the event-time operators the reference
lacks entirely (SURVEY §2.9 "—" row): watermarked tumbling-window
aggregation, streaming dedup within a watermark, and a custom stateful
operator (per-conversation flow session accumulation) via
``applyInPandasWithState`` — the three building blocks a flow-analytics
pipeline actually needs at scale.

Scale notes: every transform here is identical in batch and streaming (same
column expressions), state stores are keyed by (src_ip, dst_ip) whose
cardinality is bounded by the active host set (not row count), and the
watermark bounds state size — without it, streaming aggregation state grows
forever at 100 TB/day.
"""

from __future__ import annotations

import signal
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_clickhouse_example_spark.operators.normalize import flows_from_json


def normalized_stream(raw: DataFrame) -> DataFrame:
    """Raw message frame (``value`` column) -> 12-column flows stream.

    The exact same expression tree as the batch path — one transform
    definition, two execution modes; this is the core Spark-first win over
    the reference's hand-rolled goroutine pipeline.
    """
    return flows_from_json(raw)


def normalized_stream_observed(raw: DataFrame) -> DataFrame:
    """normalized_stream plus OBSERVABLE METRICS: the reference logs every
    dropped record at ingest (ingest_kafka.go:40-42); the Spark-first
    equivalent is ``observe()`` accounting surfaced through query progress
    — per-micro-batch n_raw (pre-decode) and n_flows (post-drop) counts in
    ``observedMetrics``, so malformed-drop rates are monitorable without a
    second pass or a side channel. Metrics ride the existing plan
    (AggregateMetrics nodes), adding no shuffle and no extra scan.
    """
    from pyspark.sql import functions as F

    observed_raw = raw.observe("ingest", F.count(F.lit(1)).alias("n_raw"))
    flows = flows_from_json(observed_raw)
    return flows.observe("normalize", F.count(F.lit(1)).alias("n_flows"))


def with_event_time(flows: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Attach an event-time column (epoch-ms double -> timestamp) + watermark.

    The reference carries times as opaque doubles (connect.go:73 "TODO: use
    DateTime"); event-time semantics require a real timestamp column.
    """
    return flows.withColumn(
        "event_time", F.timestamp_millis(F.col("start").cast("long"))
    ).withWatermark("event_time", watermark)


def windowed_traffic(flows_with_time: DataFrame, window: str = "1 minute") -> DataFrame:
    """Tumbling-window per-namespace-pair traffic rollup (bytes/packets/flows).

    Watermark + append output: a window finalizes when the watermark passes
    its end, so state is bounded and late flows beyond the watermark drop —
    the documented late-data policy the reference never had.
    """
    return (
        flows_with_time.groupBy(
            F.window("event_time", window).alias("w"),
            "src_namespace",
            "dst_namespace",
        )
        .agg(
            F.sum("bytes").alias("sum_bytes"),
            F.sum("packets").alias("sum_packets"),
            F.count("*").alias("n_flows"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "src_namespace",
            "dst_namespace",
            "sum_bytes",
            "sum_packets",
            "n_flows",
        )
    )


def windowed_unique_sources(
    flows_with_time: DataFrame, window: str = "1 minute"
) -> DataFrame:
    """EXACT distinct source addresses per tumbling window — the streaming-
    safe shape for COUNT(DISTINCT): Structured Streaming rejects exact
    countDistinct in an aggregation (unbounded per-group distinct state),
    so the operator deduplicates first (dropDuplicates on the window-bucket
    + key, watermark-bounded state, one row per distinct (window, src_ip)) and then
    runs a plain count — two bounded stateful stages instead of one
    impossible one. Same answer as batch COUNT(DISTINCT), certified by the
    streaming==batch test.
    """
    bucketed = flows_with_time.withColumn(
        "w", F.window("event_time", window)
    ).dropDuplicates(["w", "src_ip"])
    return (
        bucketed.groupBy("w")
        .agg(F.count("*").alias("unique_sources"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "unique_sources",
        )
    )


def dedup_flows_stream(flows_with_time: DataFrame, key_cols: Iterable[str] | None = None) -> DataFrame:
    """Streaming exact dedup within the watermark horizon.

    Drops redelivered flows (the reference's at-least-once Kafka redelivery
    produces duplicates it never removed — T1). State per key is evicted
    once the watermark passes, so memory is bounded by the horizon's key
    cardinality, not the stream's.
    """
    keys = list(key_cols or ["start", "end", "src_ip", "dst_ip", "bytes", "packets"])
    return flows_with_time.dropDuplicatesWithinWatermark(keys + ["event_time"])


def enrich_flows_stream(flows: DataFrame, dim: DataFrame, on: str = "src_namespace") -> DataFrame:
    """Stream-static enrichment join: attach slowly-changing dimension
    attributes (zone/tier/owner metadata) to each flow as it arrives.

    The static side is explicitly broadcast — a stream-static join must
    not shuffle the stream (that would re-partition every micro-batch);
    with the dimension broadcast, enrichment is a stateless map-side hash
    probe per batch, so it composes with any downstream stateful operator
    and adds zero state of its own. LEFT join: flows without a dimension
    row pass through with NULL attributes (enrichment must never drop
    traffic).

    The static side is re-resolved per micro-batch by Structured
    Streaming, so a dimension backed by a reloadable view picks up slow
    changes without restarting the query.
    """
    from pyspark.sql import functions as F

    return flows.join(F.broadcast(dim), on=on, how="left")


# --- custom stateful operator: flow-conversation sessions -------------------

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_flows", LongType()),
        StructField("sum_bytes", LongType()),
        StructField("sum_packets", LongType()),
        StructField("first_ms", DoubleType()),
        StructField("last_ms", DoubleType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("src_ip", StringType()),
        StructField("dst_ip", StringType()),
        StructField("n_flows", LongType()),
        StructField("sum_bytes", LongType()),
        StructField("sum_packets", LongType()),
        StructField("first_ms", DoubleType()),
        StructField("last_ms", DoubleType()),
        StructField("closed", StringType()),  # 'timeout' | 'update'
    ]
)


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate per-(src_ip, dst_ip) conversation totals; emit a snapshot
    per batch and a final row on event-time timeout.

    Arrow-batched (pandas in, pandas out); state is one fixed-width tuple per
    active conversation — O(active pairs), never O(rows).
    """
    src_ip, dst_ip = key
    if state.hasTimedOut:
        n, b, p, fm, lm = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "src_ip": src_ip, "dst_ip": dst_ip,
                    "n_flows": n, "sum_bytes": b, "sum_packets": p,
                    "first_ms": fm, "last_ms": lm, "closed": "timeout",
                }
            ]
        )
        return
    n = b = p = 0
    fm = float("inf")
    lm = float("-inf")
    if state.exists:
        n, b, p, fm, lm = state.get
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        b += int(pdf["bytes"].sum())
        p += int(pdf["packets"].sum())
        fm = min(fm, float(pdf["start"].min()))
        lm = max(lm, float(pdf["end"].max()))
    if n == 0:
        # Invoked with only empty frames and no prior state (possible on
        # watermark-only triggers): int(-inf) would raise in the executor
        # (ADVICE r1) — leave no state behind and emit nothing.
        return
    # Event-time timeouts must sit above the current watermark or Spark
    # throws IllegalArgumentException; clamp for late-arriving groups.
    close_at = int(lm) + 60_000  # close 60s after last flow
    wm = state.getCurrentWatermarkMs()
    if wm >= 0:
        close_at = max(close_at, wm + 1)
    state.update((n, b, p, fm, lm))
    state.setTimeoutTimestamp(close_at)
    yield pd.DataFrame(
        [
            {
                "src_ip": src_ip, "dst_ip": dst_ip,
                "n_flows": n, "sum_bytes": b, "sum_packets": p,
                "first_ms": fm, "last_ms": lm, "closed": "update",
            }
        ]
    )


def session_traffic(flows_with_time: DataFrame, gap: str = "30 seconds") -> DataFrame:
    """Native dynamic-gap sessionization (``session_window``): per-source
    sessions that close after ``gap`` of inactivity, with per-session flow/
    byte totals. The engine merges overlapping session state across
    micro-batches; with a watermark + append mode a session finalizes (and
    its state drops) once the watermark passes session_end + gap — bounded
    state, same policy as the tumbling rollup. The identical expression
    runs in batch for ground truth (user_session_windows certifies the
    batch semantics against a gaps-and-islands oracle; the streaming test
    certifies streaming ≡ batch)."""
    return (
        flows_with_time.groupBy(
            F.session_window("event_time", gap).alias("sw"), "src_ip"
        )
        .agg(
            F.count("*").alias("n_flows"),
            F.sum("bytes").alias("sum_bytes"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "src_ip",
            "n_flows",
            "sum_bytes",
        )
    )


def conversation_sessions(flows_with_time: DataFrame) -> DataFrame:
    """Custom stateful operator: per-(src_ip, dst_ip) conversation rollup
    with 60s event-time session close — ``applyInPandasWithState``, the
    pattern the mandate names for operators Spark's built-ins can't express
    (running session state with custom close semantics)."""
    return flows_with_time.groupBy("src_ip", "dst_ip").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- process parity: sink selection + graceful shutdown ---------------------

def run_until_signal(query) -> None:
    """T4: SIGINT/SIGTERM -> query.stop() -> awaitTermination returns.

    The reference's exit-channel dance (utils/exit.go:15-37) collapses to a
    two-line signal handler because checkpointing makes stop/restart safe.
    """

    def _stop(signum, frame):
        query.stop()

    signal.signal(signal.SIGINT, _stop)
    signal.signal(signal.SIGTERM, _stop)
    query.awaitTermination()


def correlated_flows_stream(
    flows_with_time: DataFrame, horizon: str = "1 minute", join_type: str = "inner"
) -> DataFrame:
    """Stream-stream event-time interval join: each flow joined to
    reverse-direction flows (src/dst swapped — the response leg of a
    conversation) that start within ``horizon`` after it.

    The event-time range condition plus both sides' watermarks is what makes
    this runnable forever: Spark derives a state-retention bound from the
    interval (a buffered left row can be dropped once the watermark passes
    its ``event_time + horizon``), so join state is O(traffic in the
    horizon), not O(stream history). Without the range bound a
    stream-stream join would buffer both streams unboundedly.

    ``join_type="left_outer"`` turns it into an unanswered-request detector:
    a request row whose horizon expires with no matching response emits
    once, null-padded, WHEN the watermark passes ``event_time + horizon`` —
    i.e. the null row appears in a later micro-batch than the request, and
    requests still inside the watermark tail when the stream stops never
    emit (they are not yet provably unanswered). That timing is the
    semantic difference from the batch left join, which tests pin.

    The same expression tree executes in batch mode for ground-truthing
    (tests compare against the identical join on the static frame).
    """
    left = flows_with_time.alias("req")
    right = flows_with_time.alias("rsp")
    return (
        left.join(
            right,
            F.expr(
                f"""
                req.src_ip = rsp.dst_ip AND req.dst_ip = rsp.src_ip
                AND rsp.event_time >= req.event_time
                AND rsp.event_time <= req.event_time + interval {horizon}
                """
            ),
            join_type,
        )
        .select(
            F.col("req.src_ip").alias("src_ip"),
            F.col("req.dst_ip").alias("dst_ip"),
            F.col("req.event_time").alias("req_time"),
            F.col("rsp.event_time").alias("rsp_time"),
            F.col("req.bytes").alias("req_bytes"),
            F.col("rsp.bytes").alias("rsp_bytes"),
        )
    )


def _tws_schemas():
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    state_schema = StructType(
        [
            StructField("n_flows", LongType()),
            StructField("sum_bytes", LongType()),
            StructField("sum_packets", LongType()),
        ]
    )
    out_schema = StructType(
        [
            StructField("src_ip", StringType()),
            StructField("dst_ip", StringType()),
            StructField("n_flows", LongType()),
            StructField("sum_bytes", LongType()),
            StructField("sum_packets", LongType()),
        ]
    )
    return state_schema, out_schema


def make_conversation_totals_processor():
    """Module-level factory for the transformWithState processor so its
    logic is unit-testable WITHOUT the state server: the container lacks
    google.protobuf (the transformWithState wire protocol), so the
    end-to-end streaming test importorskips — but the processor's own
    accumulate/merge/emit behavior runs under a fake handle in
    tests/test_streaming.py::test_conversation_totals_processor_unit
    (ADVICE r2: ship the class exercised, not reviewed-but-never-run).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_schema, _ = _tws_schemas()

    class ConversationTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n = b = p = 0
            for pdf in rows:
                n += len(pdf)
                b += int(pdf["bytes"].sum())
                p += int(pdf["packets"].sum())
            if self._totals.exists():
                # ValueState.get() returns the stored row as a tuple-like;
                # unpack positionally (schema order) rather than by name so
                # both tuple and Row representations work.
                pn, pb, pp = self._totals.get()
                n, b, p = n + pn, b + pb, p + pp
            self._totals.update((n, b, p))
            yield pd.DataFrame(
                {
                    "src_ip": [key[0]],
                    "dst_ip": [key[1]],
                    "n_flows": [n],
                    "sum_bytes": [b],
                    "sum_packets": [p],
                }
            )

        def close(self) -> None:
            pass

    return ConversationTotals()


def make_inactivity_alert_processor(gap_ms: int = 60_000):
    """Factory for the TIMER-driven StatefulProcessor (module-level so the
    expiry logic unit-tests under a fake handle, same policy as
    make_conversation_totals_processor): per conversation, remember the
    latest event time and register an event-time timer at last_seen +
    gap_ms; when a timer fires, emit an inactivity alert UNLESS newer
    activity superseded it (stale-timer guard — re-registration does not
    delete old timers, so expiry must be checked against current state).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    state_schema = StructType([StructField("last_ms", LongType())])

    class InactivityAlert(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._last = handle.getValueState("last_seen", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            mx = 0
            for pdf in rows:
                if len(pdf):
                    mx = max(mx, int(pdf["event_ms"].max()))
            prev = int(self._last.get()[0]) if self._last.exists() else 0
            last = max(prev, mx)
            self._last.update((last,))
            self._handle.registerTimer(last + gap_ms)
            return iter(())  # alerts emit only from expired timers

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            expiry = expiredTimerInfo.getExpiryTimeInMs()
            if not self._last.exists():
                return iter(())
            last = int(self._last.get()[0])
            if expiry < last + gap_ms:
                return iter(())  # superseded: newer activity re-armed later
            # the alert is this conversation's terminal emission: clear its
            # state so dead keys don't accumulate in the store forever (a
            # resumed conversation rebuilds from max(0, new events))
            self._last.clear()
            yield pd.DataFrame(
                {
                    "src_ip": [key[0]],
                    "dst_ip": [key[1]],
                    "last_seen_ms": [last],
                    "silent_ms": [expiry - last],
                }
            )

        def close(self) -> None:
            pass

    return InactivityAlert()


def inactive_conversation_alerts_tws(
    flows_with_time: DataFrame, gap_ms: int = 60_000
) -> DataFrame:
    """Inactivity alerts via transformWithStateInPandas EVENT-TIME TIMERS:
    a conversation silent for ``gap_ms`` past its last flow (by watermark)
    emits one alert row — the push-based dead-peer detector that polling a
    rollup can't express. Completes the arbitrary-state surface: value
    state (conversation_totals_tws), session timeouts
    (applyInPandasWithState), and now registered timers.

    State per key is one long + its timers; stale timers are filtered by
    the processor (see make_inactivity_alert_processor), so repeated
    re-arming never double-alerts.
    """
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("src_ip", StringType()),
            StructField("dst_ip", StringType()),
            StructField("last_seen_ms", LongType()),
            StructField("silent_ms", LongType()),
        ]
    )
    keyed = flows_with_time.withColumn("event_ms", F.unix_millis("event_time"))
    return keyed.groupBy("src_ip", "dst_ip").transformWithStateInPandas(
        statefulProcessor=make_inactivity_alert_processor(gap_ms),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="EventTime",
    )


def conversation_totals_tws(flows_with_time: DataFrame) -> DataFrame:
    """Per-conversation running totals via transformWithStateInPandas —
    Spark 4's arbitrary-state API (successor to applyInPandasWithState,
    used by conversation_sessions above): explicit typed ValueState,
    update-mode emission per micro-batch.

    State per (src_ip, dst_ip) key is ONE value row (n_flows, sum_bytes,
    sum_packets) — the processor demonstrates the new handle/state
    lifecycle; eviction policy (timers/TTL) is orthogonal and configured
    where deployments need it. Requires the RocksDB state store provider
    (transformWithState's backing store) AND google.protobuf in the
    Python env (the state-server wire protocol): protobuf is absent in
    this container, so the contract test importorskips — the processor
    LOGIC is still unit-tested via make_conversation_totals_processor.
    """
    _, out_schema = _tws_schemas()
    return flows_with_time.groupBy("src_ip", "dst_ip").transformWithStateInPandas(
        statefulProcessor=make_conversation_totals_processor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
