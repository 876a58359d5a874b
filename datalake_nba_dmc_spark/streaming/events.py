"""Streaming operators over the events stream (ts/user_id/event_type/value).

Design: every transformation here is expressed so THE SAME function works on
a batch DataFrame and a streaming one (Structured Streaming's unified
model) — tests exercise both paths and assert they agree. Watermarks bound
state; ``availableNow`` gives exactly-once batch-like runs for backfill.

Scale notes:

- Windowed aggregations shuffle once on (window, key); state store size is
  bounded by the watermark horizon × key cardinality.
- ``dropDuplicatesWithinWatermark`` keeps only the watermark window of ids
  in state — unbounded-key streaming dedup with bounded memory.
- ``user_running_state`` shows the arbitrary-stateful escape hatch
  (``applyInPandasWithState``): per-key state updated per micro-batch with
  Arrow-batched Python, for semantics windows can't express.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

#: On-disk schema: the driver's events parquet carries
#: TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads as
#: TIMESTAMP_NTZ (see sources.registry.load_table).
EVENTS_FILE_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

EVENTS_SCHEMA = StructType(
    [f if f.name != "ts" else StructField("ts", TimestampType()) for f in EVENTS_FILE_SCHEMA]
)


def read_events_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    Streaming file sources require an explicit schema (no inference race);
    ``maxFilesPerTrigger`` throttles micro-batch size for steady backfill.
    Emits :data:`EVENTS_SCHEMA` (the on-disk NTZ ``ts`` cast to session-tz
    timestamp — value-preserving under the engine's UTC session timezone).
    """
    r = spark.readStream.schema(EVENTS_FILE_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(source_dir).withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-(window, event_type) counts + value sums. Late rows beyond the
    watermark are dropped; state is purged as the watermark advances."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 10000).cast("long")) / 10000.0).alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(sliding window, event_type) counts — the overlapping-window
    trend signal between tumbling (no overlap) and session (gap-driven)
    aggregation; completes the streaming window triple next to
    :func:`tumbling_agg` / :func:`session_agg` and mirrors the batch
    ``events_sliding_agg`` query so the stream-vs-batch agreement law is
    testable. Each event lands in ``window/slide`` overlapping windows —
    state grows by that factor, purged as the watermark passes each
    window's end (the standard Spark sliding-window cost model)."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based): a session closes after ``gap``
    of inactivity. Streaming state per open session, closed by watermark."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event ids within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` (streaming) keeps id-state only for
    the watermark window — the unbounded-stream dedup pattern. Batch path:
    plain dropDuplicates."""
    if not events.isStreaming:
        return events.dropDuplicates(["event_id"])
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


_RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


_DURATION_UNIT_MS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
    "week": 604_800_000,
}


def _duration_ms(s: str) -> int:
    """Parse a Spark-style interval string ("30 days", "1 second") to
    milliseconds — PySpark's ``GroupState.setTimeoutDuration`` takes int
    ms, unlike the Scala API's string overload, so the engine keeps the
    string surface (matching watermark parameters) and converts here."""
    n, _, unit = s.strip().partition(" ")
    unit = unit.strip().lower().rstrip("s")
    if not n.isdigit() or unit not in _DURATION_UNIT_MS:
        raise ValueError(f"unsupported duration {s!r}; use e.g. '30 days'")
    return int(n) * _DURATION_UNIT_MS[unit]


def _make_update_user_state(ttl: str | None):
    def _update_user_state(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # TTL expiry: evict the key's state row; no output (the last
            # emitted running totals remain the key's final word).
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        if ttl is not None:
            state.setTimeoutDuration(_duration_ms(ttl))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return _update_user_state


def user_running_state(events: DataFrame, ttl: str | None = None) -> DataFrame:
    """Custom stateful operator: running per-user event count + value total,
    maintained across micro-batches via ``applyInPandasWithState`` (Arrow
    batches in, persistent per-key state, Arrow batches out). The shape to
    copy for any bespoke streaming aggregate Spark lacks.

    State hygiene at 100 TB: the store holds one tiny row per user, but
    with an unbounded user population even tiny rows accumulate forever —
    pass ``ttl`` (e.g. ``"30 days"``) to evict keys idle longer than that
    via a processing-time timeout (the state row is removed; a returning
    user restarts from zero). Pair with the session factory's RocksDB
    state-store provider (session.py) so whatever state remains lives
    off-heap with changelog checkpointing."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_user_state(ttl),
        outputStructType=_RUNNING_STATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def followup_join(
    events: DataFrame,
    first_type: str = "click",
    then_type: str = "purchase",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream funnel join: (first_type → then_type) by the same user
    within ``horizon``. Runs in append mode; both sides carry watermarks
    and the time band bounds BOTH state stores — without the upper bound on
    ``p_ts`` the purchase side would buffer forever.

    ``how="left_outer"`` keeps unconverted clicks: the null-extended row
    for a click with no purchase is emitted only once the watermark passes
    the click's join horizon (the engine must prove no future match can
    arrive before it commits the null) — exactly the funnel-drop-off
    semantics a conversion report needs. Batch path: identical join, no
    watermarks (unified model)."""
    clicks = events.filter(F.col("event_type") == first_type).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = events.filter(F.col("event_type") == then_type).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("c_ts", watermark)
        purchases = purchases.withWatermark("p_ts", watermark)
    return clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    ).select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")


def latest_state_per_user(events: DataFrame) -> DataFrame:
    """Reduce an event set to the latest row per user: ``max_by`` on
    (ts, event_id) — a hash aggregate with map-side combine, no per-user
    sort. event_id rides along so the reduction can be re-applied to its
    own output (idempotent) and ties stay deterministic. Works identically
    on batch and micro-batch DataFrames."""
    tie = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("ts", "event_id", "event_type", "value"), tie
            ).alias("_last")
        )
        .select(
            "user_id",
            F.col("_last.ts").alias("ts"),
            F.col("_last.event_id").alias("event_id"),
            F.col("_last.event_type").alias("event_type"),
            F.col("_last.value").alias("value"),
        )
    )


def upsert_sink(
    events: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    query_name: str = "events_upsert",
):
    """Maintain a latest-state-per-user TABLE from the event stream via
    ``foreachBatch`` — the standard Structured Streaming pattern for sinks
    needing merge semantics the file sink lacks.

    Each micro-batch reduces to one row per user, unions with the current
    table, and re-reduces before the staging-swap overwrite
    (``sinks.overwrite_self_referencing``). Union-then-argmax (rather than
    blind key-merge) makes the sink ORDER-ROBUST: a micro-batch delivering
    older events can never regress newer table state, whatever order the
    file source lists inputs. It is also replay-idempotent (argmax is) —
    checkpoint + idempotent batch is the documented exactly-once recipe.
    Streaming STATE is zero: the cross-batch state lives in the target
    table itself, so the state store never grows with key cardinality."""
    from datalake_nba_dmc_spark.sinks import (
        overwrite_self_referencing,
        read_table,
        table_exists,
        write_table,
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        reduced = latest_state_per_user(batch_df)
        if table_exists(spark, target_path):
            current = read_table(spark, target_path).select(*reduced.columns)
            merged = latest_state_per_user(current.unionByName(reduced))
            overwrite_self_referencing(spark, merged, target_path)
        else:
            write_table(reduced, target_path)

    return (
        events.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — the bread-and-butter streaming
    pattern the funnel join doesn't cover: each micro-batch of the
    (unbounded) stream joins a bounded dimension snapshot. No watermark and
    NO streaming state: Spark re-plans the static side per micro-batch, so
    a broadcast hash join runs fresh against the dimension's latest files
    each trigger (a slowly-changing dim picked up on refresh). The static
    side is explicitly broadcast — at 100 TB of stream the dimension is
    the small side by construction, and a shuffle of the stream side per
    micro-batch would dominate the trigger latency. Works identically on a
    batch DataFrame (unified model; tests assert stream == batch)."""
    return events.join(F.broadcast(dim), on, how)


_TRANSITION_OUT_SCHEMA = StructType(
    [StructField("from_type", StringType()), StructField("to_type", StringType())]
)
_TRANSITION_STATE_SCHEMA = StructType([StructField("last_type", StringType())])


def _emit_transitions(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    types = pdf["event_type"].tolist()
    if state.exists:
        (last_type,) = state.get
        types = [last_type] + types
    state.update((str(pdf.iloc[-1]["event_type"]),))
    yield pd.DataFrame({"from_type": types[:-1], "to_type": types[1:]})


def transition_steps(events: DataFrame) -> DataFrame:
    """Consecutive (from_type → to_type) steps per user — the streaming
    twin of operators/cohort.transition_counts' step extraction.

    Streaming path: ``applyInPandasWithState`` keyed on user_id; state is
    just the last event type, so the store holds ONE tiny row per user
    regardless of stream length, and each micro-batch emits exactly its
    new transitions (the batch is sorted on (ts, event_id) inside the
    Arrow group, and the carried state stitches the cross-batch step).
    Requires micro-batches to arrive in event-time order (time-ordered
    file drops); for out-of-order replays use the batch lag-window path,
    which sorts globally. Batch path: delegates to
    ``operators/cohort.transition_steps_batch`` (same (ts, event_id)
    total order). Aggregate either output with
    ``groupBy(from_type, to_type).count()`` for the transition matrix."""
    if events.isStreaming:
        # NULL-typed events dropped BEFORE the stateful op, matching the
        # batch path: otherwise str(None) would enter the state as the
        # literal 'None' and emit phantom transitions
        return (
            events.filter(F.col("event_type").isNotNull())
            .groupBy("user_id")
            .applyInPandasWithState(
                _emit_transitions,
                outputStructType=_TRANSITION_OUT_SCHEMA,
                stateStructType=_TRANSITION_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
    from datalake_nba_dmc_spark.operators.cohort import transition_steps_batch

    return transition_steps_batch(events)
