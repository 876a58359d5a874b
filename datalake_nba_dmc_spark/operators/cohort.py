"""Cohort retention analysis — the standard product-analytics rollup
(cohort = first-active period; retention = share of the cohort active
again N periods later).

Not in the reference (its marts are latest-state only, reference
``aws-job-silver-to-gold-team/aws-job-silver-to-gold-team.py:55-70``),
but it is the first query any events-table owner asks for.

Shape chosen for 100 TB of events:

1. Distinct (user, period) pairs — ONE shuffle, map-side combined; this
   collapses arbitrarily hot users to ≤ periods rows each before
   anything else touches them.
2. Per-user first period — a groupBy on user over the already-small
   pair set (re-uses the hash-partitioning by user_id where AQE can).
3. Pair ⋈ first-period on user — co-keyed shuffle join.
4. Count rows per (cohort, offset): because step 1 de-duplicated
   (user, period) and offset is a function of (period, cohort), a plain
   ``count`` IS the exact distinct-user count — no second distinct.

Total: three shuffles, none carrying more than |users × periods| rows,
no windows, no skew-sensitive distinct over raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PERIOD_DAYS = {"week": 7, "month": None, "day": 1}


def cohort_retention(
    events: DataFrame, user_col: str, ts_col: str, period: str = "week"
) -> DataFrame:
    """Retention triangle ``(cohort, period_offset, active_users,
    cohort_size, retention_rate)``. ``period`` ∈ day/week/month; offsets
    count whole periods since the user's first-active period (month uses
    calendar-month arithmetic, day/week use exact day counts)."""
    if period not in _PERIOD_DAYS:
        raise ValueError(f"period must be one of {sorted(_PERIOD_DAYS)}")

    pairs = events.select(
        F.col(user_col).alias("_u"),
        F.date_trunc(period, F.col(ts_col)).alias("_p"),
    ).distinct()
    firsts = pairs.groupBy("_u").agg(F.min("_p").alias("cohort"))

    if period == "month":
        offset = (
            (F.year("_p") - F.year("cohort")) * 12
            + (F.month("_p") - F.month("cohort"))
        ).cast("int")
    else:
        offset = (
            F.datediff(F.col("_p"), F.col("cohort")) / _PERIOD_DAYS[period]
        ).cast("int")

    active = (
        pairs.join(firsts, "_u")
        .groupBy(F.col("cohort"), offset.alias("period_offset"))
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    sizes = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return active.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "period_offset",
        "active_users",
        "cohort_size",
        (F.col("active_users").cast("double") / F.col("cohort_size")).alias(
            "retention_rate"
        ),
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    id_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered N-step funnel: for each entity that performed ``steps[0]``,
    the earliest timestamp of each subsequent step occurring STRICTLY
    after the previous step's earliest completion — the standard
    conversion-funnel report (a later step only counts if it happened in
    order).

    Scale shape: one filtered min-aggregate per step (map-side combined,
    keyed by ``id_col``) chained by equi-joins on the id. Each join's
    build side is the survivors of the previous step — monotonically
    shrinking, so with AQE the deep-funnel joins flip to broadcast as the
    cohort narrows. No windows over raw events, no per-entity sorting.
    """
    first = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(id_col)
        .agg(F.min(ts_col).alias("step_1_ts"))
    )
    out, cur, prev_col = first, first, "step_1_ts"
    for i, step in enumerate(steps[1:], start=2):
        col = f"step_{i}_ts"
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(cur.select(id_col, prev_col), on=id_col)
            .filter(F.col(ts_col) > F.col(prev_col))
            .groupBy(id_col)
            .agg(F.min(ts_col).alias(col))
        )
        out = out.join(nxt, on=id_col, how="left")
        cur, prev_col = nxt, col
    return out


def last_touch_attribution(
    events: DataFrame,
    touch_types: list[str],
    conversion_type: str = "purchase",
    attribution_window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Last-touch marketing attribution: for every conversion event, the
    most recent touch event (``touch_types``) by the same user at or
    before the conversion and within ``attribution_window_days`` — the
    standard product-analytics credit assignment. Conversions with no
    in-window touch keep NULL attribution (they still count).

    Scale shape: touches first reduce to unique (user, ts) rows (max
    event_id pins simultaneous touches deterministically), then the
    point-in-time lookup is :func:`~datalake_nba_dmc_spark.operators.
    temporal.asof_join`'s union-merge — ONE exchange + sort over
    |conversions| + |touches|, no per-key quadratic argmax, no range
    explosion. The window cutoff is a post-hoc null-out, not a join
    predicate, so the join stays a pure as-of merge.
    """
    from datalake_nba_dmc_spark.operators.temporal import asof_join

    touches = (
        events.filter(F.col("event_type").isin(*touch_types))
        .groupBy(user_col, ts_col)
        .agg(
            F.max("event_id").alias("touch_event_id"),
            F.max_by("event_type", "event_id").alias("touch_type"),
        )
        .withColumn("touch_ts", F.col(ts_col))
    )
    conversions = events.filter(F.col("event_type") == conversion_type).select(
        "event_id", user_col, ts_col, "value"
    )
    att = asof_join(
        conversions,
        touches,
        key=user_col,
        left_ts=ts_col,
        right_ts=ts_col,
        right_cols=["touch_event_id", "touch_type", "touch_ts"],
        prefix="",
    )
    in_window = F.col("touch_ts") >= F.col(ts_col) - F.expr(
        f"INTERVAL {int(attribution_window_days)} DAYS"
    )
    return att.select(
        "event_id",
        user_col,
        ts_col,
        "value",
        F.when(in_window, F.col("touch_event_id")).alias("touch_event_id"),
        F.when(in_window, F.col("touch_type")).alias("touch_type"),
        F.when(in_window, F.col("touch_ts")).alias("touch_ts"),
    )


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Event-type transition matrix (first-order Markov counts): for each
    user's time-ordered event stream, count every consecutive
    (``from_type`` → ``to_type``) step across all users — the input to
    next-action models and funnel discovery.

    Scale shape: ONE exchange on ``user_col`` + per-partition sort for the
    lag, then a map-side-combinable hash agg on the (from, to) pair whose
    output is at most |types|² rows — no self-join on the event table (the
    naive pairing of ``e1 ⋈ e2 ON e2 is next after e1`` is a per-user
    quadratic). The tiebreaker makes the ordering total, so simultaneous
    events produce a deterministic transition."""
    steps = transition_steps_batch(events, user_col, ts_col, type_col, tiebreak_col)
    return steps.groupBy("from_type", "to_type").agg(F.count("*").alias("n_steps"))


def transition_steps_batch(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """The step-extraction half of :func:`transition_counts`: one row per
    consecutive (from_type, to_type) pair under the per-user
    (``ts_col``, ``tiebreak_col``) total order — one exchange + lag
    window. Shared by the streaming twin's batch path
    (``streaming.transition_steps``). NULL-typed events are excluded up
    front so the semantics are symmetric (a NULL type can be neither end
    of a step) and identical between the batch and streaming paths."""
    from pyspark.sql import Window

    events = events.filter(F.col(type_col).isNotNull())
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    return events.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
