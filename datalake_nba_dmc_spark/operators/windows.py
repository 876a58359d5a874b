"""Window operators: W1 (top-1 per group) plus ranking/lag/running variants.

Reference site: ``Window.partitionBy("player_name").orderBy(desc(game_date))``
+ ``row_number`` + ``filter(row_num == 1)`` — "latest team per player"
(``aws-job-silver-to-gold-player/aws-job-silver-to-gold-player.py:37-46``).

Scale notes:

- A ranking window shuffles once on the partition key and sorts within
  partitions; with AQE skew handling a hot key is split automatically.
- The reference's orderBy has nondeterministic ties (same date); every
  helper here takes explicit tiebreakers so results are stable under any
  partitioning (SURVEY.md §7.3).
- ``top1_per_group`` notes the ``max_by`` alternative: for pure argmax
  (no extra carried columns) ``F.max_by`` is a single hash aggregate —
  cheaper than window+filter at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _window(partition_by: Sequence[str], order_by: Sequence[Column]):
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def top1_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """W1 — keep the first row per group under ``order_by`` (argmax)."""
    w = _window(partition_by, order_by)
    return (
        df.withColumn("row_num", F.row_number().over(w))
        .filter(F.col("row_num") == 1)
        .drop("row_num")
    )


def top1_per_group_maxby(
    df: DataFrame,
    group_cols: Sequence[str],
    score: Column,
    payload_cols: Sequence[str],
) -> DataFrame:
    """W1 scale path — argmax as a hash aggregate instead of a window.

    ``F.max_by(payload, score)`` per payload column, all under one
    ``groupBy``: a single shuffle WITH map-side combine and no
    within-partition sort, versus the ranking window's full sort of every
    group. ``score`` must be totally ordered and tie-free (encode
    tiebreakers into it) or the argmax is nondeterministic across payload
    columns. Result column names/types match ``top1_per_group`` restricted
    to ``group_cols + payload_cols``.
    """
    return df.groupBy(*group_cols).agg(
        *[F.max_by(c, score).alias(c) for c in payload_cols]
    )


def with_rank(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    dense: bool = False,
    alias: str = "rank",
) -> DataFrame:
    w = _window(partition_by, order_by)
    fn = F.dense_rank() if dense else F.rank()
    return df.withColumn(alias, fn.over(w))


def with_lag(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    col: str,
    offset: int = 1,
    alias: str | None = None,
) -> DataFrame:
    w = _window(partition_by, order_by)
    return df.withColumn(alias or f"{col}_lag{offset}", F.lag(col, offset).over(w))


def with_ntile(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    n: int,
    alias: str = "bucket",
) -> DataFrame:
    """Equi-height bucketing (quartiles/deciles). Ordering must include a
    unique tiebreaker or bucket boundaries are nondeterministic."""
    return df.withColumn(alias, F.ntile(n).over(_window(partition_by, order_by)))


def with_percent_rank(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    alias: str = "pct_rank",
    cume_alias: str | None = None,
) -> DataFrame:
    """percent_rank (and optionally cume_dist) — pure integer-ratio window
    functions, bit-deterministic across engines."""
    w = _window(partition_by, order_by)
    out = df.withColumn(alias, F.percent_rank().over(w))
    if cume_alias:
        out = out.withColumn(cume_alias, F.cume_dist().over(w))
    return out


def with_moving_exact_avg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    col: str,
    preceding: int,
    scale: int = 100,
    alias: str | None = None,
) -> DataFrame:
    """Moving average over a rows-frame [preceding, current], computed as
    (exact scaled-long frame sum) / (scale * frame count) so the double is
    bit-identical in any engine regardless of intra-frame add order."""
    w = _window(partition_by, order_by).rowsBetween(-preceding, Window.currentRow)
    exact = F.sum(F.round(F.col(col) * scale).cast("long")).over(w)
    cnt = F.count("*").over(w)
    return df.withColumn(
        alias or f"{col}_mavg", exact / float(scale) / cnt
    )


def with_first_last(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    col: str,
    first_alias: str,
    last_alias: str,
) -> DataFrame:
    """first_value/last_value over the FULL partition frame — the default
    frame (unbounded-preceding → current) makes last_value a running value,
    which is almost never what users mean; pin the frame explicitly."""
    w = _window(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return df.withColumn(first_alias, F.first(col).over(w)).withColumn(
        last_alias, F.last(col).over(w)
    )


def with_running_sum(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    col: str,
    alias: str | None = None,
) -> DataFrame:
    """Running total with an explicit rows-frame (unbounded-preceding→current)."""
    w = _window(partition_by, order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(alias or f"{col}_running", F.sum(col).over(w))


def with_time_range_sum(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    value_col: str,
    range_seconds: int,
    scale: int = 10000,
    n_alias: str = "n_in_range",
    sum_alias: str = "sum_in_range",
) -> DataFrame:
    """Event-time RANGE frame aggregation: per row, count + exact scaled sum
    of ``value_col`` over the trailing ``range_seconds`` window ending at
    (and including) the row's own timestamp — ``RANGE BETWEEN INTERVAL ...
    PRECEDING AND CURRENT ROW`` semantics, without bucketing artifacts.

    The frame orders by ``unix_micros(ts)`` so the bound is exact at the
    on-disk microsecond precision (an interval frame over a truncated
    seconds/millis key would include or drop boundary rows differently
    from an engine evaluating at full precision). Peers (equal timestamps)
    are in-frame together in any engine — value-based frames have no tie
    ambiguity, so no tiebreaker column is needed.

    Scale shape: one shuffle on the partition key + an in-partition sort;
    the range frame is evaluated with a sliding two-pointer pass, O(rows)
    per partition, state bounded by the widest in-range span.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-range_seconds * 1_000_000, 0)
    )
    exact = F.sum(F.round(F.col(value_col) * scale).cast("long")).over(w)
    return df.withColumn(n_alias, F.count("*").over(w)).withColumn(
        sum_alias, exact / float(scale)
    )
