"""Slowly-changing-dimension (type 2) builds.

The reference's gold marts keep only the LATEST state per entity (W1
argmax — reference ``aws-job-silver-to-gold-player/aws-job-silver-to-gold-
player.py:37-75``); a warehouse user also needs the full history with
validity intervals — SCD type 2. This derives those intervals from a
change-event stream with one window pass.

Scale: a single shuffle on the entity key (the window partition); no
self-joins, no per-entity iteration. Interval derivation is
embarrassingly parallel per key — skewed hot entities are bounded by
their own event counts, and the window never crosses keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changes(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build type-2 rows from a change stream: each change opens a version
    valid from its timestamp until the NEXT change of the same key
    (``lead`` over the key window); the last version per key is current
    (``valid_to`` NULL, ``is_current`` 1).

    ``tiebreak_cols`` must make (key, ts, tiebreaks) unique — same-instant
    changes get a deterministic order instead of a nondeterministic lead.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    out = changes.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    )
    return out.withColumn(
        "is_current", F.col("valid_to").isNull().cast("int")
    )


def scd2_current(dim: DataFrame) -> DataFrame:
    """The type-1 view of a type-2 dimension: current rows only."""
    return dim.filter(F.col("is_current") == 1).drop("valid_to", "is_current")


def scd2_as_of(dim: DataFrame, ts) -> DataFrame:
    """Point-in-time view: the version of each key valid at ``ts``
    (valid_from <= ts < valid_to, open-ended current rows included).
    A filter, not a join — partition-prunable when the dim is written
    partitioned by is_current or date-bucketed valid_from."""
    point = F.lit(ts).cast("timestamp")
    return dim.filter(
        (F.col("valid_from") <= point)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > point))
    )
