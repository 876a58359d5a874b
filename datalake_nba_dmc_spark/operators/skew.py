"""Skew mitigation: salted joins and two-phase salted aggregation.

AQE's skew-join handling (enabled in session.py) covers most cases at
runtime by splitting oversized partitions; these explicit forms are for the
cases AQE can't fix — a single hot key inside one task during aggregation,
or a broadcast-ineligible dimension with hot join keys. Semantics are
identical to the plain operators (oracle-checked in the suite); only the
physical distribution changes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    salt_factor: int = 8,
) -> DataFrame:
    """Two-phase aggregate for hot group keys.

    Phase 1 groups by (keys + random salt in [0, salt_factor)) so a hot
    key's rows spread over ``salt_factor`` reducers; phase 2 merges the
    partials by the real keys. ``aggs`` is (col, fn, alias) with fn in
    sum/count/min/max — the decomposable aggregates (count remerges via
    sum). Cost: two small shuffles instead of one skewed one.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_factor).cast("int"))
    phase1 = salted.groupBy(*group_cols, "_salt").agg(
        *[getattr(F, fn)(c).alias(alias) for c, fn, alias in aggs]
    )
    return phase1.groupBy(*group_cols).agg(
        *[getattr(F, merge_fn[fn])(alias).alias(alias) for _, fn, alias in aggs]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_factor: int = 8,
) -> DataFrame:
    """Equi-join resilient to hot keys on the (large) left side.

    Left rows get a random salt in [0, salt_factor); the right side is
    replicated ``salt_factor`` times (explode of a literal range) so every
    (key, salt) pair finds its match. The shuffle key becomes (key, salt) —
    a hot left key now spreads over ``salt_factor`` tasks. Right-side cost:
    |R| × salt_factor rows, so use for moderate right sides that are too
    big to broadcast but far smaller than the skewed left.
    """
    salted_l = left.withColumn("_salt", (F.rand(seed=42) * salt_factor).cast("int"))
    replicated_r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return salted_l.join(replicated_r, on=[on, "_salt"], how=how).drop("_salt")
