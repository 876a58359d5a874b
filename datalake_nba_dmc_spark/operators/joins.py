"""Join operators: J1–J4 semantics plus the inner/semi/anti surface.

Reference sites: J1 single-key left equi-join
(``aws-job-bronze-to-silver/aws-job-bronze-to-silver.py:110-114``), J2
expression-key join (``:158-165``), J3 two-column equi with a derived key
(``:199-208``), J4 USING-style join
(``aws-job-silver-to-gold-player/aws-job-silver-to-gold-player.py:75``).

Scale notes:

- Every helper takes ``broadcast_right`` — the reference never hints join
  strategy (SURVEY.md §2.5) and relies on defaults; at 100 TB a small
  dimension side (region/nation/season-style tables) must be broadcast so
  the big fact side never shuffles. Catalyst + AQE still pick
  sort-merge/shuffled-hash when the hint is absent.
- Expression keys (J2) are evaluated before the exchange, so they remain
  plain equi-joins — no nested-loop fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maybe_broadcast(df: DataFrame, flag: bool) -> DataFrame:
    return F.broadcast(df) if flag else df


def left_join(
    left: DataFrame,
    right: DataFrame,
    on: Column | str | list[str],
    broadcast_right: bool = False,
) -> DataFrame:
    """J1/J2/J3/J4 — left outer join on a key, expression, or column list."""
    return left.join(_maybe_broadcast(right, broadcast_right), on=on, how="left")


def inner_join(
    left: DataFrame,
    right: DataFrame,
    on: Column | str | list[str],
    broadcast_right: bool = False,
) -> DataFrame:
    return left.join(_maybe_broadcast(right, broadcast_right), on=on, how="inner")


def semi_join(
    left: DataFrame,
    right: DataFrame,
    on: Column | str | list[str],
    broadcast_right: bool = False,
) -> DataFrame:
    """EXISTS — returns left rows with a match; never duplicates left rows."""
    return left.join(_maybe_broadcast(right, broadcast_right), on=on, how="left_semi")


def anti_join(
    left: DataFrame,
    right: DataFrame,
    on: Column | str | list[str],
    broadcast_right: bool = False,
) -> DataFrame:
    """NOT EXISTS — left rows without a match."""
    return left.join(_maybe_broadcast(right, broadcast_right), on=on, how="left_anti")
