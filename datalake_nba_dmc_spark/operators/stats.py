"""Exact distributed statistics — moments and correlation from integer sums.

Plain ``stddev``/``corr`` aggregates accumulate doubles, so their low bits
depend on partial-aggregation order — fine for analysis, fatal for a
cross-engine differential oracle (and irreproducible run-to-run on a real
cluster). These helpers instead reduce each column to EXACT integer sums
(values scaled to fixed-point longs), then combine the sums with a fixed
double-arithmetic expression tree. Identical inputs → identical IEEE ops →
bit-identical results on any engine, any partitioning, any cluster size.

Scale notes:

- One hash aggregate, map-side combined: the shuffle carries only
  (n, Sx, Sy, Sxx, Syy, Sxy) per group — O(groups), not O(rows).
- Long sums hold exactly while n · (scale·max|x|)² < 2^63; for 100 TB facts
  with wide value ranges switch the accumulators to ``decimal(38,0)`` —
  same one-pass shape, ~20% slower.
- The double combination step is per-group scalar work, negligible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: str, scale: int) -> Column:
    return F.round(F.col(col) * scale).cast("long")


def exact_moments(
    df: DataFrame,
    group_by: Sequence[str],
    col: str,
    scale: int = 1,
    prefix: str | None = None,
) -> DataFrame:
    """Per-group n / mean / sample variance / sample stddev, deterministic.

    mean = Sx / scale / n;  var = (n·Sxx − Sx²) / (n·(n−1)) / scale².
    All products/differences are computed in double AFTER the exact integer
    reduction, so there is no long overflow and no order dependence.
    """
    p = prefix or col
    x = _scaled(col, scale)
    agged = df.groupBy(*group_by).agg(
        F.count("*").alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(x * x).alias("_sxx"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    s2 = float(scale) * float(scale)
    return agged.select(
        *group_by,
        F.col("_n").alias(f"{p}_n"),
        (sx / scale / n).alias(f"{p}_mean"),
        ((n * sxx - sx * sx) / (n * (n - 1)) / s2).alias(f"{p}_var"),
        F.sqrt((n * sxx - sx * sx) / (n * (n - 1)) / s2).alias(f"{p}_std"),
    )


def exact_corr(
    df: DataFrame,
    group_by: Sequence[str],
    xcol: str,
    ycol: str,
    xscale: int = 1,
    yscale: int = 1,
    alias: str = "corr",
) -> DataFrame:
    """Per-group Pearson correlation from exact integer sums.

    corr = (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²) · √(n·Syy − Sy²)); the scale
    factors cancel. Same one-pass / O(groups)-shuffle shape as
    ``exact_moments``.
    """
    x, y = _scaled(xcol, xscale), _scaled(ycol, yscale)
    agged = df.groupBy(*group_by).agg(
        F.count("*").alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
        F.sum(x * y).alias("_sxy"),
    )
    n = F.col("_n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    return agged.select(
        *group_by,
        F.col("_n").alias("n"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias(alias),
    )


def psi_binned(
    df: DataFrame,
    split_col: Column,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int = 10,
) -> DataFrame:
    """Population Stability Index between the rows where ``split_col`` is
    true (baseline A) and false (comparison B) — the standard
    distribution-drift monitor for feature/label pipelines
    (PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 action).

    Equi-width bins over [lo, hi] with edge clamping (same binning as
    ``profile.histogram``); per-bin shares are Laplace-smoothed
    (``(cnt + 0.5) / (total + nbins/2)``) so empty bins contribute finite
    terms deterministically instead of the ±inf of the raw formula.
    Returns one row per bin: counts, both shares, and the bin's PSI
    contribution ``(pa − pb)·ln(pa/pb)`` rounded to 6 dp (ln may differ
    in the last ulp across engines — the tf_idf rounding rule); sum the
    contributions for the scalar PSI.

    Scale shape: ONE scan → conditional counts per bin (map-side
    combined, ≤ nbins groups) → totals broadcast back. No sort, no
    per-row state — the grain is bins, never rows."""
    w = (float(hi) - float(lo)) / nbins
    # clamp the LONG bucket BEFORE narrowing to int: a corrupt outlier
    # value puts the raw floor() past 2^31 and an early cast would be an
    # ANSI ARITHMETIC_OVERFLOW — on the one operator whose whole job is
    # being fed suspect data
    bucket = F.least(
        F.greatest(F.floor((F.col(value_col) - float(lo)) / F.lit(w)), F.lit(0)),
        F.lit(nbins - 1),
    ).cast("int")
    # rows where the split predicate is NULL (e.g. a NULL date) belong to
    # NEITHER cohort and are excluded EXPLICITLY: left in, they form
    # bucket rows whose conditional sums are NULL-skipped — an unknown
    # period cannot vote on drift (robustness_audit `nulls` finding)
    counts = (
        df.filter(F.col(value_col).isNotNull() & split_col.isNotNull())
        .select(bucket.alias("bucket"), split_col.cast("int").alias("_is_a"))
        .groupBy("bucket")
        .agg(
            F.sum("_is_a").cast("long").alias("n_a"),
            F.sum(1 - F.col("_is_a")).cast("long").alias("n_b"),
        )
    )
    totals = counts.agg(
        F.sum("n_a").alias("_ta"), F.sum("n_b").alias("_tb")
    )
    sm = float(nbins) / 2.0
    pa = (F.col("n_a") + 0.5) / (F.col("_ta") + sm)
    pb = (F.col("n_b") + 0.5) / (F.col("_tb") + sm)
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "n_a",
            "n_b",
            F.round(pa, 6).alias("share_a"),
            F.round(pb, 6).alias("share_b"),
            F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_contrib"),
        )
    )
