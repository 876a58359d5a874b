"""Column profiling and exact histograms — the feature-stats pass a
training-data pipeline runs over every new table drop.

The reference's only whole-table inspection is the N-scans-for-N-columns
bounds anti-pattern this repo already replaced with a one-pass aggregate
(``aggregates.column_bounds``, reference
``aws-job-silver-to-gold-player/aws-job-silver-to-gold-player.py:75-80``);
the profiler generalizes it: null counts, exact distinct counts, and
min/max for ANY number of columns in ONE scan, emitted long-format so
the report schema is stable however many columns are profiled.

Scale notes:

- N exact ``countDistinct`` aggregates in one ``agg`` compile to a
  single scan with an Expand (×N rows into the partial aggregate) —
  one pass over storage, N× the shuffle of one distinct. For quick
  profiles at extreme widths pass ``approx=True``: HLL++ sketches,
  no Expand, one ordinary shuffle.
- The histogram is a pure projection (``floor((x-lo)/w)`` clamp) + one
  hash aggregate on at most ``nbins`` keys, then a broadcast join
  against a ``spark.range(nbins)`` spine so empty bins surface as
  zero rows — O(rows) map-side work, O(nbins) result.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """One-scan profile of ``cols`` (numeric or castable-to-double):
    ``(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)``,
    one row per column. ``approx=True`` swaps exact distinct counts for
    HLL++ estimates (scale path for very wide profiles)."""
    cd = F.approx_count_distinct if approx else F.countDistinct
    aggs = []
    for c in cols:
        aggs.extend(
            [
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                    f"__nn_{c}"
                ),
                cd(c).alias(f"__nd_{c}"),
                F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__mx_{c}"),
            ]
        )
    row = df.agg(*aggs, F.count(F.lit(1)).alias("__total"))
    packed = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_val"),
                F.col(f"__mx_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(packed).alias("p"), "__total").select(
        "p.col_name",
        F.col("__total").alias("n_rows"),
        "p.n_nulls",
        "p.n_distinct",
        "p.min_val",
        "p.max_val",
    )


def histogram(
    spark: SparkSession,
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Exact equi-width histogram of ``col`` over ``[lo, hi]``:
    ``(bucket, bin_lo, bin_hi, cnt)`` with every bin present (empty bins
    carry cnt=0). Values outside the range clamp into the edge bins; the
    final bin is closed at ``hi`` (standard last-bin-closed). NULLs are
    excluded. All bucket arithmetic is plain IEEE double math, so an
    engine evaluating the same expression bins identically."""
    w = (float(hi) - float(lo)) / nbins
    bucket = F.least(
        F.greatest(
            F.floor((F.col(col) - float(lo)) / F.lit(w)).cast("int"), F.lit(0)
        ),
        F.lit(nbins - 1),
    )
    counts = (
        df.filter(F.col(col).isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spine = spark.range(nbins).select(F.col("id").cast("int").alias("bucket"))
    return (
        spine.join(counts, "bucket", "left")
        .select(
            "bucket",
            (F.lit(float(lo)) + F.col("bucket") * F.lit(w)).alias("bin_lo"),
            (F.lit(float(lo)) + (F.col("bucket") + 1) * F.lit(w)).alias(
                "bin_hi"
            ),
            F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt"),
        )
    )


def robust_outlier_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z_cutoff: float = 3.5,
) -> DataFrame:
    """Robust (median/MAD) outlier profile per group: exact median,
    median-absolute-deviation, and the count of rows whose modified
    z-score ``0.6745 · |x − median| / MAD`` exceeds ``z_cutoff``
    (Iglewicz-Hoaglin, public) — the standard mean/σ-free data-quality
    screen, immune to the outliers it is hunting.

    Scale shape: the group medians/MADs are O(groups) rows broadcast
    back, so the corpus is scanned three times (median pass, MAD pass,
    flag pass) but never shuffled (the percentile aggregates shuffle only
    per-group value lists). Exact ``percentile`` holds each group's
    values in the aggregation buffer — right for bounded-cardinality
    profiling groups (status flags, sources, partitions); switch to
    ``approx_percentile`` for unbounded group sizes at 100 TB, where ±ε
    on the median moves a z-screen by nothing that matters.

    MAD = 0 (≥ half the group's values equal the median — constant
    columns, discrete flags) pins ``n_outliers`` to 0 rather than
    dividing by zero: the modified z-score is undefined there, and both
    engines mirror the same guard so the convention is oracle-checked.
    """
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile(`{value_col}`, 0.5)").alias("med"),
        F.count("*").alias("n_rows"),
    )
    dev = (
        df.join(F.broadcast(med), on=group_col)
        .withColumn("_adev", F.abs(F.col(value_col) - F.col("med")))
    )
    mad = dev.groupBy(group_col).agg(F.expr("percentile(_adev, 0.5)").alias("mad"))
    flagged = (
        dev.join(F.broadcast(mad), on=group_col)
        .withColumn(
            "_is_out",
            F.when(
                (F.col("mad") > 0)
                & ((F.lit(0.6745) * F.col("_adev") / F.col("mad")) > F.lit(z_cutoff)),
                F.lit(1),
            )
            .otherwise(F.lit(0)),
        )
        .groupBy(group_col)
        .agg(F.sum("_is_out").alias("n_outliers"))
    )
    return (
        med.join(mad, on=group_col)
        .join(flagged, on=group_col)
        .select(group_col, "n_rows", "med", "mad", "n_outliers")
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    out_col: str = "winsorized",
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` to the group's
    [``lo_q``, ``hi_q``] interpolated percentiles — the standard
    heavy-tail taming step before training-feature extraction (unlike
    dropping outliers, every row survives with a bounded value).

    Scale shape: one grouped exact-percentile pass produces O(groups)
    bound rows, broadcast back onto the corpus for a map-only clamp —
    the corpus is scanned twice and never shuffled. Exact ``percentile``
    holds per-group values in the agg buffer (bounded-cardinality groups;
    swap to ``approx_percentile`` beyond that). Returns the input plus
    ``out_col`` and the group bounds ``_lo``/``_hi``."""
    bounds = df.groupBy(group_col).agg(
        F.expr(f"percentile(`{value_col}`, {lo_q})").alias("_lo"),
        F.expr(f"percentile(`{value_col}`, {hi_q})").alias("_hi"),
    )
    # NULL guard: greatest/least SKIP null arguments, so an unguarded
    # clamp would fabricate the group's _lo for every NULL measurement —
    # missing values must stay missing through a taming step.
    return df.join(F.broadcast(bounds), on=group_col).withColumn(
        out_col,
        F.when(
            F.col(value_col).isNotNull(),
            F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi")),
        ),
    )
