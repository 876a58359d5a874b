"""Mergeable sketches (Apache DataSketches HLL / KLL / Theta).

The reference computes exact ``countDistinct`` marts (reference
``aws-job-silver-to-gold-player/aws-job-silver-to-gold-player.py:66-70``);
at 100 TB the scale path is a MERGEABLE sketch materialized once at the
finest grain and rolled up without ever rescanning the raw data:

1. ``hll_partial`` — one pass over the fact table produces a binary HLL
   sketch per fine-grain group (a gold "sketch table", tiny: one
   ~``2^lg_k``-byte blob per group).
2. ``hll_rollup`` — any coarser grouping is answered by ``hll_union_agg``
   over the sketch table alone. A 100 TB fact table is touched once;
   every subsequent rollup level (day→month→year, sku→brand→category)
   reads kilobytes.

This is the property ``approx_count_distinct`` alone does not give you:
its sketch lives only inside one aggregation — it cannot be stored and
re-merged across queries. DataSketches HLL blobs can.

Accuracy: relative standard error ≈ 1.04/sqrt(2^lg_k) (1.6% at the
default lg_k=12); union does not degrade the bound.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_partial(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    lg_k: int = 12,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """One scan → one binary HLL sketch of ``key_col`` per fine-grain
    group. This is the only pass that touches the fact table; persist its
    output as the sketch table."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias(sketch_col)
    )


def hll_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "hll_sketch",
    estimate_col: str = "distinct_est",
) -> DataFrame:
    """Merge fine-grain sketches up to ``group_cols`` and estimate.

    Pure sketch-table input — no fact-table access. The merge is a plain
    hash aggregation over blobs (map-side combinable, skew-immune: every
    group's state is one fixed-size sketch regardless of row count)."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(estimate_col)
    )


def distinct_rollup(
    df: DataFrame,
    fine_cols: Sequence[str],
    coarse_cols: Sequence[str],
    key_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Fine-grain sketch pass + coarse rollup in one plan — the shape a
    scheduled pipeline would split into "build sketch table" (once) and
    "roll up" (per dashboard query)."""
    return hll_rollup(hll_partial(df, fine_cols, key_col, lg_k), coarse_cols)


def kll_partial(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 200,
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """One scan → one binary KLL quantile sketch of ``value_col`` (double)
    per fine-grain group. The quantile counterpart of ``hll_partial``:
    ``approx_percentile`` answers ONE aggregation, but its state cannot be
    stored; a persisted KLL sketch table answers any later quantile/rank
    question and any coarser rollup without rescanning the fact table.
    Normalized rank error ≈ 1.65% at the default k=200; merging does not
    widen the bound (KLL is mergeable by construction)."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(value_col, F.lit(k)).alias(sketch_col)
    )


def kll_quantile_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    quantiles: Sequence[float],
    sketch_col: str = "kll_sketch",
    prefix: str = "q",
) -> DataFrame:
    """Merge fine-grain KLL sketches up to ``group_cols`` and read one
    estimate per requested quantile (columns ``{prefix}{pct}``), plus the
    merged sketch itself so callers can also probe ranks. Pure
    sketch-table input — the fact table is never touched; the merge is a
    fixed-size-state hash agg (skew-immune like the HLL path)."""
    merged = sketches.groupBy(*group_cols).agg(
        F.kll_merge_agg_double(sketch_col).alias(sketch_col)
    )
    cols = [F.col(c) for c in group_cols] + [F.col(sketch_col)]
    for q in quantiles:
        # encode the full quantile value in the name (q50, q90, q99_5 …)
        # so distinct quantiles can never collide into one column name
        pct = f"{q * 100:.10g}".replace(".", "_")
        cols.append(
            F.kll_sketch_get_quantile_double(F.col(sketch_col), F.lit(float(q))).alias(
                f"{prefix}{pct}"
            )
        )
    return merged.select(*cols)


def theta_overlap(
    df: DataFrame,
    key_col: str,
    flag_a: Column,
    flag_b: Column,
    lg_k: int = 12,
) -> DataFrame:
    """Distinct-key set algebra between two row predicates via Theta
    sketches: |A ∩ B| and |A \\ B| estimates from ONE scan. This is the
    capability HLL lacks — HLL unions but cannot intersect; Theta supports
    intersection/difference with bounded error, so audience-overlap /
    cross-segment-reach questions at 100 TB are one scan + sketch algebra
    instead of a distinct-heavy self-join. Returns a single row with
    ``est_inter`` and ``est_diff_a`` (A minus B)."""
    sk = df.select(
        F.theta_sketch_agg(F.when(flag_a, F.col(key_col)), F.lit(lg_k)).alias("sk_a"),
        F.theta_sketch_agg(F.when(flag_b, F.col(key_col)), F.lit(lg_k)).alias("sk_b"),
    )
    return sk.select(
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
        ).alias("est_inter"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("sk_a"), F.col("sk_b"))
        ).alias("est_diff_a"),
    )
