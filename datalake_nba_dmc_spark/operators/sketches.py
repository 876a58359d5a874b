"""Mergeable distinct-count sketches (Apache DataSketches HLL).

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

from pyspark.sql import DataFrame
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
