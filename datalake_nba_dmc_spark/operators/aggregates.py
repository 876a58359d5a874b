"""Aggregation operators: A1–A5 plus rollup/cube and approx variants.

Reference sites: A1 whole-row dedup
(``aws-job-landing-to-bronze/aws-job-landing-to-bronze.py:59``), A2
dtype-driven dynamic aggregate
(``aws-job-silver-to-silver/aws-job-silver-to-silver.py:42-49``), A3/A4
multi-measure sum + exact countDistinct marts
(``aws-job-silver-to-gold-player/aws-job-silver-to-gold-player.py:52-72``,
``aws-job-silver-to-gold-team/aws-job-silver-to-gold-team.py:32-48``).

Scale notes:

- Catalyst plans all of these as partial (map-side) + final hash
  aggregates — one shuffle on the group key, combiner semantics for free.
- Exact ``countDistinct`` forces a second aggregation pass keyed by
  (group, distinct value); keep it for parity, but
  ``approx_count_distinct`` (HLL++, single pass, mergeable sketch) is the
  100 TB path — exposed here as ``approx=True``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: dtype strings eligible for the dynamic aggregate (the reference keys on
#: the literal dtype string 'int' — ``...silver-to-silver.py:45`` — because
#: its upstream narrowing made measures int; we accept the numeric family).
NUMERIC_DTYPES = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def dedup_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """A1 — whole-row (or subset-keyed) duplicate elimination."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def dynamic_sum_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    dtypes: Sequence[str] = ("int", "bigint"),
) -> DataFrame:
    """A2 — group by descriptive columns; sum every column whose dtype is in
    ``dtypes`` (chosen at runtime from the DataFrame schema, exactly the
    reference idiom at ``...silver-to-silver.py:42-49``)."""
    agg_cols = [
        c for c, t in df.dtypes if t.split("(")[0] in dtypes and c not in group_cols
    ]
    return df.groupBy(*group_cols).agg(*[F.sum(c).alias(c) for c in agg_cols])


def multi_measure_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    distinct_count_col: str | None = None,
    distinct_count_alias: str = "games_played",
    extra: Sequence[Column] = (),
    approx: bool = False,
) -> DataFrame:
    """A3/A4 — N× sum + exact (or approx) countDistinct + computed measures.

    ``extra`` takes expression-over-aggregate columns such as the
    reference's ``((sum(sec)+sum(min_to_sec))/60).cast(double)``
    (``...silver-to-gold-player.py:70``).
    """
    aggs: list[Column] = [F.sum(c).alias(c) for c in sum_cols]
    if distinct_count_col is not None:
        cd = (
            F.approx_count_distinct(distinct_count_col)
            if approx
            else F.countDistinct(distinct_count_col)
        )
        aggs.append(cd.alias(distinct_count_alias))
    aggs.extend(extra)
    return df.groupBy(*group_cols).agg(*aggs)


def multi_measure_agg_preagg(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_count_col: str,
    sums: dict[str, Column],
    distinct_count_alias: str = "games_played",
    derived: dict[str, Column] | None = None,
) -> DataFrame:
    """A3/A4 scale path — exact distinct count via explicit two-phase plan.

    Phase 1 pre-aggregates by (group, distinct key): every ``sums`` value is
    summed under its dict key. Phase 2 re-aggregates by the group key alone:
    ``SUM`` of each partial sum (sums over longs re-associate exactly) and
    ``COUNT(distinct_count_col)`` — one row per distinct non-null key
    survives phase 1, so a plain count IS the exact distinct count, with
    ``countDistinct``'s null semantics. ``derived`` expressions run after
    phase 2 over the summed columns plus ``line_count`` (``COUNT(*)`` rolled
    up through phase 1).

    Versus the single ``groupBy`` + ``countDistinct`` plan this feeds the
    wide input through one narrow pre-shuffle aggregation instead of
    Catalyst's merged distinct plan, and every shuffled row carries only
    partial sums — at cluster scale the first exchange is the bottleneck
    and this roughly halves it (measured 15% faster even at sf0.1 on
    local[32]).
    """
    pre = df.groupBy(*group_cols, distinct_count_col).agg(
        *[F.sum(expr).alias(name) for name, expr in sums.items()],
        F.count(F.lit(1)).alias("__cnt"),
    )
    out = pre.groupBy(*group_cols).agg(
        F.count(distinct_count_col).alias(distinct_count_alias),
        *[F.sum(name).alias(name) for name in sums],
        F.sum("__cnt").alias("line_count"),
    )
    for name, expr in (derived or {}).items():
        out = out.withColumn(name, expr)
    return out


def column_bounds(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A5 — per-column max/min in ONE pass (replaces the reference's
    per-column RDD ``max()`` loop, ``...landing-to-bronze.py:74``)."""
    return df.agg(
        *[F.max(c).alias(f"max_{c}") for c in cols],
        *[F.min(c).alias(f"min_{c}") for c in cols],
    )


def rollup_agg(df: DataFrame, group_cols: Sequence[str], *aggs: Column) -> DataFrame:
    """Hierarchical subtotals (beyond-reference; SURVEY.md §2.6 'absent')."""
    return df.rollup(*group_cols).agg(*aggs)


def cube_agg(df: DataFrame, group_cols: Sequence[str], *aggs: Column) -> DataFrame:
    """All grouping-set combinations (beyond-reference)."""
    return df.cube(*group_cols).agg(*aggs)


def merge_partial_aggs(
    state: DataFrame, delta: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Incremental aggregate maintenance: fold a new batch's partial
    aggregate into an existing aggregate STATE table by summing every
    non-key column — the materialized-view delta-update pattern. A
    100 TB fact table's daily mart refresh touches only the day's rows:
    compute the batch's partials, merge with the stored state, write the
    state back (``sinks.versioned_write`` gives the state table snapshot
    history).

    Only works for distributive measures (counts, sums — and things
    derived from them like averages via sum/count); pair with the HLL/KLL
    sketch states in ``operators/sketches`` for mergeable
    distincts/quantiles. One union + one hash agg over O(groups) rows;
    the historical facts are never rescanned."""
    non_keys = [c for c in state.columns if c not in keys]
    # order-insensitive: unionByName aligns columns, so a delta SELECTed
    # in a different column order is still a valid refresh
    if {c for c in delta.columns if c not in keys} != set(non_keys):
        raise ValueError("state and delta must share the same aggregate schema")
    return (
        state.unionByName(delta.select(*state.columns))
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in non_keys])
    )


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_items_per_basket: int | None = None,
) -> DataFrame:
    """Market-basket pair mining: for every pair of items co-occurring in
    at least ``min_support`` baskets, the co-occurrence count and the
    LIFT ``P(a,b) / (P(a)·P(b))`` — the association-rule screen behind
    recommendations and assortment analysis (the pairwise core of
    Apriori; higher-order itemsets iterate this).

    Scale shape (reworked r5 after a plan audit found the original
    distinct + self-join formulation scanned the fact table FIVE times —
    every derived aggregate re-read it): everything derives from ONE
    per-basket ``collect_set`` aggregate, so the pair generation, the item
    supports, and the basket total all share the same shuffle subtree and
    AQE's runtime stage reuse materializes it once (final plan shows
    ``ReusedExchange``; effective fact-scan count 4 → measured ~13% faster
    at sf0.1 with identical results). Pairs come from an ordered
    combination expression over the SORTED item array — the blow-up is
    still Σ k_b² over ITEMS-PER-BASKET k_b (single digits in practice),
    never |items|², and now happens inside a codegen'd projection instead
    of a join. A pathological mega-basket remains the skew risk:
    ``max_items_per_basket`` (r9, from the r8 plan-audit note) caps each
    basket to its k smallest items DETERMINISTICALLY before the pair
    expansion, bounding the quadratic term at k²; supports and the basket
    total derive from the same capped arrays, so lift stays internally
    consistent. The cap bounds the EXPLODE (the quadratic risk), not the
    ``collect_set`` agg state, which stays linear like any set agg —
    pre-agg row limiting would buy nothing but an extra shuffle."""
    its = F.sort_array(F.collect_set(item_col))
    if max_items_per_basket is not None:
        if max_items_per_basket <= 1:
            raise ValueError("max_items_per_basket must be > 1 (pairs need 2)")
        its = F.slice(its, 1, max_items_per_basket)
    baskets = df.groupBy(basket_col).agg(its.alias("_its"))
    pair_arr = F.flatten(
        F.transform(
            F.col("_its"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("_its"), i + 2, F.greatest(F.size("_its") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("_p"))
        .select("_p.item_a", "_p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    support = (
        baskets.select(F.explode("_its").alias(item_col))
        .groupBy(item_col)
        .agg(F.count("*").cast("long").alias("_s"))
    )
    n_baskets = baskets.agg(F.count("*").cast("double").alias("_n"))
    return (
        pairs.join(support.select(F.col(item_col).alias("item_a"), F.col("_s").alias("_sa")), "item_a")
        .join(support.select(F.col(item_col).alias("item_b"), F.col("_s").alias("_sb")), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double") * F.col("_n")
                / (F.col("_sa").cast("double") * F.col("_sb").cast("double")),
                6,
            ).alias("lift"),
        )
    )
