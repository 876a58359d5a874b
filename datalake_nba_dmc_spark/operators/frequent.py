"""Distributed heavy hitters: exact top-k without a full-vocabulary shuffle.

The naive top-k-by-frequency plan (``explode → groupBy item → orderBy``)
shuffles one row per DISTINCT item — at 100 TB of text that is a
multi-billion-row exchange to find 20 winners. The classical two-phase
scheme cuts the shuffle to candidates only:

1. **Per-partition Misra–Gries summaries** (bounded memory, here via an
   Arrow ``mapInPandas`` pass): each partition keeps at most ``cap``
   weighted counters; on overflow every counter is decremented by the
   (cap+1)-th largest weight and non-positive ones dropped — the standard
   mergeable-summary prune (Misra & Gries 1982; merge form per Agarwal et
   al., "Mergeable Summaries", 2012). Any item with partition count
   > n_p/(cap+1) survives its partition summary.
2. **Candidate union + exact recount**: the union of summaries is at most
   ``cap × partitions`` items; pigeonhole over partitions guarantees any
   item with GLOBAL count > n/(cap+1) appears in some summary. A second
   corpus scan recounts candidates exactly (broadcast semi-join), so the
   returned top-k counts are EXACT — the approximation only bounds which
   items can be missed, and ``cap`` is chosen so the top-k threshold sits
   far above n/(cap+1).

Result: shuffle O(cap × partitions) + O(k) instead of O(|vocabulary|),
two scans, exact output.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_summarize(item_col: str, cap: int):
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
            for item, c in pdf[item_col].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > cap:
                # MG merge-prune: subtract the (cap+1)-th largest weight
                # from every counter, drop the non-positive ones. Total
                # weight subtracted per partition is ≤ n_p/(cap+1).
                thr = sorted(counts.values(), reverse=True)[cap]
                counts = {i: c - thr for i, c in counts.items() if c > thr}
        yield pd.DataFrame({item_col: list(counts.keys())})

    return summarize


def heavy_hitters_exact(
    items: DataFrame,
    item_col: str,
    k: int = 20,
    cap: int = 2000,
) -> DataFrame:
    """Exact global top-``k`` items of ``items[item_col]`` via per-partition
    Misra–Gries candidate generation + exact recount (module docstring).
    Returns (``item_col``, ``item_count``) — exactly the k most frequent,
    ties broken by item value ascending, provided every true top-k item
    has count > n/(cap+1) (guaranteed comfortably for k ≪ cap)."""
    item_type = items.schema[item_col].dataType.simpleString()
    candidates = (
        items.mapInPandas(
            _mg_summarize(item_col, cap), schema=f"{item_col} {item_type}"
        )
        .distinct()
    )
    exact = (
        items.join(F.broadcast(candidates), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count("*").alias("item_count"))
    )
    # TakeOrderedAndProject: per-partition top-k then driver merge — no
    # global sort of the candidate counts.
    return exact.orderBy(F.col("item_count").desc(), F.col(item_col).asc()).limit(k)
