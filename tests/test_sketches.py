"""Unit tests: mergeable HLL sketch rollup (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.sketches import (
    distinct_rollup,
    hll_partial,
    hll_rollup,
)


def _toy(spark, n_groups=4, keys_per_group=500, overlap=100):
    # group g holds keys [g*(keys-overlap), g*(keys-overlap)+keys) →
    # adjacent groups share `overlap` keys, so union < sum of parts.
    rows = [
        (f"g{g}", "fine_a" if k % 2 else "fine_b", g * (keys_per_group - overlap) + k)
        for g in range(n_groups)
        for k in range(keys_per_group)
    ]
    return spark.createDataFrame(rows, ["coarse", "fine", "key"])


def test_estimate_within_rse_bound(spark):
    df = _toy(spark)
    out = {
        r["coarse"]: r["distinct_est"]
        for r in distinct_rollup(
            df, ["coarse", "fine"], ["coarse"], "key"
        ).collect()
    }
    exact = {
        r["coarse"]: r["exact"]
        for r in df.groupBy("coarse")
        .agg(F.countDistinct("key").alias("exact"))
        .collect()
    }
    for g, est in out.items():
        # lg_k=12 → RSE 1.6%; 5σ margin keeps the test deterministic-safe
        assert abs(est - exact[g]) <= 0.08 * exact[g], (g, est, exact[g])


def test_union_of_sketches_matches_direct_sketch(spark):
    """Mergeability law: estimating after hll_union_agg over fine-grain
    sketches equals sketching the coarse grain directly (same blobs merge
    associatively), modulo nothing — DataSketches HLL union of identical
    inputs is deterministic, so we assert close agreement."""
    df = _toy(spark)
    rolled = {
        r["coarse"]: r["distinct_est"]
        for r in hll_rollup(
            hll_partial(df, ["coarse", "fine"], "key"), ["coarse"]
        ).collect()
    }
    direct = {
        r["coarse"]: r["distinct_est"]
        for r in hll_rollup(hll_partial(df, ["coarse"], "key"), ["coarse"]).collect()
    }
    for g in direct:
        assert abs(rolled[g] - direct[g]) <= 0.02 * max(direct[g], 1.0), (
            g,
            rolled[g],
            direct[g],
        )


def test_global_rollup_sees_cross_group_overlap(spark):
    df = _toy(spark, n_groups=4, keys_per_group=500, overlap=100)
    total_exact = df.select("key").distinct().count()
    naive_sum = 4 * 500  # double-counts the 3×100 shared keys
    est = (
        hll_rollup(hll_partial(df, ["coarse"], "key"), [])
        .collect()[0]["distinct_est"]
    )
    assert abs(est - total_exact) <= 0.08 * total_exact
    assert est < naive_sum - 100  # the sketch union deduplicates overlap
