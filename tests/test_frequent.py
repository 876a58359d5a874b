"""Unit tests: Misra-Gries two-phase exact heavy hitters
(operators/frequent.py)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.frequent import heavy_hitters_exact


def _zipf_items(head=5_000, n_types=400):
    # true Zipf skew: item i appears head//(i+1) times → the top-k counts
    # sit far above the n/(cap+1) completeness threshold the operator
    # guarantees (module docstring).
    return [
        f"item{i:04d}" for i in range(n_types) for _ in range(head // (i + 1))
    ]


def test_matches_exact_topk_on_skewed_stream(spark):
    items = _zipf_items()
    df = spark.createDataFrame([(x,) for x in items], ["token"]).repartition(8)
    got = [
        (r["token"], r["item_count"])
        for r in heavy_hitters_exact(df, "token", k=10, cap=200).collect()
    ]
    c = Counter(items)
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_counts_are_exact_not_mg_residuals(spark):
    """The recount phase must return TRUE counts, not the pruned MG
    weights — force heavy pruning with a tiny cap and verify counts."""
    items = ["hot"] * 500 + [f"cold{i}" for i in range(2000)]
    df = spark.createDataFrame([(x,) for x in items], ["token"]).repartition(4)
    got = dict(
        (r["token"], r["item_count"])
        for r in heavy_hitters_exact(df, "token", k=1, cap=20).collect()
    )
    assert got == {"hot": 500}


def test_partition_invariance(spark):
    """Result identical across partitionings (phase 3 is exact; phase 1
    only affects WHICH candidates are generated, and the guarantee keeps
    every top-k item in every layout)."""
    items = _zipf_items(head=1_000, n_types=100)
    rows = [(x,) for x in items]
    outs = []
    for parts in (1, 3, 16):
        df = spark.createDataFrame(rows, ["token"]).repartition(parts)
        outs.append(
            [
                (r["token"], r["item_count"])
                for r in heavy_hitters_exact(df, "token", k=8, cap=100).collect()
            ]
        )
    assert outs[0] == outs[1] == outs[2]


def test_non_string_item_column(spark):
    """The MG summarize schema must follow the item column's type."""
    items = [(i % 7,) for i in range(700)]
    df = spark.createDataFrame(items, ["key"])
    got = [
        (r["key"], r["item_count"])
        for r in heavy_hitters_exact(df, "key", k=3, cap=50).collect()
    ]
    assert got == [(0, 100), (1, 100), (2, 100)]
