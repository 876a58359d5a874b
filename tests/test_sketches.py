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


def _values(spark, n_groups=3, n_per_group=2000):
    # group g holds values g*0.5 + Uniform-ish spread over [0, 100) via a
    # deterministic low-discrepancy sequence (i*phi mod 100).
    rows = [
        (f"g{g}", "fa" if i % 2 else "fb", float((i * 61.803398875 + g * 0.5) % 100.0))
        for g in range(n_groups)
        for i in range(n_per_group)
    ]
    return spark.createDataFrame(rows, ["coarse", "fine", "v"])


def test_kll_rollup_quantiles_within_rank_error(spark):
    from datalake_nba_dmc_spark.operators.sketches import kll_partial, kll_quantile_rollup

    df = _values(spark)
    est = {
        r["coarse"]: (r["q50"], r["q90"])
        for r in kll_quantile_rollup(
            kll_partial(df, ["coarse", "fine"], "v"), ["coarse"], [0.5, 0.9]
        ).collect()
    }
    import numpy as np

    pdf = df.toPandas()
    for g, (q50, q90) in est.items():
        vals = np.sort(pdf[pdf.coarse == g].v.values)
        # 1.65% rank error at k=200, 5σ-ish margin → ±5% rank window
        for q, got in ((0.5, q50), (0.9, q90)):
            lo = vals[int(max(0, (q - 0.05) * len(vals)))]
            hi = vals[min(len(vals) - 1, int((q + 0.05) * len(vals)))]
            assert lo <= got <= hi, (g, q, got, lo, hi)


def test_kll_merge_matches_direct_sketch_exactly(spark):
    """KLL merge determinism: merging fine-grain sketches and sketching
    the coarse grain directly may compact differently, but both must land
    within the rank bound of each other."""
    from datalake_nba_dmc_spark.operators.sketches import kll_partial, kll_quantile_rollup

    df = _values(spark)
    rolled = {
        r["coarse"]: r["q50"]
        for r in kll_quantile_rollup(
            kll_partial(df, ["coarse", "fine"], "v"), ["coarse"], [0.5]
        ).collect()
    }
    direct = {
        r["coarse"]: r["q50"]
        for r in kll_quantile_rollup(
            kll_partial(df, ["coarse"], "v"), ["coarse"], [0.5]
        ).collect()
    }
    for g in direct:
        assert abs(rolled[g] - direct[g]) <= 5.0, (g, rolled[g], direct[g])


def test_theta_overlap_exact_at_small_cardinality(spark):
    """Below ~2^lg_k distincts a Theta sketch is in exact mode, so the
    intersection/difference estimates must equal the true counts."""
    from datalake_nba_dmc_spark.operators.sketches import theta_overlap

    rows = [(k, k % 3 == 0, k % 2 == 0) for k in range(1000)]
    df = spark.createDataFrame(rows, ["key", "in_a", "in_b"])
    out = theta_overlap(df, "key", F.col("in_a"), F.col("in_b")).collect()[0]
    # A = multiples of 3 (334), B = evens (500); A∩B = multiples of 6 (167)
    assert out["est_inter"] == 167
    assert out["est_diff_a"] == 334 - 167


def test_hll_portable_accuracy_and_layout_invariance(spark):
    """Portable HLL: estimate within the m=32 rse band of the exact
    distinct count per group, and bit-identical under repartition/row
    order (max-merge algebra — the r10 partitions-audit design rule)."""
    from datalake_nba_dmc_spark.operators.hll_portable import (
        hll_portable_distinct,
    )

    rows = [(i % 7, (i * 13) % 400) for i in range(5000)]
    df = spark.createDataFrame(rows, "g int, k long")
    got = {
        r.g: r.distinct_est_micro
        for r in hll_portable_distinct(df, ["g"], "k").collect()
    }
    exact = {}
    for g, k in rows:
        exact.setdefault(g, set()).add(k)
    assert set(got) == set(exact)
    for g, ks in exact.items():
        est = got[g] / 1e6
        assert abs(est - len(ks)) / len(ks) < 0.45  # ~2.5 sigma at m=32
    for parts in (1, 17):
        df2 = spark.createDataFrame(list(reversed(rows)), "g int, k long")
        got2 = {
            r.g: r.distinct_est_micro
            for r in hll_portable_distinct(
                df2.repartition(parts), ["g"], "k"
            ).collect()
        }
        assert got2 == got  # BIT-equal micro-units, not approx


def test_hll_portable_empty_and_single(spark):
    from datalake_nba_dmc_spark.operators.hll_portable import (
        hll_portable_distinct,
    )

    empty = spark.createDataFrame([], "g int, k long")
    assert hll_portable_distinct(empty, ["g"], "k").collect() == []
    one = spark.createDataFrame([(1, 42)], "g int, k long")
    [r] = hll_portable_distinct(one, ["g"], "k").collect()
    # linear counting: V = 31 zero registers -> 32*ln(32/31), ~1.016
    import math

    assert r.distinct_est_micro == math.floor(
        32 * math.log(32 / 31) * 1e6 + 0.5
    )


def test_cms_counters_merge_by_addition(spark):
    """The shard-merge law: the CMS of a concatenated corpus equals the
    per-shard counter matrices added cell-wise (what makes the sketch
    mergeable across 100 TB partitions/days without re-scanning)."""
    from datalake_nba_dmc_spark.operators.portable_sketch import (
        cms_counters,
    )

    a = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog ran far")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(3, "the cat returned"), (4, "a dog")],
        "doc_id long, text string",
    )
    kw = dict(depth=3, width=8)
    whole = {
        (r.row_idx, r.col_idx): r.cnt
        for r in cms_counters(a.union(b), **kw).collect()
    }
    merged: dict[tuple[int, int], int] = {}
    for shard in (a, b):
        for r in cms_counters(shard, **kw).collect():
            key = (r.row_idx, r.col_idx)
            merged[key] = merged.get(key, 0) + r.cnt
    assert whole == merged and len(whole) > 0


def test_cms_empty_degenerate_and_validation(spark):
    import pytest

    from datalake_nba_dmc_spark.operators.portable_sketch import (
        cms_counters,
        cms_heavy_hitters,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert cms_counters(empty).collect() == []
    assert cms_heavy_hitters(empty).collect() == []
    degenerate = spark.createDataFrame(
        [(1, None), (2, ""), (3, " \t "), (4, "café")],
        ["doc_id", "text"],
    )
    # NULL/empty/whitespace/non-ASCII all drop in-band (ASCII contract)
    assert cms_counters(degenerate).collect() == []
    with pytest.raises(ValueError, match="depth"):
        cms_counters(empty, depth=0)
    with pytest.raises(ValueError, match="depth"):
        cms_counters(empty, width=0)


def test_cms_estimate_exact_when_no_collisions(spark):
    """With width far above the vocabulary, estimates are exact counts
    (the d row hashes injure nothing) — pins the probe/min plumbing."""
    from datalake_nba_dmc_spark.operators.portable_sketch import (
        cms_heavy_hitters,
    )

    df = spark.createDataFrame(
        [(1, "x x x y y z"), (2, "x w")], "doc_id long, text string"
    )
    got = {
        r.tok: (r.true_cnt, r.cms_est)
        for r in cms_heavy_hitters(df, k=4, depth=4, width=4096).collect()
    }
    assert got == {"x": (4, 4), "y": (2, 2), "w": (1, 1), "z": (1, 1)}
