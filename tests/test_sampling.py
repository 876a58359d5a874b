"""Unit tests: deterministic key-hash sampling (stability, stratification,
disjoint splits)."""

from __future__ import annotations

import pytest

from datalake_nba_dmc_spark.operators.sampling import (
    sample_fraction,
    sample_stratified,
    split_train_holdout,
)


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(2000)], "k long, lang string"
    )


def test_fraction_is_stable_and_close(keyed):
    a = sample_fraction(keyed, "k", 0.2)
    assert a.count() == sample_fraction(keyed, "k", 0.2).count()
    assert 0.15 < a.count() / 2000 < 0.25
    # repartitioning must not change membership (df.sample would)
    b = sample_fraction(keyed.repartition(7), "k", 0.2)
    assert set(r.k for r in a.collect()) == set(r.k for r in b.collect())


def test_stratified_rates_apply_per_stratum(keyed):
    out = sample_stratified(
        keyed, "k", "lang", rates={"de": 1.0}, default_rate=0.1
    ).groupBy("lang").count().collect()
    counts = {r.lang: r["count"] for r in out}
    assert counts["de"] == 2000 // 3 + (1 if 2000 % 3 else 0)  # rate 1.0 keeps all
    assert 0.05 < counts["en"] / (2000 * 2 / 3) < 0.16


def test_split_is_disjoint_and_total(keyed):
    train, hold = split_train_holdout(keyed, "k", 0.25)
    t = set(r.k for r in train.collect())
    h = set(r.k for r in hold.collect())
    assert not (t & h)
    assert len(t) + len(h) == 2000


def test_resample_balanced_equalizes_mass(spark):
    from datalake_nba_dmc_spark.operators.sampling import resample_balanced

    # source "big" has 10x the char mass of "small" → ~10% keep rate
    rows = [(i, "big", 100) for i in range(1000)] + [
        (10_000 + i, "small", 100) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = resample_balanced(df, "doc_id", "source", "n_chars")
    got = out.groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in got}
    # smallest stratum keeps everything (threshold == buckets)
    assert counts["small"] == 100
    # dominant stratum downsamples to ~its share (hash-uniform, ±5%)
    assert 50 <= counts["big"] <= 150
    # deterministic: same membership on re-run
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in out.collect()
    )


def test_sample_weighted_topk(spark):
    import math

    from datalake_nba_dmc_spark.operators.sampling import sample_weighted_topk

    rows = [(i, float(1 + (i % 7) * 100)) for i in range(1, 501)]
    df = spark.createDataFrame(rows, "k long, w double")
    got = sorted(r.k for r in sample_weighted_topk(df, "k", "w", k=50).collect())
    # mirror the Efraimidis-Spirakis keys in plain Python (same IEEE ops)
    def es_key(key, w):
        h = ((key & 2147483647) * 2654435761) % 4294967296
        h = (h + ((key >> 31) * 2246822519) % 4294967296) % 4294967296
        return math.log((h + 0.5) / 4294967296.0) / w
    want = sorted(k for k, w in sorted(rows, key=lambda r: -es_key(*r))[:50])
    assert got == want
    assert len(got) == 50
    # weight-1 rows are ~100x less likely than weight-601 rows
    weights = {k: w for k, w in rows}
    heavy = sum(1 for k in got if weights[k] >= 401)
    assert heavy >= 35  # ~43% of rows hold ~57% of mass; observed 39/50
    # k >= n returns everything
    assert sample_weighted_topk(df, "k", "w", k=1000).count() == 500
    # schema untouched (helper column dropped)
    assert sample_weighted_topk(df, "k", "w", k=5).columns == ["k", "w"]


def test_gumbel_topk_equals_efraimidis_spirakis_on_exp_weights(spark):
    """Gumbel-top-k over log-weights must select (and rank) EXACTLY the
    rows Efraimidis–Spirakis selects over w = exp(logw): both reduce to
    the same ordering given the same per-key uniform
    (ln(u)/w desc ⟺ logw − ln(−ln u) desc). Also pins determinism
    across partitionings."""
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.sampling import (
        sample_gumbel_topk,
        sample_weighted_topk,
    )

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, w double").withColumn(
        "logw", F.log("w")
    )
    got_es = [r["k"] for r in sample_weighted_topk(df, "k", "w", 20).collect()]
    got_gu = [r["k"] for r in sample_gumbel_topk(df, "k", "logw", 20).collect()]
    assert sorted(got_es) == sorted(got_gu)

    repart = [
        r["k"] for r in sample_gumbel_topk(df.repartition(7), "k", "logw", 20).collect()
    ]
    assert sorted(repart) == sorted(got_gu)

    # log-space robustness: shifting all log-weights by a huge constant
    # (where exp() would overflow) cannot change the selection
    shifted = df.withColumn("logw", F.col("logw") + F.lit(700.0))
    got_shift = [r["k"] for r in sample_gumbel_topk(shifted, "k", "logw", 20).collect()]
    assert sorted(got_shift) == sorted(got_gu)


def test_split_by_group_no_straddle_and_fractions(spark):
    """split_by_group: every group lands in exactly one split, boundaries
    cover [0, buckets) exactly, and observed fractions are in the right
    ballpark on 3000 keyed groups."""
    from collections import Counter

    from datalake_nba_dmc_spark.operators.sampling import (
        split_boundaries,
        split_by_group,
    )

    bounds = split_boundaries({"train": 0.9, "val": 0.05, "test": 0.05})
    assert bounds[0][1] == 0 and bounds[-1][2] == 10_000
    assert [b[0] for b in bounds] == ["test", "train", "val"]
    assert all(lo < hi for _, lo, hi in bounds)

    rows = [(i, f"g{i % 1000}") for i in range(3000)]  # 1000 groups of 3
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    out = split_by_group(df, group_col="grp", key_col="doc_id").collect()
    assert len(out) == 3000
    per_group = {}
    for r in out:
        per_group.setdefault(r["grp"], set()).add(r["split"])
        assert r["group_rep"] == int(r["grp"][1:])  # min doc_id of the group
    assert all(len(s) == 1 for s in per_group.values())  # no straddling
    counts = Counter(next(iter(s)) for s in per_group.values())
    assert 0.85 < counts["train"] / 1000 < 0.95
    assert counts["val"] + counts["test"] < 200


def test_split_by_group_bad_fractions_raise(spark):
    import pytest as _pytest

    from datalake_nba_dmc_spark.operators.sampling import split_boundaries

    with _pytest.raises(ValueError):
        split_boundaries({"train": 0.5, "val": 0.1})


def test_sample_temperature_rates_and_determinism(spark):
    """tau=0.5 keep-rates follow sqrt(n_min/n_i): the rarest stratum keeps
    everything, a 4x-bigger stratum keeps ~sqrt(1/4)=50%; membership is
    deterministic and downsample-only."""
    from datalake_nba_dmc_spark.operators.sampling import sample_temperature

    rows = [(i, "big") for i in range(4000)] + [(10_000 + i, "small") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sample_temperature(df, key_col="doc_id", stratum_col="source", tau=0.5)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert counts["small"] == 1000  # rate 1.0 exactly
    assert 0.40 * 4000 < counts["big"] < 0.60 * 4000  # rate floor(sqrt(1/4)*1000)=500
    # deterministic across evaluations
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in out.collect())
    assert a == b


def test_sample_temperature_tau_extremes(spark):
    """tau=0 keeps the natural mix (all rows); tau=1 equalizes counts to
    ~n_min per stratum."""
    from datalake_nba_dmc_spark.operators.sampling import sample_temperature

    rows = [(i, "big") for i in range(2000)] + [(10_000 + i, "small") for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    assert sample_temperature(df, "doc_id", "source", tau=0.0).count() == 2500
    eq = {
        r["source"]: r["n"]
        for r in sample_temperature(df, "doc_id", "source", tau=1.0)
        .groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    assert eq["small"] == 500
    assert 0.2 * 2000 < eq["big"] < 0.3 * 2000  # rate = 500/2000 = 25%


def test_split_by_group_null_group_rows_survive(spark):
    """r7 ADVICE: a plain equi-join back on the group key silently dropped
    every NULL-group row. The null-safe join must keep them, as ONE group
    (per the docstring contract), represented by their min key."""
    from datalake_nba_dmc_spark.operators.sampling import split_by_group

    rows = [(1, "a"), (2, "a"), (3, None), (4, None), (5, "b")]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = split_by_group(df, group_col="grp", key_col="doc_id").collect()
    assert len(out) == 5  # nothing dropped
    null_rows = [r for r in out if r["grp"] is None]
    assert {r["doc_id"] for r in null_rows} == {3, 4}
    assert all(r["group_rep"] == 3 for r in null_rows)  # one group, min key
    assert len({r["split"] for r in null_rows}) == 1  # never straddles
