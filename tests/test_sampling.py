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
