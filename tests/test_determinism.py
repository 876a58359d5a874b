"""Partitioning-invariance: the suite's determinism machinery (scaled-long
sums, seeded hash families, sort_array over collect_set, exact integer
quantiles) claims every query's VALUE SET is independent of physical
layout. Pin it directly: run representative queries under two different
shuffle-partition counts and compare order-insensitive value hashes.

This is the invariant the driver's oracle compare silently relies on —
the driver session's partitioning differs from the builder's, so any
layout-dependent value (unsorted collect_set, double-sum reassociation,
first() without order) would show up as a cross-round hash flake long
before it was diagnosable."""

from __future__ import annotations

import hashlib
import os

import pytest

from datalake_nba_dmc_spark.suite import load_all

SF0001 = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF0001), reason="driver testdata not present"
)

#: One representative per determinism mechanism: money-sum scaling
#: (tpch_q1, flagship), seeded minhash/LSH (dedup_minhash_lsh), seeded
#: weighted sampling (sample_weighted_topk, sample_hash_mod), collect_set
#: ordering (mart_basket_pairs), micro-nat quantization (text_char_entropy),
#: exact moments (stat_exact_moments), window tiebreakers
#: (w1_latest_order_per_customer), integer quantiles (agg_percentiles).
SAMPLE = [
    "flagship_customer_resume",
    "tpch_q1_pricing_summary",
    "dedup_minhash_lsh",
    "sample_weighted_topk",
    "sample_hash_mod",
    "mart_basket_pairs",
    "text_char_entropy",
    "stat_exact_moments",
    "w1_latest_order_per_customer",
    "agg_percentiles",
    "dedup_url_canonical",
    "text_domain_quota",
    "text_dsir_selection",
    "text_bpe_pair_counts",
]


def _value_hash(df) -> str:
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        "|".join("NULL" if v is None else repr(v) for v in rec)
        for rec in pdf.itertuples(index=False, name=None)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


@needs_testdata
@pytest.mark.parametrize("name", SAMPLE)
def test_value_set_invariant_under_shuffle_partitioning(spark, name):
    spec = load_all()[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        h3 = _value_hash(spec.builder(spark, SF0001))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        h17 = _value_hash(spec.builder(spark, SF0001))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert h3 == h17, f"{name}: value set depends on shuffle partitioning"
