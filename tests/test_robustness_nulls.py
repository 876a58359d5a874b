"""NULL-input operator semantics — pins the fixes found by
``tools/robustness_audit.py nulls`` (round 6) with fast in-memory cases,
so a regression fails in the suite without needing the full audit sweep.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_tokenless_docs_produce_no_grams(spark):
    """NULL and empty/whitespace texts must yield NULL gram arrays (no
    near-dup candidates) — concat_ws's NULL-array→'' collapse previously
    merged them all into one bucket and fabricated O(n²) pairs. Short
    docs keep their single whole-text gram."""
    from datalake_nba_dmc_spark.operators.dedup import with_shingles

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, " \t\n "), (4, "one two"), (5, "a b c d")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["sh"] for r in with_shingles(df).collect()}
    assert rows[1] is None
    assert rows[2] is None
    assert rows[3] is None
    assert rows[4] == ["one two"]
    assert len(rows[5]) == 2  # 4 tokens, n=3 → two grams


def test_asof_join_ignores_null_timestamps_both_sides(spark):
    """A NULL-ts right row can govern nobody; a NULL-ts left row matches
    nothing. Previously both sorted NULLS FIRST into the partition head
    and the NULL-date right row was carried onto NULL-ts left rows."""
    from datalake_nba_dmc_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10, None), (1, 11, "2024-01-02")], ["k", "lid", "lts"]
    ).select("k", "lid", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(1, 100, None), (1, 101, "2024-01-01")], ["k", "rid", "rts"]
    ).select("k", "rid", F.col("rts").cast("timestamp").alias("rts"))
    out = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts", right_cols=["rid"]
        ).collect()
    }
    assert out[10] is None  # NULL-ts left row: no fabricated match
    assert out[11] == 101  # real row matches the real (non-NULL) right row


def test_registrable_domain_null_host_is_null(spark):
    from datalake_nba_dmc_spark.operators.web import registrable_domain

    df = spark.createDataFrame(
        [(1, None), (2, "a.example.com"), (3, "bbc.co.uk")], ["i", "host"]
    )
    rows = {
        r["i"]: r["d"]
        for r in df.select("i", registrable_domain(F.col("host")).alias("d")).collect()
    }
    assert rows[1] is None
    assert rows[2] == "example.com"
    assert rows[3] == "bbc.co.uk"


def test_psi_binned_excludes_null_split_rows(spark):
    """Rows whose split predicate is NULL belong to NEITHER cohort —
    previously they formed bucket rows with NULL-skipped sums."""
    from datalake_nba_dmc_spark.operators.stats import psi_binned

    df = spark.createDataFrame(
        [(10.0, "a"), (10.0, "b"), (10.0, None)], ["v", "grp"]
    )
    out = psi_binned(
        df, split_col=F.col("grp") == "a", value_col="v", lo=0.0, hi=100.0, nbins=2
    ).collect()
    assert len(out) == 1
    assert out[0]["n_a"] == 1 and out[0]["n_b"] == 1  # NULL-grp row excluded


def test_repetition_signals_zero_fill_null_doc(spark):
    from datalake_nba_dmc_spark.operators.text import repetition_signals

    df = spark.createDataFrame([(1, None), (2, "x x")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert rows[1]["n_words"] == 0
    assert rows[1]["n_distinct_words"] == 0
    assert rows[1]["distinct_word_ratio"] == 0.0
    assert rows[2]["n_words"] == 2 and rows[2]["n_distinct_words"] == 1


def test_split_mmss_tolerates_malformed_input(spark):
    """No colon → (value, NULL) instead of an ANSI out-of-bounds error."""
    from datalake_nba_dmc_spark.operators import conform

    df = spark.createDataFrame([(1, "12:34"), (2, "junk"), (3, None)], ["i", "m"])
    mins, secs = conform.split_mmss("m")
    rows = {
        r["i"]: (r["mn"], r["sc"])
        for r in df.select("i", mins.alias("mn"), secs.alias("sc")).collect()
    }
    assert rows[1] == (12, 34)
    assert rows[2] == (None, None)  # 'junk' → cast('junk' as int) is NULL
    assert rows[3] == (None, None)
