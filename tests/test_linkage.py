"""Unit tests: FastSS deletion-neighborhood fuzzy pairing
(operators/linkage.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.linkage import fuzzy_pairs_fastss


def _pairs(spark, rows):
    df = spark.createDataFrame(rows, ["id", "name"])
    return {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs_fastss(df, "id", "name").collect()
    }


def test_substitution_insertion_deletion_all_match(spark):
    got = _pairs(
        spark,
        [
            (1, "alphabet"),
            (2, "alphabft"),  # substitution of 1
            (3, "alphabets"),  # insertion at end of 1
            (4, "alphabe"),  # deletion from 1
            (5, "zzzzzzzz"),  # unrelated
        ],
    )
    assert (1, 2, 1) in got
    assert (1, 3, 1) in got
    assert (1, 4, 1) in got
    assert not any(5 in (a, b) for a, b, _ in got)


def test_distance_two_false_positives_are_verified_away(spark):
    # "ab"-style transposition: shares deletion variants but lev = 2
    got = _pairs(spark, [(1, "xab"), (2, "xba")])
    assert got == set()


def test_matches_brute_force_on_clustered_names(spark):
    rows = [(i, f"item#{i:05d}") for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_pairs_fastss(df, "id", "name").collect()
    }
    a = df.select(F.col("id").alias("ia"), F.col("name").alias("na"))
    b = df.select(F.col("id").alias("ib"), F.col("name").alias("nb"))
    want = {
        (r["ia"], r["ib"])
        for r in a.crossJoin(b)
        .filter(
            (F.col("ia") < F.col("ib")) & (F.levenshtein("na", "nb") <= 1)
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_shared_prefix_is_not_a_hot_block(spark):
    """All names share a long boilerplate prefix; the signature join must
    stay linear-ish — candidate volume bounded by true-neighborhood size,
    not prefix-block size. Asserted via the distinct candidate count the
    verify step sees (≈ true pairs + transposition FPs, far below n²)."""
    rows = [(i, f"boilerplate-prefix-{i:04d}") for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = fuzzy_pairs_fastss(df, "id", "name")
    n_pairs = out.count()
    # 500 ids over 4 digit positions: neighbors differ in one digit
    assert 0 < n_pairs < 500 * 40  # n² would be 124,750 unordered pairs


def test_null_texts_are_dropped_not_blocked(spark):
    rows = [(1, "alpha"), (2, "alphb"), (3, None), (4, None), (5, None)]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r["id_a"], r["id_b"]) for r in fuzzy_pairs_fastss(df, "id", "name").collect()
    }
    assert got == {(1, 2)}  # NULL rows pair with nothing, including each other


def test_fuzzy_pairs_exotic_column_name(spark):
    """Reference schemas carry names like `3p`/`fg%` before conform renames
    them; the deletion-signature SQL must survive such identifiers (they
    are backtick-quoted into the transform expression)."""
    from datalake_nba_dmc_spark.operators.linkage import fuzzy_pairs_fastss

    df = spark.createDataFrame(
        [(1, "abcd"), (2, "abxd"), (3, "zzzz")], ["id", "fg%"]
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs_fastss(df, "id", "fg%").collect()
    }
    assert got == {(1, 2, 1)}


def test_position_filter_keeps_run_edge_substitutions(spark):
    """r16 candidate filter completeness on the run cases: equal deletion
    variants within a string form a contiguous position INTERVAL, and the
    filter keeps a match when the two sides' intervals overlap (or either
    side is the identity variant). A canonical single-position dedup
    would miss pairs like ("aa", "ab"): "aa" yields variant "a" only from
    its run start (position 1), "ab" yields "a" at position 2 — intervals
    [1,2] and [2,2] overlap at the differing position, so the dist-1 pair
    must survive."""
    got = _pairs(
        spark,
        [
            (1, "aa"),
            (2, "ab"),  # substitution at the END of 1's run
            (3, "ba"),  # substitution at the START of 1's run
            (4, "aaab"),
            (5, "aaxb"),  # substitution inside a longer run
            (6, "xy"),
            (7, "yx"),  # transposition: dist 2, must NOT pair with 6
        ],
    )
    assert (1, 2, 1) in got
    assert (1, 3, 1) in got
    assert (4, 5, 1) in got
    assert (2, 3, 2) not in got and (2, 3, 1) not in got
    assert not any(a == 6 and b == 7 for a, b, _ in got)
