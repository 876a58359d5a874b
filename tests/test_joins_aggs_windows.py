"""Unit tests: join semantics (J1–J4 + inner/semi/anti), aggregates (A1–A5,
rollup/cube), windows (W1 + rank/lag/running-sum)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"
needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF0001), reason="driver testdata not present"
)

from datalake_nba_dmc_spark.operators.aggregates import (
    column_bounds,
    cube_agg,
    dedup_rows,
    dynamic_sum_agg,
    multi_measure_agg,
    rollup_agg,
)
from datalake_nba_dmc_spark.operators.joins import (
    anti_join,
    inner_join,
    left_join,
    semi_join,
)
from datalake_nba_dmc_spark.operators.windows import (
    top1_per_group,
    with_lag,
    with_rank,
    with_running_sum,
)


@pytest.fixture(scope="module")
def facts(spark):
    return spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 3, 30), ("c", 4, 40)],
        ["k", "seq", "v"],
    )


@pytest.fixture(scope="module")
def dim(spark):
    # "b" missing; "d" unmatched on the dim side
    return spark.createDataFrame([("a", "A"), ("c", "C"), ("d", "D")], ["k", "label"])


def test_left_join_null_propagation(facts, dim):
    out = left_join(facts, dim, on="k").orderBy("seq").collect()
    assert len(out) == 4
    assert out[2]["k"] == "b" and out[2]["label"] is None  # unmatched → NULL


def test_inner_join_drops_unmatched(facts, dim):
    assert inner_join(facts, dim, on="k").count() == 3


def test_semi_join_never_duplicates(spark, facts):
    dup_dim = spark.createDataFrame([("a", 1), ("a", 2)], ["k", "x"])
    out = semi_join(facts, dup_dim, on="k")
    assert out.count() == 2  # both "a" fact rows, each once
    assert out.columns == facts.columns  # no right columns leak


def test_anti_join(facts, dim):
    out = anti_join(facts, dim, on="k").collect()
    assert [r["k"] for r in out] == ["b"]


def test_expression_key_join_stays_equi(spark, facts, dim):
    # J2 shape: one side of the key is a computed expression
    expr = F.upper(facts["k"]) == F.upper(dim["k"])
    out = facts.join(dim, on=expr, how="left")
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString() or (
        out.count() == 4
    )


def test_dedup_rows(spark):
    df = spark.createDataFrame([(1, "x"), (1, "x"), (1, "y")], ["a", "b"])
    assert dedup_rows(df).count() == 2
    assert dedup_rows(df, subset=["a"]).count() == 1


def test_dynamic_sum_agg_selects_by_dtype(spark):
    df = spark.createDataFrame(
        [("g1", 1, 1.5, "skip"), ("g1", 2, 2.5, "skip")],
        "k string, i bigint, d double, s string",
    )
    out = dynamic_sum_agg(df, ["k"], dtypes=("bigint",))
    assert out.columns == ["k", "i"]  # double + string excluded
    assert out.first()["i"] == 3


def test_dynamic_sum_agg_excludes_group_cols(spark):
    df = spark.createDataFrame([(1, 2)], "g bigint, v bigint")
    out = dynamic_sum_agg(df, ["g"], dtypes=("bigint",))
    assert out.columns == ["g", "v"]


def test_multi_measure_agg(spark):
    df = spark.createDataFrame(
        [("p", 10, 60, "d1"), ("p", 20, 120, "d1"), ("p", 30, 0, "d2")],
        ["player", "sec", "min2sec", "game_date"],
    )
    out = multi_measure_agg(
        df,
        ["player"],
        sum_cols=["sec"],
        distinct_count_col="game_date",
        distinct_count_alias="games_played",
        extra=[
            ((F.sum("sec") + F.sum("min2sec")) / 60).cast("double").alias("total_minutes")
        ],
    ).first()
    assert out["sec"] == 60
    assert out["games_played"] == 2
    assert out["total_minutes"] == pytest.approx(4.0)


def test_multi_measure_agg_approx_variant(spark):
    df = spark.createDataFrame([("p", i, f"d{i}") for i in range(50)], ["k", "v", "d"])
    out = multi_measure_agg(
        df, ["k"], sum_cols=["v"], distinct_count_col="d", approx=True
    ).first()
    assert abs(out["games_played"] - 50) <= 5  # HLL++ default rsd ~2.3%


def test_multi_measure_agg_preagg_matches_generic(spark):
    # Same semantics as the countDistinct plan, incl. NULL distinct keys
    # (excluded from the distinct count, included in line_count).
    df = spark.createDataFrame(
        [("p", 10, "d1"), ("p", 20, "d1"), ("p", 30, "d2"), ("p", 5, None),
         ("q", 7, "d1")],
        ["player", "sec", "game_date"],
    )
    from datalake_nba_dmc_spark.operators.aggregates import multi_measure_agg_preagg

    generic = multi_measure_agg(
        df, ["player"], sum_cols=["sec"], distinct_count_col="game_date",
        extra=[F.count(F.lit(1)).alias("line_count")],
    )
    two_phase = multi_measure_agg_preagg(
        df, ["player"], distinct_count_col="game_date", sums={"sec": F.col("sec")}
    )
    cols = ["player", "sec", "games_played", "line_count"]
    assert sorted(map(tuple, generic.select(cols).collect())) == sorted(
        map(tuple, two_phase.select(cols).collect())
    )


def test_column_bounds_one_pass(spark):
    df = spark.createDataFrame([(1, 10), (5, -3)], ["a", "b"])
    row = column_bounds(df, ["a", "b"]).first()
    assert (row["max_a"], row["min_a"], row["max_b"], row["min_b"]) == (5, 1, 10, -3)


def test_rollup_and_cube_cardinality(spark):
    df = spark.createDataFrame(
        [("x", "p", 1), ("x", "q", 2), ("y", "p", 3)], ["a", "b", "v"]
    )
    # rollup: (a,b) groups 3 + a subtotals 2 + grand total 1
    assert rollup_agg(df, ["a", "b"], F.sum("v").alias("v")).count() == 6
    # cube adds b-only subtotals (2)
    assert cube_agg(df, ["a", "b"], F.sum("v").alias("v")).count() == 8


def test_top1_per_group_deterministic_ties(spark):
    # same date twice for "a" — tiebreaker column must decide
    df = spark.createDataFrame(
        [("a", "2021-01-01", 1), ("a", "2021-01-01", 2), ("b", "2020-01-01", 3)],
        ["k", "d", "id"],
    )
    out = top1_per_group(df, ["k"], [F.col("d").desc(), F.col("id").desc()])
    got = {r["k"]: r["id"] for r in out.collect()}
    assert got == {"a": 2, "b": 3}


def test_top1_maxby_matches_window(spark):
    from datalake_nba_dmc_spark.operators.windows import top1_per_group_maxby

    df = spark.createDataFrame(
        [("a", 10, 1, "x"), ("a", 10, 2, "y"), ("a", 20, 3, "z"),
         ("b", 5, 4, "w")],
        ["k", "d", "id", "payload"],
    )
    window = top1_per_group(
        df, ["k"], [F.col("d").desc(), F.col("id").desc()]
    ).select("k", "id", "payload")
    # pack (d, id) into one tie-free score, same ordering as the window
    maxby = top1_per_group_maxby(
        df, ["k"], F.col("d").cast("long") * 1000 + F.col("id"),
        ["id", "payload"],
    )
    assert sorted(map(tuple, window.collect())) == sorted(
        map(tuple, maxby.collect())
    )


def test_with_rank_dense_vs_sparse(spark, facts):
    df = spark.createDataFrame([("a", 10), ("a", 10), ("a", 5)], ["k", "v"])
    sparse = with_rank(df, ["k"], [F.col("v").desc()]).collect()
    dense = with_rank(df, ["k"], [F.col("v").desc()], dense=True).collect()
    assert sorted(r["rank"] for r in sparse) == [1, 1, 3]
    assert sorted(r["rank"] for r in dense) == [1, 1, 2]


def test_with_lag(spark, facts):
    out = with_lag(facts, ["k"], [F.col("seq")], "v").orderBy("seq").collect()
    assert out[0]["v_lag1"] is None and out[1]["v_lag1"] == 10


def test_with_running_sum(spark, facts):
    out = with_running_sum(facts, ["k"], [F.col("seq")], "v").orderBy("seq").collect()
    assert [r["v_running"] for r in out] == [10, 30, 30, 40]


@needs_testdata
def test_approx_percentile_tracks_exact(spark):
    """agg_approx_percentiles now carries its accuracy certificate in-plan:
    every approx value must sit between the exact quantiles at q ± 0.005
    (accuracy 10000 → rank error 1e-4), emitted as 1/0 flags. All flags
    must be 1 per group — the same invariant the driver oracle pins."""
    from datalake_nba_dmc_spark.suite import load_all

    rows = (
        load_all()["agg_approx_percentiles"].builder(spark, SF0001).collect()
    )
    assert len(rows) == 3
    for r in rows:
        assert (r.p25_ok, r.p50_ok, r.p90_ok) == (1, 1, 1), r
        assert r.n_rows > 0


def test_merge_partial_aggs_equals_full_aggregate(spark):
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.aggregates import merge_partial_aggs

    rows = [(i % 4, i, float(i) * 1.5) for i in range(1000)]
    df = spark.createDataFrame(rows, ["grp", "k", "v"])

    def partial(d):
        return d.groupBy("grp").agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("v") * 100).cast("long")).alias("v_scaled"),
        )

    merged = merge_partial_aggs(
        partial(df.filter(F.col("k") % 3 != 0)),
        partial(df.filter(F.col("k") % 3 == 0)),
        ["grp"],
    )
    got = {r["grp"]: (r["n"], r["v_scaled"]) for r in merged.collect()}
    want = {r["grp"]: (r["n"], r["v_scaled"]) for r in partial(df).collect()}
    assert got == want


def test_merge_partial_aggs_rejects_schema_drift(spark):
    import pytest
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.aggregates import merge_partial_aggs

    a = spark.createDataFrame([(1, 2)], ["grp", "n"])
    b = spark.createDataFrame([(1, 2, 3)], ["grp", "n", "extra"])
    with pytest.raises(ValueError, match="same aggregate schema"):
        merge_partial_aggs(a, b, ["grp"])


def test_basket_pairs_counts_and_lift(spark):
    from datalake_nba_dmc_spark.operators.aggregates import basket_pairs

    # 4 baskets: {x,y} together twice, {x,z} once, y alone once
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "y"),
        (2, "x"),  # duplicate line in the same basket must not double-count
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r["item_a"], r["item_b"]): (r["n_ab"], r["lift"])
        for r in basket_pairs(df, "basket", "item", min_support=2).collect()
    }
    # supports: x in 3 baskets, y in 3; pair in 2 of 4 → lift = 2*4/(3*3)
    assert got == {("x", "y"): (2, round(8 / 9, 6))}


def test_basket_pairs_mega_basket_cap(spark):
    """max_items_per_basket bounds the quadratic pair expansion
    deterministically (k smallest items) and keeps lift internally
    consistent with the capped supports."""
    import pytest

    from datalake_nba_dmc_spark.operators.aggregates import basket_pairs

    mega = [(1, f"i{j:03d}") for j in range(50)] + [(2, "i000"), (2, "i001")]
    df = spark.createDataFrame(mega, ["basket", "item"])
    capped = basket_pairs(
        df, "basket", "item", min_support=1, max_items_per_basket=5
    ).collect()
    # basket 1 contributes C(5,2)=10 pairs, basket 2 one pair
    assert len(capped) == 10
    got = {(r.item_a, r.item_b): r.n_ab for r in capped}
    assert got[("i000", "i001")] == 2  # both baskets keep their smallest items
    assert all(a < "i005" and b < "i005" for a, b in got)
    # default stays uncapped: C(50,2) + the shared pair
    assert len(basket_pairs(df, "basket", "item", min_support=1).collect()) == 50 * 49 // 2
    with pytest.raises(ValueError, match="must be > 1"):
        basket_pairs(df, "basket", "item", max_items_per_basket=1)
