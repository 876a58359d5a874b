"""Unit tests: embedding similarity (cosine vs numpy, brute-force/LSH top-k)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from datalake_nba_dmc_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    dot,
    embedding_near_dups,
    l2_norm,
    lsh_bucketed_topk,
)

SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
)


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], SCHEMA
    )


def test_dot_norm_cosine_match_numpy(spark):
    a, b = [1.0, 2.0, 3.0], [4.0, -5.0, 6.0]
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    row = df.select(
        dot(F.col("a"), F.col("b")).alias("dot"),
        l2_norm(F.col("a")).alias("na"),
        cosine(F.col("a"), F.col("b")).alias("cos"),
    ).first()
    na, nb = np.array(a), np.array(b)
    assert row["dot"] == pytest.approx(float(na @ nb))
    assert row["na"] == pytest.approx(float(np.linalg.norm(na)))
    assert row["cos"] == pytest.approx(float(na @ nb / (np.linalg.norm(na) * np.linalg.norm(nb))))


def test_cosine_zero_vector_guard(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], ["a", "b"])
    assert df.select(cosine(F.col("a"), F.col("b")).alias("c")).first()["c"] == 0.0


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.RandomState(7)
    corpus_v = rng.randn(40, 8)
    query_v = rng.randn(2, 8)
    corpus = _vecs(spark, enumerate(corpus_v))
    queries = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(query_v)],
        StructType(
            [StructField("query_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
        ),
    )
    out = brute_force_topk(corpus, queries, k=5).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    # float32 truncation in the schema → compare against float32 ground truth
    cv = corpus_v.astype(np.float32).astype(np.float64)
    qv = query_v.astype(np.float32).astype(np.float64)
    sims = (qv @ cv.T) / (
        np.linalg.norm(qv, axis=1)[:, None] * np.linalg.norm(cv, axis=1)[None, :]
    )
    for qid in (0, 1):
        expect = list(np.argsort(-sims[qid])[:5])
        assert [v for _, v in sorted(got[qid])] == expect


def test_lsh_bucketed_topk_finds_identical_vector(spark):
    base = [1.0, 2.0, 3.0, 4.0]
    corpus = _vecs(spark, [(0, base), (1, [-1, -2, -3, -4]), (2, [4, 3, 2, 1])])
    queries = spark.createDataFrame(
        [(0, [float(x) for x in base])],
        StructType(
            [StructField("query_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
        ),
    )
    out = lsh_bucketed_topk(corpus, queries, dim=4, k=3, n_planes=4).collect()
    top = min(out, key=lambda r: r["rank"])
    assert top["vec_id"] == 0 and top["cosine_sim"] == pytest.approx(1.0)


def test_ivf_topk_full_probe_matches_bruteforce(spark):
    from datalake_nba_dmc_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(11)
    corpus = _vecs(spark, enumerate(rng.randn(60, 6)))
    queries = spark.createDataFrame(
        [(0, [float(x) for x in rng.randn(6)])],
        StructType(
            [StructField("query_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
        ),
    )
    exact = brute_force_topk(corpus, queries, k=5).collect()
    # probing every cell makes IVF exact
    approx = ivf_topk(corpus, queries, k=5, n_centroids=4, n_probe=4).collect()
    key = lambda rows: [(r["rank"], r["vec_id"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert key(approx) == key(exact)


def test_ivf_topk_partial_probe_subset(spark):
    from datalake_nba_dmc_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(12)
    corpus = _vecs(spark, enumerate(rng.randn(80, 6)))
    queries = spark.createDataFrame(
        [(0, [float(x) for x in corpus.first()["embedding"]])],
        StructType(
            [StructField("query_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
        ),
    )
    out = ivf_topk(corpus, queries, k=3, n_centroids=4, n_probe=1).collect()
    assert len(out) <= 3
    # the query IS corpus vector 0 → its own cell is the nearest → found
    top = min(out, key=lambda r: r["rank"])
    assert top["vec_id"] == 0 and top["cosine_sim"] == pytest.approx(1.0)


def test_embedding_near_dups_identical_pair(spark):
    v = [0.5, -1.5, 2.0]
    df = _vecs(spark, [(10, v), (20, v), (30, [9.0, 0.0, -4.0])])
    out = embedding_near_dups(df, dim=3, threshold=0.99).collect()
    pairs = {(r["id_a"], r["id_b"]): r["cosine_sim"] for r in out}
    assert pairs[(10, 20)] == pytest.approx(1.0)
    assert all(a < b for a, b in pairs)


def test_embedding_near_dups_star_edges_not_quadratic(spark):
    """One bucket of identical vectors → N-1 star edges from the bucket
    min, never the quadratic within-bucket pair set."""
    v = [0.5, -1.5, 2.0]
    df = _vecs(spark, [(i, v) for i in range(1, 7)])
    out = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(df, dim=3, threshold=0.99).collect()
    }
    assert out == {(1, i) for i in range(2, 7)}


def test_quantize_int8_bounds(spark):
    from datalake_nba_dmc_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [0.0, 0.0]),
            (3, [-2.0, 2.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_int8(df).collect()}
    # max-|x| component always maps to ±127
    assert rows[1].codes[0] == 127
    assert rows[3].codes == [-127, 127]
    # zero vector → zero codes, zero scale
    assert rows[2].codes == [0, 0] and rows[2].qscale == 0.0
    # reconstruction error bounded by scale/2 per component
    for r in rows.values():
        if r.qscale == 0.0:
            continue
        orig = [1.0, -0.5, 0.25, 0.0] if r.vec_id == 1 else [-2.0, 2.0]
        for x, c in zip(orig, r.codes):
            assert abs(x - c * r.qscale) <= r.qscale / 2 + 1e-9


def test_second_moments_match_numpy(spark):
    import numpy as np

    from datalake_nba_dmc_spark.operators.similarity import embedding_second_moments

    rng = np.random.default_rng(7)
    X32 = rng.normal(size=(40, 5)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X32)],
        "vec_id long, embedding array<float>",
    )
    got = {(r.i, r.j): r.s2 for r in embedding_second_moments(df).collect()}
    X = X32.astype(np.float64)
    want = np.floor(X[:, :, None] * X[:, None, :] * 1e8).astype(np.int64).sum(axis=0)
    iu = np.triu_indices(5)
    assert got == {
        (int(i) + 1, int(j) + 1): int(want[i, j]) for i, j in zip(*iu)
    }


def test_pca_project_matches_numpy(spark):
    import numpy as np

    from datalake_nba_dmc_spark.operators.similarity import pca_project

    rng = np.random.default_rng(11)
    # anisotropic cloud so components are well-separated
    X32 = (rng.normal(size=(60, 6)) * np.array([5, 3, 1, 0.5, 0.2, 0.1])).astype(
        np.float32
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X32)],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: np.array(r.pca) for r in pca_project(df, k=3).collect()}
    X = X32.astype(np.float64)
    Xc = X - X.mean(axis=0)
    w, v = np.linalg.eigh(Xc.T @ Xc / len(X))
    comps = v[:, np.argsort(w)[::-1][:3]]
    for c in range(3):
        if comps[np.abs(comps[:, c]).argmax(), c] < 0:
            comps[:, c] = -comps[:, c]
    want = Xc @ comps
    for i in range(len(X)):
        # the operator's covariance uses exact floored-integer moments, so
        # allow a tolerance of the quantization + eigh conditioning
        assert np.allclose(got[i], want[i], atol=1e-4), i


def test_pca_whiten_unit_variance(spark):
    import numpy as np

    from datalake_nba_dmc_spark.operators.similarity import pca_project

    rng = np.random.default_rng(13)
    X32 = (rng.normal(size=(200, 5)) * np.array([8, 4, 2, 1, 0.5])).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X32)],
        "vec_id long, embedding array<float>",
    )
    Y = np.stack(
        [r.pca for r in pca_project(df, k=3, whiten=True).orderBy("vec_id").collect()]
    )
    # whitened projections have ~unit variance on every component
    assert np.allclose(Y.var(axis=0), 1.0, atol=0.05)


def test_multiprobe_buckets_distinct_and_base_first(spark):
    from datalake_nba_dmc_spark.operators.similarity import (
        hyperplane_bucket,
        multiprobe_buckets,
        random_hyperplanes,
    )
    from pyspark.sql import functions as F

    planes = random_hyperplanes(dim=8, n_planes=6, seed=42)
    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = df.select(
        hyperplane_bucket(F.col("embedding"), planes).alias("base"),
        multiprobe_buckets(F.col("embedding"), planes, n_probes=4).alias("probes"),
    ).collect()
    for r in got:
        assert len(r.probes) == 4
        assert len(set(r.probes)) == 4  # single-bit flips of one base: distinct
        assert r.probes[0] == r.base  # base bucket probed first
        for p in r.probes[1:]:
            diff = p ^ r.base
            assert diff != 0 and (diff & (diff - 1)) == 0  # exactly one bit flipped


def test_multiprobe_recall_monotone(spark):
    """More probes → superset of candidates → per-query exact-top-k hit
    counts can only rise (selection is by true cosine, so an exact hit
    present at fewer probes survives at more probes)."""
    from datalake_nba_dmc_spark.operators.similarity import lsh_multiprobe_topk
    from pyspark.sql import functions as F

    import random as _r
    rng = _r.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    import numpy as np
    m = {i: np.array(v) for i, v in rows}
    exact = {}
    for q in range(3):
        sims = sorted(
            ((float(m[q] @ m[i]) / (np.linalg.norm(m[q]) * np.linalg.norm(m[i]))), i)
            for i in m
        )[::-1][:10]
        exact[q] = {i for _, i in sims}
    hits = {}
    for probes in (1, 5):
        ap = lsh_multiprobe_topk(df, queries, dim=16, k=10, n_planes=6, n_probes=probes)
        hits[probes] = {q: 0 for q in range(3)}
        for r in ap.collect():
            if r.vec_id in exact[r.query_id]:
                hits[probes][r.query_id] += 1
    for q in range(3):
        assert hits[5][q] >= hits[1][q] >= 1  # self-match structurally guaranteed
    assert sum(hits[5].values()) >= sum(hits[1].values())


def test_pq_codes_shape_and_range(spark):
    import datalake_nba_dmc_spark.operators.similarity as S

    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books = S.pq_train(df, dim=16, m=4, k=8)
    codes = {r["vec_id"]: r["codes"] for r in S.pq_encode(df, books).collect()}
    assert len(codes) == 200
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in codes.values())


def test_pq_adc_self_match_when_codebook_memorizes(spark):
    """With k >= number of distinct subvectors, KMeans can memorize every
    subvector → reconstruction is (near) exact and each query's ADC top-1
    is itself with ~0 distance."""
    import datalake_nba_dmc_spark.operators.similarity as S

    import numpy as np

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(6)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books = S.pq_train(df, dim=8, m=2, k=6, max_iter=40)
    codes = S.pq_encode(df, books)
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding")
    top = S.pq_adc_topk(codes, queries, books, k=1)
    for r in top.collect():
        assert r["vec_id"] == r["query_id"], r
        assert r["adc_dist"] < 1e-6, r


def test_pq_adc_matches_python_reference(spark):
    """ADC distances computed by the Spark expression must equal the
    plain-Python LUT sum for every (query, vector) pair."""
    import datalake_nba_dmc_spark.operators.similarity as S

    import numpy as np

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(12)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    m, k, sub = 3, 4, 4
    books = S.pq_train(df, dim=12, m=m, k=k)
    codes = {r["vec_id"]: r["codes"] for r in S.pq_encode(df, books).collect()}
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["vec_id"]): r["adc_dist"]
        for r in S.pq_adc_topk(S.pq_encode(df, books), queries, books, k=40).collect()
    }
    vecs = dict(rows)
    for qid in (0, 1):
        q = vecs[qid]
        for vid, code in codes.items():
            want = sum(
                sum((q[j * sub + t] - books[j][code[j]][t]) ** 2 for t in range(sub))
                for j in range(m)
            )
            assert abs(got[(qid, vid)] - want) < 1e-9, (qid, vid)


def test_pq_train_rejects_indivisible_dim(spark):
    import pytest

    df = spark.createDataFrame([(0, [0.0] * 10)], ["vec_id", "embedding"])
    import datalake_nba_dmc_spark.operators.similarity as S

    with pytest.raises(ValueError, match="not divisible"):
        S.pq_train(df, dim=10, m=3)


def test_pq_adc_empty_query_set_returns_empty(spark):
    import datalake_nba_dmc_spark.operators.similarity as S

    import numpy as np

    rng = np.random.RandomState(5)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(8)]) for i in range(10)],
        ["vec_id", "embedding"],
    )
    books = S.pq_train(df, dim=8, m=2, k=4)
    queries = df.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = S.pq_adc_topk(S.pq_encode(df, books), queries, books, k=3)
    assert out.count() == 0


def test_bounded_query_contract_rejects_oversized_sets(spark, monkeypatch):
    """VERDICT r4 #3: the broadcast-query-side topk APIs must FAIL CLEANLY
    (clear ValueError, no driver-side LUT build / broadcast attempt) when
    the query set exceeds the bounded-broadcast contract."""
    import datalake_nba_dmc_spark.operators.similarity as S

    monkeypatch.setattr(S, "MAX_QUERY_ROWS", 5)
    rng = np.random.RandomState(11)
    corpus = _vecs(spark, enumerate(rng.randn(12, 8)))
    big_queries = corpus.select(F.col("vec_id").alias("query_id"), "embedding")

    with pytest.raises(ValueError, match="bounded-broadcast contract"):
        brute_force_topk(corpus, big_queries, k=3)
    with pytest.raises(ValueError, match="bounded-broadcast contract"):
        lsh_bucketed_topk(corpus, big_queries, dim=8, k=3)
    with pytest.raises(ValueError, match="bounded-broadcast contract"):
        S.lsh_multiprobe_topk(corpus, big_queries, dim=8, k=3)
    with pytest.raises(ValueError, match="bounded-broadcast contract"):
        S.ivf_topk(corpus, big_queries, k=3, n_centroids=2)
    books = S.pq_train(corpus, dim=8, m=2, k=4)
    with pytest.raises(ValueError, match="bounded-broadcast contract"):
        S.pq_adc_topk(S.pq_encode(corpus, books), big_queries, books, k=3)

    # at the cap (not over) everything still runs
    ok_queries = big_queries.filter(F.col("query_id") < 5)
    assert brute_force_topk(corpus, ok_queries, k=3).count() == 15


def test_pq_adc_rerank_recovers_exact_topk(spark):
    """IVFADC-style refinement: with a shortlist big enough, the re-ranked
    result must equal the exact brute-force top-k even when raw ADC's own
    top-k (coarse codebooks) would miss — and at shortlist=k it degrades
    to raw-ADC candidates re-scored exactly."""
    import datalake_nba_dmc_spark.operators.similarity as S

    rng = np.random.RandomState(13)
    vecs = rng.randn(30, 8)
    corpus = _vecs(spark, enumerate(vecs))
    queries = spark.createDataFrame(
        [(0, [float(x) for x in vecs[0]])],
        StructType(
            [
                StructField("query_id", LongType()),
                StructField("embedding", ArrayType(FloatType())),
            ]
        ),
    )
    books = S.pq_train(corpus, dim=8, m=2, k=4)
    codes = S.pq_encode(corpus, books)
    got = S.pq_adc_rerank_topk(codes, corpus, queries, books, k=5, shortlist=30)
    exact = brute_force_topk(corpus, queries, k=5)
    got_ids = [r["vec_id"] for r in got.orderBy("rank").collect()]
    exact_ids = [r["vec_id"] for r in exact.orderBy("rank").collect()]
    assert got_ids == exact_ids
    # scores come from the float vectors, not ADC distances
    sims = {r["vec_id"]: r["cosine_sim"] for r in got.collect()}
    cv = vecs.astype(np.float32).astype(np.float64)
    ref = (cv @ cv[0]) / (np.linalg.norm(cv, axis=1) * np.linalg.norm(cv[0]))
    for vid, s in sims.items():
        assert s == pytest.approx(float(ref[vid]), abs=1e-6)


def test_semantic_dedup_groups_and_keep_rule(spark):
    """SemDeDup composition: near-identical vectors land in one duplicate
    group (transitively, via connected components) and exactly ONE member
    per group survives — the one LEAST similar to its cluster centroid
    (ties → min id); distinct vectors stay singleton keepers."""
    import datalake_nba_dmc_spark.operators.similarity as S

    rng = np.random.RandomState(3)
    base = rng.randn(4, 8)
    rows = []
    # ids 0,1,2: tiny perturbations of base[0] → one duplicate group
    for i, eps in enumerate((0.0, 1e-3, 2e-3)):
        rows.append((i, [float(x) for x in base[0] + eps]))
    # ids 10, 11: perturbations of base[1] → second group
    rows.append((10, [float(x) for x in base[1]]))
    rows.append((11, [float(x) for x in base[1] + 1e-3]))
    # ids 20, 21: distinct singletons
    rows.append((20, [float(x) for x in base[2]]))
    rows.append((21, [float(x) for x in base[3]]))
    df = _vecs(spark, [(i, v) for i, v in rows])

    out = S.semantic_dedup(df, n_clusters=2, threshold=0.999)
    got = {r["vec_id"]: (r["component"], r["keep"]) for r in out.collect()}
    assert len(got) == 7
    # groups: {0,1,2} share component 0; {10,11} share component 10
    assert got[0][0] == got[1][0] == got[2][0] == 0
    assert got[10][0] == got[11][0] == 10
    assert got[20][0] == 20 and got[21][0] == 21
    # exactly one keeper per component
    from collections import Counter

    keep_per_comp = Counter(c for c, k in got.values() if k == 1)
    comps = {c for c, _ in got.values()}
    assert keep_per_comp == {c: 1 for c in comps}
    # singletons always keep
    assert got[20][1] == 1 and got[21][1] == 1
    # the paper's keep rule: survivor has the LOWEST centroid_sim in group
    sims = {r["vec_id"]: r["centroid_sim"] for r in out.collect()}
    for comp, members in ((0, [0, 1, 2]), (10, [10, 11])):
        kept = [m for m in members if got[m][1] == 1]
        assert len(kept) == 1
        expect = min(members, key=lambda m: (sims[m], m))
        assert kept[0] == expect


def test_semantic_dedup_hot_cluster_cap_splits_and_keeps_recall(spark):
    """The enforced hot-cluster cap (VERDICT r5 #4): with one cluster far
    over ``max_cluster_rows``, the pairwise stage pre-splits it on a
    secondary sign-pattern, the plan stays an equi-join (never cartesian),
    the split key actually appears in the join, and the injected
    near-duplicate pairs are still found (multi-table splits recover
    cross-bucket recall; identical/near-identical vectors share sign bits
    so table 0 alone already co-buckets most of them)."""
    import datalake_nba_dmc_spark.operators.similarity as S

    rng = np.random.RandomState(7)
    rows = []
    # 60 well-spread singleton vectors ...
    spread = rng.randn(60, 8) * 10.0
    for i, v in enumerate(spread):
        rows.append((i, [float(x) for x in v]))
    # ... plus 3 injected near-dup pairs (ids 100x and 100x+1)
    for j in range(3):
        base = rng.randn(8)
        rows.append((1000 + 2 * j, [float(x) for x in base]))
        rows.append((1001 + 2 * j, [float(x) for x in base + 1e-4]))
    df = _vecs(spark, rows)

    # two KMeans clusters over 66 rows => both far over the cap of 8,
    # forcing multi-way splitting of every cluster
    out = S.semantic_dedup(
        df, n_clusters=2, threshold=0.999, max_cluster_rows=8
    )
    # the pairwise stage is checkpointed away inside connected components,
    # so assert its plan via the exposed edge builder on an equivalent
    # pre-assigned frame
    edges = S._semantic_edges(
        df.withColumn("centroid_id", (F.col("vec_id") % 2).cast("int")),
        dim=8,
        id_col="vec_id",
        vec_col="embedding",
        threshold=0.999,
        max_cluster_rows=8,
        n_split_tables=3,
        seed=42,
    )
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_split" in plan, "hot-cluster split key missing from the plan"

    got = {r["vec_id"]: (r["component"], r["keep"]) for r in out.collect()}
    assert len(got) == 66
    for j in range(3):
        a, b = 1000 + 2 * j, 1001 + 2 * j
        assert got[a][0] == got[b][0] == a, (a, got[a], got[b])
        assert got[a][1] + got[b][1] == 1
    # spread vectors stay singleton keepers
    assert all(got[i] == (i, 1) for i in range(60))
