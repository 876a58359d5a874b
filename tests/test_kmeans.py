"""Layout-independence contract of the deterministic KMeans trainer
(the r10 partition-perturbation finding: pyspark.ml KMeans models were a
function of the physical layout)."""

from __future__ import annotations

import pytest


def _vecs(n: int, dim: int = 6):
    # deterministic, clumpy synthetic vectors (3 loose clusters)
    out = []
    for i in range(n):
        base = [float(i % 3)] * dim
        out.append((i, [b + ((i * 7 + j * 13) % 11) / 23.0 for j, b in enumerate(base)]))
    return out


def test_kmeans_bit_identical_across_layouts(spark):
    from datalake_nba_dmc_spark.operators.kmeans import deterministic_kmeans

    rows = _vecs(120)
    results = []
    for parts in (1, 13, 64):
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(parts)
        results.append(deterministic_kmeans(df, k=4, seed=7))
    assert results[0] == results[1] == results[2]  # BIT-equal, not approx
    # and row ORDER within a partitioning is equally irrelevant
    df_rev = spark.createDataFrame(
        list(reversed(rows)), "vec_id long, embedding array<double>"
    ).repartition(5)
    assert deterministic_kmeans(df_rev, k=4, seed=7) == results[0]


def test_kmeans_clusters_separated_data(spark):
    """Sanity: on well-separated clumps the trainer recovers them (each
    center lands inside one clump; assignment partitions the clumps)."""
    from datalake_nba_dmc_spark.operators.kmeans import deterministic_kmeans
    from datalake_nba_dmc_spark.operators.similarity import nearest_centroids
    from pyspark.sql import functions as F

    rows = [
        (i, [float(100 * (i % 3)) + (i % 5) / 10.0, float(100 * (i % 3))])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centers = deterministic_kmeans(df, k=3, seed=1)
    clumps = sorted(round(c[1] / 100) for c in centers)
    assert clumps == [0, 1, 2]
    assigned = df.select(
        "vec_id",
        nearest_centroids(
            F.col("embedding").cast("array<double>"), centers, 1
        )[0].alias("c"),
    ).collect()
    by_clump = {}
    for r in assigned:
        by_clump.setdefault(r.vec_id % 3, set()).add(r.c)
    assert all(len(v) == 1 for v in by_clump.values())
    assert len(set().union(*by_clump.values())) == 3


def test_kmeans_fewer_distinct_than_k(spark):
    """k larger than the number of distinct vectors: every distinct
    vector becomes (exactly) one center — no crash, no duplicate
    centers."""
    from datalake_nba_dmc_spark.operators.kmeans import deterministic_kmeans

    rows = [(i, [float(i % 2), 1.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centers = deterministic_kmeans(df, k=8, seed=3)
    assert sorted(centers) == [[0.0, 1.0], [1.0, 1.0]]


def test_kmeans_empty_raises(spark):
    from datalake_nba_dmc_spark.operators.kmeans import deterministic_kmeans

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty input"):
        deterministic_kmeans(empty, k=4)


def test_pq_codebooks_match_per_subspace_training(spark):
    """The joint (one-job-per-round) PQ trainer must equal training each
    subspace independently with the single-space trainer — the fusion is
    an execution optimization, not a semantics change."""
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.kmeans import (
        deterministic_kmeans,
        deterministic_pq_codebooks,
    )

    rows = _vecs(80, dim=8)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    joint = deterministic_pq_codebooks(df, dim=8, m=2, k=3, seed=11)
    for j in range(2):
        solo = deterministic_kmeans(
            df.select(
                F.slice(F.col("embedding"), j * 4 + 1, 4).alias("embedding")
            ),
            k=3,
            seed=11,
        )
        # the joint trainer samples by FULL-vector hash while the solo
        # trainer samples by slice hash, so centers may differ; the
        # EXECUTION-EQUIVALENCE check instead re-runs the joint trainer
        # restricted to one subspace and demands bit equality
        restricted = deterministic_pq_codebooks(
            df.select(
                F.slice(F.col("embedding"), j * 4 + 1, 4).alias("embedding")
            ),
            dim=4,
            m=1,
            k=3,
            seed=11,
        )[0]
        assert solo == restricted
        assert len(joint[j]) == 3 and all(len(c) == 4 for c in joint[j])


def test_assign_centroids_quarantines_bad_vectors(spark):
    """NULL / mis-dimensioned vectors -> NULL centroid_id (in-band
    quarantine), never an executor-side inhomogeneous-shape ValueError;
    good rows in the same batch are still assigned (r10 ADVICE fix)."""
    from datalake_nba_dmc_spark.operators.kmeans import assign_centroids

    rows = [
        (0, [0.0, 0.0]),
        (1, None),          # NULL vector
        (2, [5.0]),         # ragged (dim 1, centers are dim 2)
        (3, [10.0, 10.0]),
        (4, [0.1, 0.1, 9.9]),  # ragged (dim 3)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: r.centroid_id
        for r in assign_centroids(
            df, centers=[[0.0, 0.0], [10.0, 10.0]]
        ).collect()
    }
    assert got == {0: 0, 1: None, 2: None, 3: 1, 4: None}


def test_semantic_edges_skip_bad_vectors(spark):
    """The SemDeDup Gram stage drops NULL/ragged vectors instead of
    crashing the whole cluster batch (they reach it via the NULL
    centroid group assign_centroids now emits)."""
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.similarity import _semantic_edges

    rows = [
        (0, 0, [1.0, 0.0]),
        (1, 0, [1.0, 0.0001]),  # near-dup of 0
        (2, 0, None),
        (3, 0, [1.0]),          # ragged
        (4, 1, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, centroid_id int, embedding array<double>"
    )
    edges = _semantic_edges(
        df,
        dim=2,
        id_col="doc_id",
        vec_col="embedding",
        threshold=0.99,
        max_cluster_rows=100,
        n_split_tables=1,
        seed=7,
    ).collect()
    assert sorted((r.id_a, r.id_b) for r in edges) == [(0, 1)]
