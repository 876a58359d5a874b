"""Layout-independent Lloyd's KMeans — exact-integer centroid updates.

The r10 partition-perturbation audit caught ``pyspark.ml`` KMeans
producing DIFFERENT models for the same data under different physical
layouts (its kmeans|| init samples per-partition and its centroid
updates sum doubles in partition order), which made every downstream
ANN artifact — IVF assignments, PQ codes, SemDeDup groups — a function
of ``spark.sql.files.maxPartitionBytes``. That is poison for a 100 TB
pipeline: re-running the same job after a repartition or a file
compaction would silently re-cluster the corpus.

This module replaces the fit with a Lloyd's loop where every step is a
layout-free function of the DATA VALUES:

- **Init**: the k distinct vectors with the smallest salted CONTENT hash
  (``xxhash64(vec, seed)``) — a deterministic pseudo-random draw that no
  partitioning can influence (ties broken on the vector value itself).
- **Assignment**: per-row argmin over broadcast centers via an
  ``array_sort`` of (distance, centroid_id) structs — pure codegen'd
  double arithmetic on one row at a time, identical on any executor.
- **Update**: per-component sums of ``round(x · 10⁸)`` int64s — exact
  integers, associative, partition-order-free — collected as k·dim
  bounded rows; the mean's two divisions happen once, driver-side, in a
  fixed order. Empty clusters keep their previous center.
- **Stop**: when the centers are BIT-EQUAL to the previous round (exact
  assignments → exact integer sums → exact equality is meaningful), or
  at ``max_iter``. Convergence is typically well under 10 rounds.

Cost per iteration: one scan + one hash-agg to (m · k · dim/m) rows —
the same shuffle class as MLlib's aggregate, minus its layout
sensitivity. The PQ variant trains ALL m sub-codebooks inside the same
per-iteration job (the m separate MLlib fits each paid their own job
chain). Int64 headroom: component sums are bounded by rows · 10⁸ ·
|x|; at 10⁹ unit-normalized vectors that is ~10¹⁷, inside int64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.util import ensure_parallelism

QUANT = 10**8


def _argmin_center(vec_col: Column, centers: list[list[float]]) -> Column:
    """Centroid id of the squared-L2-nearest center — inline struct sort,
    ties to the lower id (deterministic per row under any layout)."""
    scored = [
        F.struct(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(x) for x in c]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v.cast("double"),
            ).alias("d"),
            F.lit(i).alias("cid"),
        )
        for i, c in enumerate(centers)
    ]
    return F.array_sort(F.array(*scored))[0]["cid"]


def _train(rows: DataFrame, m: int, k: int, max_iter: int, seed: int) -> list[list[list[float]]]:
    """Core loop over (_j, _v) subspace rows; returns m books of <= k
    centers each (fewer iff a subspace has fewer distinct vectors)."""
    rows = ensure_parallelism(rows).localCheckpoint(eager=True)
    w = Window.partitionBy("_j").orderBy("_h", "_v")
    init = (
        rows.distinct()
        .withColumn("_h", F.xxhash64("_v", F.lit(seed), "_j"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("_j", "_rn", "_v")
        .collect()
    )
    if not init:
        raise ValueError("deterministic_kmeans: empty input (no vectors to fit)")
    books: list[list[list[float]]] = [[] for _ in range(m)]
    for r in sorted(init, key=lambda r: (r._j, r._rn)):
        books[r._j].append([float(x) for x in r._v])
    dims = [len(b[0]) for b in books]
    for _ in range(max_iter):
        cid = None
        for j in range(m):
            a = _argmin_center(F.col("_v"), books[j])
            cid = a if cid is None else F.when(F.col("_j") == j, a).otherwise(cid)
        # the assignment projects in its OWN select: a Generate
        # (posexplode) in the same projection re-resolves the struct
        # array literal and drops its field aliases (col1/col2 —
        # FIELD_NOT_FOUND on `cid`), a Catalyst quirk isolated in r10
        agg = (
            rows.select("_j", cid.alias("_c"), "_v")
            .select("_j", "_c", F.posexplode("_v").alias("_p", "_x"))
            .groupBy("_j", "_c", "_p")
            .agg(
                F.sum(F.round(F.col("_x") * QUANT).cast("long")).alias("_s"),
                F.count("*").alias("_n"),
            )
            .collect()
        )
        cell = {(r._j, r._c, r._p): (r._s, r._n) for r in agg}
        new_books = [[list(c) for c in b] for b in books]  # empty cluster keeps center
        for j in range(m):
            for c in range(len(books[j])):
                if (j, c, 0) in cell:
                    new_books[j][c] = [
                        (cell[(j, c, p)][0] / cell[(j, c, p)][1]) / QUANT
                        for p in range(dims[j])
                    ]
        if new_books == books:
            break
        books = new_books
    return books


def deterministic_kmeans(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    max_iter: int = 10,
    seed: int = 42,
) -> list[list[float]]:
    """Train one codebook of <= k centers over ``vec_col`` (see module
    docstring for the layout-independence contract)."""
    rows = df.select(
        F.lit(0).alias("_j"), F.col(vec_col).cast("array<double>").alias("_v")
    ).filter(F.col("_v").isNotNull())
    return _train(rows, 1, k, max_iter, seed)[0]


def deterministic_pq_codebooks(
    df: DataFrame,
    dim: int,
    m: int,
    k: int,
    vec_col: str = "embedding",
    max_iter: int = 10,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train all m product-quantization sub-codebooks JOINTLY: subvector
    rows carry their subspace id, so each Lloyd round is ONE scan + ONE
    hash-agg for every book (the m separate fits each paid their own job
    chain). Returns m books of <= k codewords."""
    sub = dim // m
    slices = F.array(
        *[
            F.struct(
                F.lit(j).alias("_j"),
                F.slice(F.col(vec_col).cast("array<double>"), j * sub + 1, sub).alias(
                    "_v"
                ),
            )
            for j in range(m)
        ]
    )
    rows = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.explode(slices).alias("_e"))
        .select("_e._j", "_e._v")
    )
    return _train(rows, m, k, max_iter, seed)
