"""Layout-independent KMeans training — content-hash sample + driver
Lloyd, the faiss posture with a determinism contract.

The r10 partition-perturbation audit caught ``pyspark.ml`` KMeans
producing DIFFERENT models for the same data under different physical
layouts (its kmeans|| init samples per-partition and its centroid
updates sum doubles in partition order), which made every downstream
ANN artifact — IVF assignments, PQ codes, SemDeDup groups — a function
of ``spark.sql.files.maxPartitionBytes``. That is poison for a 100 TB
pipeline: re-running the same job after a repartition or a file
compaction would silently re-cluster the corpus.

The replacement makes every step a layout-free function of the DATA
VALUES, at the standard industrial cost shape (faiss trains IVF/PQ
quantizers on a bounded sample — ~256·k vectors — never the corpus;
this repo's BPE/unigram tokenizers already use the same "distributed
reduce → bounded driver solve → broadcast" split):

1. **Sample** (distributed, ONE job, no window): the ``cap`` vectors
   with the smallest salted content hash ``xxhash64(vec, seed)`` via
   ``orderBy(hash, vec).limit(cap)`` — TakeOrderedAndProject keeps a
   cap-sized top-k per map partition, so nothing resembling a global
   sort or a single-partition window ever runs; the draw is a
   deterministic pseudo-random function of the VALUES that no
   partitioning can influence (hash ties break on the vector itself).
   Duplicates dedupe on the driver, stably, in hash order.
2. **Init** (driver): deterministic farthest-point traversal over the
   sample — first center = lowest-hash vector, each next = the sample
   point maximizing distance to its nearest chosen center (ties to the
   lower hash rank). Spread-out centers bound cluster imbalance the way
   kmeans++ does, with zero randomness.
3. **Train** (driver, numpy): Lloyd's iterations over the fixed-order
   sample — squared-L2 argmin (ties to the lower centroid index),
   means reduced in sample order, stop on bit-equal centers or
   ``max_iter``. Single-threaded numpy reductions over a fixed-order
   array are bit-deterministic; nothing here sees Spark's layout.
4. **Assign** (distributed, one scan): :func:`assign_centroids` — an
   Arrow-vectorized numpy argmin batch scan (the role MLlib's
   ``model.transform`` played); the Catalyst expression path
   (``similarity.nearest_centroids``) stays as the INDEPENDENT check
   the emb_cluster_assign_ok certificate compares corpus-wide.

PQ sub-codebooks are sliced from the SAME sampled vectors (faiss's
exact design), so m books cost the one sampling job.

A first cut kept Lloyd DISTRIBUTED with exact int64-quantized centroid
sums — bit-identical across layouts, but 15-45× slower than the MLlib
fit it replaced (each round re-scans the corpus through an interpreted
higher-order argmin; receipts in PERF.md r10). Sample-bounded driver
training is both the faster AND the more scale-honest design: at 100 TB
nobody Lloyd-iterates the full corpus, and the one full-corpus pass
this module keeps is the single hash-ranked top-cap job.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default training-sample bound: comfortably above faiss's recommended
#: 256 points per centroid for the suite's k ≤ 16 codebooks, tiny for
#: the driver (4096 × 768 doubles ≈ 25 MB worst case).
DEFAULT_SAMPLE_CAP = 4096


def _hash_ranked_sample(df: DataFrame, vec_col: str, cap: int, seed: int):
    """The cap smallest-salted-hash vectors as a driver list (hash
    order, duplicates removed stably) — one TakeOrderedAndProject job,
    the only full-data pass training ever makes."""
    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .withColumn("_h", F.xxhash64("_v", F.lit(seed)))
        .orderBy("_h", "_v")
        .limit(cap)
        .collect()
    )
    seen: set[tuple] = set()
    out = []
    for r in rows:
        key = tuple(r._v)
        if key not in seen:
            seen.add(key)
            out.append([float(x) for x in r._v])
    return out


def _farthest_point_init(sample, k: int):
    """Deterministic kmeans++-style spread: greedy farthest-point
    traversal from the lowest-hash vector; ties to the lower rank."""
    import numpy as np

    chosen = [0]
    d2 = ((sample - sample[0]) ** 2).sum(axis=1)
    while len(chosen) < k:
        nxt = int(d2.argmax())  # argmax ties -> lowest index
        if d2[nxt] == 0.0:
            break  # fewer than k distinct points
        chosen.append(nxt)
        d2 = np.minimum(d2, ((sample - sample[nxt]) ** 2).sum(axis=1))
    return sample[chosen].copy()


def _lloyd_numpy(sample, k: int, max_iter: int):
    """Driver-side Lloyd over a fixed-order (n, dim) float64 array.
    Deterministic end to end: farthest-point init, argmin ties to the
    lower index, means reduce in row order, stop on bit-equal centers."""
    import numpy as np

    centers = _farthest_point_init(sample, k)
    for _ in range(max_iter):
        d = ((sample[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # ties -> lowest index
        new = centers.copy()  # empty cluster keeps its center
        for c in range(len(centers)):
            members = sample[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        if np.array_equal(new, centers):
            break
        centers = new
    return [[float(x) for x in c] for c in centers]


def deterministic_kmeans(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    max_iter: int = 10,
    seed: int = 42,
    sample_cap: int = DEFAULT_SAMPLE_CAP,
) -> list[list[float]]:
    """Train one codebook of <= k centers over ``vec_col`` (see module
    docstring for the layout-independence contract)."""
    import numpy as np

    picked = _hash_ranked_sample(df, vec_col, sample_cap, seed)
    if not picked:
        raise ValueError("deterministic_kmeans: empty input (no vectors to fit)")
    sample = np.asarray(picked, dtype=np.float64)
    return _lloyd_numpy(sample, min(k, len(sample)), max_iter)


def deterministic_pq_codebooks(
    df: DataFrame,
    dim: int,
    m: int,
    k: int,
    vec_col: str = "embedding",
    max_iter: int = 10,
    seed: int = 42,
    sample_cap: int = DEFAULT_SAMPLE_CAP,
) -> list[list[list[float]]]:
    """Train all m product-quantization sub-codebooks from the SAME
    hash-ranked vector sample, sliced per subspace on the driver
    (faiss's design — m books for one sampling job). Returns m books of
    <= k codewords; a subspace with fewer distinct subvectors than k
    gets exactly its distinct set."""
    import numpy as np

    picked = _hash_ranked_sample(df, vec_col, sample_cap, seed)
    if not picked:
        raise ValueError("pq codebooks: empty input (no vectors to fit)")
    full = np.asarray(picked, dtype=np.float64)
    sub = dim // m
    books = []
    for j in range(m):
        sl = full[:, j * sub : (j + 1) * sub]
        # stable per-subspace dedupe (slices of distinct vectors can
        # collide) — hash order preserved, first occurrence wins
        seen: set[tuple] = set()
        keep = []
        for i in range(len(sl)):
            key = tuple(sl[i])
            if key not in seen:
                seen.add(key)
                keep.append(i)
        sample = sl[keep]
        books.append(_lloyd_numpy(sample, min(k, len(sample)), max_iter))
    return books


def assign_centroids(
    df: DataFrame,
    centers: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "centroid_id",
) -> DataFrame:
    """Nearest-centroid assignment as an Arrow-vectorized numpy scan —
    one batched matmul-shaped pass (the role MLlib's ``model.transform``
    played, minus the layout-dependent model). The first deterministic
    cut assigned through the inline ``nearest_centroids`` struct-sort
    expression; interpreted higher-order functions made that ~2.3 s per
    evaluation at sf0.1 AND it re-evaluates at every plan reference
    (SemDeDup's self-joins paid it ~8×: 1.1 → 20 s — receipts in
    PERF.md r10). Ties go to the lower centroid index, matching the
    expression path, which the emb_cluster_assign_ok certificate keeps
    comparing against this scan corpus-wide.

    NULL or mis-dimensioned vectors get a NULL ``out_col`` (in-band
    quarantine, the resize_images policy) instead of the opaque
    inhomogeneous-shape ValueError ``np.asarray`` would raise inside the
    executor — ``ivf_index`` feeds this the UNFILTERED corpus, so a
    single bad row must stay diagnosable (r10 ADVICE finding)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(centers, dtype=np.float64)
    dim = c.shape[1]

    @pandas_udf("int")
    def _nearest(vs: pd.Series) -> pd.Series:
        out = np.full(len(vs), -1, dtype=np.int64)
        idxs, rows = [], []
        for i, x in enumerate(vs):
            if x is None:
                continue
            a = np.asarray(x, dtype=np.float64)
            if a.shape != (dim,):
                continue
            idxs.append(i)
            rows.append(a)
        if rows:
            v = np.asarray(rows, dtype=np.float64)
            d = ((v[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            out[idxs] = d.argmin(axis=1)
        res = pd.Series(out, dtype="Int32")
        return res.mask(res < 0)

    return df.withColumn(out_col, _nearest(F.col(vec_col).cast("array<double>")))
