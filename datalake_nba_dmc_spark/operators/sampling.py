"""Deterministic sampling operators.

``df.sample()`` is seeded per-partition, so its membership changes with
partitioning, scale factor, and engine — unusable for training-data
holdouts that must be reproducible across reruns and re-shards. These
operators decide membership from the ROW KEY alone (multiplicative
hashing over the key's 31-bit halves with Knuth's 2654435761 and
xxhash's 2246822519, mod 2^32), so a row keeps or loses membership no
matter how the data is partitioned or how big the table grows. The
split-half form exists because a raw ``key * 2654435761`` passes 2^63
for keys ≥ ~3.5e9 — an ARITHMETIC_OVERFLOW under ANSI mode at exactly
the 100 TB key ranges this is meant for; each half's product stays below
2^62, so the arithmetic is exact int64 in both engines for any
non-negative key below 2^62.

Scale: pure filters — they push to the scan, add no shuffle, keep no RNG
state, and compose with partition pruning.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761
_KNUTH2 = 2246822519
_MOD = 4294967296
_LOWMASK = 2147483647  # 2^31 - 1


def _key_hash(key: Column, buckets: int) -> Column:
    """Deterministic engine-portable hash bucket in [0, buckets)."""
    lo = key.bitwiseAND(F.lit(_LOWMASK))
    hi = F.shiftrightunsigned(key.cast("long"), 31)
    h = (
        (lo * F.lit(_KNUTH)) % F.lit(_MOD) + (hi * F.lit(_KNUTH2)) % F.lit(_MOD)
    ) % F.lit(_MOD)
    return h % F.lit(buckets)


def duck_key_hash(key_sql: str, buckets: int) -> str:
    """The DuckDB SQL twin of :func:`_key_hash`, character-for-character
    the same arithmetic, for oracle strings."""
    return (
        f"((({key_sql} & {_LOWMASK}) * {_KNUTH}) % {_MOD}"
        f" + (({key_sql} >> 31) * {_KNUTH2}) % {_MOD}) % {_MOD} % {buckets}"
    )


def sample_fraction(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, decided only by ``key_col``."""
    permille = int(round(fraction * 1000))
    return df.filter(_key_hash(F.col(key_col), 1000) < permille)


def sample_stratified(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its own
    keep-fraction (e.g. downsample the dominant language, keep all of a
    rare one — the standard training-mix rebalance). Unlisted strata fall
    back to ``default_rate``. Implemented as one CASE expression over the
    stratum column compared against the key hash — a scan-level filter,
    no per-stratum jobs, no ``sampleBy`` RNG nondeterminism."""
    rate = F.lit(int(round(default_rate * 1000)))
    for value, frac in sorted(rates.items()):
        rate = (
            F.when(F.col(stratum_col) == value, F.lit(int(round(frac * 1000))))
            .otherwise(rate)
        )
    return df.filter(_key_hash(F.col(key_col), 1000) < rate)


def split_train_holdout(
    df: DataFrame, key_col: str, holdout_fraction: float = 0.1
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, reproducible train/holdout split on the key hash: the
    same key lands on the same side in every run, at every scale factor,
    under any partitioning — the leakage-safety property random splits
    lack."""
    permille = int(round(holdout_fraction * 1000))
    h = _key_hash(F.col(key_col), 1000)
    return df.filter(h >= permille), df.filter(h < permille)


def resample_balanced(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weight_col: str,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Rebalance a corpus so every stratum contributes (approximately) the
    same total ``weight_col`` mass: each stratum's keep-fraction is
    ``min_stratum_weight / its_weight``, and row membership is decided by
    the deterministic key hash against that threshold — the data-driven
    version of :func:`sample_stratified`, where the rates come FROM the
    data instead of a config (the standard "don't let one crawl dominate
    the training mix" step).

    Plan: one partial-agg shuffle to get per-stratum totals (a handful of
    rows), a broadcast join of those thresholds back onto the corpus, and
    a scan-level hash filter. The corpus itself is never shuffled, and
    thresholds are exact integers (floor of the weight ratio scaled to
    ``buckets``), so membership is engine-portable and reproducible at
    any scale factor.
    """
    totals = df.groupBy(stratum_col).agg(F.sum(weight_col).alias("_w"))
    min_w = totals.agg(F.min("_w").alias("_wmin"))
    # exact integer division (`div`), not floor-of-double-divide: keeps the
    # threshold engine-portable past 2^53 total weight. Overflow bound:
    # min-stratum weight × buckets must fit in int64.
    thresholds = totals.crossJoin(F.broadcast(min_w)).select(
        stratum_col,
        F.expr(f"div(_wmin * {buckets}L, _w)").alias("_thr"),
    )
    return (
        df.join(F.broadcast(thresholds), on=stratum_col)
        .filter(_key_hash(F.col(key_col), buckets) < F.col("_thr"))
        .drop("_thr")
    )


def sample_weighted_topk(
    df: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, public): each row draws a key ``u^(1/w)`` — here in the
    equivalent log form ``ln(u)/w`` — and the ``k`` largest keys win. A
    row's inclusion probability is proportional to its weight, yet the
    draw is reproducible across runs, partitionings, engines, and scale
    factors because ``u`` comes from the row-key hash (``(h + 0.5) /
    2^32`` ∈ (0,1)), not an RNG.

    Scale: the selection compiles to per-partition top-k + a single
    driver-side merge of k rows (Spark's TakeOrderedAndProject) — no full
    sort, no shuffle of the losing rows. The standard "pick a
    quality-weighted subcorpus" primitive.

    Weights must be strictly positive; ties are impossible for distinct
    keys (distinct h → distinct u, and ``ln(u)/w`` collisions across
    different (u, w) pairs are measure-zero, far wider than an engine's
    last-ulp ``ln`` differences).
    """
    h = _key_hash(F.col(key_col), _MOD)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(_MOD))
    es_key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.withColumn("_es", es_key)
        .orderBy(F.col("_es").desc())
        .limit(k)
        .drop("_es")
    )


def sample_gumbel_topk(
    df: DataFrame, key_col: str, logweight_col: str, k: int
) -> DataFrame:
    """Deterministic weighted sampling without replacement when weights
    live in LOG space (the Gumbel-top-k trick: ``argtop-k(log w + G)``
    with standard Gumbel noise ``G = −ln(−ln u)`` samples ∝ exp(log w)
    without replacement — provably the same draw as Efraimidis–Spirakis
    on ``w = exp(log w)``, see test_sampling, but immune to the overflow/
    underflow of exponentiating scores like DSIR log-ratios that span
    hundreds of nats).

    Same determinism contract as :func:`sample_weighted_topk`: ``u``
    comes from the row-key hash, so the draw is stable across runs,
    partitionings, and engines; same scale shape (TakeOrderedAndProject —
    per-partition top-k, only k rows reach the driver-side merge).
    Composes directly with ``text.dsir_importance``: pass
    ``dsir_logratio`` as the log-weight for the paper's actual
    importance-RESAMPLING step instead of deterministic top-k selection.
    """
    h = _key_hash(F.col(key_col), _MOD)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(_MOD))
    gumbel_key = F.col(logweight_col).cast("double") - F.log(-F.log(u))
    return (
        df.withColumn("_gk", gumbel_key)
        .orderBy(F.col("_gk").desc())
        .limit(k)
        .drop("_gk")
    )


def split_boundaries(
    fractions: Mapping[str, float], buckets: int = 10_000
) -> list[tuple[str, int, int]]:
    """Deterministic (name, lo, hi) bucket ranges for a named split, in
    sorted-name order, covering [0, buckets) exactly (the last range
    absorbs rounding residue). Shared by the Spark expression and the
    DuckDB oracle so both engines cut on literally the same integers."""
    names = sorted(fractions)
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out, cum = [], 0
    for i, name in enumerate(names):
        hi = buckets if i == len(names) - 1 else cum + round(fractions[name] * buckets)
        out.append((name, cum, hi))
        cum = hi
    return out


def split_by_group(
    df: DataFrame,
    group_col: str,
    key_col: str = "doc_id",
    fractions: Mapping[str, float] | None = None,
    buckets: int = 10_000,
) -> DataFrame:
    """Leakage-free train/val/test split: the split is decided per GROUP
    (a dedup cluster, a domain, an exact-text fingerprint), never per row,
    so duplicates and near-duplicates can never straddle the eval boundary
    — the contamination mode row-level random splits are famous for.

    Every group is represented by its minimum ``key_col`` (portable
    integer), hashed with the engine-portable :func:`_key_hash` into
    ``buckets`` and cut on :func:`split_boundaries`' ranges — fully
    deterministic across runs, partitionings, and scale factors. Rows with
    a NULL group key form ONE group (they are mutually indistinguishable
    to the grouping; pre-coalesce a per-row key to opt out).

    Plan: one map-side-combinable min-agg shuffled on the group key plus
    an equi-join back on that same key (co-partitioned — AQE reuses the
    exchange), then a pure-codegen CASE. The corpus never shuffles twice.

    Returns ``df`` + (group_rep, split).
    """
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    reps = (
        df.groupBy(group_col)
        .agg(F.min(key_col).alias("group_rep"))
        .withColumnRenamed(group_col, "_grp_key")
    )
    bucket = _key_hash(F.col("group_rep"), buckets)
    expr = None
    for name, lo, hi in split_boundaries(fractions, buckets):
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # Null-safe equi-join (<=>): groupBy keeps NULL as its own group, but a
    # plain equi-join back would never match it and silently DROP every
    # NULL-group row from the split output (r7 ADVICE — data loss in a
    # train/val/test splitter). <=> is still a hash-joinable key, so the
    # plan shape (one shuffle, exchange reuse) is unchanged.
    return (
        df.join(reps, F.col(group_col).eqNullSafe(F.col("_grp_key")))
        .drop("_grp_key")
        .withColumn("split", expr)
    )


def sample_temperature(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    tau: float = 0.5,
    buckets: int = 1000,
) -> DataFrame:
    """Temperature-scaled mix rebalancing (the multilingual-LM sampling
    rule of mBERT / XLM-R, Conneau et al. 2020: sample strata with
    probability ∝ p_i^α): per-stratum deterministic keep-rate
    ``(n_min / n_i)^tau``, so surviving mass ∝ p_i^(1-tau) — ``tau=0`` is
    the natural mix, ``tau=1`` the equal-mass mix of
    :func:`resample_balanced`, and ``tau=0.5`` the sqrt scaling (α=0.5)
    most multilingual recipes use. Downsample-only (every rate ≤ 1, the
    rarest stratum keeps everything) and decided by the portable key
    hash, so membership is reproducible across runs, partitionings, and
    scale factors.

    Plan: one map-side-combinable count agg (k strata rows), a one-row
    min broadcast onto it, a k-row broadcast join back to the corpus, and
    a scan-level hash filter — the corpus is never shuffled.

    Engine-exactness note: at ``tau=0.5`` the rate is
    ``sqrt(n_min/n_i)`` — IEEE-754 sqrt is correctly rounded in both the
    JVM and C, so oracle twins match bit-for-bit; other ``tau`` values go
    through ``pow``, which carries a last-ulp cross-engine risk at
    threshold boundaries (fine for the operator, avoid in oracles).
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    min_n = counts.agg(F.min("_n").alias("_nmin"))
    rate = (
        F.sqrt(F.col("_nmin") / F.col("_n"))
        if tau == 0.5
        else F.pow(F.col("_nmin") / F.col("_n"), F.lit(float(tau)))
    )
    thresholds = counts.crossJoin(F.broadcast(min_n)).select(
        stratum_col, F.floor(rate * buckets).cast("long").alias("_thr")
    )
    return (
        df.join(F.broadcast(thresholds), on=stratum_col)
        .filter(_key_hash(F.col(key_col), buckets) < F.col("_thr"))
        .drop("_thr")
    )
