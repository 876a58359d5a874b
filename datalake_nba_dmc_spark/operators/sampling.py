"""Deterministic sampling operators.

``df.sample()`` is seeded per-partition, so its membership changes with
partitioning, scale factor, and engine — unusable for training-data
holdouts that must be reproducible across reruns and re-shards. These
operators decide membership from the ROW KEY alone (multiplicative
hashing, Knuth's 2654435761 mod 2^32), so a row keeps or loses membership
no matter how the data is partitioned or how big the table grows.

Scale: pure filters — they push to the scan, add no shuffle, keep no RNG
state, and compose with partition pruning.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761
_MOD = 4294967296


def _key_hash(key: Column, buckets: int) -> Column:
    """Deterministic engine-portable hash bucket in [0, buckets)."""
    return ((key * F.lit(_KNUTH)) % F.lit(_MOD)) % F.lit(buckets)


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
