"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan out an under-partitioned input before CPU-heavy per-row work.

    Spark sizes scan partitions by input bytes (``maxPartitionBytes``),
    which is right for IO-bound plans but wrong for compute-bound ones: a
    few-MB parquet of short documents arrives as ONE partition, so
    shingling/hashing/scoring runs single-threaded no matter how many cores
    exist (measured: the whole MinHash pipeline on 1 core at local[32]).

    If the DataFrame has fewer partitions than the cluster's default
    parallelism, round-robin repartition up to it — the shuffle moves only
    the small under-partitioned data, and every downstream per-row stage
    uses the full cluster. No-op (and no shuffle) when the input is already
    parallel enough, so it's safe on 100 TB scans where partitioning came
    from the file layout.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
