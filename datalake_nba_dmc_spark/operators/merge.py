"""MERGE / upsert semantics as a batch DataFrame operator.

The reference's only write mode is whole-table overwrite (SURVEY.md §2.2
K1/K2 — reference ``aws-job-landing-to-bronze/aws-job-landing-to-bronze.py:
85-106``); a lakehouse user also runs ``MERGE INTO`` (upsert a change batch
into a large table). Without Delta/Iceberg jars (see README "Table
formats") the transactional file-pruned MERGE is unavailable, so this
operator expresses the same ROW semantics declaratively: one full-outer
shuffle join on the merge keys, with each output row picked from the
matched side by presence flags. With Delta on the classpath the call-site
swaps to ``DeltaTable.merge`` unchanged in meaning.

Scale: ONE shuffle of each side on the merge keys — the exact shape
Delta's shuffle-based MERGE executes. If the target is bucketed on the
keys (sinks.write_bucketed), the target side's exchange disappears.
A 100 TB target with a small change batch wants the Delta file-pruning
path instead; that is an I/O optimization of the same logical plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MATCHED_MODES = ("update", "delete")
_NOT_MATCHED_MODES = ("insert", "ignore")


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
) -> DataFrame:
    """Merge ``source`` into ``target`` on ``keys``.

    - target-only rows are always kept;
    - matched rows become the source version (``update``) or are dropped
      (``delete``);
    - source-only rows are inserted (``insert``) or dropped (``ignore``).

    Both inputs must share a schema, and source must be unique per key
    (standard MERGE precondition — enforce upstream with dedup_rows or an
    argmax window; violations would multiply matched rows here exactly as
    they error in Delta). Column picks use presence flags, not COALESCE,
    so legitimate NULLs in source updates survive."""
    if when_matched not in _MATCHED_MODES:
        raise ValueError(f"when_matched must be one of {_MATCHED_MODES}")
    if when_not_matched not in _NOT_MATCHED_MODES:
        raise ValueError(f"when_not_matched must be one of {_NOT_MATCHED_MODES}")
    cols = target.columns
    if source.columns != cols:
        raise ValueError(f"schema mismatch: target {cols} vs source {source.columns}")
    key_list = list(keys)
    val_cols = [c for c in cols if c not in key_list]

    # a literal presence marker keeps the struct non-null-checkable even
    # when every non-key column is NULL (or when there are none)
    t = target.select(
        *[F.col(k).alias(f"_tk_{k}") for k in key_list],
        F.struct(F.lit(1).alias("_present"), *val_cols).alias("_t_row"),
    )
    s = source.select(
        *[F.col(k).alias(f"_sk_{k}") for k in key_list],
        F.struct(F.lit(1).alias("_present"), *val_cols).alias("_s_row"),
    )
    cond = None
    for k in key_list:
        eq = F.col(f"_tk_{k}") == F.col(f"_sk_{k}")
        cond = eq if cond is None else (cond & eq)
    joined = t.join(s, cond, "full_outer")

    in_t = F.col("_t_row").isNotNull()
    in_s = F.col("_s_row").isNotNull()
    keep = in_t & ~in_s  # target-only: always kept
    if when_matched == "update":
        keep = keep | (in_t & in_s)
    if when_not_matched == "insert":
        keep = keep | (~in_t & in_s)

    # matched rows take the source version under "update"; inserts are
    # source-only by construction — so "row comes from source" ⇔ in_s,
    # except under matched-delete (those rows are filtered out above).
    row = F.when(in_s, F.col("_s_row")).otherwise(F.col("_t_row"))
    out_keys = [
        F.coalesce(F.col(f"_tk_{k}"), F.col(f"_sk_{k}")).alias(k) for k in key_list
    ]
    return (
        joined.filter(keep)
        .select(*out_keys, row.alias("_row"))
        .select(*key_list, *[F.col(f"_row.{c}").alias(c) for c in val_cols])
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Change-data-capture between two table snapshots: one row per
    changed key with ``change_type`` in (insert, delete, update). Keys
    present in both but with identical non-key values emit nothing.

    The comparison is one full-outer shuffle join on the keys; value
    equality is a single null-safe struct comparison (so NULL→NULL is
    unchanged and NULL→value is an update), never per-column driver
    logic. This is the diff side of :func:`merge_upsert` — the batch
    equivalent of reading a Delta CDF between two versions."""
    cols = old.columns
    if new.columns != cols:
        raise ValueError(f"schema mismatch: old {cols} vs new {new.columns}")
    key_list = list(keys)
    val_cols = [c for c in cols if c not in key_list]
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_list],
        F.struct(F.lit(1).alias("_present"), *val_cols).alias("_o_row"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_list],
        F.struct(F.lit(1).alias("_present"), *val_cols).alias("_n_row"),
    )
    cond = None
    for k in key_list:
        eq = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")
    in_o = F.col("_o_row").isNotNull()
    in_n = F.col("_n_row").isNotNull()
    change = (
        F.when(in_o & ~in_n, F.lit("delete"))
        .when(~in_o & in_n, F.lit("insert"))
        .when(~F.col("_o_row").eqNullSafe(F.col("_n_row")), F.lit("update"))
    )
    out_keys = [
        F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k) for k in key_list
    ]
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*out_keys, "change_type")
    )
