"""Column conformance operators: drop / bulk-rename / derive / cast.

Covers reference inventory rows P1, P2, P4, P5, X1–X8 and the safe
bigint→int narrowing (reference
``aws-job-landing-to-bronze/aws-job-landing-to-bronze.py:46-82``,
``aws-job-bronze-to-silver/aws-job-bronze-to-silver.py:46-106,199``).

Scale notes:

- ``safe_downcast_longs`` fixes the reference anti-pattern of one full RDD
  scan per bigint column (reference ``...landing-to-bronze.py:68-82``,
  SURVEY.md §4.3-1): here ALL column maxima are computed in ONE DataFrame
  aggregate pass (Catalyst plans a single scan with partial aggregation),
  so cost is O(1) scans instead of O(columns).
- Everything else is pure projection — no shuffle, fully codegen'd, and
  column pruning pushes the ``select``/``drop`` into the Parquet scan.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

INT32_MAX = 2_147_483_647
INT32_MIN = -2_147_483_648


def drop_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P1 — remove junk/derived columns (reference ``...landing-to-bronze.py:47``)."""
    return df.drop(*cols)


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P2 — bulk rename via a single projection.

    The reference chains ``withColumnRenamed`` up to 26 times per table
    (reference ``...bronze-to-silver.py:46-106``); each call builds a new
    logical plan node. One ``select`` with aliases produces the identical
    schema with a single projection node. Handles non-identifier source
    names (``3p``, ``+/-``, ``fg%``) via backticked column refs.
    """
    return df.select(
        *[F.col(f"`{c}`").alias(mapping.get(c, c)) for c in df.columns]
    )


def with_derived(df: DataFrame, **exprs: Column) -> DataFrame:
    """P4/P5 — add derived columns (arithmetic, concat_ws, …) in one projection."""
    return df.withColumns(dict(exprs))


def safe_downcast_longs(df: DataFrame, threshold: int = INT32_MAX) -> DataFrame:
    """Narrow every LongType column to int iff its values fit in int32.

    Semantics match the reference's ``cast_bigint_to_int_if_safe``
    (``...landing-to-bronze.py:68-82``: downcast when ``max <= 2**31-1``)
    but adds the symmetric min-bound check and computes all bounds in one
    aggregate pass (one Spark job, not one per column).
    """
    long_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, LongType)]
    if not long_cols:
        return df
    bounds = df.agg(
        *[F.max(c).alias(f"max_{c}") for c in long_cols],
        *[F.min(c).alias(f"min_{c}") for c in long_cols],
    ).first()
    casts = {}
    for c in long_cols:
        mx, mn = bounds[f"max_{c}"], bounds[f"min_{c}"]
        if mx is not None and mx <= threshold and mn is not None and mn >= INT32_MIN:
            casts[c] = F.col(c).cast("int")
    return df.withColumns(casts) if casts else df


def parse_date(col: str | Column, fmt: str) -> Column:
    """X1 — parse a string date column with a Java SimpleDateFormat pattern
    (reference parses ``"MMM dd, yyyy"`` gamelog dates and ISO birthdates,
    ``...landing-to-bronze.py:46,60``)."""
    return F.to_date(F.col(col) if isinstance(col, str) else col, fmt)


def parse_date_null_guarded(col: str | Column, fmt: str) -> Column:
    """F2/X6/X7 — ``when(col.isNotNull(), to_date(col, fmt))`` with implicit
    NULL otherwise (reference ``...landing-to-bronze.py:60``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull(), F.to_date(c, fmt))


def split_mmss(col: str | Column) -> tuple[Column, Column]:
    """X4 — split a ``"MM:SS"`` string into (minutes, seconds) ints
    (reference ``...landing-to-bronze.py:50-51``). ``try_element_at`` +
    ``try_cast``, not ``getItem`` + ``cast``: a malformed value — no colon,
    or non-numeric segments — yields NULLs instead of killing the job
    under Spark 4's ANSI out-of-bounds / CAST_INVALID_INPUT errors, the
    tolerance the reference's non-ANSI pipeline had implicitly
    (robustness_audit `nulls` finding + test_robustness_nulls)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ":")
    return (
        F.try_element_at(parts, F.lit(1)).try_cast("int"),
        F.try_element_at(parts, F.lit(2)).try_cast("int"),
    )


def union_evolved(old: DataFrame, new: DataFrame) -> DataFrame:
    """Schema-evolution union: combine snapshots whose schemas drifted
    (columns added or dropped over time) by NAME, with missing columns
    null-filled — the read-side half of schema evolution for plain-format
    tables (table formats do this in metadata; here it is one
    ``unionByName(allowMissingColumns=True)``, a zero-shuffle plan where
    each side just projects to the merged schema). Positional ``union``
    would silently misalign columns — the classic drifted-schema bug this
    wrapper exists to prevent."""
    return old.unionByName(new, allowMissingColumns=True)
