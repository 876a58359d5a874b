"""Grouped-map Pandas operators (batch ``applyInPandas``).

The escape hatch for per-group logic the built-in operators can't express
(model scoring, per-entity curve fitting, custom normalizations): Spark
shuffles rows by the group key, hands each group to Python as ONE Arrow
batch, and returns the transformed batch. Rules that keep it scale-safe:

- The group is the memory unit — a group must fit in one executor's RAM.
  Hot/huge groups need salting or a windowed reformulation first.
- Everything numeric inside the UDF must be deterministic (fixed reduction
  order / exact arithmetic) or results change with partitioning.
- Prefer built-in window/agg expressions when they can express the
  semantics — they're codegen'd and spill; this path is the fallback.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame


def grouped_minmax_norm(
    df: DataFrame,
    group_by: Sequence[str],
    col: str,
    alias: str = "minmax",
) -> DataFrame:
    """Per-group min-max normalization (x − min)/(max − min) via
    ``applyInPandas`` — deliberately an exactly-SQL-expressible semantic so
    the differential oracle can verify the grouped-map plumbing itself
    (shuffle → Arrow batch → Python → Arrow) and not just trust it.
    Min/max are order-independent, and the normalization is one double
    subtract/divide per row with identical operands in any engine, so the
    output is bit-deterministic. Constant groups (max == min) yield 0.0.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    # build a NEW StructType: StructType.add mutates in place, and df.schema
    # is the DataFrame's cached schema object — adding to it corrupts df
    out_schema = StructType(list(df.schema.fields) + [StructField(alias, DoubleType())])
    keys = list(group_by)

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf[col].min(), pdf[col].max()
        span = hi - lo
        pdf[alias] = (pdf[col] - lo) / span if span > 0 else 0.0
        return pdf

    return df.groupBy(*keys).applyInPandas(norm, schema=out_schema)
