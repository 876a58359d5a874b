"""Query suite registry.

Each implemented operator from SURVEY.md §2 (plus the extension operators)
is exposed as a named query: a builder ``(spark, sf_dir) -> DataFrame`` and,
where SQL-expressible, an equivalent ANSI-SQL oracle string for DuckDB.
``__spark_entry__.py`` re-exports this registry to the driver.

Determinism rules (so the order-insensitive value-hash matches the oracle):

- Every computed column is aliased identically in Spark and SQL.
- Sums over money-style double columns are scaled per-row to 10^-4 units
  and rounded to long (identical IEEE row values round identically in both
  engines), summed as integers (associative → partial-agg order
  irrelevant), and divided back once. Plain double sums would differ in
  ULPs between engines; this integer form is also ~1.8× faster than the
  decimal(18,4)-cast alternative (pure codegen'd long ops).
- Window orderings always carry a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Register a named query (decorator). Builders are wrapped so the
    engine's dynamic SQL confs apply even when the caller (e.g. the driver
    harness) supplies its own SparkSession."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            from datalake_nba_dmc_spark.session import apply_runtime_confs

            return fn(apply_runtime_confs(spark), sf_dir)

        build.__name__ = fn.__name__
        build.__doc__ = fn.__doc__
        QUERIES[name] = QuerySpec(name, build, oracle)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every suite module so registrations run; return the registry."""
    from datalake_nba_dmc_spark.suite import (  # noqa: F401
        analytics,
        classic,
        dedup,
        events,
        functions_surface,
        multimodal,
        parity,
        similarity,
        skew,
        subqueries,
        text,
    )

    return QUERIES
