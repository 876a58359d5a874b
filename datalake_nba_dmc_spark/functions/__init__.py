"""Scalar-function library: reusable column builders over the engine's
function surface (dates, strings, null semantics, array scalars).

The reference touches exactly ten scalar functions (SURVEY.md §2.8,
X1–X10) — date parse/format, split, concat_ws, when/isNotNull, casts,
arithmetic; all are wrapped in `operators/conform.py`. This package carries
the *extended* surface an engine user expects, grouped as composable
builders so pipelines and the query suite share one definition. Everything
is a built-in `pyspark.sql.functions` expression — JVM-side, codegen'd,
UDF-free.
"""

from datalake_nba_dmc_spark.functions.scalars import (  # noqa: F401
    array_scalar_features,
    date_parts,
    null_semantics,
    string_features,
)
