"""Portable HyperLogLog — a distinct-count sketch whose REGISTERS are a
cross-engine bit-exact contract.

The suite already has two approximate-distinct paths, each with a
weaker check than the engine's standard:

- ``approx_count_distinct`` / DataSketches blobs (operators/sketches):
  real mergeable sketches, but their binary state is engine-private, so
  the driver oracle can only pin a CERTIFICATE (|approx − exact| within
  a band), never the sketch's own values.

This module closes that gap with the HyperBall building blocks
(operators/hyperball): the hash is the dialect-rendered 32-bit integer
mixer (plain arithmetic — no engine hash builtin), registers are m flat
``MAX(CASE …)`` aggregates (map-side combined, skew-immune: every
group's state is m small ints regardless of row count, and max-merge is
layout-independent BY ALGEBRA), and the estimate is the standard
alpha·m²/Σ2^(−reg) with linear-counting small-range correction — every
constant embedded as the SAME full-precision literal in both engines.
Result: a DuckDB twin reproduces the ESTIMATE bit-for-bit, so the
sketch query gets a full value-hash driver oracle, not a tolerance
certificate (driver query ``sketch_hll_portable``, registered r11).

Contract: ``key`` must be a non-negative integral expression (ids); at
100 TB string keys pre-hash through any stable int64 derivation the
twin shares. Accuracy: rse ≈ 1.04/sqrt(m) (~18% at the default m=32 —
raise m for real dashboards; the plan just widens one projection).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.hyperball import (
    _ALPHA_32,
    _K,
    _idiv,
    M_REGISTERS,
    linear_counting_case_sql,
    mixer_sql,
    rho_sql,
)


def register_agg_sql(key: str, j: int, dialect: str, m: int = M_REGISTERS) -> str:
    """Aggregate fragment for register j: MAX over rows of (rho if the
    key lands in bucket j else 0) — shared recipe, dialect-rendered."""
    h = mixer_sql(key, dialect)
    return (
        f"COALESCE(MAX(CASE WHEN ({h} % {m}) = {j} THEN "
        f"{rho_sql(_idiv(h, m, dialect))} END), 0)"
    )


def sum_v_sql(reg_cols: list[str]) -> tuple[str, str]:
    """The two register reductions: exact long Σ 2^(K−reg) and the
    zero-register count V. Dialect-free."""
    s = " + ".join(f"CAST(POW(2, {_K} - {r}) AS BIGINT)" for r in reg_cols)
    v = " + ".join(f"(CASE WHEN {r} = 0 THEN 1 ELSE 0 END)" for r in reg_cols)
    return f"({s})", f"({v})"


def estimate_from_sv_sql(s: str, v: str, m: int = M_REGISTERS) -> str:
    """Dialect-free estimate from the staged (Σ 2^(K−reg), V) pair:
    linear-counting switch, micro-unit half-up floor — identical
    literals, identical operation order, both engines."""
    # every literal is CAST AS DOUBLE: DuckDB parses bare decimal
    # literals as DECIMAL and then overflows the DECIMAL multiply; Spark
    # happens to widen — the casts make both engines run pure doubles
    raw = (
        f"(CAST({_ALPHA_32 * m * m!r} AS DOUBLE) "
        f"* CAST({float(2 ** _K)!r} AS DOUBLE) / CAST({s} AS DOUBLE))"
    )
    lin = linear_counting_case_sql(v, m)
    est = (
        f"(CASE WHEN {raw} <= CAST({2.5 * m!r} AS DOUBLE) AND {v} > 0 "
        f"THEN {lin} ELSE {raw} END)"
    )
    return (
        f"CAST(FLOOR({est} * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )


def estimate_sql(reg_cols: list[str], m: int = M_REGISTERS) -> str:
    """One-shot composition over register columns (the DuckDB twin's
    convenience form; the Spark path stages (_s, _v) columns first —
    inlining all three layers into one expression fused the whole thing
    into the aggregate's generated output method and blew janino's
    64 KB method limit at sf0.1, silently falling back to interpreted
    mode: an r10 cross-scale finding)."""
    s, v = sum_v_sql(reg_cols)
    return estimate_from_sv_sql(s, v, m)


def hll_portable_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    m: int = M_REGISTERS,
) -> DataFrame:
    """Distinct-count estimate per group with the portable-register
    contract: (group_cols…, distinct_est_micro). One hash-agg scan — m
    flat MAX aggregates, partial-aggregated map-side, state m ints per
    group however hot the group (the skew-immunity exact countDistinct's
    two-shuffle form lacks)."""
    regs = [f"_r{j}" for j in range(m)]
    # staged per-row bucket/rho (mixer rendered ONCE — the hyperball
    # seeding lesson: m copies of the mixer+rho ladder cost seconds of
    # codegen compile), then m trivial MAX(CASE) aggregates
    scored = (
        df.withColumn("_h", F.expr(mixer_sql(key_col, "spark")))
        .withColumn("_b", F.col("_h") % m)
        .withColumn("_rho", F.expr(rho_sql(_idiv("_h", m, "spark"))))
    )
    agg = scored.groupBy(*group_cols).agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("_b") == j, F.col("_rho"))), F.lit(0)
            ).alias(r)
            for j, r in enumerate(regs)
        ]
    )
    # STAGED estimate: (_s, _v) reductions in their own projection, the
    # CASE/floor pipeline in the next — one fused expression overflowed
    # janino's generated-method limit at scale (see estimate_sql note)
    s_sql, v_sql = sum_v_sql(regs)
    staged = agg.withColumn("_s", F.expr(s_sql)).withColumn(
        "_v", F.expr(v_sql)
    )
    return staged.select(
        *group_cols,
        F.expr(estimate_from_sv_sql("_s", "_v", m)).alias(
            "distinct_est_micro"
        ),
    )
