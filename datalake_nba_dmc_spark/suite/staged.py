"""STAGED queries — implemented, twin-green in tests/test_staged_oracles.py,
awaiting their round's registration window (the registry freeze: operators
stage in the round they are built and register in the next, so every
CORRECTNESS row lands inside a planned window).

These are the REAL builder functions the next round's registration will
expose — kept out of ``QUERIES`` (the driver must not see them early) but
given to ``tools/robustness_audit.py`` (``load_all(include_staged=True)``)
so every staged operator faces the empty/nulls/skew/dup/partitions/spill/
codegen batteries BEFORE it registers: registration arrives pre-hardened
instead of discovering audit findings in its first graded round.

Builders use the exact parameterizations their DuckDB twins pin (the
registration is then literally a move of the dict entry plus the oracle
string). Oracle = None here: the mutated-fixture audit modes apply their
rows-only gate, the layout/spill/codegen modes their bit-identity gate —
the full-value differential stays the staged twins' job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.suite import QuerySpec


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.sources import TableRegistry

    return TableRegistry(spark, sf_dir).documents


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the graph suite's derived link graph (suite/graph.py:_edges)
    return _docs(spark, sf_dir).select(
        (F.col("doc_id") % 101).alias("src"),
        (F.expr("doc_id div 101") % 101).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))


def _text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.text import c4_line_filters

    return c4_line_filters(_docs(spark, sf_dir))


def _graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.graph import (
        label_propagation_micro,
    )

    return label_propagation_micro(_edges(spark, sf_dir), n_rounds=4)


def _dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.cdc import cdc_chunks

    return cdc_chunks(_docs(spark, sf_dir), divisor=16)


def _dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.portable_sketch import (
        minhash_portable,
    )

    return minhash_portable(_docs(spark, sf_dir))


def _dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.portable_sketch import (
        simhash_portable,
    )

    return simhash_portable(_docs(spark, sf_dir))


def _graph_connected_components(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.dedup import (
        connected_components_star,
    )

    return connected_components_star(
        _edges(spark, sf_dir), src="src", dst="dst"
    )


def _graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.graph import triangle_count

    return triangle_count(_edges(spark, sf_dir))


def _sketch_cms_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.portable_sketch import cms_counters

    return cms_counters(_docs(spark, sf_dir))


def _sketch_cms_heavy_hitters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.portable_sketch import (
        cms_heavy_hitters,
    )

    return cms_heavy_hitters(_docs(spark, sf_dir), k=20)


def _stat_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.stats import bootstrap_ci_mean
    from datalake_nba_dmc_spark.sources import TableRegistry

    return bootstrap_ci_mean(
        TableRegistry(spark, sf_dir).orders, "o_totalprice", "o_orderkey"
    )


def _dedup_minhash_portable_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datalake_nba_dmc_spark.operators.portable_sketch import (
        minhash_portable_clusters,
    )

    return minhash_portable_clusters(_docs(spark, sf_dir))


def _graph_coreness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.operators.graph import coreness_micro

    return coreness_micro(_edges(spark, sf_dir), n_rounds=8)


def staged_specs() -> dict[str, QuerySpec]:
    """The r12 registration slate as audit-runnable specs."""
    builders = {
        "text_c4_filters": _text_c4_filters,
        "graph_label_propagation": _graph_label_propagation,
        "dedup_cdc_chunks": _dedup_cdc_chunks,
        "dedup_minhash_portable": _dedup_minhash_portable,
        "dedup_simhash_portable": _dedup_simhash_portable,
        "graph_connected_components": _graph_connected_components,
        "graph_triangle_count": _graph_triangle_count,
        "sketch_cms_counters": _sketch_cms_counters,
        "sketch_cms_heavy_hitters": _sketch_cms_heavy_hitters,
        "stat_bootstrap_ci": _stat_bootstrap_ci,
        "dedup_minhash_portable_clusters": _dedup_minhash_portable_clusters,
        "graph_coreness": _graph_coreness,
    }
    return {n: QuerySpec(n, b, None) for n, b in builders.items()}
