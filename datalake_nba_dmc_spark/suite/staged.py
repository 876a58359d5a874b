"""STAGED queries — implemented, twin-green in tests/test_staged_oracles.py,
awaiting their round's registration window (the registry freeze: operators
stage in the round they are built and register in the next, so every
CORRECTNESS row lands inside a planned window).

These are the REAL builder functions the next round's registration will
expose — kept out of ``QUERIES`` (the driver must not see them early) but
given to ``tools/robustness_audit.py`` (``load_all(include_staged=True)``)
so every staged operator faces the empty/nulls/skew/dup/partitions/spill/
codegen/bytes/retry batteries BEFORE it registers: registration arrives
pre-hardened instead of discovering audit findings in its first graded
round.

Builders use the exact parameterizations their DuckDB twins pin (the
registration is then literally a move of the dict entry plus the oracle
string). Oracle = None here: the mutated-fixture audit modes apply their
rows-only gate, the layout/spill/codegen modes their bit-identity gate —
the full-value differential stays the staged twins' job.

The r14 slate (stat_psi_by_segment, sim_ivf_sq8_recall,
sample_eval_decontaminated_split, stat_bootstrap_ci_by_segment,
events_trailing_windows_multi) REGISTERED in r15 — builders and oracles
now live in their suite modules. The dict below stages the r16 slate as
this round builds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.suite import QuerySpec


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_nba_dmc_spark.sources import TableRegistry

    return TableRegistry(spark, sf_dir).documents


def staged_specs() -> dict[str, QuerySpec]:
    """The r16 registration slate as audit-runnable specs (grows as
    this round stages operators)."""
    builders: dict = {}
    return {n: QuerySpec(n, b, None) for n, b in builders.items()}
