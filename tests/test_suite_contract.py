"""Driver-contract tests: every registered query analyzes cleanly against the
sf0.001 tables; oracle keys are a subset of query keys; entry() smoke."""

from __future__ import annotations

import importlib.util
import os

import pytest

from datalake_nba_dmc_spark.suite import load_all

SF0001 = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF0001), reason="driver testdata not present"
)


def test_registry_shape():
    specs = load_all()
    assert len(specs) >= 45
    for name, spec in specs.items():
        assert spec.name == name
        assert callable(spec.builder)


@needs_testdata
def test_every_query_analyzes(spark):
    """df.schema forces Catalyst analysis (column/type resolution) without
    executing the plan — catches broken column refs in every suite entry."""
    for name, spec in load_all().items():
        df = spec.builder(spark, SF0001)
        assert len(df.schema.fields) > 0, name


@needs_testdata
def test_entry_smoke(spark):
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    df = m.entry(spark)
    assert df.count() > 0
    assert set(m.oracle_sql()) <= set(m.queries())
