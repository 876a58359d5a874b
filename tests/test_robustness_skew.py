"""Skew-injection audit plumbing (r7) — fast checks that the mutation
builder produces the dominance the audit's invariants assume, without
running the full differential sweep."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF0001 = "/root/testdata/sf0.001"
needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF0001), reason="driver testdata not present"
)


@needs_testdata
def test_skew_builder_creates_dominant_keys():
    import pyarrow.parquet as pq

    from tools.robustness_audit import _SKEW_RULES, _skew

    t = pq.read_table(os.path.join(SF0001, "orders.parquet"))
    s = _skew(t, "orders.parquet")
    vals = s.column("o_custkey").to_pylist()
    hot = max(set(vals), key=vals.count)
    frac = vals.count(hot) / len(vals)
    lo = _SKEW_RULES["orders.parquet"][0][0]
    assert frac >= lo * 0.9, f"hot customer owns only {frac:.0%}"
    # deterministic: same bytes on rebuild
    assert _skew(t, "orders.parquet").equals(s)
    # keys referenced elsewhere stay intact
    assert s.column("o_orderkey").equals(t.column("o_orderkey"))


@needs_testdata
def test_skew_builder_hot_text_and_embedding_cluster():
    import pyarrow.parquet as pq

    from tools.robustness_audit import _skew

    d = pq.read_table(os.path.join(SF0001, "documents.parquet"))
    sd = _skew(d, "documents.parquet")
    texts = sd.column("text").to_pylist()
    hot = max(set(t for t in texts if t), key=texts.count)
    assert texts.count(hot) / len(texts) >= 0.25
    src = sd.column("source").to_pylist()
    hot_src = max(set(src), key=src.count)
    assert src.count(hot_src) / len(src) >= 0.7

    e = pq.read_table(os.path.join(SF0001, "embeddings.parquet"))
    se = _skew(e, "embeddings.parquet")
    embs = se.column("embedding").to_pylist()
    first = embs[0]
    assert sum(1 for v in embs if v == first) / len(embs) >= 0.25


def test_lang_diversity_oracle_no_negative_zero():
    """r7 skew-audit finding: a monolingual source makes DuckDB's
    -SUM(p·ln p) evaluate to IEEE -0.0 while Spark emits +0.0, and the
    value-hash distinguishes them. The oracle's `+ 0.0` canonicalization
    must hold for the degenerate single-language group."""
    import math

    import duckdb

    from datalake_nba_dmc_spark.suite import load_all

    load_all()
    from datalake_nba_dmc_spark.suite import QUERIES

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'solo', 'en'), (2, 'duo', 'en'), (3, 'duo', 'de')"
        ") t(doc_id, source, lang)"
    )
    df = con.execute(QUERIES["text_source_lang_diversity"].oracle).df()
    solo = df[df["source"] == "solo"]["lang_entropy"].iloc[0]
    assert solo == 0.0 and math.copysign(1.0, solo) == 1.0  # +0.0, not -0.0
