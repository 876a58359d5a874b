"""Robustness audit — differential correctness on ADVERSARIAL inputs.

The driver's correctness gate (and ``tools/verify_local.py``) proves
Spark==DuckDB parity on the *clean* generated testdata. This tool re-runs
the same differential comparison on two mutated copies of the data that a
100 TB crawl pipeline actually encounters:

- ``empty``  — every table present with the right schema but ZERO rows
  (an empty partition / empty day / brand-new landing zone). A query that
  crashes here (driver-side ``collect()[0]``, quantile on nothing, KMeans
  on nothing) is a robustness bug regardless of its clean-data parity.
- ``nulls``  — deterministic injection of NULLs, empty strings, and
  whitespace/unicode-edge strings into non-key string columns, and NULLs
  into non-key numeric/date columns (~6% of rows touched per column).
  Spark and DuckDB see the IDENTICAL mutated bytes, so any hash mismatch
  is a real engine-semantics divergence (or a twin whose equivalence
  silently assumed no-null input) — both are findings.
- ``skew``   — deterministic HEAVY-KEY injection (r7): one customer owns
  50% of orders, one part/supplier 50% of lineitems, one user 50% of
  events, one source 80% of documents, one text repeated across 30% of
  documents (a hot LSH bucket AND a giant dup group), one vector repeated
  across 30% of embeddings (a hot ANN/SemDeDup cluster). Unlike the other
  modes this deliberately mutates JOIN KEYS — skewed foreign keys are the
  production failure, not a degenerate input. Two gates: (a) the same
  differential compare (results must stay correct under skew), and (b)
  ``skew_invariants`` — the bounded-fan-out claims the operators promise
  (star edges linear in bucket size, rank-limit pushdown present for the
  domain quota, salted pre-agg present) are re-checked against the hot
  data's ACTUAL row counts, not just the plan text.

Usage::

    python tools/robustness_audit.py empty [query ...]
    python tools/robustness_audit.py nulls [query ...]
    python tools/robustness_audit.py skew  [query ...]

Builds the mutated dataset under ``/tmp/robustness_<mode>`` (cached — wiped
and rebuilt when missing) from ``/root/testdata/sf0.001``, then runs the
full registry through the same compare loop as ``verify_local``. Exit 0 if
every oracle query matches and nothing crashes.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"

# columns that must stay intact: ids and join/foreign keys — mutating them
# only degenerates joins into noise without testing anything new
KEY_SUFFIXES = ("key", "_id")
EDGE_STRINGS = ["", " \t\n ", "café — \U0001d54a", "NULL", "0"]


def _is_key(name: str) -> bool:
    return name.endswith(KEY_SUFFIXES) or name in ("doc_id", "vec_id", "event_id")


# Expected outcomes on EMPTY input, each triaged (see PERF.md round-6
# robustness-audit notes):
# - "raises": index builds fail fast with a clear ValueError by design —
#   you cannot train centroids/codebooks/PCA on nothing, and silently
#   returning an empty index would mask an upstream failure.
# - "diverges": Spark's GROUP BY CUBE/ROLLUP/GROUPING SETS on empty input
#   yields 0 rows, while the SQL standard (and DuckDB) yields the
#   grand-total row for the empty grouping set. Engine semantics, not an
#   operator bug; our engine is Spark, so Spark's answer stands.
KNOWN_EMPTY: dict[str, str] = {
    "emb_pca_project": "raises",
    "emb_pca_whitened": "raises",
    "emb_cluster_assign_ok": "raises",
    "emb_pq_codes": "raises",
    "sim_ivf_recall": "raises",
    "sim_ivf_topk": "raises",
    "sim_pq_adc_recall": "raises",
    "sim_semantic_dedup": "raises",
    "sim_semantic_dedup_certificate": "raises",
    "agg_cube": "diverges",
    "agg_grouping_sets": "diverges",
    "agg_rollup": "diverges",
    "events_time_rollup": "diverges",
}

# Expected outcomes on NULL/edge-mutated input, each triaged and verified
# (PERF.md round-6 robustness-audit notes). Everything NOT listed here
# must hash-match its oracle on the mutated tables.
# - k1/k2/k5: hive partition-value encoding is LOSSY for degenerate
#   strings — both NULL and '' serialize to __HIVE_DEFAULT_PARTITION__
#   and read back as NULL, so a round-trip through a layout partitioned
#   on a column containing empty strings cannot equal the source (the
#   operational rule is "partition on canonical, non-empty keys";
#   write_table's docstring carries the warning).
# - func_string_surface: DuckDB's levenshtein counts UTF-8 BYTES where
#   Spark counts characters — they disagree on any non-ASCII input
#   (e.g. 'café — 𝕊' vs 'Customer': 8 chars vs 14 bytes). Engine
#   semantics; ours is Spark's character distance.
KNOWN_NULLS: dict[str, str] = {
    "k1_write_roundtrip": "hive-partition-value encoding lossy for ''/NULL",
    "k2_partition_overwrite_roundtrip": "hive-partition-value encoding lossy for ''/NULL",
    "k5_file_manifest": "hive-partition-value encoding lossy for ''/NULL",
    "func_string_surface": "levenshtein unicode units: bytes (DuckDB) vs chars (Spark)",
}


def build_mutated(mode: str) -> str:
    out = f"/tmp/robustness_{mode}"
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for f in sorted(os.listdir(SRC)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(SRC, f))
        if mode == "empty":
            t = t.schema.empty_table()
        elif mode == "nulls":
            t = _inject(t, seed_text=f)
        else:
            raise SystemExit(f"unknown mode {mode!r}")
        pq.write_table(t, os.path.join(out, f))
    open(marker, "w").close()
    return out


def _inject(t: pa.Table, seed_text: str) -> pa.Table:
    n = t.num_rows
    rng = np.random.default_rng(abs(hash(seed_text)) % 2**32)
    cols = {}
    for field in t.schema:
        col = t.column(field.name)
        if _is_key(field.name) or n == 0:
            cols[field.name] = col
            continue
        r = rng.random(n)
        if pa.types.is_string(field.type) or pa.types.is_large_string(field.type):
            vals = col.to_pylist()
            for i in range(n):
                if r[i] < 0.03:
                    vals[i] = None
                elif r[i] < 0.06:
                    vals[i] = EDGE_STRINGS[i % len(EDGE_STRINGS)]
            cols[field.name] = pa.array(vals, type=field.type)
        elif (
            pa.types.is_integer(field.type)
            or pa.types.is_floating(field.type)
            or pa.types.is_decimal(field.type)
            or pa.types.is_date(field.type)
            or pa.types.is_timestamp(field.type)
        ):
            vals = col.to_pylist()
            for i in range(n):
                if r[i] < 0.02:
                    vals[i] = None
            cols[field.name] = pa.array(vals, type=field.type)
        else:  # lists (embeddings) and anything exotic: leave intact
            cols[field.name] = col
    return pa.table(cols)


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "empty"
    only = set(sys.argv[2:])
    sf_dir = build_mutated(mode)

    import duckdb
    import pandas as pd  # noqa: F401  (verify_local.canonical_hash uses pd)

    from datalake_nba_dmc_spark.session import get_spark
    from datalake_nba_dmc_spark.sources import TABLES
    from datalake_nba_dmc_spark.suite import load_all
    from tools.verify_local import canonical_hash

    specs = load_all()
    spark = get_spark(f"robustness_{mode}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )

    known = KNOWN_EMPTY if mode == "empty" else KNOWN_NULLS
    n_pass = n_fail = n_rows_only = n_crash = n_known = 0
    failures: list[str] = []
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        try:
            spdf = spec.builder(spark, sf_dir).toPandas()
        except ValueError as e:
            if known.get(name) == "raises" and "empty input" in str(e):
                print(f"KNOWN {name}: raises by design: {e}")
                n_known += 1
                continue
            print(f"CRASH {name}: spark: ValueError: {str(e).splitlines()[0][:160]}")
            n_crash += 1
            failures.append(name)
            continue
        except Exception as e:
            print(f"CRASH {name}: spark: {type(e).__name__}: {str(e).splitlines()[0][:160]}")
            n_crash += 1
            failures.append(name)
            continue
        kn = known.get(name)
        if kn and kn != "raises":
            reason = (
                "engine divergence on empty grouping sets" if kn == "diverges" else kn
            )
            print(f"KNOWN {name}: {reason}")
            n_known += 1
            continue
        if spec.oracle is None:
            print(f"ROWS {name}: {len(spdf)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(spec.oracle).df()
        except Exception as e:
            print(f"CRASH {name}: duckdb: {type(e).__name__}: {str(e).splitlines()[0][:160]}")
            n_crash += 1
            failures.append(name)
            continue
        problems = []
        if len(spdf) != len(odf):
            problems.append(f"rows {len(spdf)} vs {len(odf)}")
        if sorted(spdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(spdf.columns)} vs {sorted(odf.columns)}")
        elif not problems:
            hs, ho = canonical_hash(spdf), canonical_hash(odf)
            if hs != ho:
                problems.append(f"hash {hs} vs {ho}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
            failures.append(name)
        else:
            print(f"PASS {name} ({len(spdf)} rows)")
            n_pass += 1
    print(
        f"\n[{mode}] {n_pass} pass, {n_fail} mismatch, {n_crash} crash, "
        f"{n_rows_only} rows-only, {n_known} known"
    )
    if failures:
        print("failures:", " ".join(sorted(failures)))
    return 1 if (n_fail or n_crash) else 0


if __name__ == "__main__":
    sys.exit(main())
