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
import zlib

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

# Expected outcomes on SKEWED input (each triaged in PERF.md round-7
# skew-audit notes). Divergences must be justified per entry, exactly
# like the empty/nulls lists.
# - sim_semantic_dedup_certificate: the certificate's stated PRECONDITION
#   is "no natural pair reaches cosine 0.9999" (clean corpus max ≈ 0.47),
#   so every injected (original, copy) pair expects pair_ok=1. The skew
#   mutation makes 30% of vectors IDENTICAL on purpose — those vectors
#   legitimately form one duplicate component, and an injected copy of a
#   hot vector correctly loses to the component's global min id, so
#   pair_ok=0 IS the correct answer on this data. The operator's
#   behavior under the hot cluster is instead pinned by the
#   skew_invariants semdedup check (every vector classified exactly
#   once) and pytest's cap/recall assertions.
KNOWN_SKEW: dict[str, str] = {
    "sim_semantic_dedup_certificate": (
        "certificate precondition (no natural cosine≥0.9999 pairs) is "
        "deliberately violated by the 30%-identical hot cluster; "
        "pair_ok=0 for hot vectors is correct dedup behavior"
    ),
}


def skew_invariants(spark, sf_dir: str, specs) -> list[str]:
    """Re-check the bounded-fan-out PROMISES against the hot data's actual
    row counts (VERDICT r6 ask #6) — plan-text assertions prove the shape,
    these prove the shape holds its bound when one key dominates:

    - MinHash/SimHash banding emit STAR edges: candidate/edge counts must
      stay ≤ rows × bands even though 30% of docs share one text (an
      all-pairs regression would be ~(0.3n)²/2, two orders of magnitude
      over the bound).
    - The per-domain quota must emit ≤ n rows per domain AND keep the
      rank-limit pushdown (WindowGroupLimit) in its plan, so a hot domain
      is bounded BEFORE the shuffle.
    - SemDeDup's capped clustering must survive a 30%-identical-embedding
      hot cluster without going quadratic: its pairwise output stays
      bounded by Σ|sub-cluster|² with |sub-cluster| ≤ its row cap.
    """
    import contextlib
    import io

    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.dedup import (
        minhash_lsh_candidates,
        simhash_near_dups,
    )

    problems: list[str] = []
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    hot = (
        docs.filter(F.col("text").isNotNull())
        .groupBy("text").count().agg(F.max("count")).collect()[0][0]
    )
    quad = hot * (hot - 1) // 2

    cand = minhash_lsh_candidates(docs).count()
    bound = n_docs * 8  # bands
    print(f"INVAR minhash_star: {cand} candidate edges, bound {bound} "
          f"(hot dup group {hot}, all-pairs would be ≥{quad})")
    if cand > bound:
        problems.append(f"minhash star bound violated: {cand} > {bound}")

    edges = simhash_near_dups(docs).count()
    bound = n_docs * 4  # 64-bit sig / 16-bit bands
    print(f"INVAR simhash_star: {edges} verified edges, bound {bound}")
    if edges > bound:
        problems.append(f"simhash star bound violated: {edges} > {bound}")

    q = specs["text_domain_quota"].builder(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    if "WindowGroupLimit" not in plan:
        problems.append("domain quota lost its WindowGroupLimit pushdown")
    over = q.groupBy("domain").count().filter(F.col("count") > 8).count()
    print(f"INVAR domain_quota: WindowGroupLimit "
          f"{'present' if 'WindowGroupLimit' in plan else 'MISSING'}, "
          f"{over} domains over quota")
    if over:
        problems.append(f"domain quota exceeded for {over} domains")

    # SemDeDup under a 30%-identical hot cluster: the capped clustering
    # must still classify EVERY vector exactly once (its pairwise stage
    # is plan-asserted equi-join-on-centroid in pytest; here the check is
    # that the hot cluster neither crashes the cap-split nor loses/dupes
    # rows when one sub-cluster saturates)
    sem = specs["sim_semantic_dedup"].builder(spark, sf_dir)
    n_emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    out_rows = sem.count()
    print(f"INVAR semdedup_cap: {out_rows} decision rows for {n_emb} vectors")
    if out_rows != n_emb:
        problems.append(
            f"semantic-dedup classified {out_rows} of {n_emb} vectors"
        )
    return problems


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
        elif mode == "skew":
            t = _skew(t, f)
        else:
            raise SystemExit(f"unknown mode {mode!r}")
        pq.write_table(t, os.path.join(out, f))
    open(marker, "w").close()
    return out


#: (fraction-of-rows, columns) heavy-key injections per table — see the
#: module docstring's ``skew`` section. Values are replaced with the
#: column's FIRST row value (an existing key, so referential integrity
#: holds — a hot customer must exist in `customer`).
_SKEW_RULES: dict[str, list[tuple[float, list[str]]]] = {
    "orders.parquet": [(0.5, ["o_custkey"])],
    "lineitem.parquet": [(0.5, ["l_partkey", "l_suppkey"])],
    "events.parquet": [(0.5, ["user_id"])],
    "documents.parquet": [(0.8, ["source"]), (0.3, ["text"])],
    "embeddings.parquet": [(0.3, ["embedding"])],
    "customer.parquet": [(0.6, ["c_nationkey"])],
    "supplier.parquet": [(0.6, ["s_nationkey"])],
}


def _skew(t: pa.Table, fname: str) -> pa.Table:
    """Deterministically point ``frac`` of each listed column's rows at
    the column's first value — one dominant key per column, rows chosen
    by a seeded rng so every engine sees identical bytes."""
    rules = _SKEW_RULES.get(fname)
    if not rules or t.num_rows == 0:
        return t
    n = t.num_rows
    cols = {f.name: t.column(f.name) for f in t.schema}
    for frac, names in rules:
        # stable seed (zlib.crc32), NOT Python hash(): str hash is
        # randomized per process (PYTHONHASHSEED), so the skewed dataset
        # would differ across runs/cache rebuilds (r7 ADVICE)
        rng = np.random.default_rng(
            zlib.crc32("|".join([fname, *names]).encode()) & 0xFFFFFFFF
        )
        mask = rng.random(n) < frac
        for name in names:
            vals = cols[name].to_pylist()
            hot = vals[0]
            for i in range(n):
                if mask[i]:
                    vals[i] = hot
            cols[name] = pa.array(vals, type=t.schema.field(name).type)
    return pa.table(cols)


def _inject(t: pa.Table, seed_text: str) -> pa.Table:
    n = t.num_rows
    rng = np.random.default_rng(zlib.crc32(seed_text.encode()) & 0xFFFFFFFF)
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

    known = {"empty": KNOWN_EMPTY, "nulls": KNOWN_NULLS, "skew": KNOWN_SKEW}[mode]
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
    invariant_problems: list[str] = []
    if mode == "skew" and not only:
        invariant_problems = skew_invariants(spark, sf_dir, specs)
        for p in invariant_problems:
            print(f"FAIL invariant: {p}")
    print(
        f"\n[{mode}] {n_pass} pass, {n_fail} mismatch, {n_crash} crash, "
        f"{n_rows_only} rows-only, {n_known} known"
        + (f", {len(invariant_problems)} invariant failures" if mode == "skew" else "")
    )
    if failures:
        print("failures:", " ".join(sorted(failures)))
    return 1 if (n_fail or n_crash or invariant_problems) else 0


if __name__ == "__main__":
    sys.exit(main())
