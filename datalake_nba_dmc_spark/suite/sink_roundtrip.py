"""Sink round-trip query: gives the write path (K1/K2) a driver-checked
CORRECTNESS row instead of pytest-only coverage.

Reference semantics being exercised: every reference job ends in an
overwrite-the-table-directory write (reference
``aws-job-landing-to-bronze/aws-job-landing-to-bronze.py:85-106`` — its
coalesce(1)+boto3-rename dance is deliberately replaced per SURVEY.md
§4.3-2/3 by a parallel partitioned overwrite). The query writes a real
table with :func:`datalake_nba_dmc_spark.sinks.write_table` (hive-style
``partition_by`` so downstream reads get partition pruning), reads it back
with :func:`read_table`, and returns the full row set; the DuckDB oracle
reads the ORIGINAL source table — so the driver's row-count + schema +
value-hash compare certifies the write→read cycle is lossless.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.sinks import (
    read_table,
    write_range_sorted,
    write_table,
    write_zordered,
)
from datalake_nba_dmc_spark.sources import TableRegistry
from datalake_nba_dmc_spark.suite import query

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _scratch(sf_dir: str, name: str) -> str:
    """Per-SF scratch directory inside the repo (the only writable root)."""
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(_REPO_ROOT, ".scratch", name, sf_tag)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def _scratch_reset(spark: SparkSession, root: str) -> None:
    """Recursively delete a scratch root via the Hadoop FS API so a
    versioned-store query restarts its chain identically every run
    (shared by the k6 round-trip and the version-diff query)."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    p = hpath(root)
    p.getFileSystem(spark._jsc.hadoopConfiguration()).delete(p, True)


@query(
    "k1_write_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    """,
)
def k1_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K2 — overwrite-table write, partitioned by ``o_orderpriority``,
    then read back. Lossless iff the hash of the read-back rows equals the
    oracle's hash of the source rows (doubles survive parquet bit-exactly;
    the partition column round-trips through the directory layout)."""
    target = _scratch(sf_dir, "k1_roundtrip")
    src = TableRegistry(spark, sf_dir).orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    write_table(src, target, mode="overwrite", partition_by=["o_orderpriority"])
    return read_table(spark, target).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("o_orderpriority").cast("string").alias("o_orderpriority"),
    )


@query(
    "y2_range_sorted_roundtrip",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def y2_range_sorted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-sorted data layout (sinks.write_range_sorted): lineitem is
    written range-partitioned + sorted on l_shipdate, then read back with
    a one-month predicate. Losslessness is certified by the oracle hash;
    the pruning effect (the read opens only the files whose min/max range
    intersects the month) is asserted file-by-file in
    tests/test_layout.py. At 100 TB this layout is what turns time-range
    scans from full-table I/O into a handful of files."""
    target = _scratch(sf_dir, "y2_range_sorted")
    src = TableRegistry(spark, sf_dir).lineitem.select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"
    )
    write_range_sorted(src, target, sort_cols=["l_shipdate"], num_files=16)
    return read_table(spark, target).filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )


@query(
    "y3_zorder_roundtrip",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
    FROM lineitem
    WHERE l_suppkey BETWEEN 1 AND 5
    """,
)
def y3_zorder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered layout (sinks.write_zordered): lineitem is
    Morton-clustered on (l_partkey, l_suppkey), then read back filtered on
    the SECOND z-axis — the column a single-sort layout cannot prune at
    all. Losslessness certified by the oracle hash; the both-axes
    footer-stat pruning property is asserted file-by-file in
    tests/test_layout.py. At 100 TB this is what makes multi-dimension
    slice queries (part AND supplier) open a hypercube of files instead of
    the whole table."""
    target = _scratch(sf_dir, "y3_zorder")
    src = TableRegistry(spark, sf_dir).lineitem.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
    )
    write_zordered(src, target, ["l_partkey", "l_suppkey"], num_files=16)
    return read_table(spark, target).filter(F.col("l_suppkey").between(1, 5))


@query(
    "k2_partition_overwrite_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
    WHERE o_orderpriority <> '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 2 = 0
    """,
)
def k2_partition_overwrite_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (sinks.overwrite_partitions): land the
    full orders table hive-partitioned by priority, then re-land ONLY the
    1-URGENT partition from a corrected batch (even orderkeys). The
    driver hash certifies the incremental-ingest contract end-to-end:
    untouched partitions keep every original row, the re-landed partition
    holds exactly the new batch — the daily-partition re-land pattern that
    avoids read-modify-write of a 100 TB table."""
    from datalake_nba_dmc_spark.sinks import overwrite_partitions

    target = _scratch(sf_dir, "k2_dyn_overwrite")
    src = TableRegistry(spark, sf_dir).orders.select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    write_table(src, target, mode="overwrite", partition_by=["o_orderpriority"])
    patch = src.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderkey") % 2 == 0)
    )
    overwrite_partitions(patch, target, ["o_orderpriority"])
    return read_table(spark, target).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderpriority").cast("string").alias("o_orderpriority"),
    )


@query(
    "k3_orc_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders
    """,
)
def k3_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-pluggability proof on a SECOND columnar format: orders
    written to ORC (Spark-native, no extra jar) and read back; lossless
    iff the read-back hash equals the parquet source's oracle hash —
    doubles and strings survive ORC bit-exactly. The same
    ``write_table(fmt=...)`` path Delta/Iceberg would use where their
    jars exist (README notes the sandbox has none)."""
    target = _scratch(sf_dir, "k3_orc_roundtrip")
    src = TableRegistry(spark, sf_dir).orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    write_table(src, target, mode="overwrite", fmt="orc")
    return read_table(spark, target, fmt="orc")


@query(
    "k4_csv_landing_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def k4_csv_landing_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landing-format proof: nation written as header CSV and re-read
    through the landing source (sources/landing.read_csv — the
    reference's crawler-cataloged text-file entry point, reference
    ``aws-job-landing-to-bronze/aws-job-landing-to-bronze.py:22-37``)
    with an EXPLICIT schema, as a production landing job would. Lossless
    iff the read-back hash equals the parquet source's oracle hash —
    integers and strings round-trip CSV exactly (no doubles here; CSV is
    the reference's landing format for conformable text tables, not a
    float-precision medium)."""
    from datalake_nba_dmc_spark.sources.landing import read_csv

    target = _scratch(sf_dir, "k4_csv_landing")
    src = TableRegistry(spark, sf_dir).nation.select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    src.write.mode("overwrite").option("header", True).csv(target)
    schema = "n_nationkey int, n_name string, n_regionkey int"
    from pyspark.sql.types import StructType

    return read_csv(
        spark, target, schema=StructType.fromDDL(schema), header=True
    ).select("n_nationkey", "n_name", "n_regionkey")


@query(
    "k5_file_manifest",
    oracle="""
    SELECT o_orderpriority, 1 AS n_files, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM orders GROUP BY o_orderpriority
    """,
)
def k5_file_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout introspection (sinks.file_manifest): orders are clustered on
    the partition key before a hive-partitioned write (repartition by
    o_orderpriority → every partition VALUE lands wholly in one task →
    exactly one file per partition directory), then one
    ``input_file_name()`` scan reports files + rows per partition. The
    oracle pins n_files=1 — a broken clustering (e.g. dropping the
    repartition re-fans each partition value across all write tasks) or a
    lossy write shows up as a value mismatch. This is the report that
    schedules :func:`~datalake_nba_dmc_spark.sinks.compact` on a real
    lake."""
    from datalake_nba_dmc_spark.sinks import file_manifest, write_table

    target = _scratch(sf_dir, "k5_manifest")
    src = TableRegistry(spark, sf_dir).orders.select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    write_table(
        src.repartition("o_orderpriority"),
        target,
        partition_by=["o_orderpriority"],
    )
    return file_manifest(spark, target, ["o_orderpriority"]).select(
        "o_orderpriority",
        F.col("n_files").cast("int").alias("n_files"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


@query(
    "k6_versioned_roundtrip",
    oracle="""
    SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round(o_totalprice * 10000) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS revenue
    FROM orders
    UNION ALL
    SELECT 2 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round(o_totalprice * 10000) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS revenue
    FROM orders WHERE o_totalprice > 150000.0
    """,
)
def k6_versioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-table time travel (sinks.versioned_write/versioned_read):
    v1 = the full orders table, v2 = the high-value subset; the query then
    reads BOTH versions back — v1 via an explicit pinned version AFTER v2
    was committed (time travel: the old snapshot is immutable), v2 via the
    latest pointer — and aggregates each. The rename-as-commit protocol
    means a crashed writer can never surface a half-written version; this
    is the native no-jar fallback for the Delta/Iceberg snapshot
    semantics the sandbox cannot load (README "Table formats")."""
    import pyspark.sql.functions as _F

    from datalake_nba_dmc_spark.sinks import versioned_read, versioned_write

    root = _scratch(sf_dir, "k6_versioned")
    # scratch reset: the version chain must restart per run so the driver
    # sees the same two versions every time
    _scratch_reset(spark, root)

    src = TableRegistry(spark, sf_dir).orders.select(
        "o_orderkey", "o_totalprice"
    )
    v1 = versioned_write(spark, src, root)
    v2 = versioned_write(spark, src.filter(F.col("o_totalprice") > 150000.0), root)

    def agg(df: DataFrame, version: int) -> DataFrame:
        return df.agg(
            _F.lit(version).alias("version"),
            _F.count("*").cast("long").alias("n_rows"),
            (
                _F.sum(_F.round(_F.col("o_totalprice") * 10000).cast("long"))
                .cast("double")
                / 10000.0
            ).alias("revenue"),
        )

    pinned_v1 = versioned_read(spark, root, version=v1)
    latest = versioned_read(spark, root)  # resolves to v2
    return agg(pinned_v1, v1).unionAll(agg(latest, v2))


@query(
    "k7_jsonl_landing_roundtrip",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey FROM supplier
    """,
)
def k7_jsonl_landing_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landing-format proof for JSONL (sources/landing.read_jsonl): the
    supplier table written as JSON lines, one hand-corrupted record
    appended, then re-read with an explicit schema and corrupt-record
    quarantine — the crawler-drop entry format next to CSV (k4). The
    corrupt line must land in the quarantine column and be EXCLUDED, so
    the surviving rows hash-equal the parquet source's oracle exactly;
    a silent-coercion regression (corrupt row kept as nulls, or a good
    row misparsed) breaks the count or the hash."""
    import os

    from pyspark.sql.types import StructType

    from datalake_nba_dmc_spark.sources.landing import read_jsonl

    target = _scratch(sf_dir, "k7_jsonl_landing")
    src = TableRegistry(spark, sf_dir).supplier.select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    src.write.mode("overwrite").json(target)
    with open(os.path.join(target, "zz_corrupt.json"), "w") as f:
        f.write('{"s_suppkey": 999999, "s_name": "broken\n')

    schema = StructType.fromDDL(
        "s_suppkey bigint, s_name string, s_nationkey bigint, _corrupt_record string"
    )
    # Spark disallows plans that reference ONLY the internal corrupt
    # column after pruning (e.g. a count() over this query) unless the
    # parsed result is cached first — the documented contract for
    # corrupt-record queries. The table is landing-sized; the cache is
    # what makes the quarantine filter legal in every downstream shape.
    # The entry is deliberately not unpersisted here (the returned plan
    # still needs it); MEMORY_AND_DISK evicts under pressure and the
    # harness session drops it at shutdown.
    raw = read_jsonl(spark, target, schema=schema, quarantine_corrupt=True).cache()
    return raw.filter(F.col("_corrupt_record").isNull()).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
