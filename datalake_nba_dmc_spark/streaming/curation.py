"""Streaming curation: continuous crawl ingest → deduplicated curated
table (r8, VERDICT r7 stretch #10 — closes the loop from crawl stream to
curated corpus).

The batch curation surface (exact dedup, n-gram near-dedup, CCNet
paragraph dedup) answers "clean THIS corpus"; a production crawl instead
delivers document files continuously, and the admission question is
"which of these NEW rows deserve to enter the already-curated table?" —
exactly :func:`operators.dedup.incremental_dedup`'s contract. This module
lifts it to Structured Streaming via ``foreachBatch``: each micro-batch is
admission-filtered against the curated table AND itself, and survivors
append. Cross-batch state lives in the curated table, not the state store
(zero streaming state, same design as ``events.upsert_sink``), and the
sink is replay-idempotent BY the dedup semantics themselves: a replayed
batch's rows are exact duplicates of their previously-admitted copies, so
they drop — checkpoint + idempotent batch is the documented exactly-once
recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: File-source schema for streamed document batches (file streams require
#: an explicit schema — inference needs a listing the stream doesn't do).
DOCUMENTS_FILE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("source", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("text", StringType(), True),
    ]
)


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source document stream: one (or few) crawl dump files per
    micro-batch — the arrival pattern of a real crawl pipeline."""
    return (
        spark.readStream.schema(DOCUMENTS_FILE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def admit_batch(
    curated_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    fmt: str = "parquet",
):
    """Build the ``foreachBatch`` callback: admission-filter each
    micro-batch against the curated table with
    :func:`operators.dedup.incremental_dedup` (exact + near-duplicate
    checks; the batch side broadcasts, the curated corpus is scanned once
    and never shuffled), then APPEND the admitted rows.

    First batch against a missing table admits against an empty corpus.
    Append (not overwrite) keeps the sink's work proportional to the
    batch, not the table — the property that matters when the curated
    table is 100 TB and a micro-batch is a few thousand documents.
    """
    from datalake_nba_dmc_spark.operators.dedup import incremental_dedup
    from datalake_nba_dmc_spark.sinks import read_table, table_exists

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if table_exists(spark, curated_path):
            corpus = read_table(spark, curated_path, fmt).select(*batch_df.columns)
        else:
            corpus = spark.createDataFrame([], batch_df.schema)
        admitted = incremental_dedup(
            corpus,
            batch_df,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
        )
        # localCheckpoint before the append: admitted reads the path it is
        # about to extend; materializing first keeps the plan from
        # re-listing the directory mid-write (same self-reference rule as
        # sinks.overwrite_self_referencing, but append-shaped)
        admitted.localCheckpoint(eager=True).write.mode("append").format(fmt).save(
            curated_path
        )

    return _apply


def curated_ingest(
    docs_stream: DataFrame,
    curated_path: str,
    checkpoint_dir: str,
    query_name: str = "curated_ingest",
    **admit_kwargs,
):
    """Wire the admission callback into a streaming query (availableNow —
    drain what exists, then stop; swap the trigger for continuous runs)."""
    return (
        docs_stream.writeStream.foreachBatch(
            admit_batch(curated_path, **admit_kwargs)
        )
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
