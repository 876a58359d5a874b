"""Multimodal-column queries: binary payload + metadata plumbing, decode via
Arrow-batched mapInPandas (decode body stubbed — see operators.multimodal)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datalake_nba_dmc_spark.operators import multimodal as M
from datalake_nba_dmc_spark.sources import TableRegistry
from datalake_nba_dmc_spark.suite import query


@query(
    "media_metadata",
    oracle="""
    SELECT doc_id AS media_id, 'image' AS media_type,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(strlen(text) % 640 + 1 AS INTEGER) AS width,
           CAST(strlen(text) % 480 + 1 AS INTEGER) AS height
    FROM documents
    """,
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: documents→(media_id, payload bytes, metadata)
    → mapInPandas feature extraction. The decode stub derives dimensions
    deterministically from payload length, which is what the oracle
    replicates — so the whole Arrow/mapInPandas path is hash-checked."""
    docs = TableRegistry(spark, sf_dir).documents
    return M.extract_features(M.documents_as_media(docs))


@query(
    "media_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(range(0, CAST(strlen(text) % 300 + 1 AS INTEGER), 10)) AS INTEGER)
             AS frame_idx
    FROM documents
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame index (every 10th),
    frame count stubbed deterministically from payload size."""
    docs = TableRegistry(spark, sf_dir).documents
    return M.frame_sample_plan(M.documents_as_media(docs), every_n=10)
