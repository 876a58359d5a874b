"""Structured Streaming operators (beyond-reference; the reference is
batch-only — SURVEY.md §2.10 — but an analytics engine at 100 TB needs the
streaming surface for continuous ingest)."""

from datalake_nba_dmc_spark.streaming.curation import (  # noqa: F401
    curated_ingest,
    read_documents_stream,
)
from datalake_nba_dmc_spark.streaming.events import (  # noqa: F401
    EVENTS_SCHEMA,
    enrich_with_dimension,
    followup_join,
    read_events_stream,
    session_agg,
    stream_dedup,
    transition_steps,
    tumbling_agg,
    user_running_state,
)
