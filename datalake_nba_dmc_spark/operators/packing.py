"""Training-sequence packing — distributed global prefix sums without a
single-partition window.

LLM pre-training concatenates the tokenized corpus in a deterministic
document order and cuts it into fixed-length training sequences; a
document can straddle a boundary and contribute pieces to two (or, when
longer than the sequence length, many) sequences. The sequential
formulation is a running offset — the textbook "needs one global cumsum"
shape that, written naively as ``Window.orderBy(id)`` with no partition,
collapses 100 TB onto ONE task (Spark even warns). This module computes
the exact same assignment with the classic two-phase parallel prefix sum:

1. per-document token counts, bucketed by an ORDER-PRESERVING integer
   range split of the id domain (``(id · B) // (max_id + 1)`` — monotone,
   so bucket order == id order);
2. one tiny per-bucket aggregate (≤ B rows) whose running total — the
   only unpartitioned window, over B rows, not the corpus — yields each
   bucket's global starting offset;
3. a PARALLEL within-bucket running sum (window partitioned by bucket)
   plus the broadcast bucket offsets gives every document's exact global
   [start, end) token span;
4. each document explodes into the ``start//L .. (end-1)//L`` sequences
   it overlaps — at most tokens/L + 1 rows per doc, linear overall.

Driver query ``corpus_pack_sequences`` (registered r10); the DuckDB
twin is a running-sum window plus ``unnest(range(...))`` (sequential
semantics, independently formulated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.text import token_count
from datalake_nba_dmc_spark.operators.util import ensure_parallelism


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 256,
) -> DataFrame:
    """Assign every document's whitespace-token span to fixed-length
    training sequences, in ascending ``id_col`` order. Returns one row
    per (document, sequence) PIECE:

    - ``seq_id``      — the training sequence (0-based);
    - ``doc_offset``  — first token of the piece within the document;
    - ``seq_offset``  — its position within the sequence;
    - ``piece_len``   — tokens contributed (> 0);
    - ``n_tokens``    — the document's total tokens (carried for yield
      accounting).

    Invariants (pytest-pinned): concatenating pieces in (seq_id,
    seq_offset) order replays the corpus in id order exactly; every
    sequence except the last holds exactly ``seq_len`` tokens; a
    document's pieces partition [0, n_tokens). Zero-token and NULL
    documents contribute nothing (and consume no offset).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        # a non-integral id would produce NULL buckets that the inner
        # joins silently drop — reject at plan time instead
        raise TypeError(
            f"pack_sequences requires an integral id column; "
            f"{id_col} is {id_type.simpleString()}"
        )
    counts = (
        ensure_parallelism(df.select(id_col, text_col))
        .select(id_col, F.coalesce(token_count(text_col), F.lit(0)).alias("_n"))
        .filter(F.col("_n") > 0)
    )
    # Order-preserving bucket split of the id domain (monotone in id).
    # Min-shifted DOUBLE arithmetic: the earlier integer form
    # (id·B)//(max+1) wrapped int64 for large ids (e.g. xxhash64-derived
    # doc ids) — scrambling bucket order without error — and flipped
    # monotonicity when every id was negative. Double conversion,
    # same-constant subtraction, division, and floor are each monotone
    # non-decreasing, so bucket order == id order for ANY long ids; ties
    # from >2^53 precision loss merely merge adjacent buckets, which the
    # algorithm tolerates (any monotone id→bucket map is correct).
    rng = counts.agg(
        F.min(id_col).cast("double").alias("_mn"),
        (F.max(id_col).cast("double") - F.min(id_col).cast("double") + 1).alias(
            "_span"
        ),
    )
    bucketed = counts.crossJoin(F.broadcast(rng)).withColumn(
        "_b",
        (
            (F.col(id_col).cast("double") - F.col("_mn"))
            / F.col("_span")
            * num_buckets
        ).cast("long"),
    )
    # tiny per-bucket totals; the ONLY unpartitioned window runs over
    # <= num_buckets rows (the corpus never single-partitions)
    w_b = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    bucket_offsets = (
        bucketed.groupBy("_b")
        .agg(F.sum("_n").alias("_bn"))
        .withColumn("_boff", F.coalesce(F.sum("_bn").over(w_b), F.lit(0)))
        .select("_b", "_boff")
    )
    # explicit ROWS frame: the default RANGE frame treats ORDER BY ties as
    # peers and hands BOTH rows the same running total — with a duplicated
    # id (the dup-audit shape) that double-assigns one span and covers
    # nothing with the other. ROWS packs each physical row its own span;
    # tied rows are identical, so the output MULTISET stays deterministic
    # and equals the sequential replay of the duplicated corpus.
    w_in = (
        Window.partitionBy("_b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        bucketed.join(F.broadcast(bucket_offsets), "_b")
        .withColumn("_end", F.col("_boff") + F.sum("_n").over(w_in))
        .withColumn("_start", F.col("_end") - F.col("_n"))
    )
    seq = F.col("_seq")
    seq_start = seq * seq_len
    piece_start = F.greatest(F.col("_start"), seq_start)
    piece_end = F.least(F.col("_end"), seq_start + seq_len)
    return (
        spans.withColumn(
            "_seq",
            F.explode(
                F.sequence(
                    (F.col("_start") / seq_len).cast("long"),
                    ((F.col("_end") - 1) / seq_len).cast("long"),
                )
            ),
        )
        .select(
            id_col,
            seq.alias("seq_id"),
            (piece_start - F.col("_start")).alias("doc_offset"),
            (piece_start - seq_start).alias("seq_offset"),
            (piece_end - piece_start).alias("piece_len"),
            F.col("_n").alias("n_tokens"),
        )
    )
