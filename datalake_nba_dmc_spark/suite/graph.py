"""Link-graph centrality queries (crawl-curation ranking signals).

Both queries run over a deterministic synthetic link graph derived from
the documents table (src = doc_id mod 101, dst = doc_id div 101 mod 101,
self-loops dropped) — the same derivation on both engines, so the twins
replay the exact integer recurrences bit-for-bit (operators/graph.py's
micro-rank contract: every op is an integer add or a floor division).

The DuckDB twins are the SEQUENTIAL formulations — k unrolled chained
CTEs for PageRank, k unrolled BFS rounds with an ANTI JOIN for harmonic
centrality — independently structured from the Spark loop (which is
join+agg supersteps with checkpointed lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.graph import (
    SCALE,
    harmonic_centrality_micro,
    pagerank_micro,
)
from datalake_nba_dmc_spark.sources import TableRegistry
from datalake_nba_dmc_spark.suite import query

_PR_ITERS = 5
_HC_HOPS = 4

#: Derived edge list, shared by both queries. Parallel edges are KEPT for
#: PageRank (a page linking twice passes twice the share — and under the
#: dup audit both engines double multiplicity identically); harmonic's
#: operator dedupes internally and its twin mirrors with DISTINCT.
_EDGES_SQL = (
    "SELECT doc_id % 101 AS src, (doc_id // 101) % 101 AS dst "
    "FROM documents WHERE doc_id % 101 != (doc_id // 101) % 101"
)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = TableRegistry(spark, sf_dir).documents
    # `div`, not `/`+cast: double division truncates-toward-zero after
    # rounding, which diverges from the twin's exact integer `//` for
    # negative ids and for ids >= ~2^46 (r10 ADVICE finding)
    return docs.select(
        (F.col("doc_id") % 101).alias("src"),
        (F.expr("doc_id div 101") % 101).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))


def _pagerank_oracle(n_iters: int, dp: int, scale: int) -> str:
    """Unrolled-CTE PageRank twin: iteration k is a plain CTE over k-1 —
    the sequential formulation of the documented integer recurrence."""
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))",
        "deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)",
        "n AS (SELECT COUNT(*) AS c FROM nodes)",
        f"r0 AS (SELECT node, (SELECT {scale} // c FROM n) AS rank_micro "
        "FROM nodes)",
    ]
    for k in range(1, n_iters + 1):
        ctes.append(
            f"r{k} AS (SELECT nodes.node, "
            f"(SELECT ({100 - dp} * {scale}) // (100 * c) FROM n) "
            "+ COALESCE(inflow.s, 0) AS rank_micro "
            "FROM nodes LEFT JOIN ("
            # CAST: DuckDB widens SUM(BIGINT) to HUGEINT, which would
            # propagate through every later CTE and the driver's pandas
            # conversion — pin it back to BIGINT at each aggregation
            f"SELECT e.dst AS node, "
            f"CAST(SUM((r.rank_micro * {dp} // 100) // deg.d) AS BIGINT) AS s "
            f"FROM edges e JOIN r{k - 1} r ON e.src = r.node "
            "JOIN deg ON deg.src = e.src GROUP BY e.dst"
            ") inflow ON nodes.node = inflow.node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, CAST(rank_micro AS BIGINT) AS rank_micro "
        f"FROM r{n_iters}"
    )


def _harmonic_oracle(k: int, scale: int) -> str:
    """Unrolled-BFS harmonic-centrality twin: round r discovers pairs via
    an ANTI JOIN against everything known — first discovery = min hops."""
    ctes = [
        f"edges AS (SELECT DISTINCT src AS s, dst AS d FROM ({_EDGES_SQL}))",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT s AS node FROM edges UNION ALL SELECT d FROM edges))",
        "k1 AS (SELECT s, d, 1 AS h FROM edges)",
        "a1 AS (SELECT * FROM k1)",
    ]
    for r in range(2, k + 1):
        ctes.append(
            f"c{r} AS (SELECT DISTINCT f.s, e.d FROM k{r - 1} f "
            "JOIN edges e ON f.d = e.s WHERE f.s != e.d)"
        )
        ctes.append(
            f"k{r} AS (SELECT c{r}.s, c{r}.d, {r} AS h FROM c{r} "
            f"ANTI JOIN a{r - 1} USING (s, d))"
        )
        ctes.append(
            f"a{r} AS (SELECT * FROM a{r - 1} UNION ALL SELECT * FROM k{r})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
    SELECT n.node,
           CAST(COALESCE(SUM({scale} // a.h), 0) AS BIGINT) AS harmonic_micro
    FROM nodes n LEFT JOIN a{k} a ON n.node = a.d
    GROUP BY n.node"""
    )


@query("graph_pagerank_micro", oracle=_pagerank_oracle(_PR_ITERS, 85, SCALE))
def graph_pagerank_micro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration integer PageRank (operators/graph.pagerank_micro):
    each iteration is one edge⋈rank equi-join plus one groupBy(dst) sum —
    the Pregel superstep shuffle pair — with localCheckpoint truncating
    lineage every 3 rounds (each eager checkpoint is an action; the
    cadence amortizes it, bit-identical at any cadence). The integer
    micro-rank contract (SQL `div`, never `/`) makes the k-unrolled-CTE
    DuckDB twin reproduce every rank BIT-EXACTLY."""
    return pagerank_micro(_edges(spark, sf_dir), n_iters=_PR_ITERS)


@query("graph_harmonic_centrality", oracle=_harmonic_oracle(_HC_HOPS, SCALE))
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bounded-radius harmonic centrality
    (operators/graph.harmonic_centrality_micro): k rounds of distributed
    BFS — frontier⋈edges extension, anti-join against the known-pair
    table, first discovery = minimum distance (no min() re-agg) — then
    one Σ SCALE div dist aggregate per target node. The 100 TB variant
    swaps the pair table for HyperBall HLL ball sketches; the loop shape
    is identical."""
    return harmonic_centrality_micro(_edges(spark, sf_dir), max_hops=_HC_HOPS)
