"""Web-crawl curation queries: canonical-URL dedup + per-domain quotas
(CCNet / RefinedWeb family — VERDICT r5 stretch #8).

The documents table carries no URL column, so both twins derive the SAME
deterministic URL per document (from doc_id/source/lang arithmetic) with
deliberate non-canonical variation — upper/lower case, ``www.``, the
https default port, tracking params, param order, trailing slash,
fragments — and the assertion is that the two INDEPENDENT
canonicalization implementations (Catalyst expressions vs DuckDB
regexp/list SQL) collapse the variations to identical dup groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators import web as W
from datalake_nba_dmc_spark.sources import TableRegistry
from datalake_nba_dmc_spark.suite import query

#: Shared derivation of a messy URL per document; the Spark twin mirrors
#: this expression exactly (see _messy_url below).
_URL_SQL = """
    'https://'
    || CASE WHEN doc_id % 7 = 0 THEN 'WWW.' ELSE '' END
    || CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END
    || '.Example.COM'
    || CASE WHEN doc_id % 3 = 1 THEN ':443' ELSE '' END
    || '/' || lang || '/p/' || CAST(doc_id % 10 AS VARCHAR)
    || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN '?b=2&a=1&utm_source=x'
            ELSE '?utm_campaign=y&a=1&b=2' END
    || CASE WHEN doc_id % 11 = 0 THEN '#frag' ELSE '' END
"""


def _messy_url() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.lit("https://"),
        F.when(d % 7 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.when(d % 3 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".Example.COM"),
        F.when(d % 3 == 1, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/"),
        F.col("lang"),
        F.lit("/p/"),
        (d % 10).cast("string"),
        F.when(d % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("?b=2&a=1&utm_source=x")).otherwise(
            F.lit("?utm_campaign=y&a=1&b=2")
        ),
        F.when(d % 11 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


def duck_canonicalize_ctes(source: str) -> str:
    """DuckDB CTE chain ``parts → fields → canon`` canonicalizing the
    ``url`` column of ``source`` (a relation exposing doc_id, url) into
    ``canon(doc_id, canonical_url)``. Kept as a reusable fragment so the
    cross-engine differential property test (test_web) can aim the SAME
    independent SQL implementation at arbitrary generated URLs, not just
    this oracle's derived ones. Scheme-less strings canonicalize to NULL
    (mirrors operators/web.canonicalize_url's malformed-input guard)."""
    return f"""parts AS (
      SELECT doc_id, url, regexp_replace(url, '#.*', '') AS nofrag
      FROM {source}
    ), fields AS (
      SELECT doc_id, url,
             lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))
               AS scheme,
             regexp_replace(
               lower(regexp_extract(nofrag, '^[^:]+://([^/?#]*)', 1)),
               '^www\\.', '') AS host0,
             regexp_replace(
               regexp_extract(nofrag, '^[^:]+://[^/?#]*([^?#]*)', 1),
               '/+$', '') AS path,
             array_to_string(list_sort(list_filter(
               string_split(regexp_extract(nofrag, '\\?([^#]*)', 1), '&'),
               x -> x <> '' AND NOT regexp_matches(x,
                 '^(utm_[^=]*|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)='))),
               '&') AS params
      FROM parts
    ), canon AS (
      SELECT doc_id, url,
             CASE WHEN NOT regexp_matches(url,
                    '^[A-Za-z][A-Za-z0-9+.\\-]*://') THEN NULL
             ELSE scheme || '://'
             || CASE WHEN scheme = 'https' AND host0 LIKE '%:443'
                       THEN regexp_replace(host0, ':443$', '')
                     WHEN scheme = 'http' AND host0 LIKE '%:80'
                       THEN regexp_replace(host0, ':80$', '')
                     ELSE host0 END
             || path
             || CASE WHEN params <> '' THEN '?' || params ELSE '' END
             END AS canonical_url
      FROM fields
    )"""


@query(
    "dedup_url_canonical",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {_URL_SQL} AS url FROM documents
    ), {duck_canonicalize_ctes("u")}
    SELECT COALESCE(canonical_url, url,
                    '__nourl__:' || CAST(doc_id AS VARCHAR)) AS canonical_url,
           MIN(doc_id) AS keeper_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM canon GROUP BY 1
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL exact dedup (CCNet/RefinedWeb first stage): derive a
    messy per-document URL, canonicalize with pure Catalyst expressions
    (operators/web.canonicalize_url — map-only), keep min doc_id per
    canonical URL via ONE hash-groupBy shuffle. The DuckDB twin
    re-implements canonicalization independently with regexp/list SQL."""
    docs = TableRegistry(spark, sf_dir).documents
    urls = docs.select("doc_id", _messy_url().alias("url"))
    return W.url_exact_dedup(urls, url_col="url", id_col="doc_id").select(
        "canonical_url", "keeper_id", "n_dups"
    )


#: Host derivation for the quota query: a couple dozen registrable
#: domains, some under the co.uk public-suffix branch, some with a
#: subdomain the registrable-domain extraction must strip.
_HOST_SQL = """
    CASE WHEN doc_id % 5 = 0 THEN 'news.' ELSE '' END
    || source || CAST(doc_id % 3 AS VARCHAR)
    || CASE WHEN doc_id % 2 = 0 THEN '.com' ELSE '.co.uk' END
"""


def _messy_host() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.when(d % 5 == 0, F.lit("news.")).otherwise(F.lit("")),
        F.col("source"),
        (d % 3).cast("string"),
        F.when(d % 2 == 0, F.lit(".com")).otherwise(F.lit(".co.uk")),
    )


#: Independent DuckDB implementation of registrable-domain extraction
#: (mirrors operators/web.registrable_domain); a reusable fragment so the
#: cross-engine grid test in test_web can aim it at arbitrary hosts.
#: Expects a relation exposing a ``host`` column and label list ``labels``.
DUCK_REGISTRABLE_DOMAIN = """
             CASE WHEN len(labels) <= 1 THEN host
                  WHEN len(labels) >= 3
                       AND labels[-2] IN
                         ('co','com','net','org','gov','ac','edu')
                       AND length(labels[-1]) = 2
                    THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
                  ELSE labels[-2] || '.' || labels[-1] END
"""


@query(
    "text_domain_quota",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, n_chars, {_HOST_SQL} AS host FROM documents
    ), lab AS (
      SELECT doc_id, n_chars, host, string_split(host, '.') AS labels FROM h
    ), dom AS (
      SELECT doc_id, n_chars, {DUCK_REGISTRABLE_DOMAIN} AS domain
      FROM lab
    ), r AS (
      SELECT domain, doc_id,
             CAST(row_number() OVER (
               PARTITION BY domain
               ORDER BY n_chars DESC, doc_id ASC) AS INTEGER) AS quota_rank
      FROM dom
    )
    SELECT domain, doc_id, quota_rank FROM r WHERE quota_rank <= 8
    """,
)
def text_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota (CCNet/RefinedWeb anti-link-farm guard): derive a
    host per document, extract the registrable domain (public-suffix
    heuristic incl. co.uk + subdomain stripping), keep the best 8 docs
    per domain by (n_chars DESC, doc_id). One ranking window whose limit
    Catalyst pushes below the exchange (WindowGroupLimit Partial — the
    hot-domain bound; see operators/web.domain_topn_quota)."""
    docs = TableRegistry(spark, sf_dir).documents
    with_domain = docs.select(
        "doc_id",
        "n_chars",
        W.registrable_domain(_messy_host()).alias("domain"),
    )
    return W.domain_topn_quota(
        with_domain,
        n_per_domain=8,
        domain_col="domain",
        order_cols=[F.col("n_chars").desc(), F.col("doc_id").asc()],
        id_col="doc_id",
    ).select("domain", "doc_id", "quota_rank")
