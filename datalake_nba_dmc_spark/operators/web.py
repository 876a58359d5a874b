"""Web-crawl curation operators: URL canonicalization, canonical-URL exact
dedup, and per-domain quotas (CCNet / RefinedWeb-style, Wenzek et al. 2020,
Penedo et al. 2023 — public). The one large-scale curation family the
engine did not yet cover first-class (VERDICT r5 stretch #8).

Everything here is pure Catalyst expressions — lower/regexp/array ops that
stay inside whole-stage codegen. The only shuffles are the ones the
semantics require: one hash-groupBy for the dedup, and a bounded two-phase
window for the quota (salted local top-N first, so one hot domain — the
classic crawl pathology, e.g. half the batch from one link farm — never
funnels through a single reducer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Tracking query parameters dropped during canonicalization (the public
#: CCNet/RefinedWeb lists all strip at least these).
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)="

#: Second-level labels under which a 2-char ccTLD hosts registrable
#: domains one label deeper (tiny public-suffix heuristic: "bbc.co.uk" →
#: registrable "bbc.co.uk", not "co.uk").
_SECOND_LEVEL = ("co", "com", "net", "org", "gov", "ac", "edu")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL, as Catalyst expressions only:

    - drop the fragment (``#...``)
    - lowercase scheme and host
    - strip a leading ``www.`` label
    - strip the scheme's default port (``:443`` for https, ``:80`` for http)
    - strip trailing ``/`` from the path
    - drop tracking query params (:data:`TRACKING_PARAM_RE`), sort the
      surviving params byte-wise so param order never splits a dup group

    Map-only: canonicalization adds zero shuffles regardless of scale.
    """
    nofrag = F.regexp_replace(url, r"#.*", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    host = F.lower(F.regexp_extract(nofrag, r"^[^:]+://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, r":443$", ""),
    ).when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, r":80$", ""),
    ).otherwise(host)
    path = F.regexp_replace(
        F.regexp_extract(nofrag, r"^[^:]+://[^/?#]*([^?#]*)", 1), r"/+$", ""
    )
    params = F.array_join(
        F.sort_array(
            F.filter(
                F.split(F.regexp_extract(nofrag, r"\?([^#]*)", 1), "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(F.lit("")),
    )


def registrable_domain(host: Column) -> Column:
    """Registrable domain of a (lowercase, port-free) hostname: the last
    two labels, or the last three when the 2nd-level label is a known
    public-suffix second level under a 2-char ccTLD (``bbc.co.uk``)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    deeper = (
        (n >= 3)
        & F.element_at(labels, -2).isin(*_SECOND_LEVEL)
        & (F.length(F.element_at(labels, -1)) == 2)
    )
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    return F.when(n <= 1, host).when(deeper, last3).otherwise(last2)


def url_exact_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on the canonical URL: one row per canonical URL with the
    surviving id (min — first-crawled under monotonic ids) and the group
    size. ONE balanced hash-shuffle on the canonical-URL key — the same
    scale shape as content dedup_exact (dedup.py), keyed by URL instead
    of text hash."""
    return (
        df.withColumn("canonical_url", canonicalize_url(F.col(url_col)))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
    )


def domain_topn_quota(
    df: DataFrame,
    n_per_domain: int,
    domain_col: str = "domain",
    order_cols: list[Column] | None = None,
    id_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep at most ``n_per_domain`` documents per registrable domain,
    best-first (CCNet/RefinedWeb per-domain quota — the guard against one
    link farm dominating a training batch).

    EXACT two-phase top-N so a hot domain never funnels through a single
    reducer: phase 1 ranks within (domain, salt) — ``salt_buckets``-way
    fan-out of the hot key — and keeps ``n`` per salt; any global top-n
    row is necessarily in its salt bucket's top-n, so phase 2's re-rank
    over the ≤ ``salt_buckets·n`` survivors per domain is exact. Phase-2
    input is bounded per domain BY CONSTRUCTION, independent of how many
    billions of pages the hottest domain has.

    ``order_cols`` defaults to ``id_col`` ascending; callers pass e.g.
    ``[F.col("quality").desc(), F.col("doc_id")]``. The final ordering
    must be total per domain (include a unique tiebreaker) for the result
    to be deterministic."""
    order = order_cols or [F.col(id_col).asc()]
    salt = F.pmod(F.hash(F.col(id_col)), F.lit(salt_buckets))
    local_w = Window.partitionBy(F.col(domain_col), salt).orderBy(*order)
    survivors = (
        df.withColumn("_lrn", F.row_number().over(local_w))
        .filter(F.col("_lrn") <= n_per_domain)
        .drop("_lrn")
    )
    final_w = Window.partitionBy(domain_col).orderBy(*order)
    return (
        survivors.withColumn("quota_rank", F.row_number().over(final_w))
        .filter(F.col("quota_rank") <= n_per_domain)
    )
