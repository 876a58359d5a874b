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

    A string with no ``scheme://`` prefix canonicalizes to NULL, NOT to a
    shared junk value: every component regexp extracts ``''`` on a
    malformed URL, so without the guard ALL malformed URLs in a dirty
    crawl would collapse into one canonical group and be deduped away —
    silent data loss (:func:`url_exact_dedup` keys such rows by their raw
    string instead).

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
    return F.when(
        url.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"),
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(params != "", F.concat(F.lit("?"), params)).otherwise(
                F.lit("")
            ),
        ),
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
    # outer guard: a NULL host must give a NULL domain — without it the
    # otherwise-branch's concat_ws maps NULL labels to '' and every
    # hostless row lands in one shared ''-domain quota group
    # (robustness_audit `nulls` finding)
    return F.when(
        host.isNotNull(), F.when(n <= 1, host).when(deeper, last3).otherwise(last2)
    )


def url_exact_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on the canonical URL: one row per canonical URL with the
    surviving id (min — first-crawled under monotonic ids) and the group
    size. ONE balanced hash-shuffle on the canonical-URL key — the same
    scale shape as content dedup_exact (dedup.py), keyed by URL instead
    of text hash.

    Malformed URLs (NULL canonical) fall back to their RAW string as the
    group key, so distinct junk rows stay distinct singletons instead of
    collapsing into one NULL group and being deduped away. Rows with a
    NULL raw url get a per-row synthetic key (``__nourl__:<id>``) for the
    same reason: groupBy treats NULLs as equal, so without it every
    missing-URL doc would silently collapse into ONE keeper — exactly the
    data-loss mode the raw-string fallback exists to prevent."""
    return (
        df.withColumn(
            "canonical_url",
            F.coalesce(
                canonicalize_url(F.col(url_col)),
                F.col(url_col),
                F.concat(F.lit("__nourl__:"), F.col(id_col).cast("string")),
            ),
        )
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
) -> DataFrame:
    """Keep at most ``n_per_domain`` documents per registrable domain,
    best-first (CCNet/RefinedWeb per-domain quota — the guard against one
    link farm dominating a training batch).

    Deliberately ONE ranking window, not a hand-salted two-phase: Spark's
    rank-limit pushdown (``WindowGroupLimit``, SPARK-37099, on by
    default) splits this into a PARTIAL limit before the exchange and a
    FINAL limit after it, so a hot domain contributes at most ``n`` rows
    per upstream partition to the shuffle — the single-reducer link-farm
    funnel is already bounded by Catalyst, and a manual salted phase
    would only add a second exchange + sort for the same guarantee
    (verified: the manual two-phase plan carried 2 Exchanges vs this
    plan's 1, both with Partial/Final WindowGroupLimit). The pushdown's
    presence is plan-asserted in test_plan_shape.

    ``order_cols`` defaults to ``id_col`` ascending; callers pass e.g.
    ``[F.col("quality").desc(), F.col("doc_id")]``. The ordering must be
    total per domain (include a unique tiebreaker) for the result to be
    deterministic."""
    order = order_cols or [F.col(id_col).asc()]
    w = Window.partitionBy(domain_col).orderBy(*order)
    return (
        df.withColumn("quota_rank", F.row_number().over(w))
        .filter(F.col("quota_rank") <= n_per_domain)
    )
