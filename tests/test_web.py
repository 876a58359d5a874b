"""Web-curation operators: URL canonicalization table-driven cases +
malformed-input guard, registrable-domain extraction, and the per-domain
quota's exactness + rank-limit-pushdown plan shape on a hot domain."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators import web as W


def test_canonicalize_url_cases(spark):
    cases = [
        # case-folding of scheme+host, not path
        ("HTTPS://Example.COM/A/B", "https://example.com/A/B"),
        # www strip + default https port + trailing slash
        ("https://www.Example.com:443/x/", "https://example.com/x"),
        # http default port kept distinct from https
        ("http://example.com:80/x", "http://example.com/x"),
        # NON-default port survives
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        # tracking params dropped, rest sorted, fragment dropped
        (
            "https://example.com/p?utm_source=x&b=2&a=1&gclid=9#frag",
            "https://example.com/p?a=1&b=2",
        ),
        # all params tracking -> no '?' at all
        ("https://example.com/p?utm_campaign=y&fbclid=1", "https://example.com/p"),
        # bare root: path '/' strips to empty
        ("https://example.com/", "https://example.com"),
        # ref is tracking; href is NOT (prefix must anchor whole param name)
        ("https://example.com/p?ref=a&href=b", "https://example.com/p?href=b"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "i long, url string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", W.canonicalize_url(F.col("url")).alias("c")).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_registrable_domain_cases(spark):
    cases = [
        ("example.com", "example.com"),
        ("a.b.example.com", "example.com"),
        ("bbc.co.uk", "bbc.co.uk"),
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("ac.uk", "ac.uk"),  # 2 labels: never go deeper than the host
        ("localhost", "localhost"),
        # 'co' second-level only under 2-char ccTLDs: x.co.com -> co.com
        ("x.co.com", "co.com"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, host string"
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", W.registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    for i, (h, want) in enumerate(cases):
        assert got[i] == want, f"{h!r}: {got[i]!r} != {want!r}"


def test_domain_quota_exact_on_hot_domain_with_limit_pushdown(spark):
    """One domain holds 90% of rows (the link-farm pathology). The quota
    must keep exactly the true top-5 per domain, and the plan must carry
    Spark's rank-limit pushdown (WindowGroupLimit Partial BEFORE the
    exchange) — the property that bounds a hot domain's contribution to
    the shuffle at 100 TB."""
    rows = [(i, "farm.com", float((i * 37) % 101)) for i in range(900)]
    rows += [(1000 + i, f"site{i % 7}.org", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, quality double")
    order = [F.col("quality").desc(), F.col("doc_id").asc()]

    quota = W.domain_topn_quota(df, n_per_domain=5, order_cols=order)
    plan = quota._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan

    got = {
        (r["domain"], r["doc_id"]): r["quota_rank"] for r in quota.collect()
    }
    w = Window.partitionBy("domain").orderBy(*order)
    want = {
        (r["domain"], r["doc_id"]): r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .collect()
    }
    assert got == want
    assert sum(1 for (d, _) in got if d == "farm.com") == 5


def test_url_exact_dedup_groups(spark):
    urls = [
        (1, "https://www.Site.com/a?utm_source=x"),
        (2, "https://site.com:443/a/"),
        (3, "https://site.com/a"),
        (4, "https://site.com/b"),
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    got = {
        r["canonical_url"]: (r["keeper_id"], r["n_dups"])
        for r in W.url_exact_dedup(df).collect()
    }
    assert got == {
        "https://site.com/a": (1, 3),
        "https://site.com/b": (4, 1),
    }


def test_malformed_urls_do_not_collapse_into_one_group(spark):
    """Latent-defect guard (found by probing the first cut): every
    component regexp extracts '' on a scheme-less string, so without the
    NULL guard ALL malformed URLs canonicalized to the same junk value
    ('://') — one dup group, all but one row silently dropped. Malformed
    rows must stay DISTINCT singletons keyed by their raw string, and
    canonicalize_url must return NULL for them."""
    rows = [
        (1, "example.com/a"),          # no scheme
        (2, "not a url at all"),
        (3, "ftp-data"),
        (4, "https://ok.com/x"),
        (5, "https://ok.com/x/"),      # dup of 4 after canonicalization
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")

    canon = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", W.canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    assert canon[1] is None and canon[2] is None and canon[3] is None
    assert canon[4] == canon[5] == "https://ok.com/x"

    got = {
        r["canonical_url"]: (r["keeper_id"], r["n_dups"])
        for r in W.url_exact_dedup(df).collect()
    }
    assert got == {
        "example.com/a": (1, 1),
        "not a url at all": (2, 1),
        "ftp-data": (3, 1),
        "https://ok.com/x": (4, 2),
    }


def test_canonicalizer_twins_agree_on_generated_urls(spark):
    """Cross-engine differential: the Catalyst canonicalizer and the
    INDEPENDENT DuckDB regexp/list-SQL implementation (the suite oracle's
    own CTE chain) must agree on arbitrary messy URLs — not just the
    derived set the driver compares. Exhaustive grid over the variation
    axes (scheme case, www, port, path, trailing slash, param subsets ×
    order, fragment) plus malformed strings."""
    import itertools

    import duckdb

    from datalake_nba_dmc_spark.suite.web import duck_canonicalize_ctes

    urls = []
    params_opts = [
        [], ["a=1"], ["utm_source=x"], ["b=2", "a=1"],
        ["a=1", "ref=z", "b=2"], ["gclid=9", "utm_campaign=c"],
        ["href=q", "ref=z"],
    ]
    for scheme, www, host, port, path, slash, params, frag in itertools.product(
        ["https", "HTTP"],
        ["", "WWW."],
        ["Example.com", "a.B.co.uk"],
        ["", ":443", ":80", ":8443"],
        ["", "p/One"],
        ["", "/"],
        params_opts,
        ["", "#frag"],
    ):
        u = (
            scheme + "://" + www + host + port + "/" + path + slash
            + ("?" + "&".join(params) if params else "") + frag
        )
        urls.append(u)
    urls += ["example.com/a", "no scheme here", "://", "https:/half", ""]

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    got_spark = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", W.canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }

    con = duckdb.connect()
    con.register("urls_t", df.toPandas())
    got_duck = {
        int(r[0]): r[1]
        for r in con.execute(
            f"WITH {duck_canonicalize_ctes('urls_t')} "
            "SELECT doc_id, canonical_url FROM canon"
        ).fetchall()
    }
    assert len(got_spark) == len(got_duck) == len(urls)
    diffs = {
        i: (got_spark[i], got_duck[i], urls[i])
        for i in got_spark
        if got_spark[i] != got_duck[i]
    }
    assert not diffs, f"{len(diffs)} disagreements, e.g. {list(diffs.items())[:5]}"


def test_registrable_domain_twins_agree_on_generated_hosts(spark):
    """Cross-engine differential for registrable-domain extraction: the
    Catalyst expression and the oracle's independent DuckDB CASE must
    agree over a grid of label shapes (1-4 labels, public-suffix second
    levels, 2/3-char TLDs, deep subdomains)."""
    import itertools

    import duckdb

    from datalake_nba_dmc_spark.suite.web import DUCK_REGISTRABLE_DOMAIN

    hosts = ["localhost", "x", "ab.cd"]
    for sub, name, second, tld in itertools.product(
        ["", "www.", "a.b."],
        ["example", "x1"],
        ["", "co.", "com.", "ac.", "zz."],
        ["uk", "com", "org", "io"],
    ):
        hosts.append(f"{sub}{name}.{second}{tld}")
    hosts = sorted(set(hosts))

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "i long, host string"
    )
    got_spark = {
        r["i"]: r["d"]
        for r in df.select(
            "i", W.registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    con = duckdb.connect()
    con.register("hosts_t", df.toPandas())
    got_duck = {
        int(r[0]): r[1]
        for r in con.execute(
            "WITH lab AS (SELECT i, host, string_split(host, '.') AS labels"
            f" FROM hosts_t) SELECT i, {DUCK_REGISTRABLE_DOMAIN} AS d FROM lab"
        ).fetchall()
    }
    diffs = {
        i: (hosts[i], got_spark[i], got_duck[i])
        for i in got_spark
        if got_spark[i] != got_duck[i]
    }
    assert not diffs, f"{len(diffs)} disagreements: {list(diffs.items())[:5]}"
