"""Hypothesis property tests for the trickiest cross-engine semantics
(SURVEY.md §5.2): safe-downcast boundaries, scaled-long sum exactness,
date-parse round-trips, left-join null propagation, shingle/minhash laws."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datalake_nba_dmc_spark.operators.conform import (
    INT32_MAX,
    INT32_MIN,
    safe_downcast_longs,
)

SLOW = settings(
    # 12 → 8 examples (r16): ~15 @SLOW tests cost 10-15 s each and the
    # driver's pytest run must fit its timeout; 8 keeps multi-case
    # coverage (hypothesis shrinks failures regardless of example count)
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: For properties whose EXAMPLES are expensive (≥6 Spark actions each —
#: per-segment global/by cross-checks): 12 examples cost 79 s of the
#: suite's pytest budget (r16; the driver's run must finish inside its
#: timeout — VERDICT r15), 5 keep the multi-segment/multi-sign coverage.
VERY_SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(
    vals=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=8
    )
)
def test_safe_downcast_iff_all_values_fit(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    out_type = dict(safe_downcast_longs(df).dtypes)["x"]
    fits = all(INT32_MIN <= v <= INT32_MAX for v in vals)
    assert out_type == ("int" if fits else "bigint")
    # values survive the cast unchanged either way
    assert sorted(r["x"] for r in safe_downcast_longs(df).collect()) == sorted(vals)


@SLOW
@given(
    cents=st.lists(
        st.integers(min_value=-(10**10), max_value=10**10), min_size=1, max_size=30
    )
)
def test_scaled_long_sum_exact_regardless_of_partitioning(spark, cents):
    """The suite's exact-sum trick: money doubles (x/100) summed via
    round(x*10^4)::long must equal the integer ground truth under any
    partitioning."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(c / 100.0,) for c in cents], "x double"
    ).repartition(4)
    got = df.agg(
        (F.sum(F.round(F.col("x") * 10000).cast("long")) / 10000.0).alias("s")
    ).first()["s"]
    assert got == pytest.approx(sum(cents) / 100.0, abs=1e-9)


@SLOW
@given(
    d=st.dates(
        min_value=datetime.date(1900, 1, 1), max_value=datetime.date(2100, 12, 31)
    )
)
def test_date_parse_roundtrip(spark, d):
    """X1/X2 — 'MMM dd, yyyy' parse and 'yyyy-MM-dd' format round-trip."""
    from pyspark.sql import functions as F

    s = d.strftime("%b %d, %Y")
    row = (
        spark.createDataFrame([(s,)], ["raw"])
        .select(
            F.to_date("raw", "MMM dd, yyyy").alias("parsed"),
            F.date_format(F.to_date("raw", "MMM dd, yyyy"), "yyyy-MM-dd").alias("fmt"),
        )
        .first()
    )
    assert row["parsed"] == d
    assert row["fmt"] == d.isoformat()


@SLOW
@given(
    left_keys=st.lists(st.integers(0, 6), min_size=1, max_size=10),
    right_keys=st.sets(st.integers(0, 6), max_size=5),
)
def test_left_join_preserves_left_rows_and_nulls_unmatched(spark, left_keys, right_keys):
    from datalake_nba_dmc_spark.operators.joins import left_join

    left = spark.createDataFrame([(k, i) for i, k in enumerate(left_keys)], ["k", "i"])
    right = spark.createDataFrame(
        [(k, f"v{k}") for k in right_keys], "k long, v string"
    )
    out = left_join(left, right, on="k").collect()
    assert len(out) == len(left_keys)  # unique right keys → no fan-out
    for r in out:
        if r["k"] in right_keys:
            assert r["v"] == f"v{r['k']}"
        else:
            assert r["v"] is None


@SLOW
@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=4), min_size=1, max_size=12
    )
)
def test_shingles_match_python_reference(spark, words):
    """Operator shingles == reference n-gram-set implementation in Python."""
    from datalake_nba_dmc_spark.operators.dedup import with_shingles

    text = " ".join(words)
    got = set(
        with_shingles(spark.createDataFrame([(text,)], ["text"]), "text", 3)
        .first()["sh"]
    )
    toks = text.split()
    if len(toks) >= 3:
        want = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    else:
        want = {" ".join(toks)}
    assert got == want


@SLOW
@given(data=st.data())
def test_minhash_identical_sets_identical_sigs(spark, data):
    """Permutation invariance: signature depends on the shingle SET, so any
    reordering of the same words' shingle array yields the same signature."""
    import random as pyrandom

    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.dedup import minhash_signature

    shingle_set = data.draw(
        st.sets(st.text(alphabet="xyz ", min_size=1, max_size=6), min_size=1, max_size=8)
    )
    a = sorted(shingle_set)
    b = list(shingle_set)
    pyrandom.Random(0).shuffle(b)
    df = spark.createDataFrame([(a, b)], "a array<string>, b array<string>")
    row = df.select(
        minhash_signature(F.col("a"), 16).alias("sa"),
        minhash_signature(F.col("b"), 16).alias("sb"),
    ).first()
    assert row["sa"] == row["sb"]


@SLOW
@given(
    tvals=st.dictionaries(
        st.integers(0, 9), st.integers(-100, 100), min_size=0, max_size=6
    ),
    svals=st.dictionaries(
        st.integers(0, 9), st.integers(-100, 100), min_size=0, max_size=6
    ),
)
def test_merge_upsert_equals_dict_update(spark, tvals, svals):
    """MERGE(update/insert) over keyed rows must equal Python dict.update:
    source wins on matched keys, both sides' unmatched keys survive."""
    from datalake_nba_dmc_spark.operators.merge import merge_upsert

    schema = "k int, v int"
    t = spark.createDataFrame(sorted(tvals.items()) or [], schema=schema)
    s = spark.createDataFrame(sorted(svals.items()) or [], schema=schema)
    got = {r.k: r.v for r in merge_upsert(t, s, keys=["k"]).collect()}
    assert got == {**tvals, **svals}


@SLOW
@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0,
        max_size=60,
    ),
    chunk=st.integers(2, 12),
    overlap=st.integers(0, 6),
)
def test_chunks_reconstruct_document(spark, text, chunk, overlap):
    """Dropping each chunk's overlap prefix (after the first) and
    concatenating in index order must reproduce the document exactly —
    no characters lost or duplicated at chunk boundaries."""
    from hypothesis import assume

    from datalake_nba_dmc_spark.operators.text import chunk_documents

    assume(overlap < chunk)
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = sorted(
        (r.chunk_idx, r.chunk_text)
        for r in chunk_documents(
            df, chunk_chars=chunk, overlap_chars=overlap
        ).collect()
    )
    if not text:
        assert rows == []
        return
    rebuilt = rows[0][1] + "".join(c[overlap:] for _, c in rows[1:])
    assert rebuilt == text


@SLOW
@given(
    old=st.dictionaries(st.integers(0, 9), st.integers(-5, 5), max_size=6),
    new=st.dictionaries(st.integers(0, 9), st.integers(-5, 5), max_size=6),
)
def test_snapshot_diff_inverts_to_new_state(spark, old, new):
    """Applying the diff's insert/update/delete classification to the old
    dict must reproduce the new dict (CDC completeness + minimality:
    unchanged keys never appear)."""
    from datalake_nba_dmc_spark.operators.merge import snapshot_diff

    schema = "k int, v int"
    o = spark.createDataFrame(sorted(old.items()) or [], schema=schema)
    n = spark.createDataFrame(sorted(new.items()) or [], schema=schema)
    diff = {r.k: r.change_type for r in snapshot_diff(o, n, keys=["k"]).collect()}
    rebuilt = dict(old)
    for k, op in diff.items():
        if op == "delete":
            rebuilt.pop(k)
        else:
            rebuilt[k] = new[k]
    assert rebuilt == new
    for k in set(old) & set(new):
        if old[k] == new[k]:
            assert k not in diff


@SLOW
@given(
    st.lists(
        st.text(alphabet="abcdef \n", min_size=1, max_size=40).filter(
            lambda t: len(t) > 0
        ),
        min_size=1,
        max_size=6,
    )
)
def test_char_entropy_permutation_invariant_and_bounded(spark, texts):
    """Entropy depends only on the char multiset: shuffling characters
    changes nothing, and 0 <= H <= ln(distinct_chars)."""
    import math

    from datalake_nba_dmc_spark.operators.text import char_entropy

    rows = [(i, t) for i, t in enumerate(texts)]
    perm = [(i, "".join(sorted(t))) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dfp = spark.createDataFrame(perm, "doc_id long, text string")
    a = {r.doc_id: r.char_entropy_nats for r in char_entropy(df).collect()}
    b = {r.doc_id: r.char_entropy_nats for r in char_entropy(dfp).collect()}
    assert a == b
    d = {r.doc_id: r.n_distinct_chars for r in char_entropy(df).collect()}
    for i, h in a.items():
        # operator clamps to [0, round(ln(d), 6)]: the lower bound is
        # exact, the upper can exceed ln(d) only by the final 6-dp
        # rounding of ln(d) itself (half a step)
        assert 0.0 <= h <= math.log(max(d[i], 1)) + 5e-7


@SLOW
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, width=32
            ),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_quantize_int8_negation_symmetry_and_range(spark, vecs):
    """Codes are odd under vector negation, bounded to [-127, 127], and
    the scale equals max|x|/127."""
    from datalake_nba_dmc_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    neg = spark.createDataFrame(
        [(i, [-x for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    a = {r.vec_id: r for r in quantize_int8(df).collect()}
    b = {r.vec_id: r for r in quantize_int8(neg).collect()}
    for i in a:
        assert a[i].qscale == b[i].qscale
        assert [-c for c in a[i].codes] == b[i].codes
        assert all(-127 <= c <= 127 for c in a[i].codes)


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000),
            st.floats(min_value=0.001, max_value=1000.0, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=10),
)
def test_weighted_sample_matches_python_mirror(spark, rows, k):
    """The ES selection equals the plain-Python mirror of the same keys on
    any inputs — partitioning/engine cannot change membership."""
    import math

    from datalake_nba_dmc_spark.operators.sampling import sample_weighted_topk

    df = spark.createDataFrame(rows, "k long, w double")
    got = sorted(r.k for r in sample_weighted_topk(df, "k", "w", k=k).collect())

    def es(key, w):
        h = ((key & 2147483647) * 2654435761) % 4294967296
        h = (h + ((key >> 31) * 2246822519) % 4294967296) % 4294967296
        return math.log((h + 0.5) / 4294967296.0) / w

    want = sorted(key for key, w in sorted(rows, key=lambda r: -es(*r))[:k])
    assert got == want


@SLOW
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
            max_size=200,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_gopher_ratios_bounded(spark, texts):
    """On arbitrary unicode documents every Gopher ratio stays in [0, 1],
    counts are non-negative, and the pass flag is always 0/1 (never
    NULL)."""
    from datalake_nba_dmc_spark.operators.text import gopher_quality

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in gopher_quality(df).collect():
        assert r.n_words >= 0 and r.n_stop_hits >= 0
        for ratio in (
            r.symbol_word_ratio,
            r.bullet_line_frac,
            r.ellipsis_line_frac,
            r.alpha_word_frac,
        ):
            assert ratio is not None and 0.0 <= ratio <= 1.0
        assert r.gopher_pass in (0, 1)
        if r.n_words > 0:
            assert r.mean_word_chars > 0


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@SLOW
@given(
    names=st.lists(
        st.text(alphabet="ab1", min_size=1, max_size=6),
        min_size=2,
        max_size=10,
        unique=True,
    )
)
def test_fastss_pairs_equal_brute_force(spark, names):
    """FastSS deletion-neighborhood completeness + soundness law: the
    blocked pair set equals the brute-force levenshtein<=1 pair set for
    ARBITRARY strings (tiny alphabet maximizes near-collisions, incl.
    insert/delete cases with unequal lengths and transposition false
    positives the verify step must kill)."""
    from datalake_nba_dmc_spark.operators.linkage import fuzzy_pairs_fastss

    df = spark.createDataFrame(list(enumerate(names)), ["id", "name"])
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_pairs_fastss(df, "id", "name").collect()
    }
    want = {
        (i, j)
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if _lev(names[i], names[j]) <= 1
    }
    assert got == want


@SLOW
@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=60), min_size=1, max_size=15
    )
)
def test_heavy_hitters_exact_topk_when_guarantee_holds(spark, counts):
    """Two-phase heavy hitters equals true top-k whenever every top-k item
    clears the n/(cap+1) completeness threshold — with cap >= n the MG
    phase never prunes, so the law must hold for ANY multiset."""
    from collections import Counter

    from datalake_nba_dmc_spark.operators.frequent import heavy_hitters_exact

    items = [f"t{i}" for i, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame([(x,) for x in items], ["token"]).repartition(3)
    k = min(5, len(counts))
    got = [
        (r["token"], r["item_count"])
        for r in heavy_hitters_exact(df, "token", k=k, cap=len(items) + 1).collect()
    ]
    want = sorted(Counter(items).items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == want


@SLOW
@given(
    lvals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1, max_size=12
    ),
    rvals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=0, max_size=8,
        unique=True,
    ),
)
def test_nearest_value_join_law(spark, lvals, rvals):
    """nearest_value_join law on arbitrary floats (incl. subnormals and
    empty right sides): the result is the backward candidate (largest
    right ≤ v) unless the forward one is strictly closer in double
    arithmetic — which equals the naive distance-argmin everywhere except
    same-side sub-ulp neighbors, where this pick is the truly nearer
    value."""
    from datalake_nba_dmc_spark.operators.temporal import nearest_value_join

    left = spark.createDataFrame(
        [(i, "k", float(v)) for i, v in enumerate(lvals)], "id long, key string, v double"
    )
    right = spark.createDataFrame(
        [("k", float(rv), str(j)) for j, rv in enumerate(rvals)],
        "key string, rv double, tag string",
    )
    got = {
        r["id"]: r["nearest_rv"]
        for r in nearest_value_join(left, right, "key", "v", "rv", ["tag"]).collect()
    }
    for i, v in enumerate(lvals):
        if not rvals:
            assert got[i] is None
            continue
        # mirror of the operator's exact semantics: backward = largest
        # rv <= v, forward = smallest rv >= v, backward wins non-strict
        # double-distance ties. (A naive argmin over DOUBLE distances
        # disagrees on same-side values within one ulp of each other —
        # where the operator's pick is the truly nearer one.)
        below = [rv for rv in rvals if rv <= v]
        above = [rv for rv in rvals if rv >= v]
        b = max(below) if below else None
        f = min(above) if above else None
        if b is not None and (f is None or (v - b) <= (f - v)):
            want = b
        else:
            want = f
        assert got[i] == want, (v, got[i], want)


@SLOW
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_repeated_spans_match_python_reference(spark, docs):
    """repeated_ngram_spans vs a direct Python reference on random tiny
    corpora: same (doc, start, end, n_grams) span sets for n=2,
    min_count=2 — pinning the window-count + interval-merge pipeline
    against an implementation with no shared code."""
    from collections import Counter

    from datalake_nba_dmc_spark.operators.dedup import repeated_ngram_spans

    n = 2
    toks = [[t for t in d] for d in docs]
    counts = Counter(
        tuple(ts[i : i + n]) for ts in toks for i in range(len(ts) - n + 1)
    )
    expect = set()
    for doc_id, ts in enumerate(toks):
        occ = [
            i
            for i in range(len(ts) - n + 1)
            if counts[tuple(ts[i : i + n])] >= 2
        ]
        spans = []
        for i in occ:
            if spans and i <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], i + n)
                spans[-1][2] += 1
            else:
                spans.append([i, i + n, 1])
        expect.update((doc_id, s, e, g) for s, e, g in spans)

    df = spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in enumerate(toks)], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in repeated_ngram_spans(df, n=n, min_count=2).collect()
    }
    assert got == expect


@SLOW
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 6)),  # (basket, item)
        min_size=1,
        max_size=40,
    )
)
def test_basket_pairs_match_python_reference(spark, rows):
    """basket_pairs (r5 single-subtree rework) vs a direct Python
    reference on random basket/item multisets: identical (pair, n_ab,
    lift) sets — pins the sorted-array pair-combination expression,
    support counting, and lift math, including duplicate (basket, item)
    rows collapsing to one."""
    from collections import Counter
    from itertools import combinations

    from datalake_nba_dmc_spark.operators.aggregates import basket_pairs

    items = sorted(set(rows))
    baskets = {}
    for b, i in items:
        baskets.setdefault(b, set()).add(i)
    nb = len(baskets)
    support = Counter(i for its in baskets.values() for i in its)
    pair_counts = Counter(
        p for its in baskets.values() for p in combinations(sorted(its), 2)
    )
    expect = {
        (a, b, n, round(n * nb / (support[a] * support[b]), 6))
        for (a, b), n in pair_counts.items()
        if n >= 2
    }

    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r["item_a"], r["item_b"], r["n_ab"], r["lift"])
        for r in basket_pairs(df, "basket", "item", min_support=2).collect()
    }
    assert got == expect


@SLOW
@given(
    urls=st.lists(
        st.builds(
            lambda scheme, www, host, port, path, slash, params, frag: (
                scheme
                + "://"
                + ("WWW." if www else "")
                + host
                + port
                + "/"
                + path
                + ("/" if slash else "")
                + ("?" + "&".join(params) if params else "")
                + ("#x" if frag else "")
            ),
            scheme=st.sampled_from(["http", "HTTPS", "https", "HTTP"]),
            www=st.booleans(),
            host=st.sampled_from(
                ["Example.com", "a.B.co.uk", "x.org:8443", "site.NET"]
            ),
            port=st.sampled_from(["", ":443", ":80"]),
            path=st.sampled_from(["a", "a/B", "p/1", ""]),
            slash=st.booleans(),
            params=st.lists(
                st.sampled_from(
                    ["a=1", "b=2", "utm_source=x", "gclid=9", "ref=z", "href=q"]
                ),
                max_size=4,
            ),
            frag=st.booleans(),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_canonicalize_url_idempotent_and_variation_free(spark, urls):
    """Canonicalization is a projection onto its own fixed points:
    canonical(canonical(u)) == canonical(u), and the canonical form never
    retains a fragment, a www. prefix, a default port, a trailing slash,
    or a tracking parameter."""
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.web import canonicalize_url

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    out = df.select(
        "i",
        canonicalize_url(F.col("url")).alias("c1"),
        canonicalize_url(canonicalize_url(F.col("url"))).alias("c2"),
    ).collect()
    for r in out:
        assert r["c1"] == r["c2"], (r["c1"], r["c2"])
        c = r["c1"]
        assert "#" not in c
        assert "://www." not in c
        assert not c.split("?", 1)[0].endswith("/")
        assert "utm_" not in c and "gclid" not in c and "ref=" not in c.replace("href=", "")
        scheme = c.split("://", 1)[0]
        hostpart = c.split("://", 1)[1].split("/", 1)[0].split("?", 1)[0]
        if scheme == "https":
            assert not hostpart.endswith(":443")
        if scheme == "http":
            assert not hostpart.endswith(":80")


# ---------------------------------------------------------------------------
# r8 codecs: property fuzzing (pure Python — no Spark session needed)
# ---------------------------------------------------------------------------

FAST = settings(max_examples=40, deadline=None)


@FAST
@given(
    blocks=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=63),
                st.integers(min_value=-1023, max_value=1023).filter(lambda v: v != 0),
            ),
            max_size=16,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_jpeg_entropy_roundtrip_property(blocks):
    """ANY coefficient block list round-trips the Huffman/DPCM/RLE layer
    exactly (hypothesis-fuzzed sparsity patterns, signs, magnitudes)."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.jpeg import (
        AC_LUMA,
        DC_LUMA,
        _BitWriter,
        _cached_lut,
        _canonical_codes,
        _decode_entropy,
        _encode_block,
    )

    zz = np.zeros((len(blocks), 64), dtype=np.int32)
    for i, cells in enumerate(blocks):
        for pos, val in cells:
            zz[i, pos] = val
    dc, ac = _canonical_codes(*DC_LUMA), _canonical_codes(*AC_LUMA)
    w = _BitWriter()
    pred = 0
    for b in zz:
        pred = _encode_block(w, b, pred, dc, ac)
    w.flush()
    seg = bytes(w.out).replace(b"\xff\x00", b"\xff")
    huff = {(0, 0): _cached_lut(*DC_LUMA), (1, 0): _cached_lut(*AC_LUMA)}
    out = _decode_entropy(
        [seg], [{"h": 1, "v": 1, "td": 0, "ta": 0}], len(zz), 1, 0, huff
    )
    assert (out[0] == zz).all()


@FAST
@given(
    data=st.data(),
    h=st.integers(min_value=1, max_value=10),
    w=st.integers(min_value=1, max_value=10),
    ch=st.sampled_from([1, 2, 3, 4]),
    interlace=st.booleans(),
)
def test_png_roundtrip_property(data, h, w, ch, interlace):
    """ANY 8-bit image round-trips the PNG codec bit-exactly, interlaced
    or not, under a fuzzed filter schedule."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import decode_png, encode_png

    img = np.array(
        data.draw(
            st.lists(
                st.lists(
                    st.lists(st.integers(0, 255), min_size=ch, max_size=ch),
                    min_size=w,
                    max_size=w,
                ),
                min_size=h,
                max_size=h,
            )
        ),
        dtype=np.uint8,
    )
    filters = data.draw(st.lists(st.integers(0, 4), min_size=1, max_size=5))
    out = decode_png(encode_png(img, filter_types=filters, interlace=interlace))
    assert out.shape == (h, w, ch)
    assert (out == img).all()


@FAST
@given(
    data=st.data(),
    word=st.text(alphabet="abcd", min_size=1, max_size=9),
)
def test_unigram_argmin_matches_bruteforce_property(data, word):
    """best_segmentation equals full enumeration for ANY fuzzed vocab that
    covers the word's characters (singles always present)."""
    import itertools

    from datalake_nba_dmc_spark.operators.unigram_lm import best_segmentation

    pieces = {c: data.draw(st.integers(1, 50), label=f"cost_{c}") for c in "abcd"}
    for _ in range(data.draw(st.integers(0, 6))):
        p = data.draw(st.text(alphabet="abcd", min_size=2, max_size=4))
        pieces[p] = data.draw(st.integers(1, 50))

    n = len(word)
    best = None
    for mask in itertools.product([0, 1], repeat=max(0, n - 1)):
        cuts = [0] + [i + 1 for i, b in enumerate(mask) if b] + [n]
        segs = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        if any(p not in pieces for p in segs):
            continue
        key = (sum(pieces[p] for p in segs), " ".join(segs))
        if best is None or key < best[:2]:
            best = (key[0], key[1], segs)
    got = best_segmentation(word, pieces)
    assert got == (best[0], best[2])


@FAST
@given(
    data=st.data(),
    h=st.integers(min_value=1, max_value=8),
    w=st.integers(min_value=1, max_value=8),
    n_pal=st.integers(min_value=1, max_value=16),
)
def test_png_trns_roundtrip_property(data, h, w, n_pal):
    """ANY palette image with ANY (shorter-or-equal) tRNS alpha vector
    decodes to RGBA with alpha = tRNS[idx] (255 past the vector), and ANY
    gray image with ANY key gets alpha 0 exactly where samples equal the
    key."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import decode_png, encode_png

    pal = np.array(
        data.draw(
            st.lists(
                st.lists(st.integers(0, 255), min_size=3, max_size=3),
                min_size=n_pal,
                max_size=n_pal,
            )
        ),
        dtype=np.uint8,
    )
    idx = np.array(
        data.draw(
            st.lists(
                st.lists(st.integers(0, n_pal - 1), min_size=w, max_size=w),
                min_size=h,
                max_size=h,
            )
        ),
        dtype=np.uint8,
    )[:, :, None]
    n_alpha = data.draw(st.integers(min_value=1, max_value=n_pal))
    alphas = bytes(data.draw(st.lists(st.integers(0, 255), min_size=n_alpha, max_size=n_alpha)))
    out = decode_png(encode_png(idx, palette=pal, transparency=alphas))
    assert out.shape == (h, w, 4)
    assert (out[:, :, :3] == pal[idx[:, :, 0]]).all()
    full = np.full(n_pal, 255, dtype=np.uint8)
    full[:n_alpha] = np.frombuffer(alphas, dtype=np.uint8)
    assert (out[:, :, 3] == full[idx[:, :, 0]]).all()

    gray = np.array(
        data.draw(
            st.lists(
                st.lists(st.integers(0, 255), min_size=w, max_size=w),
                min_size=h,
                max_size=h,
            )
        ),
        dtype=np.uint8,
    )
    key = data.draw(st.integers(0, 255))
    gout = decode_png(encode_png(gray, transparency=(key,)))
    assert gout.shape == (h, w, 2)
    assert (gout[:, :, 0] == gray).all()
    assert ((gout[:, :, 1] == 0) == (gray == key)).all()


@FAST
@given(
    data=st.data(),
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    ch=st.sampled_from([1, 3]),
)
def test_phash_format_invariance_property(data, h, w, ch):
    """The aHash of ANY image is identical across PNG and BMP encodings
    of the same pixels — the re-encode invariance that defines a
    perceptual hash (byte hashing has none)."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import (
        _ahash64,
        decode_image,
        encode_bmp,
        encode_png,
    )

    img = np.array(
        data.draw(
            st.lists(
                st.lists(
                    st.lists(st.integers(0, 255), min_size=ch, max_size=ch),
                    min_size=w,
                    max_size=w,
                ),
                min_size=h,
                max_size=h,
            )
        ),
        dtype=np.uint8,
    )
    h_png = _ahash64(decode_image(encode_png(img)))
    h_bmp = _ahash64(decode_image(encode_bmp(img)))
    assert h_png == h_bmp


@FAST
@given(
    data=st.data(),
    h=st.integers(min_value=1, max_value=10),
    w=st.integers(min_value=1, max_value=10),
    sy=st.integers(min_value=1, max_value=4),
    sx=st.integers(min_value=1, max_value=4),
)
def test_resize_nearest_laws_property(data, h, w, sy, sx):
    """Nearest-neighbor resize laws on ANY image: identity at source
    dims; integer upscale-by-repeat then downscale-back is the identity;
    every output pixel VALUE exists in the source."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import _resize_pixels

    img = np.array(
        data.draw(
            st.lists(
                st.lists(st.integers(0, 255), min_size=w, max_size=w),
                min_size=h,
                max_size=h,
            )
        ),
        dtype=np.uint8,
    )[:, :, None]
    assert np.array_equal(_resize_pixels(img, w, h), img)
    up = _resize_pixels(img, w * sx, h * sy)
    assert np.array_equal(up, np.repeat(np.repeat(img, sy, 0), sx, 1))
    assert np.array_equal(_resize_pixels(up, w, h), img)


@FAST
@given(
    data=st.data(),
    n=st.integers(min_value=1, max_value=5),
    h=st.integers(min_value=1, max_value=4),
    w=st.integers(min_value=1, max_value=4),
    cs=st.sampled_from(["420", "422", "444", "mono"]),
)
def test_y4m_roundtrip_property(data, n, h, w, cs):
    """ANY luma frame stack round-trips the Y4M encoder/walker: the
    parser recovers dims/colorspace, the walk yields every frame offset,
    and the luma planes read back byte-exact."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.y4m import (
        encode_y4m,
        iter_y4m_frames,
        parse_y4m_header,
    )

    if cs == "420":
        h, w = h * 2, w * 2  # 4:2:0 requires even dims
    frames = np.array(
        data.draw(
            st.lists(
                st.lists(
                    st.lists(st.integers(0, 255), min_size=w, max_size=w),
                    min_size=h,
                    max_size=h,
                ),
                min_size=n,
                max_size=n,
            )
        ),
        dtype=np.uint8,
    )
    p = encode_y4m(frames, colorspace=cs)
    pw, ph, _fn, _fd, pcs, _fb, _off = parse_y4m_header(p)
    assert (pw, ph, pcs) == (w, h, cs)
    offs = list(iter_y4m_frames(p))
    assert [i for i, _ in offs] == list(range(n))
    for i, off in offs:
        y = np.frombuffer(p, dtype=np.uint8, count=w * h, offset=off).reshape(h, w)
        assert np.array_equal(y, frames[i])


@SLOW
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),  # value (scaled int)
            st.booleans(),                             # cohort A?
        ),
        min_size=2,
        max_size=40,
    )
)
def test_mann_whitney_matches_bruteforce_pair_count(spark, vals):
    """mann_whitney_u's doubled-midrank prefix-sum form equals the
    DEFINITION: u2_a = 2·#(a>b) + #(a==b) over all cross pairs, for
    any tie structure hypothesis invents (both cohorts non-empty)."""
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.stats import mann_whitney_u

    a = [v for v, s in vals if s]
    b = [v for v, s in vals if not s]
    if not a or not b:
        return
    df = spark.createDataFrame(
        [(float(v), s) for v, s in vals], "v double, s boolean"
    )
    [r] = mann_whitney_u(df, "v", F.col("s"), scale=1).collect()
    u2_brute = sum(
        2 if x > y else (1 if x == y else 0) for x in a for y in b
    )
    assert (r.n_a, r.n_b) == (len(a), len(b))
    assert r.u2_a == u2_brute
    assert r.u2_a + r.u2_b == 2 * len(a) * len(b)
    assert r.auc_micro == (u2_brute * 1_000_000) // (2 * len(a) * len(b))


@SLOW
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.booleans(),
        ),
        min_size=2,
        max_size=40,
    )
)
def test_ks_matches_bruteforce_ecdf_sup(spark, vals):
    """ks_two_sample's cross-multiplied prefix-sum numerator equals the
    DEFINITION: max over the merged grid of |#(A<=x)·n_b − #(B<=x)·n_a|
    (both cohorts non-empty)."""
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.stats import ks_two_sample

    a = [v for v, s in vals if s]
    b = [v for v, s in vals if not s]
    if not a or not b:
        return
    df = spark.createDataFrame(
        [(float(v), s) for v, s in vals], "v double, s boolean"
    )
    [r] = ks_two_sample(df, "v", F.col("s"), scale=1).collect()
    grid = sorted(set(a) | set(b))
    brute = max(
        abs(
            sum(1 for x in a if x <= g) * len(b)
            - sum(1 for y in b if y <= g) * len(a)
        )
        for g in grid
    )
    assert (r.n_a, r.n_b, r.ks_num) == (len(a), len(b), brute)
    assert r.ks_d_micro == (brute * 1_000_000) // (len(a) * len(b))


@VERY_SLOW
@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["p", "q", "r"]),           # segment
            st.integers(min_value=-30, max_value=30),
            st.booleans(),
        ),
        min_size=2,
        max_size=50,
    )
)
def test_segmented_stats_equal_global_stats_per_segment(spark, vals):
    """The per-segment generalizations are EXACTLY the global operators
    applied per segment: for every segment present, ks_two_sample_by /
    mann_whitney_u_by rows equal running the global operator on that
    segment's rows alone."""
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.stats import (
        ks_two_sample,
        ks_two_sample_by,
        mann_whitney_u,
        mann_whitney_u_by,
    )

    df = spark.createDataFrame(
        [(g, float(v), s) for g, v, s in vals], "g string, v double, s boolean"
    )
    ks_by = {
        r.g: (r.n_a, r.n_b, r.ks_num, r.ks_d_micro)
        for r in ks_two_sample_by(df, "g", "v", F.col("s"), scale=1).collect()
    }
    mw_by = {
        r.g: (r.n_a, r.n_b, r.u2_a, r.u2_b, r.auc_micro)
        for r in mann_whitney_u_by(df, "g", "v", F.col("s"), scale=1).collect()
    }
    segs = {g for g, _, _ in vals}
    assert set(ks_by) == set(mw_by) == segs
    for g in segs:
        sub = df.filter(F.col("g") == g)
        [kr] = ks_two_sample(sub, "v", F.col("s"), scale=1).collect()
        assert ks_by[g] == (kr.n_a, kr.n_b, kr.ks_num, kr.ks_d_micro)
        [mr] = mann_whitney_u(sub, "v", F.col("s"), scale=1).collect()
        assert mw_by[g] == (mr.n_a, mr.n_b, mr.u2_a, mr.u2_b, mr.auc_micro)


@SLOW
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 120)),  # (key, minute)
        min_size=1,
        max_size=25,
    ),
    rights=st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(0, 120), st.integers(-20, 20)
        ),
        min_size=0,
        max_size=25,
    ),
    win=st.integers(min_value=1, max_value=40),
)
def test_trailing_window_agg_matches_bruteforce(spark, lefts, rights, win):
    """trailing_window_agg's prefix-sum-difference form equals the
    DEFINITION: count/sum of right rows with key match and timestamp in
    (t−w, t], for arbitrary keys, ties, and window widths."""
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.temporal import (
        trailing_window_agg,
    )

    base = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            (i, k, base + datetime.timedelta(minutes=m))
            for i, (k, m) in enumerate(lefts)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (k, base + datetime.timedelta(minutes=m), float(v))
            for k, m, v in rights
        ],
        "user_id long, ts timestamp, value double",
    ) if rights else spark.createDataFrame(
        [], "user_id long, ts timestamp, value double"
    )
    got = {
        r.event_id: (r.win_count, r.win_sum_scaled)
        for r in trailing_window_agg(
            left, right, key="user_id", left_ts="ts", right_ts="ts",
            value_col="value", window=f"interval {win} minutes",
            scale=1,
        ).collect()
    }
    for i, (k, m) in enumerate(lefts):
        inside = [
            v for rk, rm, v in rights if rk == k and m - win < rm <= m
        ]
        assert got[i] == (len(inside), sum(inside)), (i, k, m, win)


@SLOW
@given(
    lrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5000)),
        min_size=1,
        max_size=20,
    ),
    rrows=st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(0, 5000), st.integers(-50, 50)
        ),
        min_size=0,
        max_size=20,
    ),
)
def test_trailing_window_matches_python_mirror(spark, lrows, rrows):
    """trailing_window_agg's prefix-sum differencing vs the brute-force
    Python mirror (count/sum of right rows in (t−w, t] per left row) on
    arbitrary event layouts — duplicate timestamps, duplicate (user, ts)
    right rows, empty right sides, negative values. The differencing
    form is algebraically cum(t) − cum(t−w); this pins the edge
    semantics (left edge EXCLUSIVE, right edge inclusive) and the
    per-(key, ts) pre-aggregation against an implementation-free
    definition."""
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.temporal import (
        trailing_window_agg,
    )

    W = 600  # seconds
    left = spark.createDataFrame(
        [(i, u, s) for i, (u, s) in enumerate(lrows)],
        "event_id long, user_id long, s long",
    ).select("event_id", "user_id", F.col("s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        rrows or [(0, 0, 0)], "user_id long, s long, v long"
    ).select(
        "user_id",
        F.col("s").cast("timestamp").alias("ts"),
        F.col("v").cast("double").alias("value"),
    )
    if not rrows:
        right = right.filter(F.lit(False))
    got = {
        r.event_id: (r.win_count, r.win_sum_scaled)
        for r in trailing_window_agg(
            left,
            right,
            key="user_id",
            left_ts="ts",
            right_ts="ts",
            value_col="value",
            window=f"interval {W} seconds",
        ).collect()
    }
    for i, (u, s) in enumerate(lrows):
        hits = [
            v for (ru, rs, v) in rrows if ru == u and s - W < rs <= s
        ]
        assert got[i] == (len(hits), 100 * sum(hits)), (i, u, s)
    assert len(got) == len(lrows)


@SLOW
@given(
    lrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5000)),
        min_size=1,
        max_size=20,
    ),
    rrows=st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(0, 5000), st.integers(0, 99)
        ),
        min_size=0,
        max_size=20,
    ),
)
def test_asof_within_matches_python_mirror(spark, lrows, rrows):
    """asof_join_within vs the brute-force mirror: per left row, the
    max-v right row at the LATEST rs <= ts for the same key, nulled
    when older than the tolerance — arbitrary layouts including exact
    ts ties (right rows deduped per (key, ts) by max v on both sides,
    the as-of uniqueness contract) and the boundary rs == ts − tol
    (still inside: >= semantics)."""
    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.temporal import asof_join_within
    from datalake_nba_dmc_spark.operators.windows import top1_per_group

    TOL = 600
    left = spark.createDataFrame(
        [(i, u, s) for i, (u, s) in enumerate(lrows)],
        "event_id long, user_id long, s long",
    ).select("event_id", "user_id", F.col("s").cast("timestamp").alias("ts"))
    right_raw = spark.createDataFrame(
        rrows or [(0, 0, 0)], "user_id long, s long, v long"
    ).select(
        "user_id", F.col("s").cast("timestamp").alias("rt"), "v"
    )
    if not rrows:
        right_raw = right_raw.filter(F.lit(False))
    right = top1_per_group(
        right_raw, ["user_id", "rt"], [F.col("v").desc()]
    )
    got = {
        r.event_id: r.asof_v
        for r in asof_join_within(
            left,
            right,
            key="user_id",
            left_ts="ts",
            right_ts="rt",
            right_cols=["v"],
            tolerance=f"interval {TOL} seconds",
        ).collect()
    }
    # python mirror with the same (key, ts)-dedup rule
    best: dict = {}
    for ru, rs, v in rrows:
        k = (ru, rs)
        if k not in best or v > best[k]:
            best[k] = v
    for i, (u, s) in enumerate(lrows):
        cands = [(rs, v) for (ru, rs), v in best.items()
                 if ru == u and rs <= s]
        want = None
        if cands:
            rs, v = max(cands)
            if rs >= s - TOL:
                want = v
        assert got[i] == want, (i, u, s)
    assert len(got) == len(lrows)


@SLOW
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 120)),  # (key, minute)
        min_size=1,
        max_size=22,
    ),
    rights=st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(0, 120), st.integers(0, 5)
        ),  # (key, minute, item) — small item space forces repeats
        min_size=0,
        max_size=25,
    ),
    win=st.integers(min_value=1, max_value=40),
)
def test_trailing_distinct_matches_bruteforce(spark, lefts, rights, win):
    """trailing_distinct_count's interval-stabbing form equals the
    DEFINITION — |{distinct items with an occurrence in (t−w, t] for
    the same key}| — for arbitrary keys, repeated items, duplicate
    (key, item, ts) rows, boundary ties, and window widths. The small
    item space makes first-in-window collisions (the case the
    prev-occurrence interval construction exists for) common."""
    from pyspark.sql import functions as F  # noqa: F401

    from datalake_nba_dmc_spark.operators.temporal import (
        trailing_distinct_count,
    )

    base = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            (i, k, base + datetime.timedelta(minutes=m))
            for i, (k, m) in enumerate(lefts)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (k, base + datetime.timedelta(minutes=m), v)
            for k, m, v in rights
        ],
        "user_id long, ts timestamp, item long",
    ) if rights else spark.createDataFrame(
        [], "user_id long, ts timestamp, item long"
    )
    got = {
        r.event_id: r.win_distinct
        for r in trailing_distinct_count(
            left, right, key="user_id", left_ts="ts", right_ts="ts",
            value_col="item", window=f"interval {win} minutes",
        ).collect()
    }
    for i, (k, m) in enumerate(lefts):
        inside = {
            v for rk, rm, v in rights if rk == k and m - win < rm <= m
        }
        assert got[i] == len(inside), (i, k, m, win, inside)
