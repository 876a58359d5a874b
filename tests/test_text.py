"""Unit tests: text-analysis operators (lang-id, quality, tokens, fingerprint)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_features,
    token_count,
    tokens,
)


def _one(spark, text):
    return spark.createDataFrame([(text,)], ["text"])


def test_tokens_empty_and_whitespace(spark):
    df = spark.createDataFrame([("",), ("   ",), ("a  b",)], ["text"])
    out = df.select(token_count("text").alias("n")).collect()
    assert [r["n"] for r in out] == [0, 0, 2]


def test_bpe_ish_token_count(spark):
    # "don't stop!" → don / ' / t / stop / ! = 5
    row = _one(spark, "don't stop!").select(bpe_ish_token_count("text").alias("n")).first()
    assert row["n"] == 5


def test_quality_features_values(spark):
    out = quality_features(_one(spark, "The cat, the hat.")).first()
    assert out["n_chars_calc"] == 17
    assert out["n_tokens"] == 4
    # "," and "." are punctuation
    assert out["punct_ratio"] == pytest.approx(2 / 17)
    assert out["upper_ratio"] == pytest.approx(1 / 17)
    # "The"/"the" are stopwords → 2 of 4 tokens
    assert out["stopword_ratio"] == pytest.approx(0.5)
    # mean word len: (17 - 3 separators) / 4 tokens = 3.5
    assert out["mean_word_len"] == pytest.approx(3.5)


def test_quality_features_empty_text_no_nan(spark):
    out = quality_features(_one(spark, "")).first()
    assert out["n_tokens"] == 0
    assert out["punct_ratio"] == 0.0
    assert out["stopword_ratio"] == 0.0
    assert out["mean_word_len"] is None


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the quick fox and the dog",),
            ("el perro y la casa de madrid",),
            ("le chien et un chat",),
            ("der hund und die katze",),
            ("zzz qqq xxx",),
        ],
        ["text"],
    )
    out = [r["lang_pred"] for r in lang_id(df).collect()]
    assert out == ["en", "es", "fr", "de", "und"]


def test_tf_idf_known_values(spark):
    import math

    from datalake_nba_dmc_spark.operators.text import tf_idf

    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "banana")],
        ["doc_id", "text"],
    )
    out = {(r["doc_id"], r["term"]): r for r in tf_idf(df).collect()}
    # banana in all 3 docs → idf = ln(3/3) = 0
    assert out[(1, "banana")]["tf_idf"] == pytest.approx(0.0)
    # apple: tf=2 in doc1, df=1 → 2*ln(3)
    assert out[(1, "apple")]["tf"] == 2
    assert out[(1, "apple")]["tf_idf"] == pytest.approx(2 * math.log(3))
    # min_df pruning drops hapax terms
    pruned = tf_idf(df, min_df=2).collect()
    assert all(r["term"] == "banana" for r in pruned)


def test_winnow_shared_substring_guarantee(spark):
    from datalake_nba_dmc_spark.operators.text import with_winnow_fingerprints

    shared = "abcdefghijklmnop"  # 16 chars >= k+w-1 = 11
    df = spark.createDataFrame(
        [(1, "xx " + shared + " yy"), (2, "completely other " + shared), (3, "zzz unrelated qqq")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: set(r["fps"]) for r in with_winnow_fingerprints(df).collect()}
    assert out[1] & out[2]  # winnowing guarantee: shared fingerprint exists
    assert not (out[1] & out[3])


def test_winnow_short_text(spark):
    from datalake_nba_dmc_spark.operators.text import with_winnow_fingerprints

    df = spark.createDataFrame([(1, "tiny")], ["doc_id", "text"])  # < k chars
    out = with_winnow_fingerprints(df).first()
    assert len(out["fps"]) == 1


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("  hello world ",), ("goodbye",)], ["text"]
    )
    fps = [r["fp"] for r in df.select(fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


class TestChunking:
    def test_offsets_and_overlap(self, spark):
        from datalake_nba_dmc_spark.operators.text import chunk_documents

        df = spark.createDataFrame(
            [(1, "abcdefghij")], "doc_id int, text string"
        )
        got = sorted(
            (r.chunk_idx, r.chunk_text, r.chunk_len)
            for r in chunk_documents(df, chunk_chars=4, overlap_chars=1).collect()
        )
        # step 3: offsets 0,3,6,9 -> abcd, defg, ghij, j
        assert got == [(0, "abcd", 4), (1, "defg", 4), (2, "ghij", 4), (3, "j", 1)]

    def test_empty_doc_emits_nothing(self, spark):
        from datalake_nba_dmc_spark.operators.text import chunk_documents

        df = spark.createDataFrame([(1, ""), (2, "xy")], "doc_id int, text string")
        out = chunk_documents(df, chunk_chars=4, overlap_chars=1).collect()
        assert {r.doc_id for r in out} == {2}

    def test_overlap_must_be_smaller(self, spark):
        from datalake_nba_dmc_spark.operators.text import chunk_documents

        df = spark.createDataFrame([(1, "xy")], "doc_id int, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_chars=4, overlap_chars=4)


class TestRepetition:
    def test_known_ratios(self, spark):
        from datalake_nba_dmc_spark.operators.text import repetition_signals

        df = spark.createDataFrame(
            [(1, "a a a b"), (2, "w x y z"), (3, "")],
            "doc_id int, text string",
        )
        got = {r.doc_id: r for r in repetition_signals(df).collect()}
        r1 = got[1]  # words: a,a,a,b -> grams: "a a","a a","a b"
        assert (r1.n_words, r1.n_distinct_words) == (4, 2)
        assert r1.distinct_word_ratio == 0.5
        assert r1.top_word_fraction == 0.75
        assert abs(r1.dup_2gram_fraction - (1 - 2 / 3)) < 1e-12
        r2 = got[2]
        assert r2.distinct_word_ratio == 1.0 and r2.dup_2gram_fraction == 0.0
        r3 = got[3]
        assert (r3.n_words, r3.top_word_fraction) == (0, 0.0)


class TestRedactPii:
    def test_patterns(self, spark):
        from datalake_nba_dmc_spark.operators.text import redact_pii

        df = spark.createDataFrame(
            [
                (1, "mail bob.smith+x@corp.example.org now"),
                (2, "call +1555-0042199 asap"),
                (3, "host 192.168.0.1 up"),
                (4, "clean text only"),
            ],
            "doc_id int, text string",
        )
        got = {r.doc_id: r.text for r in redact_pii(df).collect()}
        assert got[1] == "mail <EMAIL> now"
        assert got[2] == "call <PHONE> asap"
        assert got[3] == "host <IP> up"
        assert got[4] == "clean text only"


class TestPackTokenBins:
    def test_greedy_fill_within_shard(self, spark):
        from datalake_nba_dmc_spark.operators.text import pack_token_bins

        # 4 docs x 3 tokens, budget 5: cum_before = 0,3,6,9 -> bins 0,0,1,1
        df = spark.createDataFrame(
            [(i, "s", "a b c") for i in range(4)],
            "doc_id int, source string, text string",
        )
        got = sorted(
            (r.doc_id, r.bin_id)
            for r in pack_token_bins(df, budget=5).collect()
        )
        assert got == [(0, 0), (1, 0), (2, 1), (3, 1)]

    def test_shards_pack_independently(self, spark):
        from datalake_nba_dmc_spark.operators.text import pack_token_bins

        df = spark.createDataFrame(
            [(0, "x", "a b c"), (1, "y", "a b c")],
            "doc_id int, source string, text string",
        )
        got = {(r.source): r.bin_id for r in pack_token_bins(df, budget=5).collect()}
        assert got == {"x": 0, "y": 0}  # each shard starts at bin 0


def test_char_entropy_known_values(spark):
    import math

    from datalake_nba_dmc_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_chars, r.n_distinct_chars, r.char_entropy_nats)
        for r in char_entropy(df).collect()
    }
    assert set(got) == {1, 2, 3}  # empty/null docs dropped
    assert got[1] == (4, 1, 0.0)
    assert got[2][0:2] == (2, 2)
    assert abs(got[2][2] - math.log(2)) < 1e-5
    assert abs(got[3][2] - math.log(4)) < 1e-5


def test_collocations_pmi(spark):
    import math

    from datalake_nba_dmc_spark.operators.text import collocations

    # "new york" always adjacent; "dog" and "cat" never adjacent to each other
    rows = [(i, "new york city") for i in range(6)] + [
        (100 + i, "dog sleeps") for i in range(6)
    ] + [(200 + i, "cat runs") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.w1, r.w2): (r.c_xy, r.pmi) for r in collocations(df, min_count=5).collect()}
    # bigrams: (new,york) x6, (york,city) x6, (dog,sleeps) x6, (cat,runs) x6
    assert set(got) == {("new", "york"), ("york", "city"), ("dog", "sleeps"), ("cat", "runs")}
    n_toks, n_pairs = 42, 24  # 6x3 + 6x2 + 6x2 tokens; 6x2 + 6 + 6 bigrams
    want = round(math.log((6 * n_toks * n_toks) / (n_pairs * 6 * 6)), 6)
    assert got[("new", "york")] == (6, want)


def test_gopher_quality_rules(spark):
    from datalake_nba_dmc_spark.operators.text import gopher_quality

    good = " ".join(
        ["the quick brown fox jumps over that lazy dog with style and grace"] * 5
    )  # 65 words, mean len ~4, plenty of stopwords, all alphabetic
    too_short = "tiny doc"
    symbols = " ".join(["the of and that have with"] * 10 + ["#tag"] * 10)  # >10% symbol words
    bullets = "\n".join(["- item the of and that have with more words here"] * 10)
    df = spark.createDataFrame(
        [(1, good), (2, too_short), (3, symbols), (4, bullets)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_quality(df).collect()}
    assert got[1].gopher_pass == 1
    assert got[1].n_words == 65
    assert abs(got[1].alpha_word_frac - 1.0) < 1e-12
    assert got[2].gopher_pass == 0  # < 50 words
    assert got[3].gopher_pass == 0  # symbol ratio 10/70 > 0.1
    assert got[3].symbol_word_ratio > 0.1
    assert got[4].gopher_pass == 0  # every line is a bullet
    assert got[4].bullet_line_frac == 1.0


def test_unigram_logprob_small(spark):
    import math

    from datalake_nba_dmc_spark.operators.text import unigram_logprob

    # corpus: "a a b" + "a c" -> counts a:3 b:1 c:1, T=5
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in unigram_logprob(df).collect()}
    t1 = (2 * round(math.log(3 / 5) * 1e6) + round(math.log(1 / 5) * 1e6)) / 1e6 / 3
    t2 = (round(math.log(3 / 5) * 1e6) + round(math.log(1 / 5) * 1e6)) / 1e6 / 2
    assert got[1].n_tokens == 3
    assert abs(got[1].avg_logprob - round(t1, 6)) < 1e-9
    assert got[2].n_tokens == 2
    assert abs(got[2].avg_logprob - round(t2, 6)) < 1e-9
    # log-probs are negative; doc 1 leans more on the frequent token "a"
    assert got[1].avg_logprob < 0 and got[2].avg_logprob < 0
    assert got[1].avg_logprob > got[2].avg_logprob


def test_gram_novelty(spark):
    from datalake_nba_dmc_spark.operators.text import gram_novelty

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),          # shares shingles with 2
            (2, "alpha beta gamma epsilon"),        # overlap: (alpha beta gamma)
            (3, "totally different words entirely"),  # all novel
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gram_novelty(df).collect()}
    # doc1 shingles: (a b g), (b g d) -> (a b g) shared with doc2
    assert got[1].n_grams == 2 and got[1].n_novel == 1
    assert abs(got[1].novelty - 0.5) < 1e-12
    assert got[2].n_grams == 2 and got[2].n_novel == 1
    assert got[3].n_grams == 2 and got[3].n_novel == 2
    assert got[3].novelty == 1.0


def test_sentence_boilerplate_stats(spark):
    from datalake_nba_dmc_spark.operators.text import sentence_boilerplate_stats

    boiler = "Accept all cookies."
    rows = [(i, f"{boiler} Unique insight number {i}!") for i in range(5)]
    rows.append((99, "Entirely novel text with no repeats."))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_sentences"], r["n_boiler"], r["boiler_share"])
        for r in sentence_boilerplate_stats(df, df_threshold=3).collect()
    }
    for i in range(5):
        assert got[i] == (2, 1, 0.5)  # the cookie banner is boilerplate
    assert got[99] == (1, 0, 0.0)


def test_vocab_logit_score_matches_hand_computation(spark):
    """Linear BoW classifier scoring: logit = bias + sum(w(token)*count)
    / n_tokens, OOV words contribute 0 but still count toward n_tokens;
    exact under the 1e-6 scaled-long convention."""
    from datalake_nba_dmc_spark.operators.text import vocab_logit_score

    docs = spark.createDataFrame(
        [
            (0, "good good bad unknown"),
            (1, "bad bad bad"),
            (2, "unknown words only"),
        ],
        ["doc_id", "text"],
    )
    weights = spark.createDataFrame(
        [("good", 2.5), ("bad", -1.0)], ["word", "weight"]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["logit"])
        for r in vocab_logit_score(docs, weights, bias=0.5).collect()
    }
    assert got[0] == (4, round(0.5 + (2 * 2.5 - 1.0) / 4, 6))
    assert got[1] == (3, round(0.5 + (3 * -1.0) / 3, 6))
    assert got[2] == (3, 0.5)


def test_vocab_logit_score_duplicate_weight_rows_sum(spark):
    """Duplicate rows for one word in the weight table must SUM (linear
    model over duplicate features), never fan out the per-doc count rows
    into double-counted joins."""
    from datalake_nba_dmc_spark.operators.text import vocab_logit_score

    docs = spark.createDataFrame([(0, "good good")], ["doc_id", "text"])
    weights = spark.createDataFrame(
        [("good", 1.0), ("good", 0.25)], ["word", "weight"]
    )
    row = vocab_logit_score(docs, weights).first()
    assert row["n_tokens"] == 2
    assert row["logit"] == round(2 * 1.25 / 2, 6)


def test_dsir_importance_matches_python_reference(spark):
    """DSIR log-ratio weights equal an independent Python computation with
    the pinned estimation spec (raw-vocab Laplace smoothing, micro-nat
    quantization), and target-domain docs outrank off-domain docs."""
    import collections
    import math

    from datalake_nba_dmc_spark.operators.text import dsir_importance

    raw = [
        (0, "spark spark shuffle join"),
        (1, "cat dog cat fish"),
        (2, "spark join broadcast spark"),
        (3, "dog dog fish bird"),
    ]
    target = [(10, "spark join spark shuffle"), (11, "broadcast join spark")]
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")

    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_logratio"])
        for r in dsir_importance(rdf, tdf).collect()
    }

    cr = collections.Counter(w for _, t in raw for w in t.lower().split())
    ct_all = collections.Counter(w for _, t in target for w in t.lower().split())
    vocab = set(cr)
    ct = {w: ct_all.get(w, 0) for w in vocab}
    nr, nt, v = sum(cr.values()), sum(ct.values()), len(vocab)
    q = lambda p: round(math.log(p) * 1e6)
    term = {
        w: q((ct[w] + 1) / (nt + v)) - q((cr[w] + 1) / (nr + v)) for w in vocab
    }
    for doc_id, text in raw:
        toks = text.lower().split()
        want = round(sum(term[w] for w in toks) / 1e6, 6)
        assert got[doc_id] == (len(toks), want), doc_id
    # spark-domain docs (0, 2) outrank animal docs (1, 3)
    assert min(got[0][1], got[2][1]) > max(got[1][1], got[3][1])


def test_bm25_scores_hand_computed(spark):
    """BM25 matches a hand-computed reference (Lucene '+1' idf, k1=1.2,
    b=0.75); docs with no query term are absent; NULL text neither
    crashes nor skews avgdl (excluded by the _has_text guard)."""
    import math

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from datalake_nba_dmc_spark.operators.text import bm25_scores

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    corpus = {1: "spark spark join", 2: "spark window", 3: "nothing here at all"}
    df = spark.createDataFrame(list(corpus.items()) + [(4, None)], schema)
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ["spark", "join"]).collect()}

    n_docs, avgdl = 4.0, (3 + 2 + 4) / 3  # N counts all ids; avgdl non-null only
    k1, b = 1.2, 0.75

    def score(tf, dl, df_t):
        idf = math.log(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert set(got) == {1, 2}
    assert got[1] == round(score(2, 3, 2) + score(1, 3, 1), 6)
    assert got[2] == round(score(1, 2, 2), 6)


def test_bm25_topk_order_and_cut(spark):
    """bm25_topk orders by (bm25 DESC, doc_id ASC) and cuts to k."""
    from datalake_nba_dmc_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [(i, "alpha beta") for i in range(5)] + [(9, "alpha alpha alpha")],
        ["doc_id", "text"],
    )
    rows = bm25_topk(df, ["alpha"], topk=3).collect()
    assert rows[0]["doc_id"] == 9  # highest tf first
    assert [r["doc_id"] for r in rows[1:]] == [0, 1]  # tie → id ASC


def test_js_divergence_hand_computed(spark):
    """JSD matches a hand-computed reference on a tiny two-source corpus
    (micro-nat integer terms, identical-corpora → 0, disjoint → ln 2)."""
    import math

    from datalake_nba_dmc_spark.operators.text import js_divergence

    def r_half_up(x):  # Spark/DuckDB round: half away from zero, not banker's
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    def r6(x):
        return r_half_up(x * 1e6) / 1e6

    def ref_jsd(ca, cb):
        ta, tb = sum(ca.values()), sum(cb.values())
        sa = sum(
            c * r_half_up(math.log((2 * (c / ta)) / (c / ta + cb.get(w, 0) / tb)) * 1e6)
            for w, c in ca.items()
        )
        sb = sum(
            c * r_half_up(math.log((2 * (c / tb)) / (ca.get(w, 0) / ta + c / tb)) * 1e6)
            for w, c in cb.items()
        )
        ka, kb = sa / (ta * 1e6), sb / (tb * 1e6)
        return r6(ka), r6(kb), r6((ka + kb) / 2)

    df = spark.createDataFrame(
        [
            (1, "a", "x x y z"),
            (2, "a", "y y"),
            (3, "b", "x z z w"),
            (4, "b", None),
            (5, "c", "ignored entirely"),
        ],
        ["doc_id", "source", "text"],
    )
    row = js_divergence(df, "a", "b").collect()[0]
    ka, kb, jsd = ref_jsd({"x": 2, "y": 3, "z": 1}, {"x": 1, "z": 2, "w": 1})
    assert (row["n_tokens_a"], row["n_tokens_b"]) == (6, 4)
    assert (row["kl_a"], row["kl_b"], row["jsd"]) == (ka, kb, jsd)

    # identical corpora → exactly 0; fully disjoint → exactly ln 2
    same = spark.createDataFrame(
        [(1, "a", "p q r"), (2, "b", "p q r")], ["doc_id", "source", "text"]
    )
    assert js_divergence(same, "a", "b").collect()[0]["jsd"] == 0.0
    disj = spark.createDataFrame(
        [(1, "a", "p p"), (2, "b", "q q")], ["doc_id", "source", "text"]
    )
    assert js_divergence(disj, "a", "b").collect()[0]["jsd"] == r6(math.log(2))


def test_bm25_multiquery_matches_single_query_scores(spark):
    """bm25_multiquery must equal running bm25_scores per query: the
    batched corpus-shared tf/df path is an optimization, not a semantics
    change. Also pins set-semantics on duplicated query terms and the
    per-query rank cut."""
    from datalake_nba_dmc_spark.operators.text import bm25_multiquery, bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "spark join window join"),
            (2, "customer stream batch stream stream"),
            (3, "spark spark spark filter"),
            (4, "window customer join"),
            (5, None),
            (6, ""),
        ],
        "doc_id long, text string",
    )
    workload = [
        ("qa", "spark join"),
        ("qb", "customer stream stream"),  # dup term → set semantics
        ("qc", "absentterm"),
    ]
    qdf = spark.createDataFrame(workload, ["query_id", "query_text"])
    multi = {
        (r["query_id"], r["doc_id"]): r["bm25"]
        for r in bm25_multiquery(docs, qdf).collect()
    }
    for qid, qtext in workload:
        single = {
            r["doc_id"]: r["bm25"]
            for r in bm25_scores(docs, sorted(set(qtext.split()))).collect()
        }
        got = {d: s for (q, d), s in multi.items() if q == qid}
        assert got == single, qid
    assert not {q for q, _ in multi if q == "qc"}  # no-match query → no rows
    # rank cut: top-1 per query, deterministic tiebreak
    top1 = {
        r["query_id"]: (r["doc_id"], r["rank"])
        for r in bm25_multiquery(docs, qdf, topk=1).collect()
    }
    assert set(top1) == {"qa", "qb"} and all(v[1] == 1 for v in top1.values())
