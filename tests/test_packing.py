"""Unit tests: training-sequence packing (distributed global prefix sum)."""

from __future__ import annotations

import pytest

from datalake_nba_dmc_spark.operators.packing import pack_sequences


def _docs(spark, counts: dict[int, int]):
    rows = [(i, " ".join(f"d{i}t{j}" for j in range(n))) for i, n in counts.items()]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _sequential_reference(counts: dict[int, int], L: int):
    """Driver-side sequential replay: the semantics pack_sequences must
    reproduce distributively."""
    out, off = [], 0
    for i in sorted(counts):
        n = counts[i]
        if n <= 0:
            continue
        start, end = off, off + n
        s = start // L
        while s * L < end:
            ps, pe = max(start, s * L), min(end, (s + 1) * L)
            out.append((i, s, ps - start, ps - s * L, pe - ps, n))
            s += 1
        off = end
    return sorted(out)


def _collect(df):
    return sorted(
        (r.doc_id, r.seq_id, r.doc_offset, r.seq_offset, r.piece_len, r.n_tokens)
        for r in df.collect()
    )


def test_pack_matches_sequential_reference(spark):
    counts = {1: 3, 2: 5, 3: 1, 5: 9, 8: 2, 13: 4, 21: 7}
    got = _collect(pack_sequences(_docs(spark, counts), seq_len=4))
    assert got == _sequential_reference(counts, 4)


def test_pack_boundary_cases(spark):
    # exact-fit docs, a doc spanning MANY sequences, gaps in ids,
    # zero-token / NULL docs consume no offset
    counts = {10: 4, 11: 12, 40: 4}
    df = _docs(spark, counts)
    extra = spark.createDataFrame(
        [(12, ""), (13, None), (14, "   ")], ["doc_id", "text"]
    )
    got = _collect(pack_sequences(df.unionByName(extra), seq_len=4))
    assert got == _sequential_reference(counts, 4)
    # doc 11 (12 tokens) fills sequences 1,2,3 exactly
    d11 = [g for g in got if g[0] == 11]
    assert [(g[1], g[3], g[4]) for g in d11] == [(1, 0, 4), (2, 0, 4), (3, 0, 4)]


def test_pack_invariants_random(spark):
    import random

    rng = random.Random(9)
    counts = {i: rng.randint(1, 17) for i in rng.sample(range(1000), 60)}
    L = 8
    got = _collect(pack_sequences(_docs(spark, counts), seq_len=L, num_buckets=7))
    assert got == _sequential_reference(counts, L)
    total = sum(counts.values())
    # every sequence except the last is exactly full
    per_seq: dict[int, int] = {}
    for _i, s, _do, _so, pl, _n in got:
        per_seq[s] = per_seq.get(s, 0) + pl
    last = max(per_seq)
    assert all(v == L for s, v in per_seq.items() if s != last)
    assert sum(per_seq.values()) == total
    # per-doc pieces partition [0, n)
    per_doc: dict[int, list] = {}
    for i, _s, do, _so, pl, n in got:
        per_doc.setdefault(i, []).append((do, pl, n))
    for i, pieces in per_doc.items():
        pieces.sort()
        assert pieces[0][0] == 0
        for (a, al, _), (b, _, _) in zip(pieces, pieces[1:]):
            assert a + al == b
        assert pieces[-1][0] + pieces[-1][1] == counts[i]


def test_pack_no_corpus_wide_single_partition_window(spark):
    """The only unpartitioned window must be the <=num_buckets bucket
    table — the document-scale windows are all partitioned by bucket."""
    df = _docs(spark, {i: 3 for i in range(1, 40)})
    plan = pack_sequences(df, seq_len=4)._jdf.queryExecution().executedPlan().toString()
    import re

    windows = re.findall(r"Window \[[^\n]*", plan)
    assert windows, "expected Window nodes in the packing plan"

    def is_unpartitioned(w: str) -> bool:
        # windowspecdefinition(partCol1, ..., sortCol ASC, frame) — when the
        # FIRST argument already carries a sort direction there is no
        # partition spec at all
        inner = w.split("windowspecdefinition(", 1)[1]
        first = inner.split(",", 1)[0]
        return "ASC" in first or "DESC" in first

    unpart = [w for w in windows if is_unpartitioned(w)]
    # exactly one unpartitioned window, and it is the <=num_buckets bucket
    # offsets table (sums _bn), never the corpus-scale running sum
    assert len(unpart) == 1 and "sum(_bn" in unpart[0], unpart
    assert any("sum(_n#" in w and not is_unpartitioned(w) for w in windows)

    with pytest.raises(ValueError, match="positive"):
        pack_sequences(df, seq_len=0)


def test_pack_duplicated_rows_pack_twice(spark):
    """Duplicate-data law (the dup-audit shape): a corpus containing the
    same document row TWICE packs its tokens twice — the output multiset
    equals a sequential replay over the duplicated row list. Regression
    pin for the RANGE-frame trap: the default window frame hands ORDER BY
    peers the same running total, double-assigning one span and covering
    nothing with the other."""
    rows = [(i, " ".join(f"t{j}" for j in range(n))) for i, n in
            [(1, 3), (2, 5), (3, 2)]]
    df = spark.createDataFrame(rows + rows, ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.seq_id, r.doc_offset, r.seq_offset, r.piece_len, r.n_tokens)
        for r in pack_sequences(df, seq_len=4).collect()
    )
    # sequential replay over the duplicated list, id-ordered, row by row
    L, out, off = 4, [], 0
    for i, n in sorted([(1, 3), (1, 3), (2, 5), (2, 5), (3, 2), (3, 2)]):
        start, end = off, off + n
        s = start // L
        while s * L < end:
            ps, pe = max(start, s * L), min(end, (s + 1) * L)
            out.append((i, s, ps - start, ps - s * L, pe - ps, n))
            s += 1
        off = end
    assert got == sorted(out)
    # every token slot [0, 20) is covered exactly once across sequences
    covered = sorted(
        (seq * 4 + so + k)
        for _i, seq, _do, so, pl, _n in got
        for k in range(pl)
    )
    assert covered == list(range(20))


def test_pack_sequences_extreme_and_negative_ids(spark):
    """ADVICE r9: the bucket split is min-shifted double arithmetic —
    xxhash64-scale ids no longer wrap int64 (which scrambled bucket
    order silently) and all-negative id domains keep id order. The
    span assignment must equal the sequential replay in id order."""
    from datalake_nba_dmc_spark.operators.packing import pack_sequences

    cases = [
        [(-(2**62) + 7, 3), (-5, 5), (-1, 2)],          # all negative
        [(2**62 + 11, 4), (2**62 + 12, 3), (2**63 - 2, 5)],  # near-overflow
        [(-(2**61), 2), (0, 3), (2**61, 4)],            # huge span
    ]
    for ids in cases:
        rows = [(i, " ".join(f"t{j}" for j in range(n))) for i, n in ids]
        got = sorted(
            (r.doc_id, r.seq_id, r.doc_offset, r.seq_offset, r.piece_len)
            for r in pack_sequences(
                spark.createDataFrame(rows, ["doc_id", "text"]), seq_len=4
            ).collect()
        )
        L, out, off = 4, [], 0
        for i, n in sorted(ids):
            start, end = off, off + n
            s = start // L
            while s * L < end:
                ps, pe = max(start, s * L), min(end, (s + 1) * L)
                out.append((i, s, ps - start, ps - s * L, pe - ps))
                s += 1
            off = end
        assert got == sorted(out)


def test_pack_sequences_rejects_non_integral_id(spark):
    import pytest

    from datalake_nba_dmc_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([("a", "x y z")], ["doc_id", "text"])
    with pytest.raises(TypeError, match="integral id column"):
        pack_sequences(df, seq_len=4)
