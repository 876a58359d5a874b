"""Unit tests: REAL YUV4MPEG2 frame access (parse / iterate / stats)."""

from __future__ import annotations

import numpy as np
import pytest

from datalake_nba_dmc_spark.operators.y4m import (
    encode_y4m,
    iter_y4m_frames,
    parse_y4m_header,
    synthesize_y4m_media,
    y4m_frame_stats,
)


def _frames(n, h=4, w=6, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, h, w), dtype=np.uint8)


def test_parse_header_params_and_defaults():
    f = _frames(2)
    p = encode_y4m(f, fps=(25, 1), colorspace="420")
    w, h, fn, fd, cs, fb, off = parse_y4m_header(p)
    assert (w, h, fn, fd, cs) == (6, 4, 25, 1, "420")
    assert fb == 6 * 4 * 3 // 2
    assert p[off : off + 5] == b"FRAME"
    # colorspace variants change the frame stride
    assert parse_y4m_header(encode_y4m(f, colorspace="444"))[5] == 6 * 4 * 3
    assert parse_y4m_header(encode_y4m(f, colorspace="mono"))[5] == 6 * 4
    # C tag defaults to 420 when absent
    bare = b"YUV4MPEG2 W6 H4 F30:1\n"
    assert parse_y4m_header(bare)[4] == "420"


def test_parse_header_rejects():
    for payload, frag in [
        (b"RIFF not a y4m", "not a Y4M"),
        (None, "not a Y4M"),
        (b"YUV4MPEG2 W6 H4 F30:1", "unterminated"),
        (b"YUV4MPEG2 H4 F30:1\n", "missing/invalid dimensions"),
        (b"YUV4MPEG2 W6 H0 F30:1\n", "missing/invalid dimensions"),
        (b"YUV4MPEG2 W5 H4 C420\n", "even dimensions"),
        (b"YUV4MPEG2 W6 H4 C411\n", "unsupported Y4M colorspace"),
        (b"YUV4MPEG2 W6x H4\n", "malformed header token"),
        (b"YUV4MPEG2 W6 H4 F0:1\n", "invalid frame rate"),
    ]:
        with pytest.raises(ValueError, match=frag):
            parse_y4m_header(payload)


def test_iter_frames_walks_and_validates():
    f = _frames(5)
    p = encode_y4m(f)
    offs = list(iter_y4m_frames(p))
    assert [i for i, _ in offs] == [0, 1, 2, 3, 4]
    # frame data round-trips byte-exact at the yielded offsets
    for i, data in offs:
        y = np.frombuffer(p, dtype=np.uint8, count=24, offset=data).reshape(4, 6)
        assert np.array_equal(y, f[i])
    # FRAME headers may carry parameters — still walks
    tagged = p.replace(b"FRAME\n", b"FRAME Xtag\n")
    assert len(list(iter_y4m_frames(tagged))) == 5
    with pytest.raises(ValueError, match="truncated frame"):
        list(iter_y4m_frames(p[:-3]))
    bad = bytearray(p)
    at = bad.index(b"FRAME", offs[0][1])  # corrupt the SECOND marker
    bad[at : at + 5] = b"FRANE"
    with pytest.raises(ValueError, match="bad FRAME marker"):
        list(iter_y4m_frames(bytes(bad)))


def test_frame_stats_exact_and_sampled(spark):
    f = _frames(7, h=4, w=4)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_y4m(f))),
            (2, bytearray(b"garbage, not video")),
            (3, None),
        ],
        "media_id long, payload binary",
    )
    got = {
        (r.media_id, r.frame_idx): r
        for r in y4m_frame_stats(df, every_n=3).collect()
    }
    assert set(got) == {(1, 0), (1, 3), (1, 6)}  # every 3rd frame; junk dropped
    for idx in (0, 3, 6):
        r = got[(1, idx)]
        s, n = int(f[idx].sum()), 16
        assert r.n_frames == 7
        assert r.y_mean_micro == (2 * s * 1_000_000 + n) // (2 * n)


def test_synthesize_y4m_replayable_from_bytes(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 100), (2, "ab"), (3, None), (4, "")], ["doc_id", "text"]
    )
    media = synthesize_y4m_media(docs, width=8, height=8, cap_frames=16)
    rows = {r.media_id: r for r in media.collect()}
    assert set(rows) == {1, 2}
    # doc 1: 100 bytes -> 2 frames of 64 (padded); doc 2: 1 frame
    stats = {
        (r.media_id, r.frame_idx): r
        for r in y4m_frame_stats(media, every_n=1).collect()
    }
    assert {k for k in stats} == {(1, 0), (1, 1), (2, 0)}
    x = ord("x")
    assert stats[(1, 0)].y_mean_micro == (2 * (64 * x) * 10**6 + 64) // (2 * 64)
    assert stats[(1, 1)].y_mean_micro == (2 * (36 * x) * 10**6 + 64) // (2 * 64)
    ab = ord("a") + ord("b")
    assert stats[(2, 0)].y_mean_micro == (2 * ab * 10**6 + 64) // (2 * 64)
    # the luma plane IS the document bytes — the staged oracle's byte-walk
    p = bytes(rows[2].payload)
    _, _, _, _, _, _, off = parse_y4m_header(p)
    data = p.index(b"\n", off) + 1
    assert p[data : data + 2] == b"ab" and p[data + 2 : data + 64] == bytes(62)


def test_frame_stats_rejects_bad_every_n(spark):
    """ADVICE r9: every_n is validated at plan time — 0 would raise
    inside the executor task (zero slice step) and a negative value
    would silently sample in reverse."""
    import pytest

    from datalake_nba_dmc_spark.operators.y4m import y4m_frame_stats

    media = spark.createDataFrame([], "media_id long, payload binary")
    for bad in (0, -1):
        with pytest.raises(ValueError, match="every_n"):
            y4m_frame_stats(media, every_n=bad)
