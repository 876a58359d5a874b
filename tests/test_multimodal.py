"""Unit tests: multimodal column plumbing (binary payload + mapInPandas)."""

from __future__ import annotations

from datalake_nba_dmc_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    documents_as_media,
    extract_features,
    frame_sample_plan,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello"), (2, "a much longer document body"), (3, None)],
        ["doc_id", "text"],
    )


def test_documents_as_media_schema_and_bytes(spark):
    out = documents_as_media(_docs(spark))
    assert out.columns == ["media_id", "payload", "media_type", "width", "height", "n_bytes"]
    rows = {r["media_id"]: r for r in out.collect()}
    assert bytes(rows[1]["payload"]) == b"hello"
    assert rows[1]["n_bytes"] == 5
    assert rows[3]["payload"] is None and rows[3]["n_bytes"] is None


def test_extract_features_best_effort_dims(spark):
    """REAL decode where possible, header dims where only the header
    parses, NULL dims otherwise — never invented dimensions."""
    import struct

    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import encode_png

    png = encode_png(np.zeros((12, 34, 1), dtype=np.uint8))
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4  # header only
    media = spark.createDataFrame(
        [
            (1, bytearray(png), "image", None, None, len(png)),
            (2, bytearray(gif), "image", None, None, len(gif)),
            (3, bytearray(b"not an image"), "image", None, None, 12),
            (4, None, "image", None, None, None),
        ],
        "media_id long, payload binary, media_type string, "
        "width int, height int, n_bytes long",
    )
    out = extract_features(media)
    assert out.schema == FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (34, 12)  # real decode
    assert (rows[2]["width"], rows[2]["height"]) == (320, 200)  # header walk
    assert rows[3]["width"] is None and rows[3]["height"] is None
    assert rows[4]["width"] is None  # null payload survives the batch path


def test_resize_images_real_pixels(spark):
    """REAL resize path: PNG payloads decode, resize, re-encode; resizing
    to the source dims is pixel-identical (nearest-neighbor identity);
    non-decodable payloads are quarantined in-band with NULL payload."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import (
        decode_image,
        encode_png,
        resize_images,
    )

    rng_px = (np.arange(12 * 10, dtype=np.uint8) * 7 % 251).reshape(12, 10, 1)
    rgb_px = (np.arange(6 * 4 * 3, dtype=np.uint8) * 11 % 253).reshape(6, 4, 3)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_png(rng_px)), "image", 10, 12, 0),
            (2, bytearray(encode_png(rgb_px)), "image", 4, 6, 0),
            (3, bytearray(b"not an image at all"), "image", None, None, 19),
            (4, None, "image", None, None, None),
        ],
        "media_id long, payload binary, media_type string, "
        "width int, height int, n_bytes long",
    )
    # identity resize: same dims → byte-decoded pixels identical
    out = {
        r["media_id"]: r
        for r in resize_images(media, target_w=10, target_h=12).collect()
    }
    assert np.array_equal(decode_image(bytes(out[1]["payload"])), rng_px)
    assert out[3]["payload"] is None and out[3]["width"] is None
    assert out[4]["payload"] is None

    # downsample by 2: nearest picks source pixel (2i, 2j)
    down = {
        r["media_id"]: r
        for r in resize_images(media, target_w=5, target_h=6).collect()
    }
    got = decode_image(bytes(down[1]["payload"]))
    assert np.array_equal(got, rng_px[::2, ::2])
    assert down[1]["width"] == 5 and down[1]["height"] == 6
    # RGB channel count survives the round trip
    got_rgb = decode_image(bytes(down[2]["payload"]))
    assert got_rgb.shape == (6, 5, 3)


def test_resize_pixels_bilinear_vectors():
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import _resize_pixels

    # 2×2 → 4×4 bilinear with half-pixel centers: corners keep values,
    # mid positions interpolate exactly
    px = np.array([[0, 100], [200, 100]], dtype=np.uint8)[:, :, None]
    out = _resize_pixels(px, 4, 4, method="bilinear")
    assert out.shape == (4, 4, 1)
    assert out[0, 0, 0] == 0 and out[0, 3, 0] == 100
    assert out[3, 0, 0] == 200 and out[3, 3, 0] == 100
    # identity bilinear == source (sample points hit pixel centers)
    assert np.array_equal(_resize_pixels(px, 2, 2, method="bilinear"), px)


def test_frame_sample_plan(spark):
    media = documents_as_media(_docs(spark)).filter("media_id = 1")  # n_bytes=5
    out = frame_sample_plan(media, every_n=2).collect()
    # n_frames = 5 % 300 + 1 = 6 → indices 0,2,4
    assert sorted(r["frame_idx"] for r in out) == [0, 2, 4]


def test_audio_waveform_stats_match_numpy(spark):
    import math

    from datalake_nba_dmc_spark.operators.multimodal import (
        audio_waveform_stats,
        documents_as_media,
    )

    df = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "zz")], "doc_id long, text string"
    )
    media = documents_as_media(df)
    got = {r.media_id: r for r in audio_waveform_stats(media, 8000).collect()}
    assert set(got) == {1, 3}  # empty payload emits no stats row
    r1 = got[1]  # bytes 97,98,99
    assert (r1.n_samples, r1.peak) == (3, 99)
    assert abs(r1.duration_s - 3 / 8000.0) < 1e-15
    assert abs(r1.rms - math.sqrt((97**2 + 98**2 + 99**2) / 3)) < 1e-12
    assert got[3].peak == 122 and got[3].n_samples == 2


def test_parse_image_header_real_formats():
    import struct

    from datalake_nba_dmc_spark.operators.multimodal import parse_image_header

    png = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + struct.pack(
        ">IIBBBBB", 640, 480, 8, 6, 0, 0, 0
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 100, -50) + b"\x00" * 4
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 768, 1024)
        + b"\x00" * 10
    )
    assert parse_image_header(png) == ("png", 640, 480)
    assert parse_image_header(gif) == ("gif", 320, 200)
    assert parse_image_header(bmp) == ("bmp", 100, 50)  # top-down height abs'd
    assert parse_image_header(jpeg) == ("jpeg", 1024, 768)
    assert parse_image_header(b"plain text payload") == ("unknown", None, None)
    assert parse_image_header(None) == ("unknown", None, None)


def test_parse_jpeg_fill_bytes_and_tail_sof():
    """JPEG spec allows runs of 0xFF fill bytes before a marker, and a SOF
    segment may end exactly at the payload tail — both must still parse
    (ADVICE r3: the old scan read a fill byte as a marker with a bogus
    length and its loop bound skipped a tail-flush SOF)."""
    import struct

    from datalake_nba_dmc_spark.operators.multimodal import parse_image_header

    # fill bytes (0xFF 0xFF) padding before APP0 and before SOF0
    filled = (
        b"\xff\xd8"
        + b"\xff\xff\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 480, 640)
        + b"\x00" * 10
    )
    assert parse_image_header(filled) == ("jpeg", 640, 480)
    # SOF dimensions end exactly at the payload tail (no trailing bytes)
    tail = (
        b"\xff\xd8"
        + b"\xff\xc2" + struct.pack(">H", 8) + b"\x08" + struct.pack(">HH", 33, 44)
    )
    assert parse_image_header(tail) == ("jpeg", 44, 33)
    # restart markers (standalone, no length) are skipped; EOI terminates
    rst = b"\xff\xd8" + b"\xff\xd0" * 3 + b"\xff\xd9"
    assert parse_image_header(rst) == ("jpeg", None, None)


def test_extract_image_headers_distributed(spark):
    import struct

    from datalake_nba_dmc_spark.operators.multimodal import extract_image_headers

    png = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + struct.pack(
        ">IIBBBBB", 12, 34, 8, 6, 0, 0, 0
    )
    df = spark.createDataFrame(
        [(1, png), (2, b"not an image here")],
        "media_id long, payload binary",
    )
    got = {r.media_id: (r.format, r.width, r.height) for r in extract_image_headers(df).collect()}
    assert got == {1: ("png", 12, 34), 2: ("unknown", None, None)}


def _block_image_png(block_vals, encode=None):
    """64 block values → a 16×16 grayscale image of 2×2 constant blocks,
    encoded as a real PNG (or via ``encode``) — each 2×2 block maps
    exactly onto one cell of the aHash 8×8 grid."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import encode_png

    px = np.asarray(block_vals, dtype=np.uint8).reshape(8, 8)
    px = np.repeat(np.repeat(px, 2, axis=0), 2, axis=1)[:, :, None]
    return (encode or encode_png)(px)


def test_perceptual_hash_and_near_dups(spark):
    """REAL pixel phash: hamming structure over crafted block images, and
    re-encode invariance (PNG vs BMP of identical pixels hash equal)."""
    from datalake_nba_dmc_spark.operators.multimodal import (
        encode_bmp,
        perceptual_hash,
        phash_near_dups,
    )

    base = [10 if i % 2 == 0 else 200 for i in range(64)]
    near = list(base)
    near[0] = 200  # one block crosses the global mean -> 1-bit hamming
    far = [200 if i % 2 == 0 else 10 for i in range(64)]  # inverted pattern
    df = spark.createDataFrame(
        [
            (1, bytearray(_block_image_png(base))),
            (2, bytearray(_block_image_png(near))),
            (3, bytearray(_block_image_png(far))),
            (4, bytearray(_block_image_png(base, encode=encode_bmp))),
            (5, None),  # null payload quarantined
            (6, bytearray(b"\x89PNG but actually garbage")),  # quarantined
        ],
        "media_id long, payload binary",
    )
    sig = {r.media_id: r.phash for r in perceptual_hash(df).collect()}
    assert set(sig) == {1, 2, 3, 4}
    assert sig[1] == sig[4]  # SAME pixels, different FORMAT → same hash
    assert bin((sig[1] ^ sig[2]) & ((1 << 64) - 1)).count("1") == 1
    assert bin((sig[1] ^ sig[3]) & ((1 << 64) - 1)).count("1") == 64

    edges = {
        (r.id_a, r.id_b): r.hamming for r in phash_near_dups(df).collect()
    }
    assert edges == {(1, 2): 1, (1, 4): 0}  # star edges to min id; 3 is alone


def test_ahash_block_grid_vectors():
    """_ahash64 unit vectors: ragged block boundaries, channel reduction,
    tiny-image upsampling."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import _ahash64

    # uniform image → all block means equal the global mean → no bit set
    assert _ahash64(np.full((20, 20, 1), 7, dtype=np.uint8)) == 0
    # left half bright, right half dark on a non-multiple-of-8 width:
    # bits = 4 bright columns per row → 32 bits set
    px = np.zeros((10, 10, 1), dtype=np.uint8)
    px[:, :5] = 255
    h = _ahash64(px) & ((1 << 64) - 1)
    assert bin(h).count("1") == 32
    # grayscale of an RGB image = mean of channels: a pure-red half reads
    # as 85 vs 0 → same 32-bit pattern
    rgb = np.zeros((10, 10, 3), dtype=np.uint8)
    rgb[:, :5, 0] = 255
    assert (_ahash64(rgb) & ((1 << 64) - 1)) == h
    # tiny 2×2 image upsamples deterministically (no crash, stable value)
    tiny = np.array([[0, 255], [255, 0]], dtype=np.uint8)[:, :, None]
    assert _ahash64(tiny) == _ahash64(np.repeat(np.repeat(tiny, 4, 0), 4, 1))


def test_phash_reencode_certificate(spark):
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import (
        encode_png,
        phash_reencode_certificate,
        synthesize_png_media,
    )

    docs = spark.createDataFrame(
        [(1, "hello world " * 40), (2, "b" * 10), (3, None), (4, "")],
        ["doc_id", "text"],
    )
    media = synthesize_png_media(docs, width=16, cap=256)
    rows = {r["media_id"]: r for r in media.collect()}
    assert set(rows) == {1, 2}  # null/empty dropped
    assert rows[2]["width"] == 16 and rows[2]["height"] == 1  # padded row
    cert = {r["media_id"]: r for r in phash_reencode_certificate(media).collect()}
    assert set(cert) == {1, 2}
    assert all(r["hamming_bits"] == 0 and r["phash_invariant"] for r in cert.values())

    # a non-decodable payload is quarantined out of the certificate
    bad = spark.createDataFrame(
        [(9, bytearray(b"JUNK")), (10, bytearray(encode_png(np.full((9, 9, 1), 3, np.uint8))))],
        "media_id long, payload binary",
    )
    got = phash_reencode_certificate(bad).collect()
    assert [r["media_id"] for r in got] == [10]


def test_parse_wav_header_crafted_files(spark):
    """Real RIFF walking on crafted byte-exact WAV files: canonical
    44-byte layout, a non-canonical layout with a JUNK chunk before fmt,
    an odd-sized (word-aligned) chunk, a truncated data chunk, and
    non-WAV payloads."""
    import struct

    from datalake_nba_dmc_spark.operators.multimodal import (
        extract_audio_headers,
        parse_wav_header,
    )

    def wav(chunks):
        body = b"WAVE" + b"".join(chunks)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def chunk(cid, payload):
        return cid + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) % 2 else b""
        )

    fmt16k_mono = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    data = b"\x00\x01" * 16000  # 1 s of 16-bit mono @16 kHz
    canonical = wav([chunk(b"fmt ", fmt16k_mono), chunk(b"data", data)])
    assert parse_wav_header(canonical) == ("wav", 1, 16000, 16, 1.0)

    # JUNK chunk (odd size → alignment padding) before fmt
    junky = wav(
        [chunk(b"JUNK", b"\x00" * 7), chunk(b"fmt ", fmt16k_mono), chunk(b"data", data)]
    )
    assert parse_wav_header(junky) == ("wav", 1, 16000, 16, 1.0)

    # stereo 8-bit 8kHz, half-second
    fmt8k_st = struct.pack("<HHIIHH", 1, 2, 8000, 16000, 2, 8)
    st = wav([chunk(b"fmt ", fmt8k_st), chunk(b"data", b"\x80" * 8000)])
    assert parse_wav_header(st) == ("wav", 2, 8000, 8, 0.5)

    # data chunk header claims more bytes than present → duration from
    # the bytes actually there
    trunc = canonical[: len(canonical) - 16000]
    fmt_, ch, rate, bits, dur = parse_wav_header(trunc)
    assert (fmt_, ch, rate, bits) == ("wav", 1, 16000, 16)
    assert dur is not None and 0.4 < dur < 0.6

    assert parse_wav_header(b"\x89PNG\r\n\x1a\nxxxx") == (
        "unknown", None, None, None, None,
    )
    assert parse_wav_header(None) == ("unknown", None, None, None, None)
    assert parse_wav_header(b"RIFFxxxx") == ("unknown", None, None, None, None)

    df = spark.createDataFrame(
        [(1, bytearray(canonical)), (2, bytearray(b"not audio"))],
        "media_id long, payload binary",
    )
    got = {
        r["media_id"]: (r["format"], r["channels"], r["sample_rate"],
                        r["bits_per_sample"], r["duration_s"])
        for r in extract_audio_headers(df).collect()
    }
    assert got[1] == ("wav", 1, 16000, 16, 1.0)
    assert got[2] == ("unknown", None, None, None, None)


def test_png_roundtrip_every_filter_exact():
    """decode_png must invert every scanline filter (None/Sub/Up/Average/
    Paeth) bit-exactly, for gray, gray+alpha, RGB and RGBA — verified
    against the in-repo encoder on deterministic pseudo-random images.
    Pure-Python test (no Spark session needed)."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):
        img = rng.randint(0, 256, size=(13, 9, ch), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            out = decode_png(encode_png(img, filter_types=filters))
            assert out.shape == (13, 9, ch)
            assert (out == img).all(), (ch, filters)


def test_png_decode_rejects_unsupported():
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from datalake_nba_dmc_spark.operators.multimodal import decode_png, encode_png

    with _pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with _pytest.raises(ValueError):
        decode_png(None)
    # 16-bit depth header must be rejected explicitly, not mis-decoded
    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    bad_ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    body = struct.pack(">I", len(bad_ihdr)) + b"IHDR" + bad_ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + bad_ihdr) & 0xFFFFFFFF
    )
    with _pytest.raises(ValueError):
        decode_png(good[:8] + body + good[8 + 12 + 13 :])


def test_png_pixel_stats_spark_path(spark):
    """The mapInPandas pixel-stats path: real decode on the executors,
    NULL-stats + error string for corrupt payloads, exact mean/std."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import encode_png, png_pixel_stats

    rng = np.random.RandomState(11)
    img_a = rng.randint(0, 256, size=(6, 4, 3), dtype=np.uint8)
    img_b = np.full((2, 2, 1), 7, dtype=np.uint8)
    rows = [
        (1, bytearray(encode_png(img_a, filter_types=[0, 4]))),
        (2, bytearray(encode_png(img_b))),
        (3, bytearray(b"garbage bytes")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in png_pixel_stats(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (4, 6, 3)
    assert got[1]["mean_px"] == round(float(img_a.mean()), 6)
    assert got[1]["std_px"] == round(float(img_a.std()), 6)
    assert (got[2]["mean_px"], got[2]["std_px"]) == (7.0, 0.0)
    assert got[3]["width"] is None and got[3]["decode_error"]
    assert got[4]["decode_error"]


def test_bmp_roundtrip_gray_and_rgb_exact():
    """decode_bmp must invert encode_bmp bit-exactly: bottom-up row order,
    4-byte row padding (odd widths), 8-bit gray palettes and 24-bit BGR.
    Pure-Python test."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.RandomState(3)
    for ch in (1, 3):
        for w in (1, 3, 4, 7):  # odd widths exercise row padding
            img = rng.randint(0, 256, size=(5, w, ch), dtype=np.uint8)
            out = decode_bmp(encode_bmp(img))
            assert out.shape == (5, w, ch), (ch, w, out.shape)
            assert (out == img).all(), (ch, w)


def test_bmp_decode_rejects_unsupported():
    import numpy as np
    import pytest as _pytest

    from datalake_nba_dmc_spark.operators.multimodal import decode_bmp, encode_bmp

    with _pytest.raises(ValueError):
        decode_bmp(b"PK\x03\x04 definitely not a bitmap padded to length....representative")
    with _pytest.raises(ValueError):
        decode_bmp(None)
    # flip the compression field of a valid file → explicit rejection
    good = bytearray(encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    good[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with _pytest.raises(ValueError):
        decode_bmp(bytes(good))


def test_bmp_header_parse_agrees_with_pixel_decode():
    """The r6 header sniffer and the new pixel decoder must report the
    same dimensions on the same bytes."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
        parse_image_header,
    )

    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    payload = encode_bmp(img)
    fmt, w, h = parse_image_header(payload)
    assert (fmt, w, h) == ("bmp", 4, 5)
    assert decode_bmp(payload).shape == (5, 4, 3)


def test_png_decode_multi_idat_chunks():
    """Real-world encoders split IDAT across many chunks; the decoder must
    concatenate them before inflating. Split a valid single-IDAT file
    into 7-byte IDAT chunks and decode bit-exactly."""
    import struct
    import zlib

    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import decode_png, encode_png

    img = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    whole = encode_png(img, filter_types=[0, 1, 2, 4])
    # locate the single IDAT chunk
    pos = 8
    while whole[pos + 4 : pos + 8] != b"IDAT":
        pos += 12 + struct.unpack(">I", whole[pos : pos + 4])[0]
    ln = struct.unpack(">I", whole[pos : pos + 4])[0]
    body = whole[pos + 8 : pos + 8 + ln]
    head, tail = whole[:pos], whole[pos + 12 + ln :]

    def chunk(ctype, b):
        return struct.pack(">I", len(b)) + ctype + b + struct.pack(
            ">I", zlib.crc32(ctype + b) & 0xFFFFFFFF
        )

    split = b"".join(chunk(b"IDAT", body[i : i + 7]) for i in range(0, len(body), 7))
    assert (decode_png(head + split + tail) == img).all()


def test_png_roundtrip_stats_null_and_empty_payloads_survive(spark):
    """r7 ADVICE: NULL/empty payloads used to kill the whole Arrow task
    (TypeError on bytes(None), ZeroDivisionError on n=0). They must emit
    NULL-stats rows instead — corrupt blobs never kill a scan."""
    from datalake_nba_dmc_spark.operators.multimodal import png_roundtrip_stats

    df = spark.createDataFrame(
        [(1, bytearray(b"hello world")), (2, None), (3, bytearray(b""))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in png_roundtrip_stats(df).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["roundtrip_ok"] is True and rows[1]["height"] == 11
    for mid in (2, 3):
        r = rows[mid]
        assert r["mean_px_micro"] is None and r["roundtrip_ok"] is None


def test_png_palette_roundtrip_every_filter_exact():
    """Palette (color_type 3) decode must expand indices through PLTE
    bit-exactly under every scanline filter, for full and partial
    palettes; out-of-range indices and a missing PLTE raise."""
    import numpy as np
    import pytest as _pytest

    from datalake_nba_dmc_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(19)
    pal = rng.randint(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.randint(0, 256, size=(13, 9), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        out = decode_png(encode_png(idx, filter_types=filters, palette=pal))
        assert out.shape == (13, 9, 3)
        assert (out == pal[idx]).all(), filters
    # partial palette
    pal4 = pal[:4]
    small = (idx % 4).astype(np.uint8)
    assert (decode_png(encode_png(small, palette=pal4)) == pal4[small]).all()
    # index beyond the palette must raise, not wrap or segfault
    with _pytest.raises(ValueError):
        decode_png(encode_png(np.full((2, 2), 9, dtype=np.uint8), palette=pal4))
    # palette PNG with its PLTE chunk stripped must raise
    blob = encode_png(small, palette=pal4)
    plte_at = blob.index(b"PLTE") - 4
    plte_len = 12 + 4 * 3
    with _pytest.raises(ValueError):
        decode_png(blob[:plte_at] + blob[plte_at + plte_len:])


def test_png_palette_roundtrip_stats_spark_path(spark):
    """The palette corpus query's operator: exact stats over the expanded
    RGB samples, NULL/empty payloads emit NULL-stats rows."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import (
        _roundtrip_palette,
        png_palette_roundtrip_stats,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, None), (3, bytearray(b""))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in png_palette_roundtrip_stats(df).collect()}
    assert rows[1]["roundtrip_ok"] is True
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (1, 3, 3)
    pal = _roundtrip_palette()
    vals = pal[np.frombuffer(b"abc", dtype=np.uint8)].astype(np.int64)
    n, s1, s2 = vals.size, int(vals.sum()), int((vals * vals).sum())
    assert rows[1]["mean_px_micro"] == (2 * s1 * 10**6 + n) // (2 * n)
    assert rows[1]["var_px_micro"] == (
        2 * (n * s2 - s1 * s1) * 10**6 + n * n
    ) // (2 * n * n)
    for mid in (2, 3):
        assert rows[mid]["mean_px_micro"] is None
        assert rows[mid]["roundtrip_ok"] is None


# ---------------------------------------------------------------------------
# JPEG codec (operators/jpeg) — r8
# ---------------------------------------------------------------------------


def test_jpeg_entropy_layer_exact_on_arbitrary_coefficients():
    """Huffman + DPCM + RLE/EOB/ZRL + byte stuffing must round-trip
    ARBITRARY coefficient blocks exactly (the layer is lossless by spec;
    only quantization is lossy). Exercises AC codes up to size 10, long
    zero runs (ZRL), all-zero blocks, and negative values."""
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

    rng = np.random.RandomState(23)
    blocks = np.zeros((40, 64), dtype=np.int32)
    for i in range(40):
        if i % 7 == 0:
            continue  # all-zero block → lone EOB
        nz = rng.randint(1, 20)
        pos = rng.choice(64, size=nz, replace=False)
        blocks[i, pos] = rng.randint(-1023, 1024, size=nz)
    blocks[3, 1:] = 0
    blocks[3, 63] = 5  # 62-zero run → multiple ZRLs
    dc, ac = _canonical_codes(*DC_LUMA), _canonical_codes(*AC_LUMA)
    w = _BitWriter()
    pred = 0
    for b in blocks:
        pred = _encode_block(w, b, pred, dc, ac)
    w.flush()
    huff = {(0, 0): _cached_lut(*DC_LUMA), (1, 0): _cached_lut(*AC_LUMA)}
    comps = [{"h": 1, "v": 1, "td": 0, "ta": 0}]
    # _decode_entropy takes UNSTUFFED segments (decode_jpeg's scan
    # extractor strips the 0xFF00 stuffing before dispatch)
    segment = bytes(w.out).replace(b"\xff\x00", b"\xff")
    out = _decode_entropy([segment], comps, 40, 1, 0, huff)
    assert (out[0] == blocks).all()


def test_jpeg_idct_matches_naive_definition():
    """The batched matrix IDCT must match the O(n^4) textbook DCT-III sum
    to float tolerance, and known closed forms (constant block ↔ lone DC)."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.jpeg import _M

    rng = np.random.RandomState(31)
    C = rng.uniform(-500, 500, size=(8, 8))
    fast = _M.T @ C @ _M
    naive = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv / 4.0 * C[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            naive[x, y] = s
    assert np.abs(fast - naive).max() < 1e-9
    dc_only = np.zeros((8, 8))
    dc_only[0, 0] = 8.0 * 42
    assert np.abs(_M.T @ dc_only @ _M - 42.0).max() < 1e-9


def test_jpeg_roundtrip_modes():
    """End-to-end: constant-block gray is EXACT under all-ones quant;
    arbitrary gray is within coefficient-rounding tolerance; color 4:4:4
    within YCbCr-rounding tolerance; 4:2:0 decodes at full resolution;
    restart markers change the framing, not the pixels; quality=10 is
    lossy but bounded."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 256, size=21, dtype=np.uint8)
    const = np.repeat(np.repeat(vals.reshape(-1, 1), 8, 0), 8, 1)
    out = decode_jpeg(encode_jpeg(const, quality=None))
    assert out.shape == (168, 8, 1) and (out[:, :, 0] == const).all()

    img = rng.randint(0, 256, size=(19, 26), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=None))[:, :, 0]
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    rgb = rng.randint(0, 256, size=(17, 22, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quality=None))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3

    out = decode_jpeg(encode_jpeg(rgb, quality=None, subsample=True))
    assert out.shape == rgb.shape  # 4:2:0 upsampled back to full res

    with_rst = decode_jpeg(encode_jpeg(const, quality=None, restart_interval=3))
    assert (with_rst[:, :, 0] == const).all()

    # lossy sanity on content JPEG is FOR (smooth gradients, not noise):
    # strong quantization must stay perceptually close, not explode
    grad = np.add.outer(np.arange(32) * 4, np.arange(48) * 2).astype(np.uint8)
    lossy = decode_jpeg(encode_jpeg(grad, quality=10))[:, :, 0]
    assert np.abs(lossy.astype(int) - grad.astype(int)).mean() <= 12
    crisp = decode_jpeg(encode_jpeg(grad, quality=95))[:, :, 0]
    assert np.abs(crisp.astype(int) - grad.astype(int)).max() <= 6


def test_jpeg_decode_rejects_unsupported():
    import struct

    import numpy as np
    import pytest as _pytest

    from datalake_nba_dmc_spark.operators.jpeg import decode_jpeg, encode_jpeg

    with _pytest.raises(ValueError):
        decode_jpeg(b"definitely not a jpeg")
    with _pytest.raises(ValueError):
        decode_jpeg(None)
    good = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    # flip SOF0 → SOF2 (progressive): must raise, not mis-decode
    sof_at = good.index(b"\xff\xc0")
    with _pytest.raises(ValueError):
        decode_jpeg(good[:sof_at] + b"\xff\xc2" + good[sof_at + 2:])
    # 12-bit precision
    prec_at = sof_at + 4
    with _pytest.raises(ValueError):
        decode_jpeg(good[:prec_at] + bytes([12]) + good[prec_at + 1:])
    # truncated entropy stream
    with _pytest.raises(ValueError):
        decode_jpeg(good[:-8] + b"\xff\xd9")


def test_jpeg_roundtrip_stats_spark_path(spark):
    """The corpus query's operator: exact byte stats via the constant-block
    construction, 48-byte cap, NULL/empty payloads emit NULL-stats rows."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import jpeg_roundtrip_stats

    long_text = bytes(range(32, 127)) + b"tail beyond the cap"
    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, None), (3, bytearray(b"")),
         (4, bytearray(long_text))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in jpeg_roundtrip_stats(df, cap=48).collect()}
    assert rows[1]["roundtrip_ok"] is True
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (8, 24, 1)
    v = np.frombuffer(b"abc", dtype=np.uint8).astype(np.int64)
    n, s1, s2 = 64 * 3, 64 * int(v.sum()), 64 * int((v * v).sum())
    assert rows[1]["mean_px_micro"] == (2 * s1 * 10**6 + n) // (2 * n)
    assert rows[1]["var_px_micro"] == (
        2 * (n * s2 - s1 * s1) * 10**6 + n * n
    ) // (2 * n * n)
    assert rows[4]["height"] == 8 * 48 and rows[4]["roundtrip_ok"] is True
    for mid in (2, 3):
        assert rows[mid]["mean_px_micro"] is None
        assert rows[mid]["roundtrip_ok"] is None


def test_png_adam7_interlace_roundtrip_exact():
    """Adam7: seven independently-filtered passes must scatter back
    bit-exactly for every channel count, filter schedule, and for
    dimensions that leave some passes EMPTY (w or h < pass origin)."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(47)
    for ch in (1, 2, 3, 4):
        for h, w in ((13, 9), (1, 1), (2, 3), (8, 8), (5, 17)):
            img = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
            for filters in ([0], [4, 3, 2, 1, 0]):
                out = decode_png(encode_png(img, filter_types=filters, interlace=True))
                assert out.shape == (h, w, ch)
                assert (out == img).all(), (ch, h, w, filters)


def test_png_16bit_and_low_depth_roundtrips():
    """Depth 16 decodes to the high byte (encoder expands v*257 so the
    normalization round-trips exactly, incl. under Paeth filtering at the
    2-byte filter distance); depths 1/2/4 unpack MSB-first and rescale
    gray to full range while palette indices stay raw."""
    import numpy as np
    import pytest as _pytest

    from datalake_nba_dmc_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(53)
    rgb = rng.randint(0, 256, size=(11, 6, 3), dtype=np.uint8)
    out = decode_png(encode_png(rgb, filter_types=[4, 1, 3], bit_depth=16))
    assert (out == rgb).all()
    for d in (1, 2, 4):
        g = rng.randint(0, 1 << d, size=(9, 13), dtype=np.uint8)
        out = decode_png(encode_png(g, filter_types=[2, 0], bit_depth=d))
        assert (out[:, :, 0] == g * (255 // ((1 << d) - 1))).all(), d
    pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(7, 9), dtype=np.uint8)
    out = decode_png(encode_png(idx, palette=pal, bit_depth=4))
    assert (out == pal[idx]).all()  # indices unscaled, PLTE-expanded
    # spec-invalid combination must raise: 16-bit palette
    import struct
    import zlib as z

    blob = encode_png(idx, palette=pal, bit_depth=4)
    ihdr_at = blob.index(b"IHDR") - 4
    bad_ihdr = struct.pack(">IIBBBBB", 9, 7, 16, 3, 0, 0, 0)
    bad = (
        blob[: ihdr_at + 4] + b"IHDR" + bad_ihdr
        + struct.pack(">I", z.crc32(b"IHDR" + bad_ihdr) & 0xFFFFFFFF)
        + blob[ihdr_at + 8 + 13 + 4 :]
    )
    with _pytest.raises(ValueError):
        decode_png(bad)


def test_png_trns_palette_alpha_roundtrip():
    """tRNS palette-alpha: alpha bytes apply to leading PLTE entries, the
    rest default 255; decode emits RGBA."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import decode_png, encode_png

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    idx = np.array([[0, 1], [2, 3]], np.uint8)[:, :, None]
    px = decode_png(encode_png(idx, palette=pal, transparency=bytes([0, 128])))
    assert px.shape == (2, 2, 4)
    assert px[0, 0].tolist() == [255, 0, 0, 0]
    assert px[0, 1].tolist() == [0, 255, 0, 128]
    assert px[1, 0].tolist() == [0, 0, 255, 255]
    assert px[1, 1].tolist() == [9, 9, 9, 255]
    # low-depth palette indices carry tRNS too (2-bit index plane)
    px2 = decode_png(
        encode_png(idx, palette=pal, bit_depth=2, transparency=bytes([7]))
    )
    assert px2.shape == (2, 2, 4) and px2[0, 0, 3] == 7 and px2[1, 1, 3] == 255


def test_png_trns_key_color_gray_and_rgb():
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import decode_png, encode_png

    g = np.array([[10, 20], [10, 30]], np.uint8)
    px = decode_png(encode_png(g, transparency=(10,)))
    assert px.shape == (2, 2, 2)
    assert px[:, :, 1].tolist() == [[0, 255], [0, 255]]
    assert px[:, :, 0].tolist() == g.tolist()  # samples unchanged

    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[0, 0] = [7, 8, 9]
    px = decode_png(encode_png(rgb, transparency=(7, 8, 9)))
    assert px.shape == (2, 2, 4)
    assert px[0, 0, 3] == 0 and px[1, 1, 3] == 255

    # depth 16: key compares on the decoder's high-byte output space
    g16 = np.array([[77, 78]], np.uint8)
    px = decode_png(encode_png(g16, bit_depth=16, transparency=(77 * 257,)))
    assert px[:, :, 1].tolist() == [[0, 255]]

    # depth 2: key rescales with the samples (2 → 170 in 8-bit space)
    g2 = np.array([[0, 1], [2, 3]], np.uint8)
    px = decode_png(encode_png(g2, bit_depth=2, transparency=(2,)))
    assert px[:, :, 1].tolist() == [[255, 255], [0, 255]]


def test_png_trns_malformed_rejects():
    """Malformed tRNS → ValueError (reject-to-quarantine): wrong length
    per color type, more alphas than PLTE entries, key exceeding the bit
    depth, tRNS on already-alpha color types."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from datalake_nba_dmc_spark.operators.multimodal import decode_png, encode_png

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    def with_trns(png, body):
        at = png.index(b"IDAT") - 4
        return png[:at] + chunk(b"tRNS", body) + png[at:]

    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx = np.zeros((1, 2, 1), np.uint8)
    pal_png = encode_png(idx, palette=pal)
    with pytest.raises(ValueError, match="longer than PLTE"):
        decode_png(with_trns(pal_png, bytes(3)))
    with pytest.raises(ValueError, match="longer than PLTE"):
        decode_png(with_trns(pal_png, b""))

    gray = encode_png(np.zeros((1, 2), np.uint8))
    with pytest.raises(ValueError, match="2 bytes"):
        decode_png(with_trns(gray, bytes(3)))
    with pytest.raises(ValueError, match="exceeds bit depth"):
        decode_png(with_trns(gray, struct.pack(">H", 300)))

    rgb = encode_png(np.zeros((1, 2, 3), np.uint8))
    with pytest.raises(ValueError, match="6 bytes"):
        decode_png(with_trns(rgb, bytes(2)))
    with pytest.raises(ValueError, match="exceeds bit depth"):
        decode_png(with_trns(rgb, struct.pack(">HHH", 1, 2, 999)))

    low = encode_png(np.zeros((1, 2), np.uint8), bit_depth=2)
    with pytest.raises(ValueError, match="exceeds bit depth"):
        decode_png(with_trns(low, struct.pack(">H", 4)))

    for ch in (2, 4):  # GA / RGBA already carry alpha
        base = encode_png(np.zeros((1, 2, ch), np.uint8))
        body = bytes(2) if ch == 2 else bytes(6)
        with pytest.raises(ValueError, match="forbidden"):
            decode_png(with_trns(base, body))


def test_png_trns_transparent_pixels_feed_phash_and_stats():
    """tRNS output plugs into the downstream consumers: alpha is ignored
    by the grayscale reduction (GA uses the gray plane), so a tRNS gray
    image hashes identically to its plain twin."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import (
        _ahash64,
        decode_png,
        encode_png,
    )

    g = (np.arange(256, dtype=np.uint8)).reshape(16, 16)
    plain = decode_png(encode_png(g))
    keyed = decode_png(encode_png(g, transparency=(3,)))
    assert keyed.shape == (16, 16, 2) and plain.shape == (16, 16, 1)
    assert _ahash64(plain) == _ahash64(keyed)


def test_wav_pcm_codec_roundtrip_and_rejects():
    import struct

    import numpy as np
    import pytest

    from datalake_nba_dmc_spark.operators.multimodal import (
        decode_wav_pcm,
        encode_wav_pcm,
    )

    mono16 = (np.arange(100, dtype=np.int16) * 257 - 12000).astype(np.int16)
    out, rate = decode_wav_pcm(encode_wav_pcm(mono16, 22050))
    assert rate == 22050 and out.shape == (100, 1)
    assert np.array_equal(out[:, 0], mono16)

    stereo = np.stack([mono16, mono16[::-1]], axis=1)
    out, _ = decode_wav_pcm(encode_wav_pcm(stereo))
    assert out.shape == (100, 2) and np.array_equal(out, stereo)

    eight = np.arange(50, dtype=np.uint8)
    out, _ = decode_wav_pcm(encode_wav_pcm(eight, 8000))
    assert out.dtype == np.uint8 and np.array_equal(out[:, 0], eight)

    # a non-canonical layout (JUNK chunk before fmt) still decodes
    p = encode_wav_pcm(mono16)
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"  # odd→word-aligned
    noncanon = p[:12] + junk + p[12:]
    noncanon = noncanon[:4] + struct.pack("<I", len(noncanon) - 8) + noncanon[8:]
    out, _ = decode_wav_pcm(noncanon)
    assert np.array_equal(out[:, 0], mono16)

    for payload, frag in [
        (b"not audio", "not a RIFF"),
        (None, "not a RIFF"),
        (p[:30], "truncated" ),
        (p[:-10], "overruns"),
        (p[:20] + struct.pack("<H", 3) + p[22:], "format code"),  # IEEE float
        # bits_per_sample lives at canonical offset 34 (12 RIFF + 8 chunk
        # header + 14 into fmt)
        (p[:34] + struct.pack("<H", 24) + p[36:], "unsupported WAV layout"),
    ]:
        with pytest.raises(ValueError, match=frag):
            decode_wav_pcm(payload)


def test_wav_pcm_stats_real_decode(spark):
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import (
        encode_wav_pcm,
        wav_pcm_stats,
    )

    s = np.array([0, 100, -100, 200], dtype=np.int16)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_wav_pcm(s, 8000))),
            (2, bytearray(b"garbage")),
            (3, None),
        ],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in wav_pcm_stats(media).collect()}
    assert set(rows) == {1}
    r = rows[1]
    assert (r.n_samples, r.sample_rate, r.peak) == (4, 8000, 200)
    assert abs(r.duration_s - 4 / 8000) < 1e-15
    assert abs(r.rms - float(np.sqrt(np.mean(s.astype(np.float64) ** 2)))) < 1e-12


def test_wav_fmt_chunk_declared_size_honored():
    """ADVICE r9: a malformed fmt chunk DECLARING size < 16 (with more
    payload following, so body+16 <= n holds) must raise, not read the
    next chunk's header bytes as channels/rate/bits."""
    import struct

    import numpy as np
    import pytest

    from datalake_nba_dmc_spark.operators.multimodal import (
        decode_wav_pcm,
        encode_wav_pcm,
    )

    p = encode_wav_pcm(np.arange(100, dtype=np.int16), 16000)
    # fmt chunk size field lives at offset 16 (RIFF 12 + 'fmt ' 4)
    lying = p[:16] + struct.pack("<I", 8) + p[20:]
    with pytest.raises(ValueError, match="fmt chunk truncated"):
        decode_wav_pcm(lying)


def test_media_quarantine_report_is_the_dropped_row_ledger(spark):
    """VERDICT r9 ask #7: the quarantine report's 'ok' total equals
    EXACTLY what perceptual_hash emits and what resize_images keeps
    (non-NULL payload rows) on the same frame — the silent drops are
    observable, per format, per status."""
    import numpy as np

    from datalake_nba_dmc_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        media_quarantine_report,
        perceptual_hash,
        resize_images,
    )

    px = (np.arange(96, dtype=np.uint8).reshape(8, 12) * 2 + 7) % 251
    good_png = encode_png(px)
    good_bmp = encode_bmp(px)
    rows = [
        (1, bytearray(good_png)),                      # png ok
        (2, bytearray(good_bmp)),                      # bmp ok
        (3, bytearray(good_png[:40])),                 # png quarantined
        (4, bytearray(good_bmp[:10])),                 # bmp quarantined
        (5, bytearray(b"\xff\xd8garbage")),            # jpeg quarantined
        (6, bytearray(b"plain text, no magic")),       # unrecognized
        (7, None),                                     # null payload
        (8, bytearray(good_png)),                      # png ok (again)
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    report = {
        (r.sniffed_format, r.status): r.n
        for r in media_quarantine_report(media).collect()
    }
    assert report == {
        ("png", "ok"): 2,
        ("bmp", "ok"): 1,
        ("png", "quarantined"): 1,
        ("bmp", "quarantined"): 1,
        ("jpeg", "quarantined"): 1,
        ("unknown", "unrecognized"): 1,
        ("null", "null_payload"): 1,
    }
    n_ok = sum(n for (f, s), n in report.items() if s == "ok")
    assert perceptual_hash(media).count() == n_ok
    from pyspark.sql import functions as F

    full = media.select(
        "media_id",
        "payload",
        F.lit("image").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("n_bytes"),
    )
    resized = resize_images(full, 8, 8).collect()
    assert len(resized) == len(rows)  # in-band: every row survives
    assert sum(1 for r in resized if r.payload is not None) == n_ok
