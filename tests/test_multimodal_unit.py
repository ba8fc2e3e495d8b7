"""Multimodal operator plumbing tests (deterministic fake codec)."""

from __future__ import annotations

import hashlib

import pytest

from options_data_pipeline_spark.operators import multimodal as MM


def _media(spark):
    rows = [(1, "image", b"abcdef"), (2, "video", bytes(range(200)))]
    return spark.createDataFrame(rows, "media_id long, kind string, payload binary")


def test_extract_features_byte_stats(spark):
    out = {r.media_id: r for r in MM.extract_features(_media(spark)).collect()}
    assert out[1].n_bytes == 6
    assert out[1].sum_bytes == sum(b"abcdef")
    assert out[1].payload_md5 == hashlib.md5(b"abcdef").hexdigest()
    assert out[2].n_bytes == 200


def test_extract_features_real_decode_is_stubbed(spark):
    if MM._HAS_PIL:
        pytest.skip("PIL present; stub path not reachable")
    with pytest.raises(NotImplementedError):
        MM.extract_features(_media(spark), real_decode=True)


def test_resize_pads_and_truncates(spark):
    out = {r.media_id: r for r in
           MM.resize_payloads(_media(spark), width=4, height=4).collect()}
    assert len(out[1].payload) == 16  # 6 bytes cycled up to 16
    assert bytes(out[1].payload) == (b"abcdef" * 3)[:16]
    assert len(out[2].payload) == 16  # 200 bytes truncated
    assert (out[1].width, out[1].height) == (4, 4)


def test_sample_frames_fanout(spark):
    out = MM.sample_frames(_media(spark), frame_bytes=64, every_n=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    # media 1: 6 bytes -> 1 frame (no 0) kept
    assert [r.frame_no for r in by_id[1]] == [0]
    # media 2: 200 bytes -> frames 0..3, keep 0 and 2
    assert sorted(r.frame_no for r in by_id[2]) == [0, 2]
    f2 = {r.frame_no: r for r in by_id[2]}
    assert bytes(f2[2].frame) == bytes(range(200))[128:192]
    assert f2[2].frame_md5 == hashlib.md5(bytes(range(200))[128:192]).hexdigest()


# --- real decode path (PIL slot-in) -----------------------------------------


def _png_media(spark):
    rows = [
        (1, "image", MM.png_payload(12, 7, (255, 0, 0))),
        (2, "image", MM.png_payload(3, 3, (0, 255, 0))),
        (3, "image", MM.png_payload(20, 5, (0, 0, 255))),
    ]
    return spark.createDataFrame(rows, "media_id long, kind string, payload binary")


def test_png_payload_is_spec_valid():
    """The generated payloads are REAL PNGs: magic + parseable IHDR dims
    + CRC-valid chunks — checked with struct/zlib so this pins payload
    validity even where PIL is absent."""
    import struct
    import zlib

    p = MM.png_payload(12, 7, (9, 9, 9))
    assert p.startswith(MM.PNG_MAGIC)
    off = len(MM.PNG_MAGIC)
    seen = []
    while off < len(p):
        (ln,) = struct.unpack_from(">I", p, off)
        tag = p[off + 4 : off + 8]
        data = p[off + 8 : off + 8 + ln]
        (crc,) = struct.unpack_from(">I", p, off + 8 + ln)
        assert crc == zlib.crc32(tag + data) & 0xFFFFFFFF
        seen.append(tag)
        if tag == b"IHDR":
            w, h = struct.unpack_from(">II", data, 0)
            assert (w, h) == (12, 7)
        off += 12 + ln
    assert seen == [b"IHDR", b"IDAT", b"IEND"]


def test_sample_frames_real_demux(spark):
    """Container demux needs no codec: real PNG frames come back intact
    (byte-identical, every_n sampled) from the FAKV container."""
    f0 = MM.png_payload(4, 4, (1, 2, 3))
    f1 = MM.png_payload(4, 4, (4, 5, 6))
    f2 = MM.png_payload(4, 4, (7, 8, 9))
    rows = [(7, "video", MM.pack_frames([f0, f1, f2]))]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    out = {
        r.frame_no: r
        for r in MM.sample_frames(media, every_n=2, real_decode=True).collect()
    }
    assert sorted(out) == [0, 2]
    assert bytes(out[0].frame) == f0
    assert bytes(out[2].frame) == f2
    assert out[2].frame_md5 == hashlib.md5(f2).hexdigest()


@pytest.mark.skipif(not MM._HAS_PIL, reason="PIL not installed")
def test_extract_features_real_decode(spark):
    """extract_features(real_decode=True) reports the TRUE pixel
    dimensions of genuine PNG payloads via PIL inside mapInPandas."""
    out = {
        r.media_id: r
        for r in MM.extract_features(_png_media(spark), real_decode=True).collect()
    }
    assert (out[1].width, out[1].height) == (12, 7)
    assert (out[2].width, out[2].height) == (3, 3)
    assert (out[3].width, out[3].height) == (20, 5)
    assert out[1].mode == "RGB"


@pytest.mark.skipif(not MM._HAS_PIL, reason="PIL not installed")
def test_resize_payloads_real_decode(spark):
    """Real resize: output payloads are PNGs that decode to exactly the
    requested dimensions."""
    import io

    from PIL import Image

    out = MM.resize_payloads(
        _png_media(spark), width=5, height=6, real_decode=True
    ).collect()
    assert len(out) == 3
    for r in out:
        with Image.open(io.BytesIO(bytes(r.payload))) as img:
            assert (img.width, img.height) == (5, 6)


def test_extract_features_real_decode_raises_without_pil(spark):
    if MM._HAS_PIL:
        pytest.skip("PIL installed")
    with pytest.raises(NotImplementedError):
        MM.extract_features(_png_media(spark), real_decode=True)


def test_probe_png_headers_reads_true_dimensions(spark):
    """Header probe: REAL width/height/bit-depth from genuine PNG bytes,
    no codec library involved; non-PNG payloads degrade to is_png=False
    instead of failing the scan."""
    rows = [
        (1, "image", MM.png_payload(12, 7, (9, 9, 9))),
        (2, "image", MM.png_payload(3, 3, (0, 0, 0))),
        (3, "blob", b"not a png at all" * 4),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    out = {r.media_id: r for r in MM.probe_png_headers(media).collect()}
    assert (out[1].width, out[1].height) == (12, 7)
    assert (out[2].width, out[2].height) == (3, 3)
    assert out[1].is_png and out[1].bit_depth == 8 and out[1].color_type == 2
    assert not out[3].is_png and out[3].width is None
    assert out[3].payload_md5 == hashlib.md5(rows[2][2]).hexdigest()


def _wav_bytes(
    channels=1, rate=8000, bits=16, samples=(0, 100, -100, 32767, -32768)
):
    import struct

    balign = channels * bits // 8
    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * balign, balign, bits)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def test_wav_probe_parses_real_header_and_rejects_garbage(spark):
    rows = [
        (1, "audio", _wav_bytes(channels=2, rate=44100, samples=(1, 2, 3, 4))),
        (2, "audio", b"RIFFxxxxNOPE" + bytes(40)),   # wrong WAVE magic
        (3, "audio", _wav_bytes()[:30]),             # truncated header
        (4, "blob", b"just some text bytes, definitely not audio!!"),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r.media_id: r for r in MM.probe_wav_headers(media).collect()}
    assert out[1].is_wav and out[1].n_channels == 2
    assert out[1].sample_rate == 44100 and out[1].bits_per_sample == 16
    assert out[1].n_frames == 2  # 4 samples = 8 bytes / block align 4
    assert not out[2].is_wav and out[2].n_channels is None
    assert not out[3].is_wav
    assert not out[4].is_wav


def test_wav_probe_frame_count_uses_block_align(spark):
    # stereo: 4 samples = 8 bytes, block align 4 -> 2 frames
    media = spark.createDataFrame(
        [(1, "audio", _wav_bytes(channels=2, samples=(1, 2, 3, 4)))],
        "media_id long, kind string, payload binary",
    )
    row = MM.probe_wav_headers(media).collect()[0]
    assert row.n_frames == 2


def test_pcm_stats_sign_and_extremes(spark):
    # includes int16 extremes: two's-complement decode must be exact
    media = spark.createDataFrame(
        [(1, "audio", _wav_bytes(samples=(0, 100, -100, 32767, -32768)))],
        "media_id long, kind string, payload binary",
    )
    row = MM.pcm_stats(media).collect()[0]
    assert row.is_wav and row.n_samples == 5
    assert row.sum_abs == 0 + 100 + 100 + 32767 + 32768
    assert row.peak == 32768

    # non-wav payload: nulls, not an error
    garbage = spark.createDataFrame(
        [(2, "blob", b"0123456789" * 10)],
        "media_id long, kind string, payload binary",
    )
    g = MM.pcm_stats(garbage).collect()[0]
    assert not g.is_wav and g.n_samples is None


def test_pcm_oracle_is_not_circular(spark, ddb):
    """Mutation control for media_pcm_stats: the correct decode matches
    the formula-side oracle; a deliberately wrong sign convention
    (unsigned int16) on the SAME bytes must not — demonstrating the
    oracle adjudicates the real decode rather than echoing the
    construction."""
    import struct as _struct

    from options_data_pipeline_spark.plans.media import (
        oracle_media_pcm_stats,
        q_media_pcm_stats,
    )
    from tests._compare import assert_frames_match
    from tests.conftest import SF_DIR

    good = q_media_pcm_stats(spark, SF_DIR).toPandas()
    oracle = ddb.execute(oracle_media_pcm_stats()).fetchdf()
    assert_frames_match(good, oracle, "media_pcm_stats")

    for doc_id, n_chars in [(1, 10), (2, 7)]:
        cnt = min(n_chars, 256)
        samples = [((doc_id + i) % 251) - 125 for i in range(cnt)]
        data = b"".join(_struct.pack("<h", s) for s in samples)
        wrong = _struct.unpack(f"<{cnt}H", data)  # unsigned misread
        right = _struct.unpack(f"<{cnt}h", data)
        assert sum(abs(s) for s in right) == sum(abs(s) for s in samples)
        if any(s < 0 for s in samples):
            assert sum(wrong) != sum(abs(s) for s in right)


def _mp4(timescale=1000, duration=42, brand=b"isom"):
    import struct

    ftyp = struct.pack(">I", 20) + b"ftyp" + brand + struct.pack(">I", 512) + b"mp41"
    mvhd = (
        struct.pack(">I", 28) + b"mvhd" + b"\x00" * 12
        + struct.pack(">II", timescale, duration)
    )
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


def test_probe_mp4_walks_boxes(spark):
    rows = [
        (1, "video", _mp4(timescale=90000, duration=7)),
        (2, "blob", b"plain text payload, not a box list"),
        (3, "blob", b"tiny"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    out = {r.media_id: r for r in MM.probe_mp4_headers(media).collect()}
    assert out[1].is_mp4 and out[1].brand == "isom"
    assert out[1].timescale == 90000 and out[1].duration == 7
    assert out[1].n_boxes == 2
    assert not out[2].is_mp4 and out[2].timescale is None
    assert not out[3].is_mp4 and out[3].n_boxes == 0


def test_probe_mp4_mutation_controls(spark):
    """The walker must actually FOLLOW the size chain: corrupting any
    size field, truncating, or appending trailing bytes derails it."""
    import struct

    good = _mp4()
    corrupted_ftyp_size = struct.pack(">I", 21) + good[4:]   # chain derails
    truncated = good[:-4]                                    # mvhd past EOF
    trailing = good + b"x"                                   # not fully consumed
    tiny_box = struct.pack(">I", 4) + good[4:]               # size < 8
    rows = [
        (1, "v", good),
        (2, "v", corrupted_ftyp_size),
        (3, "v", truncated),
        (4, "v", trailing),
        (5, "v", tiny_box),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    out = {r.media_id: r for r in MM.probe_mp4_headers(media).collect()}
    assert out[1].is_mp4
    for mid in (2, 3, 4, 5):
        assert not out[mid].is_mp4, mid


def _png_with_filters(width, height, filters, pixel_fn, corrupt=None):
    """Hand-rolled PNG (8-bit RGB, non-interlaced) with a CHOSEN filter
    type per row — pixel (x,y,c) value from pixel_fn. Filters are
    APPLIED here (the encoder side), so the kernel must invert them."""
    import struct
    import zlib

    stride = 3 * width
    raws = [
        bytes(pixel_fn(x, y, c) & 0xFF for x in range(width) for c in range(3))
        for y in range(height)
    ]
    out = []
    prev = bytes(stride)
    for y, raw in enumerate(raws):
        f = filters[y]
        row = bytearray(raw)
        if f == 1:
            for j in range(stride - 1, 2, -1):
                row[j] = (row[j] - raw[j - 3]) & 0xFF
        elif f == 2:
            for j in range(stride):
                row[j] = (row[j] - prev[j]) & 0xFF
        elif f == 3:
            for j in range(stride):
                a = raw[j - 3] if j >= 3 else 0
                row[j] = (row[j] - ((a + prev[j]) >> 1)) & 0xFF
        elif f == 4:
            for j in range(stride):
                a = raw[j - 3] if j >= 3 else 0
                b = prev[j]
                c = prev[j - 3] if j >= 3 else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] - pr) & 0xFF
        out.append(bytes([f]) + bytes(row))
        prev = raw

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(out))
    png = MM.PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    if corrupt is not None:
        png = bytearray(png)
        png[corrupt] ^= 0xFF
        png = bytes(png)
    return png, raws


def test_decode_png_pixels_all_filter_types(spark):
    """The stdlib decoder must invert every filter type (None/Sub/Up/
    Average/Paeth) — expected sums computed from the RAW pixels here,
    which the encoder filtered away."""
    w, h = 5, 5
    png, raws = _png_with_filters(
        w, h, [0, 1, 2, 3, 4], lambda x, y, c: x * 37 + y * 59 + c * 17
    )
    media = spark.createDataFrame(
        [(1, "image", png)], "media_id long, kind string, payload binary"
    )
    row = MM.decode_png_pixels(media).collect()[0]
    assert row.is_png and row.width == w and row.height == h
    assert row.n_px == w * h
    flat = b"".join(raws)
    assert row.sum_px == sum(flat)
    assert row.sum_r == sum(flat[0::3])


def test_decode_png_pixels_mutation_controls(spark):
    """Integrity is actually checked: flipping a byte of the IDAT
    stream (breaks chunk CRC), the IHDR CRC, or appending trailing
    bytes must all yield is_png=false; the pristine payload decodes."""
    w, h = 4, 3
    good, _ = _png_with_filters(w, h, [0, 1, 2], lambda x, y, c: x + y + c)
    # locate IDAT data: magic(8) + IHDR chunk(25) + len(4)+tag(4) => 41
    bad_idat, _ = _png_with_filters(w, h, [0, 1, 2], lambda x, y, c: x + y + c, corrupt=45)
    bad_ihdr_crc, _ = _png_with_filters(w, h, [0, 1, 2], lambda x, y, c: x + y + c, corrupt=30)
    trailing = good + b"\x00"
    not_png = b"just some text bytes"
    rows = [
        (1, "image", good),
        (2, "image", bad_idat),
        (3, "image", bad_ihdr_crc),
        (4, "image", trailing),
        (5, "blob", not_png),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r.media_id: r for r in MM.decode_png_pixels(media).collect()}
    assert out[1].is_png
    for mid in (2, 3, 4, 5):
        assert not out[mid].is_png, mid
        assert out[mid].sum_px is None, mid


def test_decode_png_pixels_rejects_unsupported_profiles(spark):
    """Grayscale / 16-bit / interlaced payloads are triaged out (valid
    PNGs, outside the supported 8-bit RGB non-interlaced profile)."""
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    def with_ihdr(bd, ct, inter):
        ihdr = struct.pack(">IIBBBBB", 2, 2, bd, ct, 0, 0, inter)
        idat = zlib.compress(b"\x00" + b"\x01" * 6)
        return MM.PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")

    rows = [
        (1, "image", with_ihdr(8, 0, 0)),   # grayscale
        (2, "image", with_ihdr(16, 2, 0)),  # 16-bit
        (3, "image", with_ihdr(8, 2, 1)),   # interlaced
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    for r in MM.decode_png_pixels(media).collect():
        assert not r.is_png


def test_decode_png_pixels_reads_png_payload_builder(spark):
    """Cross-check against the OTHER PNG producer in this module:
    png_payload's solid-color images decode to the exact closed-form
    sums."""
    png = MM.png_payload(6, 4, pixel=(10, 20, 30))
    media = spark.createDataFrame(
        [(1, "image", png)], "media_id long, kind string, payload binary"
    )
    row = MM.decode_png_pixels(media).collect()[0]
    assert row.is_png and row.width == 6 and row.height == 4
    assert row.sum_px == (10 + 20 + 30) * 6 * 4
    assert row.sum_r == 10 * 6 * 4


def test_decode_png_pixels_randomized_batch(spark):
    """50 seeded-random images (sizes 1x1..7x5, random filter types per
    row, random pixels) decoded in one batch — every sum must match the
    raw pixels the encoder filtered away."""
    import random

    rnd = random.Random(42)
    rows, expect = [], {}
    for mid in range(50):
        w, h = rnd.randint(1, 7), rnd.randint(1, 5)
        filters = [0] + [rnd.randint(0, 4) for _ in range(h - 1)]
        # row 0 may use any filter too: Up/Average/Paeth against the
        # zero prior row are legal PNG
        filters[0] = rnd.randint(0, 4)
        seed = rnd.randint(0, 10**6)
        png, raws = _png_with_filters(
            w, h, filters, lambda x, y, c, s=seed: (s + x * 31 + y * 57 + c * 11) % 256
        )
        rows.append((mid, "image", png))
        flat = b"".join(raws)
        expect[mid] = (w, h, sum(flat), sum(flat[0::3]))
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r.media_id: r for r in MM.decode_png_pixels(media).collect()}
    assert len(out) == 50
    for mid, (w, h, spx, sr) in expect.items():
        r = out[mid]
        assert r.is_png, mid
        assert (r.width, r.height, r.sum_px, r.sum_r) == (w, h, spx, sr), mid
