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
