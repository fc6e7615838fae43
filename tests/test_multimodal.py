"""Multimodal column plumbing (decode stubbed, Spark-side real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from coco_search_spark.ops.multimodal import (
    attach_media_meta,
    decode_stub,
    extract_features,
    fake_decode,
    sample_frames,
    sniff_media_type,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synthetic_media(spark, n=12).cache()
    df.count()
    return df


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x89PNGxxxx", "image/png")


def test_magic_sniffing_native_matches_python(spark, media):
    got = attach_media_meta(media).select("media_id", "media_type", "byte_len").collect()
    py = {r["media_id"]: r for r in media.collect()}
    for r in got:
        assert r["media_type"] == sniff_media_type(py[r["media_id"]]["payload"])
        assert r["byte_len"] == len(py[r["media_id"]]["payload"])
    types = {r["media_type"] for r in got}
    assert {"image/png", "image/jpeg", "audio/wav", "video/webm", "image/x-portable-pixmap"} <= types


def test_feature_extraction_deterministic(spark, media):
    f1 = {r["media_id"]: r["features"] for r in extract_features(media, dim=16).collect()}
    f2 = {r["media_id"]: r["features"] for r in extract_features(media.repartition(5), dim=16).collect()}
    assert f1 == f2
    for v in f1.values():
        assert len(v) == 16 and all(0.0 <= x <= 1.0 for x in v)
    # matches the python-side contract
    payloads = {r["media_id"]: r["payload"] for r in media.collect()}
    mid = next(iter(f1))
    assert f1[mid] == [round(float(x), 10) and float(x) for x in fake_decode(payloads[mid], "x", 16)]


def test_frame_sampling_shape(spark, media):
    frames = sample_frames(media, n_frames=4, frame_kb=2).cache()
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per)
    sizes = {r["media_id"]: len(r["payload"]) for r in media.collect()}
    rows = frames.filter("frame_idx = 0").collect()
    # a frame is the 2 KiB window, or the whole payload when smaller
    for row in rows:
        assert len(row["frame_bytes"]) == min(2048, sizes[row["media_id"]])
    import hashlib

    row = rows[0]
    assert row["frame_sha"] == hashlib.sha256(bytes(row["frame_bytes"])).hexdigest()


def test_empty_payload_handling(spark):
    df = spark.createDataFrame([("e-1", None), ("e-2", b"")], "media_id string, payload binary")
    meta = attach_media_meta(df).collect()
    assert all(r["media_type"] == "unknown" for r in meta)
    assert sample_frames(df).count() == 0


def test_real_ppm_decode_roundtrip_and_resize():
    import numpy as np

    from coco_search_spark.ops.multimodal import decode_ppm, make_ppm, resize_nearest

    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    payload = b"P6\n# synthetic\n6 10\n255\n" + pixels.tobytes()
    img = decode_ppm(payload)
    assert img.shape == (10, 6, 3)
    assert (img == pixels).all()
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    # corners map to corners under nearest-neighbor
    assert (small[0, 0] == img[0, 0]).all()
    # generator round-trips too
    img2 = decode_ppm(make_ppm(12, 8, np.random.default_rng(3)))
    assert img2.shape == (8, 12, 3)


def test_real_wav_decode_roundtrip():
    import numpy as np

    from coco_search_spark.ops.multimodal import (
        audio_feature_vec,
        decode_wav_pcm16,
        make_wav,
    )

    payload = make_wav(4000, np.random.default_rng(5), sample_rate=8000, n_channels=2)
    samples, rate = decode_wav_pcm16(payload)
    assert rate == 8000
    assert samples.shape == (4000, 2)
    dur, rms, zcr, peak = audio_feature_vec(samples, rate)
    assert abs(dur - 0.5) < 1e-6
    assert 0.1 < rms < 0.7 and 0 < zcr < 1 and 0 < peak <= 1.0


def test_real_or_fake_feature_dispatch(spark, media):
    """PPM/WAV payloads get REAL decoded features; codec-stubbed formats
    fall back to the deterministic fake — one uniform feature column."""
    import numpy as np

    from coco_search_spark.ops.multimodal import (
        extract_features,
        image_feature_vec,
        decode_ppm,
        real_or_fake_decode,
    )

    feats = {
        r["media_id"]: (r["media_type"], r["features"])
        for r in extract_features(media, dim=16, decoder=real_or_fake_decode).collect()
    }
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    types = {mt for mt, _ in feats.values()}
    assert "image/x-portable-pixmap" in types and "audio/wav" in types
    for mid, (mt, v) in feats.items():
        assert len(v) == 16
        if mt == "image/x-portable-pixmap":
            expect = image_feature_vec(decode_ppm(payloads[mid]))
            assert np.allclose(v[: len(expect)], expect, atol=1e-6)
            assert all(x == 0.0 for x in v[len(expect):])  # zero-padded tail
