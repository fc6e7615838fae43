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
    assert {"image/png", "image/jpeg", "audio/wav", "video/webm"} <= types


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
    row = frames.filter("frame_idx = 0").first()
    assert len(row["frame_bytes"]) == 2048
    import hashlib

    assert row["frame_sha"] == hashlib.sha256(bytes(row["frame_bytes"])).hexdigest()


def test_empty_payload_handling(spark):
    df = spark.createDataFrame([("e-1", None), ("e-2", b"")], "media_id string, payload binary")
    meta = attach_media_meta(df).collect()
    assert all(r["media_type"] == "unknown" for r in meta)
    assert sample_frames(df).count() == 0
