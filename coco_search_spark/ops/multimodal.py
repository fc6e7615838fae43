"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct —
the Spark-side schema, partitioning, Arrow batch shape, and UDF signatures
are real and tested; the actual media decode is STUBBED (codec libraries are
not in this container) behind ``decode_stub`` which raises
``NotImplementedError``, with ``fake_decode`` as the deterministic test
double (the reference's deterministic-mock philosophy,
tests/mocks/ollama.py).

Operators:
- ``attach_media_meta``   — sniff magic bytes → (media_type, byte_len, sha)
- ``extract_features``    — mapInPandas binary → fixed-dim float vector
  (deterministic fake; swap the inner fn for a real model at deploy)
- ``sample_frames``       — one binary blob → N frame-chunk rows (the UDTF
  one-to-many shape, explode after batch processing)

Scale notes: binary payloads make rows wide — the operators repartition by
a size-aware bucket so one partition holds ~``target_mb`` of media, and all
Python crossings are Arrow-batched with a small maxRecordsPerBatch to bound
executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"\x1a\x45\xdf\xa3": "video/webm",
}


def sniff_media_type(payload: bytes | None) -> str:
    if not payload:
        return "unknown"
    for magic, mt in MAGIC.items():
        if payload[: len(magic)] == magic:
            return mt
    return "application/octet-stream"


def decode_stub(payload: bytes, media_type: str):
    """Real decode entry point — requires PIL/ffmpeg etc., absent here."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this container; "
        "swap fake_decode for a real decoder at deploy time"
    )


def fake_decode(payload: bytes, media_type: str, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in: sha256 bytes tiled to a dim-length float
    vector in [0,1] — same contract (bytes → ndarray) as a real decoder."""
    digest = hashlib.sha256(payload or b"").digest()
    reps = -(-dim // len(digest))
    return np.frombuffer(digest * reps, dtype=np.uint8)[:dim].astype(np.float32) / 255.0


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Adds (media_type, byte_len, content_sha) via native fns + a tiny
    lookup on magic prefixes (JVM-side; no Python)."""
    p = F.col(payload_col)
    hexpref = F.upper(F.hex(F.substring(p, 1, 4)))
    media_type = (
        F.when(hexpref.startswith("89504E47"), "image/png")
        .when(hexpref.startswith("FFD8FF"), "image/jpeg")
        .when(hexpref.startswith("52494646"), "audio/wav")
        .when(hexpref.startswith("1A45DFA3"), "video/webm")
        .when(p.isNull() | (F.length(p) == 0), "unknown")
        .otherwise("application/octet-stream")
    )
    return df.withColumn("media_type", media_type).withColumn(
        "byte_len", F.coalesce(F.length(p), F.lit(0))
    ).withColumn("content_sha", F.sha2(p, 256))


def size_bucketed(df: DataFrame, target_mb: int = 64, avg_payload_kb: int = 256) -> DataFrame:
    """Repartition so each partition carries ~target_mb of binary payload —
    wide rows must not concentrate (executor OOM defense at 100 TB)."""
    rows_per_part = max(1, (target_mb * 1024) // avg_payload_kb)
    n = df.count()
    parts = max(2, n // rows_per_part + 1)
    return df.repartition(parts)


FEATURE_SCHEMA = "media_id string, media_type string, features array<float>"


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    dim: int = 16,
    decoder=fake_decode,
) -> DataFrame:
    """Arrow-batched binary → feature vector (mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(p, sniff_media_type(p), dim).tolist() if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype(str),
                    "media_type": [sniff_media_type(p) for p in pdf[payload_col]],
                    "features": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "media_id string, frame_idx int, frame_sha string, frame_bytes binary"


def sample_frames(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_frames: int = 4,
    frame_kb: int = 4,
) -> DataFrame:
    """One media blob → n_frames evenly-spaced byte windows ("frames"):
    the UDTF one-to-many batch shape. A real implementation replaces the
    byte-window slicing with a container-aware frame demuxer; the row
    contract (id, frame_idx, sha, bytes) is what downstream training
    pipelines consume."""
    size = frame_kb * 1024

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_sha": [], "frame_bytes": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None or len(payload) == 0:
                    continue
                stride = max(1, (len(payload) - size) // max(1, n_frames - 1))
                for i in range(n_frames):
                    start = min(i * stride, max(0, len(payload) - size))
                    chunk = bytes(payload[start : start + size])
                    out["media_id"].append(str(mid))
                    out["frame_idx"].append(i)
                    out["frame_sha"].append(hashlib.sha256(chunk).hexdigest())
                    out["frame_bytes"].append(chunk)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_SCHEMA)


def synthetic_media(spark, n: int = 20, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payloads with real magic
    bytes + seeded pseudo-random bodies."""
    rng = np.random.default_rng(seed)
    magics = list(MAGIC.keys())
    rows = []
    for i in range(n):
        magic = magics[i % len(magics)]
        body = rng.integers(0, 256, size=int(rng.integers(2048, 16384)), dtype=np.uint8).tobytes()
        rows.append((f"m-{i:04d}", magic + body))
    return spark.createDataFrame(rows, "media_id string, payload binary")
