"""Two-level query-result cache keyed by snapshot identity.

The reference memoizes search results at two levels (reference:
src/cocosearch/search/cache.py:160-234 — level 1: exact SHA-256 of the
query text; level 2: semantic match, embedding cosine >= 0.92 against the
last 50 cached queries). For a batch engine the analog is snapshot-scoped
result memoization: the SAME logical query against the SAME committed
snapshot returns the stored parquet instead of re-running the job — and a
*semantically equivalent* query (paraphrase, reordered terms) can reuse it
too, because both levels additionally key on ``snapshot_id`` so a new
commit invalidates everything stale for free (no TTLs, no dirty tracking:
snapshot identity IS the invalidation signal, the Iceberg-snapshot way).

Driver-side by design: the cache holds <= ``capacity`` (default 50, the
reference's window) *query descriptors* — tiny strings + one embed_dim
vector each — while results live as parquet on shared storage, so the
pattern carries to a 1000-executor cluster unchanged (any driver can probe
the manifest; executors never see the cache).

Storage layout (atomic, crash-safe — same tempfile+os.replace discipline
as StateStore):

    cache_dir/manifest.json       — ordered entry list (LRU, newest last)
    cache_dir/r_<key>/            — parquet result per entry
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from coco_search_spark.functions.embed import py_cosine, py_embed

DEFAULT_CAPACITY = 50            # reference cache window, cache.py:160-234
SEMANTIC_THRESHOLD = 0.92        # reference semantic cutoff


def _normalize_query(q: str) -> str:
    """Whitespace/case-insensitive query identity (the reference hashes the
    raw query string; normalizing first makes trivially-reformatted queries
    level-1 hits instead of burning level-2 probes)."""
    return " ".join(q.lower().split())


def _query_vec(norm_query: str, dim: int) -> list[float]:
    """Deterministic query embedding for the level-2 probe: the MEAN of the
    per-token hash vectors over the distinct token set. The engine's
    sha256 embedder is a hash — whole-string vectors of two paraphrases are
    uncorrelated — so the semantic level embeds the token SET instead:
    reordered/duplicated-token queries score cosine 1.0, partial overlap
    degrades smoothly (≈ shared/√(|A|·|B|) for hash-orthogonal tokens), and
    the 0.92 cutoff keeps only near-identical token sets. In production
    this function is the swap point for a real query-embedding model (the
    reference calls its Ollama embedder here, cache.py:160-234)."""
    import numpy as np

    tokens = sorted(set(norm_query.split())) or [""]
    vecs = np.asarray([py_embed(t, dim) for t in tokens], dtype=np.float64)
    return vecs.mean(axis=0).tolist()


class QueryResultCache:
    def __init__(
        self,
        cache_dir: str,
        capacity: int = DEFAULT_CAPACITY,
        semantic_threshold: float = SEMANTIC_THRESHOLD,
        embed_dim: int = 64,
    ):
        self.dir = cache_dir
        self.capacity = capacity
        self.semantic_threshold = semantic_threshold
        self.embed_dim = embed_dim
        os.makedirs(cache_dir, exist_ok=True)

    # ---- manifest ------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.dir, "manifest.json")

    def _load(self) -> list[dict]:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError, OSError):
            return []  # damaged cache degrades to empty, never raises

    def _store(self, entries: list[dict]) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".json")
        with os.fdopen(fd, "w") as f:
            json.dump(entries, f)
        os.replace(tmp, self._manifest_path())

    @staticmethod
    def _key(norm_query: str, snapshot_id: str) -> str:
        return hashlib.sha256(f"{snapshot_id}\x00{norm_query}".encode()).hexdigest()[
            :24
        ]

    # ---- probe ---------------------------------------------------------
    def lookup(
        self, spark: SparkSession, query_text: str, snapshot_id: str
    ) -> tuple[DataFrame | None, str]:
        """Returns (result, status): status ∈ {"exact", "semantic", "miss"}.
        A hit is moved to the LRU tail. Both levels require the SAME
        snapshot_id — results from a superseded snapshot are never served."""
        norm = _normalize_query(query_text)
        key = self._key(norm, snapshot_id)
        entries = self._load()
        by_key = {e["key"]: e for e in entries}
        hit = by_key.get(key)
        status = "exact"
        if hit is None:
            # level 2: embedding cosine against cached queries of the SAME
            # snapshot, newest first (the reference scans its last-50 window)
            qv = _query_vec(norm, self.embed_dim)
            best, best_sim = None, self.semantic_threshold
            for e in reversed(entries):
                if e["snapshot_id"] != snapshot_id:
                    continue
                sim = py_cosine(qv, e["vec"])
                if sim >= best_sim:
                    best, best_sim = e, sim
            hit, status = best, "semantic"
        if hit is None or not os.path.exists(hit["path"]):
            return None, "miss"
        # LRU touch
        entries = [e for e in entries if e["key"] != hit["key"]] + [hit]
        self._store(entries)
        return spark.read.parquet(hit["path"]), status

    # ---- fill ----------------------------------------------------------
    def put(
        self, result: DataFrame, query_text: str, snapshot_id: str
    ) -> DataFrame:
        norm = _normalize_query(query_text)
        key = self._key(norm, snapshot_id)
        path = os.path.join(self.dir, f"r_{key}")
        result.write.mode("overwrite").parquet(path)
        entries = [e for e in self._load() if e["key"] != key]
        entries.append(
            {
                "key": key,
                "query": norm,
                "snapshot_id": snapshot_id,
                "vec": _query_vec(norm, self.embed_dim),
                "path": path,
            }
        )
        # evict beyond capacity (LRU head) — drop parquet dirs too
        while len(entries) > self.capacity:
            evicted = entries.pop(0)
            shutil.rmtree(evicted["path"], ignore_errors=True)
        self._store(entries)
        return result.sparkSession.read.parquet(path)

    def get_or_compute(
        self,
        spark: SparkSession,
        query_text: str,
        snapshot_id: str,
        compute: Callable[[], DataFrame],
    ) -> tuple[DataFrame, str]:
        """The memoization entry point: serve an exact or semantic hit for
        this (query, snapshot), else run ``compute()`` once and cache it.
        Returned DataFrames always read from the cached parquet, so
        downstream plans are identical on hit and miss."""
        df, status = self.lookup(spark, query_text, snapshot_id)
        if df is not None:
            return df, status
        return self.put(compute(), query_text, snapshot_id), "miss"
