"""Two-level query-result cache (reference search/cache.py:160-234 analog):
exact SHA-256 hits, semantic cosine >= 0.92 hits, snapshot-scoped
invalidation, LRU eviction at the 50-entry window."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from coco_search_spark.ops.result_cache import QueryResultCache


def _result(spark, tag):
    return spark.createDataFrame([(tag, 1)], "name string, v int")


def test_exact_hit_skips_compute(spark, tmp_path):
    cache = QueryResultCache(str(tmp_path / "c"))
    calls = []

    def compute():
        calls.append(1)
        return _result(spark, "a")

    df1, s1 = cache.get_or_compute(spark, "top services by degree", "v000001", compute)
    assert s1 == "miss" and len(calls) == 1
    # same query, trivially reformatted → level-1 exact hit, no recompute
    df2, s2 = cache.get_or_compute(
        spark, "  Top   Services BY degree ", "v000001", compute
    )
    assert s2 == "exact" and len(calls) == 1
    assert df2.collect() == df1.collect()


def test_semantic_hit_and_threshold(spark, tmp_path):
    cache = QueryResultCache(str(tmp_path / "c"), semantic_threshold=0.92)
    cache.put(_result(spark, "a"), "top services by degree in the graph", "v1")
    # reordered token set (the deterministic token-set embedding scores
    # reorderings cosine 1.0) clears 0.92; partial/disjoint overlap must NOT
    df, status = cache.lookup(spark, "BY degree  top services in the graph", "v1")
    assert status == "semantic" and df is not None
    df2, status2 = cache.lookup(spark, "top services by depth in the graph", "v1")
    assert df2 is None and status2 == "miss"
    df3, status3 = cache.lookup(spark, "completely different words entirely", "v1")
    assert df3 is None and status3 == "miss"


def test_snapshot_scoping_invalidates(spark, tmp_path):
    """A new committed snapshot must invalidate BOTH levels — stale results
    are never served (snapshot identity is the invalidation signal)."""
    cache = QueryResultCache(str(tmp_path / "c"))
    cache.put(_result(spark, "old"), "top services", "v000001")
    df, status = cache.lookup(spark, "top services", "v000002")
    assert df is None and status == "miss"
    # identical paraphrase under the new snapshot also misses (semantic
    # level is snapshot-scoped too)
    df2, status2 = cache.lookup(spark, "top  services", "v000002")
    assert df2 is None and status2 == "miss"
    # the old snapshot's entry still serves its own snapshot
    df3, status3 = cache.lookup(spark, "top services", "v000001")
    assert status3 == "exact" and df3.collect()[0]["name"] == "old"


def test_lru_eviction_at_capacity(spark, tmp_path):
    cache = QueryResultCache(str(tmp_path / "c"), capacity=3)
    for i in range(4):
        cache.put(_result(spark, f"r{i}"), f"query number {i}", "v1")
    entries = cache._load()
    assert len(entries) == 3
    assert [e["query"] for e in entries] == [
        "query number 1",
        "query number 2",
        "query number 3",
    ]
    # evicted parquet is gone from disk
    assert len([d for d in os.listdir(cache.dir) if d.startswith("r_")]) == 3
    # touching entry 1 moves it to the tail; adding another evicts entry 2
    cache.lookup(spark, "query number 1", "v1")
    cache.put(_result(spark, "r4"), "query number 4", "v1")
    assert [e["query"] for e in cache._load()] == [
        "query number 3",
        "query number 1",
        "query number 4",
    ]


def test_corrupt_manifest_degrades_to_empty(spark, tmp_path):
    cache = QueryResultCache(str(tmp_path / "c"))
    cache.put(_result(spark, "a"), "q", "v1")
    with open(cache._manifest_path(), "w") as f:
        f.write('{"torn')
    df, status = cache.lookup(spark, "q", "v1")
    assert df is None and status == "miss"  # degraded, not raised
    # and the cache heals on the next put
    cache.put(_result(spark, "b"), "q", "v1")
    df2, status2 = cache.lookup(spark, "q", "v1")
    assert status2 == "exact" and df2.collect()[0]["name"] == "b"


def test_hit_result_plan_matches_miss(spark, tmp_path):
    """Hit and miss both read from the cached parquet → identical schema
    and downstream plan shape regardless of cache state."""
    cache = QueryResultCache(str(tmp_path / "c"))
    df_miss, _ = cache.get_or_compute(
        spark, "q", "v1", lambda: _result(spark, "a").withColumn("w", F.lit(2.5))
    )
    df_hit, status = cache.get_or_compute(
        spark, "q", "v1", lambda: (_ for _ in ()).throw(AssertionError("recomputed"))
    )
    assert status == "exact"
    assert df_hit.schema == df_miss.schema
    assert df_hit.collect() == df_miss.collect()
