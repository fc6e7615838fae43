"""Graph traversal operators (deps/query.py analogs)."""

from __future__ import annotations

from coco_search_spark.operators.graph import (
    forward_edges,
    reverse_edges,
    transitive_closure,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "subj_id string, pred string, obj_id string")


def test_forward_and_reverse(spark):
    e = _edges(
        spark,
        [("a", "calls", "b"), ("a", "uses", "c"), ("b", "calls", "c"), ("x", "calls", "a")],
    )
    assert {r["obj_id"] for r in forward_edges(e, "a").collect()} == {"b", "c"}
    assert {r["obj_id"] for r in forward_edges(e, "a", "calls").collect()} == {"b"}
    assert {r["subj_id"] for r in reverse_edges(e, "a").collect()} == {"x"}


def test_bfs_depth_and_cycles(spark):
    # a→b→c→a cycle + c→d; visited-set must terminate the cycle
    e = _edges(
        spark,
        [("a", "calls", "b"), ("b", "calls", "c"), ("c", "calls", "a"), ("c", "calls", "d")],
    )
    roots = spark.createDataFrame([("a",)], "node string")
    got = {(r["node"], r["depth"]) for r in transitive_closure(e, roots).collect()}
    assert got == {("a", 0), ("b", 1), ("c", 2), ("d", 3)}


def test_bfs_depth_cap(spark):
    chain = [(f"n{i}", "calls", f"n{i+1}") for i in range(10)]
    e = _edges(spark, chain)
    roots = spark.createDataFrame([("n0",)], "node string")
    got = transitive_closure(e, roots, max_depth=3)
    assert got.count() == 4  # depth 0..3


def test_bfs_reverse_impact(spark):
    e = _edges(spark, [("a", "calls", "b"), ("c", "calls", "b"), ("d", "calls", "c")])
    roots = spark.createDataFrame([("b",)], "node string")
    got = {(r["node"], r["depth"]) for r in transitive_closure(e, roots, "reverse").collect()}
    assert got == {("b", 0), ("a", 1), ("c", 1), ("d", 2)}


def test_external_nulls_are_leaves(spark):
    e = spark.createDataFrame(
        [("a", "calls", "b"), ("b", "calls", None)],
        "subj_id string, pred string, obj_id string",
    )
    roots = spark.createDataFrame([("a",)], "node string")
    got = {(r["node"], r["depth"]) for r in transitive_closure(e, roots).collect()}
    assert got == {("a", 0), ("b", 1)}
