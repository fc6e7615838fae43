"""Explicit store compaction — StateStore.compact, the operator-invoked
Iceberg ``rewrite_data_files`` analog (the pipeline's automatic
COMPACT_PARTS_AFTER fold is the lazy path; this is the off-peak one).

Pins the contract:

- every multi-part table (facts, chunks, edges) folds into ONE new-version
  part; the resolved tables are value-identical before and after;
- the pre-compact snapshot stays time-travel readable until vacuum, then
  expires with its fragmented parts;
- warm-run reuse gates survive compaction (the next pipeline run still
  delta-writes — compaction changes layout, never content);
- a single-part store is a no-op (nothing committed);
- the CLI ``compact`` verb fronts all of it.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from coco_search_spark.pipeline import run_pipeline
from coco_search_spark.state import StateStore

TS = datetime.datetime(2025, 1, 1)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _tdf(spark, texts: dict):
    return spark.createDataFrame(
        [(c, 0, "user", x, None, TS) for c, x in sorted(texts.items())], SCHEMA
    )


def _edge_rows(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["subj_id"], r["pred"], r["obj_id"])
        for r in df.select("conv_id", "turn_idx", "subj_id", "pred", "obj_id").collect()
    )


def _fact_rows(df):
    return sorted(
        tuple(r) for r in df.select("conv_id", "kind", "subj", "obj").collect()
    )


def _fragmented_store(spark, tmp_path):
    """cold run + one-conv edit → facts/chunks/edges all carry 2 parts."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc calls store{i}_store ." for i in range(6)}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    texts["c2"] = "svc2_svc emits cache2_cache ."
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    return out, state, texts, r2


def test_compact_folds_parts_with_value_parity_and_time_travel(spark, tmp_path):
    out, state, texts, r2 = _fragmented_store(spark, tmp_path)
    store = StateStore(state)
    v_pre = store.last_snapshot()["version"]
    for kind in ("facts", "chunks", "edges"):
        assert len(store.table_parts(kind)) == 2
    pre_edges = _edge_rows(store.read_table(spark, "edges"))
    pre_facts = _fact_rows(store.read_table(spark, "facts"))
    pre_chunks = store.read_table(spark, "chunks").count()

    res = store.compact(spark, out)
    assert res["committed"] and res["version"] == v_pre + 1
    assert set(res["compacted"]) == {"facts", "chunks", "edges"}
    assert store.last_snapshot()["stage"] == "compact"
    for kind in ("facts", "chunks", "edges"):
        assert len(store.table_parts(kind)) == 1
    # value parity: layout changed, content did not
    assert _edge_rows(store.read_table(spark, "edges")) == pre_edges
    assert _fact_rows(store.read_table(spark, "facts")) == pre_facts
    assert store.read_table(spark, "chunks").count() == pre_chunks
    # the fragmented snapshot stays time-travel readable until vacuum
    assert _edge_rows(store.read_table(spark, "edges", version=v_pre)) == pre_edges

    # reuse gates survive: the next run still delta-writes on top of the
    # compacted part (one dirty conv → one delta part, full read parity)
    texts["c3"] = "svc3_svc emits cache3_cache ."
    r3 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r3.metrics["n_edge_dirty_convs"] == 1
    assert r3.metrics["n_edge_parts"] == 2
    assert _edge_rows(store.read_table(spark, "edges")) == _edge_rows(r3.edges)


def test_compact_noop_and_dry_run_commit_nothing(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc uses store{i}_store ." for i in range(3)}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    store = StateStore(state)
    v1 = store.last_snapshot()["version"]
    res = store.compact(spark, out)  # single-part everywhere → no-op
    assert res == {
        "compacted": [],
        "version": v1,
        "parts_before": {"facts": 1, "chunks": 1, "edges": 1},
        "committed": False,
    }
    assert store.last_snapshot()["version"] == v1
    # dry_run on a fragmented store reports without committing
    texts["c1"] = "svc1_svc emits cache1_cache ."
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    v2 = store.last_snapshot()["version"]
    res = store.compact(spark, out, dry_run=True)
    assert set(res["compacted"]) == {"facts", "chunks", "edges"}
    assert not res["committed"]
    assert store.last_snapshot()["version"] == v2


def test_vacuum_after_compact_expires_fragmented_parts(spark, tmp_path):
    out, state, _texts, _r2 = _fragmented_store(spark, tmp_path)
    store = StateStore(state)
    v_pre = store.last_snapshot()["version"]
    old_parts = [
        p["path"]
        for kind in ("facts", "chunks", "edges")
        for p in store.table_parts(kind)
    ]
    pre_edges = _edge_rows(store.read_table(spark, "edges"))
    store.compact(spark, out)
    store.vacuum(out)
    for p in old_parts:
        assert not os.path.exists(p)
    assert store.snapshot(v_pre) is None  # history expired with the parts
    assert _edge_rows(store.read_table(spark, "edges")) == pre_edges
    deleted = store.read_table(spark, "edges").filter(F.col("conv_id") == "zz")
    assert deleted.count() == 0


def test_cli_compact_verb(spark, tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from coco import main as coco_main

    out, state, _texts, _r2 = _fragmented_store(spark, tmp_path)
    d = coco_main(["compact", "--state", state, "--out", out], spark=spark)
    assert d["ok"] and d["committed"]
    assert set(d["compacted"]) == {"facts", "chunks", "edges"}
    d2 = coco_main(["compact", "--state", state, "--out", out], spark=spark)
    assert d2["ok"] and not d2["committed"] and d2["compacted"] == []
