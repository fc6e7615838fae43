"""Delta-materialized edge sink (VERDICT r4 #3).

Edge rows are pure in (conversation triples, link_map): a warm run whose
link map is unchanged for every surface a conversation mentions may keep
that conversation's stored edges. These tests pin the contract:

- warm runs write O(delta) edge files (one versioned part holding only the
  edge-dirty conversations' rows);
- ``StateStore.read_table(spark, "edges")`` equals the in-memory full edge
  table row for row after any mix of cold/delta/carry runs;
- a link-map move (catalog edit) dirties exactly the conversations that
  mention a moved surface, even with zero content changes;
- the part list folds back to one full part at the compaction bound;
- deleted conversations' edges drop out of the resolved table.
"""

from __future__ import annotations

import datetime
import json
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


def test_warm_run_writes_delta_edge_part_with_full_read_parity(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc calls store{i}_store ." for i in range(6)}
    r1 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r1.metrics["n_edge_parts"] == 1  # cold: one full part
    assert r1.metrics["n_edge_dirty_convs"] is None  # full rewrite path

    texts["c2"] = "svc2_svc emits cache2_cache ."
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r2.metrics["n_edge_parts"] == 2  # delta appended
    assert r2.metrics["n_edge_dirty_convs"] == 1  # only c2
    store = StateStore(state)
    snap = store.last_snapshot()
    # the delta part holds ONLY the edge-dirty conversation's rows
    delta_part = spark.read.parquet(snap["edges_parts"][-1]["path"])
    assert {r["conv_id"] for r in delta_part.select("conv_id").collect()} == {"c2"}
    # resolved table == in-memory full recompute, row for row
    assert _edge_rows(store.read_table(spark, "edges")) == _edge_rows(r2.edges)


def test_noop_run_carries_edge_parts_and_linkmap(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc uses store{i}_store ." for i in range(4)}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    store = StateStore(state)
    parts1 = store.last_snapshot()["edges_parts"]
    lm1 = store.last_snapshot()["linkmap_path"]
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r2.metrics["n_edge_dirty_convs"] == 0
    assert r2.metrics["n_link_moved_surfaces"] == 0
    snap2 = store.last_snapshot()
    assert snap2["edges_parts"] == parts1  # verbatim carry-forward
    assert snap2["linkmap_path"] == lm1
    assert _edge_rows(store.read_table(spark, "edges")) == _edge_rows(r2.edges)


def test_catalog_move_dirties_mentioning_conversations_only(spark, tmp_path):
    """Zero content changes + a catalog edit that relinks one surface →
    exactly the conversations mentioning that surface get rewritten."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {
        "ca": "alpha_svc calls beta_store .",
        "cb": "alpha_svc uses gamma_store .",
        # no token overlap with the catalog alias — must NOT fuzzy-link to
        # it (a "_svc" subject would, via the RRF token leg, and would then
        # legitimately ride the move)
        "cc": "omega_queue emits epsilon_store .",
    }
    cat1 = spark.createDataFrame(
        [("E1", "alpha_svc")], "entity_id string, alias string"
    )
    run_pipeline(spark, _tdf(spark, texts), catalog=cat1, out_dir=out, state_dir=state)
    cat2 = spark.createDataFrame(
        [("E2", "alpha_svc")], "entity_id string, alias string"
    )
    r2 = run_pipeline(spark, _tdf(spark, texts), catalog=cat2, out_dir=out, state_dir=state)
    assert r2.metrics["n_unchanged_convs"] == 3  # no content change
    assert r2.metrics["n_link_moved_surfaces"] >= 1
    assert r2.metrics["n_edge_dirty_convs"] == 2  # ca + cb mention alpha_svc
    store = StateStore(state)
    snap = store.last_snapshot()
    delta_part = spark.read.parquet(snap["edges_parts"][-1]["path"])
    assert {r["conv_id"] for r in delta_part.select("conv_id").collect()} == {"ca", "cb"}
    got = _edge_rows(store.read_table(spark, "edges"))
    assert got == _edge_rows(r2.edges)
    assert any(s == "E2" for (_, _, s, _, _) in got)  # the move landed
    assert not any(s == "E1" for (_, _, s, _, _) in got)  # no stale edges


def test_edge_parts_fold_at_compaction_bound(spark, tmp_path):
    from coco_search_spark.config import EngineConfig

    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc calls store{i}_store ." for i in range(4)}
    cfg = EngineConfig(compact_parts_after=2)
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state, config=cfg)
    store = StateStore(state)
    for step in range(3):
        texts["c1"] = f"svc1_svc emits cache{step}_cache ."
        r = run_pipeline(
            spark, _tdf(spark, texts), out_dir=out, state_dir=state, config=cfg
        )
        assert r.metrics["n_edge_parts"] <= 2  # never beyond the bound
        assert _edge_rows(store.read_table(spark, "edges")) == _edge_rows(r.edges)


def test_deleted_conversation_edges_drop_out(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc calls store{i}_store ." for i in range(4)}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    del texts["c3"]
    texts["c0"] = "svc0_svc emits cache0_cache ."
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    store = StateStore(state)
    resolved = store.read_table(spark, "edges")
    assert resolved.filter(F.col("conv_id") == "c3").count() == 0
    assert _edge_rows(resolved) == _edge_rows(r2.edges)


def test_vacuum_removes_superseded_legacy_edges_dir(spark, tmp_path):
    """After the upgrade to versioned edge parts, a stale pre-upgrade
    ``edges`` dir in the same out_dir is provably superseded (the manifest
    carries edges_parts) and vacuum removes it; storeless layouts have no
    manifest and are never touched."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {"ca": "alpha_svc calls beta_store ."}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    legacy = os.path.join(out, "edges")
    os.makedirs(legacy, exist_ok=True)
    store = StateStore(state)
    victims = store.vacuum(out)
    assert legacy in {os.path.realpath(v) for v in victims}
    assert not os.path.exists(legacy)
    # current versioned parts untouched
    for p in store.last_snapshot()["edges_parts"]:
        assert os.path.exists(p["path"])


def test_empty_delta_part_stays_readable(spark, tmp_path):
    """An edit that removes a conversation's every triple yields an EMPTY
    delta edge part — resolution must still work and the conversation's old
    edges must drop out."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc calls store{i}_store ." for i in range(3)}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    texts["c1"] = "no triples in this text at all"
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r2.metrics["n_edge_dirty_convs"] == 1
    store = StateStore(state)
    resolved = store.read_table(spark, "edges")
    assert resolved.filter(F.col("conv_id") == "c1").count() == 0
    assert _edge_rows(resolved) == _edge_rows(r2.edges)


def test_legacy_snapshot_without_linkmap_full_rewrites(spark, tmp_path):
    """A snapshot committed before the linkmap existed (or with the file
    deleted) must fall back to a full edge rewrite — unknown is not
    known-unchanged."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc calls store{i}_store ." for i in range(3)}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    # simulate a pre-linkmap manifest
    mp = os.path.join(state, "manifest.json")
    with open(mp) as f:
        snap = json.load(f)
    snap.pop("linkmap_path", None)
    snap.pop("edges_parts", None)
    with open(mp, "w") as f:
        json.dump(snap, f)
    texts["c1"] = "svc1_svc emits cache1_cache ."
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r2.metrics["n_edge_dirty_convs"] is None  # full rewrite path
    store = StateStore(state)
    assert len(store.last_snapshot()["edges_parts"]) == 1
    assert _edge_rows(store.read_table(spark, "edges")) == _edge_rows(r2.edges)
