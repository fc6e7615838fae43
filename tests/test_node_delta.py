"""Incremental node maintenance (round 5): degrees are pure sums over edge
rows, so a warm run updates the node table from the delta —
old − contrib(replaced conversations' previous edges) + contrib(their
current edges) — instead of re-aggregating the corpus. These tests pin:

- a warm content change takes the delta path and the on-disk node table
  equals a from-scratch rebuild, row for row;
- deletions subtract their conversations' contributions;
- a standalone-only entity appears/disappears with its last mention;
- a no-op run carries the table (no recompute, no rewrite);
- a catalog move (canonical ids shifted) falls back to the full rebuild.
"""

from __future__ import annotations

import datetime

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


def _node_rows(spark, out):
    return sorted(
        (r["entity_id"], r["out_degree"], r["in_degree"])
        for r in spark.read.parquet(f"{out}/nodes").collect()
    )


def _fresh_nodes(spark, texts, tmp_path, tag):
    res = run_pipeline(
        spark,
        _tdf(spark, texts),
        out_dir=str(tmp_path / f"fo_{tag}"),
        state_dir=str(tmp_path / f"fs_{tag}"),
    )
    return sorted(
        (r["entity_id"], r["out_degree"], r["in_degree"])
        for r in res.nodes.collect()
    )


def test_warm_change_updates_nodes_incrementally_with_parity(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc calls hub_store ." for i in range(5)}
    r1 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r1.metrics["nodes_mode"] == "full"
    # c2 repoints from the hub to a new target; hub loses one in-degree
    texts["c2"] = "svc2_svc calls side2_cache ."
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r2.metrics["nodes_mode"] == "delta"
    assert _node_rows(spark, out) == _fresh_nodes(spark, texts, tmp_path, "a")


def test_deleted_conversation_contributions_subtract(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc calls hub_store ." for i in range(4)}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    del texts["c3"]
    texts["c0"] = "svc0_svc emits hub_store ."
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r2.metrics["nodes_mode"] == "delta"
    got = _node_rows(spark, out)
    assert got == _fresh_nodes(spark, texts, tmp_path, "b")
    assert not any(e.startswith("svc3") for e, _, _ in got)


def test_standalone_only_entity_tracks_its_last_mention(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {
        "ca": "alpha_svc calls beta_store .",
        # lone_queue appears ONLY as a standalone mention here
        "cb": "see lone_queue .",
    }
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    before = _node_rows(spark, out)
    assert any("lone_queue" in e for e, o, i in before)
    # the only mention disappears → the degree-0 node must drop
    texts["cb"] = "see alpha_svc ."
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r2.metrics["nodes_mode"] == "delta"
    after = _node_rows(spark, out)
    assert not any("lone_queue" in e for e, o, i in after)
    assert after == _fresh_nodes(spark, texts, tmp_path, "c")


def test_vocabulary_neutral_deletion_still_updates_nodes(spark, tmp_path):
    """Deleting a conversation whose every surface also appears elsewhere
    leaves the vocabulary (and n_moved) at zero — the node table must STILL
    retire its degree contributions (regression: a carry here goes stale)."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {
        "c0": "alpha_svc calls hub_store .",
        "c1": "alpha_svc calls hub_store .",
    }
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    del texts["c1"]
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r2.metrics["n_link_moved_surfaces"] == 0
    assert r2.metrics["nodes_mode"] == "delta"
    got = _node_rows(spark, out)
    assert got == _fresh_nodes(spark, texts, tmp_path, "d")


def test_noop_run_carries_nodes(spark, tmp_path):
    import os

    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc uses store{i}_store ." for i in range(3)}
    r1 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    mtime1 = os.path.getmtime(f"{out}/nodes")
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r2.metrics["nodes_mode"] == "carry"
    assert os.path.getmtime(f"{out}/nodes") == mtime1  # untouched on disk
    assert r2.metrics["n_nodes"] == r1.metrics["n_nodes"]


def test_catalog_move_updates_nodes_incrementally(spark, tmp_path):
    """A moved canonical id rides the delta path too: every conversation
    its edges touch is edge-dirty, so subtracting their old contributions
    retires the old id and the additions introduce the new one."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {
        "ca": "alpha_svc calls beta_store .",
        "cb": "alpha_svc uses gamma_store .",
        "cc": "omega_queue emits epsilon_store .",
    }
    cat1 = spark.createDataFrame([("E1", "alpha_svc")], "entity_id string, alias string")
    run_pipeline(spark, _tdf(spark, texts), catalog=cat1, out_dir=out, state_dir=state)
    cat2 = spark.createDataFrame([("E2", "alpha_svc")], "entity_id string, alias string")
    r2 = run_pipeline(spark, _tdf(spark, texts), catalog=cat2, out_dir=out, state_dir=state)
    assert r2.metrics["nodes_mode"] == "delta"
    got = _node_rows(spark, out)
    assert any(e == "E2" for e, _, _ in got)
    assert not any(e == "E1" for e, _, _ in got)
    assert got == sorted(
        (r["entity_id"], r["out_degree"], r["in_degree"])
        for r in run_pipeline(
            spark,
            _tdf(spark, texts),
            catalog=cat2,
            out_dir=str(tmp_path / "fo"),
            state_dir=str(tmp_path / "fs"),
        ).nodes.collect()
    )


def test_vocabulary_churn_beyond_budget_rebuilds_fully(spark, tmp_path):
    """A move set larger than broadcast_surface_limit abandons the delta
    machinery entirely (edges full-rewrite AND nodes full rebuild)."""
    from coco_search_spark.config import EngineConfig

    cfg = EngineConfig(broadcast_surface_limit=1)
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {
        "ca": "alpha_svc calls beta_store .",
        "cb": "gamma_svc uses delta_store .",
    }
    cat1 = spark.createDataFrame(
        [("E1", "alpha_svc"), ("E3", "gamma_svc")], "entity_id string, alias string"
    )
    run_pipeline(
        spark, _tdf(spark, texts), catalog=cat1, out_dir=out, state_dir=state, config=cfg
    )
    cat2 = spark.createDataFrame(
        [("E2", "alpha_svc"), ("E4", "gamma_svc")], "entity_id string, alias string"
    )
    r2 = run_pipeline(
        spark, _tdf(spark, texts), catalog=cat2, out_dir=out, state_dir=state, config=cfg
    )
    assert r2.metrics["nodes_mode"] == "full"
    assert r2.metrics["n_edge_dirty_convs"] is None  # edges full-rewrote
    got = _node_rows(spark, out)
    assert any(e == "E2" for e, _, _ in got) and any(e == "E4" for e, _, _ in got)


def test_foreign_nodes_table_fails_provenance_gate(spark, tmp_path):
    """ADVICE r5 (high): a branch (or any other ref) run overwrites the
    shared {out}/nodes sink with ITS corpus degrees; a later warm run on
    main must NOT apply a delta on top of that foreign base. The gate is
    the producing-version stamp: manifest `nodes_version` must match the
    `_PRODUCED_VERSION` sidecar in the dir — here we simulate the foreign
    writer by rewriting the sidecar, and the warm run must fall back to
    nodes_mode=full with degrees equal to a from-scratch rebuild."""
    import os

    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc calls hub_store ." for i in range(5)}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    # foreign writer: same dir, different producing snapshot
    with open(os.path.join(out, "nodes", "_PRODUCED_VERSION"), "w") as f:
        f.write("999999")
    texts["c1"] = "svc1_svc imports alt_store ."
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r2.metrics["nodes_mode"] == "full"
    assert _node_rows(spark, out) == _fresh_nodes(spark, texts, tmp_path, "prov")
    # the rebuild re-stamps provenance, so the NEXT warm run is delta again
    texts["c2"] = "svc2_svc emits beta_store ."
    r3 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r3.metrics["nodes_mode"] == "delta"
    assert _node_rows(spark, out) == _fresh_nodes(spark, texts, tmp_path, "prov3")
