"""Branch refs + write-audit-publish — StateStore(path, ref=), create_branch,
publish (the Iceberg branch / ``spark.wap.branch`` / ``fast_forward`` analog;
the reference has one mutable index per store and no staging at all — a bad
ingest lands directly in the serving tables, management/delete.py is the
only recourse).

Pins the contract:

- a branch is a pure pointer fork (zero data copied) into the SAME global
  snapshot chain; versions stay globally monotone across refs;
- a pipeline run with ``branch=`` resumes from and commits to the branch —
  main's readers see NOTHING until publish;
- publish is a fast-forward pointer swap, refused loudly when main advanced
  independently since the fork (never a silent history rewrite);
- per-ref history: ``snapshots()`` follows parent_version chains, so a
  sibling branch's interleaved versions never appear in main's history;
- vacuum protects branch heads like tags until ``drop_branch``;
- branch names resolve anywhere a version does (as-of reads, diff_table).
"""

from __future__ import annotations

import datetime

import pytest
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


BASE = {f"c{i}": f"svc{i}_svc calls store{i}_store ." for i in range(4)}
EDIT = dict(BASE, c1="svc1_svc imports cache1_cache .")


def test_branch_name_validation_and_listing(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    run_pipeline(spark, _tdf(spark, BASE), out_dir=out, state_dir=state)
    store = StateStore(state)
    with pytest.raises(ValueError):
        store.create_branch("7")
    with pytest.raises(ValueError):
        store.create_branch("main")
    store.tag("golden")
    with pytest.raises(ValueError):
        store.create_branch("golden")  # shadows a tag
    v = store.create_branch("audit")
    assert v == store.last_snapshot()["version"]
    assert store.branches() == {"audit": {"version": v, "base": v}}
    with pytest.raises(ValueError):
        store.create_branch("audit")  # duplicate
    with pytest.raises(ValueError):
        store.tag("audit")  # tag shadowing a branch
    assert store.drop_branch("audit") == v
    assert store.branches() == {}
    with pytest.raises(KeyError):
        store.drop_branch("audit")
    with pytest.raises(FileNotFoundError):
        store.create_branch("ghost", version=99)


def test_wap_flow_isolates_main_until_publish(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    run_pipeline(spark, _tdf(spark, BASE), out_dir=out, state_dir=state)
    main = StateStore(state)
    v1 = main.last_snapshot()["version"]
    base_rows = _edge_rows(main.read_table(spark, "edges"))

    main.create_branch("audit")
    run_pipeline(
        spark, _tdf(spark, EDIT), out_dir=out, state_dir=state, branch="audit"
    )

    # write: the branch advanced, main did not
    assert main.last_snapshot()["version"] == v1
    assert main.branches()["audit"]["version"] == v1 + 1
    assert _edge_rows(main.read_table(spark, "edges")) == base_rows
    # the branch run was a real incremental resume from the branch head:
    # only c1 re-extracted, delta edge part on top of the cold one
    branch = StateStore(state, ref="audit")
    assert branch.last_snapshot()["parent_version"] == v1
    assert len(branch.table_parts("edges")) == 2

    # audit: as-of reads by branch name see the edit
    audited = main.read_table(spark, "edges", version="audit")
    assert _edge_rows(audited) != base_rows
    assert audited.filter(
        (F.col("conv_id") == "c1") & (F.col("pred") == "imports")
    ).count() == 1
    # CDC between main and the branch, by name
    d = main.diff_table(spark, "edges", "main", "audit")
    assert {r["change"] for r in d.select("change").collect()} == {
        "insert", "delete"
    }
    assert {r["conv_id"] for r in d.select("conv_id").collect()} == {"c1"}

    # publish: fast-forward pointer swap, history becomes main's verbatim
    head = main.publish("audit")
    assert head["version"] == v1 + 1
    assert main.last_snapshot()["version"] == v1 + 1
    assert _edge_rows(main.read_table(spark, "edges")) == _edge_rows(audited)
    assert [s["version"] for s in main.snapshots()] == [v1, v1 + 1]
    # the branch survives, re-based at the published head
    assert main.branches()["audit"] == {"version": v1 + 1, "base": v1 + 1}
    # nothing new to publish now
    with pytest.raises(ValueError):
        main.publish("audit")


def test_publish_refuses_diverged_main(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    run_pipeline(spark, _tdf(spark, BASE), out_dir=out, state_dir=state)
    store = StateStore(state)
    store.create_branch("audit")
    run_pipeline(
        spark, _tdf(spark, EDIT), out_dir=out, state_dir=state, branch="audit"
    )
    # main commits independently after the fork
    main_edit = dict(BASE, c2="svc2_svc emits queue2_queue .")
    run_pipeline(spark, _tdf(spark, main_edit), out_dir=out, state_dir=state)
    with pytest.raises(RuntimeError, match="advanced"):
        store.publish("audit")
    # main's history never shows the branch's interleaved version
    main_versions = [s["version"] for s in store.snapshots()]
    branch_head = store.branches()["audit"]["version"]
    assert branch_head not in main_versions


def test_global_versions_never_collide_across_refs(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    run_pipeline(spark, _tdf(spark, BASE), out_dir=out, state_dir=state)
    store = StateStore(state)
    store.create_branch("audit")
    run_pipeline(
        spark, _tdf(spark, EDIT), out_dir=out, state_dir=state, branch="audit"
    )  # takes v2
    run_pipeline(
        spark,
        _tdf(spark, dict(BASE, c3="svc3_svc uses disk3_disk .")),
        out_dir=out,
        state_dir=state,
    )  # main must take v3, not clobber the branch's v2
    assert store.last_snapshot()["version"] == 3
    assert store.branches()["audit"]["version"] == 2
    assert store.snapshot(2)["stage"] != store.snapshot(3)["stage"] or (
        store.snapshot(2)["data_path"] != store.snapshot(3)["data_path"]
    )
    # branch head still resolves to ITS snapshot (untouched archive)
    b = StateStore(state, ref="audit")
    assert b.read_table(spark, "edges").filter(
        (F.col("conv_id") == "c1") & (F.col("pred") == "imports")
    ).count() == 1
    # rollback on main takes a globally-fresh version too
    m = store.rollback(1)
    assert m["version"] == 4


def test_vacuum_protects_branch_heads_until_drop(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    run_pipeline(spark, _tdf(spark, BASE), out_dir=out, state_dir=state)
    store = StateStore(state)
    store.create_branch("pinned")  # stale branch at v1
    run_pipeline(spark, _tdf(spark, EDIT), out_dir=out, state_dir=state)
    run_pipeline(
        spark,
        _tdf(spark, dict(EDIT, c2="svc2_svc emits queue2_queue .")),
        out_dir=out,
        state_dir=state,
    )
    store.vacuum(out)
    # the branch head (v1) survived vacuum: still fully readable
    b = StateStore(state, ref="pinned")
    assert b.read_table(spark, "edges").count() > 0
    assert store.read_table(spark, "edges", version="pinned").filter(
        (F.col("conv_id") == "c1") & (F.col("pred") == "calls")
    ).count() == 1
    # released: the next vacuum expires it
    store.drop_branch("pinned")
    store.vacuum(out)
    assert store.snapshot(1) is None
    with pytest.raises((FileNotFoundError, KeyError)):
        StateStore(state, ref="pinned").last_snapshot()


def test_branch_requires_state_dir_and_existing_ref(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    with pytest.raises(ValueError, match="state_dir"):
        run_pipeline(spark, _tdf(spark, BASE), out_dir=out, branch="audit")
    run_pipeline(spark, _tdf(spark, BASE), out_dir=out, state_dir=state)
    with pytest.raises(KeyError, match="unknown branch"):
        run_pipeline(
            spark, _tdf(spark, EDIT), out_dir=out, state_dir=state, branch="nope"
        )


def test_cli_branch_publish_roundtrip(spark, tmp_path):
    import sys

    sys.path.insert(0, "tools")
    import coco

    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    src = str(tmp_path / "turns")
    _tdf(spark, BASE).write.parquet(src)
    edited = str(tmp_path / "turns2")
    _tdf(spark, EDIT).write.parquet(edited)

    r = coco.main(["index", src, "--out", out, "--state", state], spark=spark)
    assert r["ok"] and r["branch"] == "main"
    r = coco.main(["branch", "audit", "--state", state], spark=spark)
    assert r["ok"] and r["version"] == 1
    r = coco.main(
        ["index", edited, "--out", out, "--state", state, "--branch", "audit"],
        spark=spark,
    )
    assert r["ok"] and r["branch"] == "audit"
    # main history untouched; branch history shows the staged commit
    h = coco.main(["history", "--state", state], spark=spark)
    assert [s["version"] for s in h["snapshots"]] == [1]
    assert h["branches"]["audit"]["version"] == 2
    hb = coco.main(["history", "--state", state, "--ref", "audit"], spark=spark)
    assert [s["version"] for s in hb["snapshots"]] == [1, 2]
    # audit via as-of by branch name, then publish
    r = coco.main(
        ["list", "--state", state, "--as-of", "audit"], spark=spark
    )
    assert r["ok"]
    r = coco.main(["publish", "audit", "--state", state], spark=spark)
    assert r["ok"] and r["version"] == 2
    h = coco.main(["history", "--state", state], spark=spark)
    assert [s["version"] for s in h["snapshots"]] == [1, 2]
    r = coco.main(["branch", "--state", state], spark=spark)
    assert r["branches"]["audit"] == {"version": 2, "base": 2}
    r = coco.main(["branch", "audit", "--state", state, "--drop"], spark=spark)
    assert r["ok"] and r["dropped"] == "audit"


def test_streaming_indexer_into_branch(spark, tmp_path):
    """Streaming write-audit-publish: the indexer maintains a staging
    branch (one snapshot per micro-batch), main serves the audited
    snapshot untouched until publish."""
    import glob
    import os
    import shutil

    from coco_search_spark.streaming.ingest import run_streaming_indexer

    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    run_pipeline(spark, _tdf(spark, BASE), out_dir=out, state_dir=state)
    store = StateStore(state)
    v1 = store.last_snapshot()["version"]
    store.create_branch("stream")

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir, exist_ok=True)
    fresh = {"s0": "svc9_svc emits queue9_queue .", "s1": "svc8_svc uses disk8_disk ."}
    for conv, text in fresh.items():
        tmp = f"{input_dir}__stage_{conv}"
        _tdf(spark, {conv: text}).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "*.parquet"))[0]
        os.replace(part, os.path.join(input_dir, f"{conv}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    q = run_streaming_indexer(
        spark, input_dir, out, state, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, branch="stream",
    )
    q.awaitTermination(120)

    # two micro-batches → two branch commits; main never moved
    assert store.last_snapshot()["version"] == v1
    assert store.branches()["stream"]["version"] == v1 + 2
    main_edges = store.read_table(spark, "edges")
    assert main_edges.filter(F.col("conv_id").isin("s0", "s1")).count() == 0
    branch_edges = store.read_table(spark, "edges", version="stream")
    assert branch_edges.filter(F.col("conv_id").isin("s0", "s1")).count() == 2
    # upsert contract held on the branch: base conversations carried
    assert branch_edges.count() == main_edges.count() + 2

    store.publish("stream")
    assert _edge_rows(store.read_table(spark, "edges")) == _edge_rows(branch_edges)
