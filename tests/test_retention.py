"""Vacuum retention knobs — ``retain_last`` / ``older_than`` (the Iceberg
``expire_snapshots(retain_last=, older_than=)`` arguments; the reference's
cleanup, management/delete.py, has no history at all). Both only WIDEN the
keep-set over the default current-plus-refs behavior, and retain_last
counts main's LINEAGE (parent chain), not a version range — a sibling
branch's interleaved versions don't eat retention slots."""

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


def _run(spark, out, state, n_edit: int):
    texts = {f"c{i}": f"svc{i}_svc calls store{i}_store ." for i in range(4)}
    if n_edit:
        texts["c0"] = f"svc0_svc imports cache{n_edit}_cache ."
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)


def test_retain_last_keeps_lineage_suffix(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    for i in range(4):  # v1..v4
        _run(spark, out, state, i)
    store = StateStore(state)
    with pytest.raises(ValueError):
        store.vacuum(out, retain_last=0)
    store.vacuum(out, retain_last=3)
    # v2, v3 retained alongside the current v4; v1 expired
    assert store.snapshot(1) is None
    for v in (2, 3, 4):
        assert store.snapshot(v) is not None
        assert store.read_table(spark, "edges", version=v).count() > 0
    # the default sweep then expires the rest
    store.vacuum(out)
    assert store.snapshot(2) is None and store.snapshot(3) is None
    assert store.read_table(spark, "edges").count() > 0


def test_retain_last_counts_lineage_not_versions(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    _run(spark, out, state, 0)  # main v1
    store = StateStore(state)
    store.create_branch("stage")
    _run_branch = dict(
        {f"c{i}": f"svc{i}_svc calls store{i}_store ." for i in range(4)},
        c1="svc1_svc emits queue_queue .",
    )
    run_pipeline(
        spark, _tdf(spark, _run_branch), out_dir=out, state_dir=state,
        branch="stage",
    )  # branch v2
    _run(spark, out, state, 7)  # main v3 (parent v1)
    # retain_last=2 on main keeps v1 (main's parent), NOT the branch's v2 —
    # which survives anyway as a branch head
    store.vacuum(out, retain_last=2)
    assert store.snapshot(1) is not None
    assert store.read_table(spark, "edges", version=1).count() > 0
    b = StateStore(state, ref="stage")
    assert b.read_table(spark, "edges").count() > 0
    # drop the branch: v2 now unprotected, v1 still lineage-retained
    store.drop_branch("stage")
    store.vacuum(out, retain_last=2)
    assert store.snapshot(2) is None
    assert store.snapshot(1) is not None


def test_older_than_protects_recent_commits(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    for i in range(3):  # v1..v3
        _run(spark, out, state, i)
    store = StateStore(state)
    v2_ts = store.snapshot(2)["committed_at"]
    # expire only snapshots strictly older than v2's commit time
    store.vacuum(out, older_than=v2_ts)
    assert store.snapshot(1) is None
    assert store.snapshot(2) is not None
    assert store.read_table(spark, "edges", version=2).count() > 0


def test_cli_vacuum_retention_flags(spark, tmp_path):
    import sys

    sys.path.insert(0, "tools")
    import coco

    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    for i in range(3):
        _run(spark, out, state, i)
    r = coco.main(
        ["vacuum", "--state", state, "--out", out, "--retain-last", "2"],
        spark=spark,
    )
    assert r["ok"]
    store = StateStore(state)
    assert store.snapshot(1) is None and store.snapshot(2) is not None


def test_files_metadata_inspection(spark, tmp_path):
    """StateStore.files (the Iceberg `files` metadata-table analog): one
    row per referenced data dir with counts/bytes, as-of aware, and the
    delta story is visible — v2 references strictly more part dirs."""
    import sys

    sys.path.insert(0, "tools")
    import coco

    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    _run(spark, out, state, 0)
    _run(spark, out, state, 1)
    store = StateStore(state)
    v1 = store.files(version=1)
    cur = store.files()
    assert all(r["n_files"] > 0 and r["bytes"] > 0 for r in v1)
    kinds = {r["kind"] for r in cur}
    assert {"state", "facts", "chunks", "edges"} <= kinds
    # the warm run delta-wrote: the current snapshot resolves MORE part
    # dirs than v1 (cold part + delta part)
    n_parts = lambda rows, k: sum(1 for r in rows if r["kind"] == k)  # noqa: E731
    assert n_parts(cur, "facts") == n_parts(v1, "facts") + 1
    assert n_parts(cur, "edges") == n_parts(v1, "edges") + 1
    r = coco.main(["files", "--state", state, "--as-of", "1"], spark=spark)
    assert r["ok"] and r["n_dirs"] == len(v1) and r["total_bytes"] > 0


def test_vacuum_keeps_protected_rollback_snapshots_state_dir(spark, tmp_path):
    """ADVICE r5 (medium): a rollback commit vN aliases its data_path to
    the TARGET's state_vK (K < N). When the rollback snapshot is protected
    (tag / retain_last), vacuum must exempt state_vK even though K itself
    is neither current nor protected — otherwise the supposedly-retained
    snapshot becomes unreadable."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    _run(spark, out, state, 0)   # v1
    _run(spark, out, state, 1)   # v2
    store = StateStore(state)
    rb = store.rollback(1)       # v3, data_path -> state_v000001
    store.tag("keep", rb["version"])
    _run(spark, out, state, 2)   # v4 (current)
    victims = store.vacuum(out)
    # the rollback snapshot stays readable after vacuum
    assert store.read(spark, version=rb["version"]).count() > 0
    data_dir = store.snapshot(rb["version"])["data_path"]
    import os

    assert os.path.exists(data_dir)
    assert all("state_v000001" not in v for v in victims)
