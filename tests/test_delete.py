"""Targeted conversation deletion — StateStore.delete_convs (the
reference's ``delete`` verb, management/delete.py, at engine granularity).

Pins the contract:

- pointer-level: a new snapshot whose state table omits the ids — every
  read_table drops their rows immediately, zero data files touched;
- recoverable: the pre-delete snapshot stays time-travel readable and
  rollback restores it (until vacuum);
- derived-table gates drop: the next pipeline run recomputes vocabulary /
  canon / links / nodes from the remaining corpus and its store equals a
  fresh full run;
- unknown ids raise (never an empty no-op commit); the CLI verb fronts it.
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


def test_delete_is_pointer_level_and_recoverable(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc calls store{i}_store ." for i in range(5)}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    store = StateStore(state)
    v1 = store.last_snapshot()["version"]

    receipt = store.delete_convs(spark, ["c1", "c3"])
    assert receipt["n_removed"] == 2 and receipt["version"] == v1 + 1
    snap = store.last_snapshot()
    assert snap["stage"] == "delete" and snap["deleted_conv_count"] == 2
    # rows vanish from every resolved table without a data rewrite:
    # the part lists are the v1 dirs, verbatim
    assert snap["facts_parts"] == store.snapshot(v1)["facts_parts"]
    for kind in ("facts", "chunks", "edges"):
        got = store.read_table(spark, kind)
        assert got.filter(F.col("conv_id").isin("c1", "c3")).count() == 0
    assert store.read(spark).count() == 3
    # CDC sees the deletion
    d = store.diff_table(spark, "edges", v1)
    assert {r["change"] for r in d.select("change").collect()} == {"delete"}
    # time travel still shows the pre-delete world; rollback restores it
    assert (
        store.read_table(spark, "edges", version=v1)
        .filter(F.col("conv_id") == "c1")
        .count()
        > 0
    )
    store.rollback(v1)
    assert store.read_table(spark, "edges").filter(F.col("conv_id") == "c1").count() > 0


def test_next_run_after_delete_equals_fresh_store(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc uses store{i}_store ." for i in range(4)}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    store = StateStore(state)
    store.delete_convs(spark, ["c0"])
    del texts["c0"]
    # re-index the remaining corpus: reuse gates were dropped, so derived
    # tables recompute; the store must equal a from-scratch run
    r = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r.metrics["n_unchanged_convs"] == 3  # facts/chunks still reused
    out2, state2 = str(tmp_path / "o2"), str(tmp_path / "s2")
    run_pipeline(spark, _tdf(spark, texts), out_dir=out2, state_dir=state2)
    ref = StateStore(state2)
    assert _edge_rows(store.read_table(spark, "edges")) == _edge_rows(
        ref.read_table(spark, "edges")
    )
    assert store.read(spark).count() == 3


def test_delete_unknown_ids_raise(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    run_pipeline(
        spark,
        _tdf(spark, {"c0": "alpha_svc calls beta_store ."}),
        out_dir=out,
        state_dir=state,
    )
    store = StateStore(state)
    with pytest.raises(KeyError):
        store.delete_convs(spark, ["nope"])
    assert store.last_snapshot()["stage"] != "delete"


def test_cli_delete_verb(spark, tmp_path):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from coco import main as coco_main

    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc calls store{i}_store ." for i in range(3)}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    d = coco_main(["delete", "c2", "--state", state], spark=spark)
    assert d["ok"] and d["n_removed"] == 1
    lst = coco_main(["list", "--state", state], spark=spark)
    assert lst["n_conversations"] == 2
    bad = coco_main(["delete", "zzz", "--state", state], spark=spark)
    assert not bad["ok"]
