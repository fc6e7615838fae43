"""Snapshot CDC diff (round 5 — Iceberg changelog-read analog).

- StateStore.diff_table(kind, v_from, v_to) returns the insert/delete
  changelog between two committed snapshots, tagged in a `change` column;
- pointer-equal conversations are pruned up front (changed_convs) — they
  resolve to the same part dir on both sides, so they cannot differ;
- works for the state-pointer table kinds (facts: written_version,
  edges: edges_wv) and composes with time travel + vacuum expiry;
- _align_columns absorbs schema evolution between snapshots.

Reference twin: the tracking table (flow.py:436-448) can only be replayed
forward — it has no two-arbitrary-commits diff; this is the Spark-state
re-expression of that gap via Iceberg's create_changelog_view semantics.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from coco_search_spark.pipeline import run_pipeline
from coco_search_spark.state import StateStore, _align_columns

TS = datetime.datetime(2025, 1, 1)


def _tdf(spark, texts):
    return spark.createDataFrame(
        [(c, 0, "user", x, None, TS) for c, x in sorted(texts.items())],
        "conv_id string, turn_idx int, role string, text string, tool string,"
        " ts timestamp",
    )


def _facts_set(df):
    return {
        (r["conv_id"], r["kind"], r["subj"], r["pred"], r["obj"])
        for r in df.select("conv_id", "kind", "subj", "pred", "obj").collect()
    }


def _tagged(df, change):
    return _facts_set(df.filter(F.col("change") == change))


def test_diff_table_insert_delete_edit_and_pruning(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {
        "c0": "alpha_svc calls beta_store .",  # untouched both runs
        "c1": "gamma_svc uses delta_store .",  # edited in run 2
        "c2": "eps_svc imports zeta_store .",  # deleted in run 2
    }
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    store = StateStore(state)
    v1_facts = _facts_set(store.read_table(spark, "facts"))

    texts["c1"] = "gamma_svc emits omega_cache ."
    del texts["c2"]
    texts["c3"] = "newsvc_svc calls newstore_store ."
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    v2_facts = _facts_set(store.read_table(spark, "facts"))

    # pruning core: the untouched conversation is pointer-equal in both
    # snapshots and must not survive changed_convs
    changed = {
        r["conv_id"] for r in store.changed_convs(spark, "facts", 1, 2).collect()
    }
    assert changed == {"c1", "c2", "c3"}

    # the changelog is exactly the set difference both ways
    diff = store.diff_table(spark, "facts", v_from=1, v_to=2)
    assert set(diff.columns) >= {"conv_id", "kind", "subj", "pred", "obj", "change"}
    assert _tagged(diff, "insert") == v2_facts - v1_facts
    assert _tagged(diff, "delete") == v1_facts - v2_facts
    # the edit shows up on both sides, the add/delete on one each,
    # the untouched conversation on neither
    assert {c for c, *_ in _tagged(diff, "insert")} == {"c1", "c3"}
    assert {c for c, *_ in _tagged(diff, "delete")} == {"c1", "c2"}

    # v_to defaults to the current snapshot
    dflt = store.diff_table(spark, "facts", v_from=1)
    assert _facts_set(dflt) == _facts_set(diff)

    # self-diff is empty but keeps the table schema + change column
    self_diff = store.diff_table(spark, "facts", v_from=2, v_to=2)
    assert self_diff.count() == 0
    assert "change" in self_diff.columns

    # edges use their own pointer column (edges_wv)
    def _edges(df):
        return {
            (r["conv_id"], r["subj_id"], r["pred"], r["obj_id"])
            for r in df.select("conv_id", "subj_id", "pred", "obj_id").collect()
        }

    e1 = _edges(store.read_table(spark, "edges", version=1))
    e2 = _edges(store.read_table(spark, "edges", version=2))
    ediff = store.diff_table(spark, "edges", v_from=1)
    assert _edges(ediff.filter("change = 'insert'")) == e2 - e1
    assert _edges(ediff.filter("change = 'delete'")) == e1 - e2

    # gold CDC invariant: applying the changelog to v1 reproduces v2
    # exactly at full-row level (maps encoded — set ops reject MAP cols)
    from coco_search_spark.state import _encode_maps, _map_cols

    v1e = store.read_table(spark, "edges", version=1)
    cols = sorted(v1e.columns)
    maps = _map_cols(v1e)
    v1e = _encode_maps(v1e, maps).select(*cols)
    v2e = _encode_maps(store.read_table(spark, "edges", version=2), maps).select(*cols)
    ins = _encode_maps(ediff.filter("change = 'insert'"), maps).select(*cols)
    dele = _encode_maps(ediff.filter("change = 'delete'"), maps).select(*cols)
    applied = v1e.exceptAll(dele).unionByName(ins)
    assert applied.exceptAll(v2e).count() == 0
    assert v2e.exceptAll(applied).count() == 0

    # chunks diff (third table kind; embedding float-arrays ride exceptAll)
    cdiff = store.diff_table(spark, "chunks", v_from=1)
    c_convs = {r["conv_id"] for r in cdiff.select("conv_id").distinct().collect()}
    assert c_convs <= {"c1", "c2", "c3"} and "c2" in c_convs and "c3" in c_convs
    assert cdiff.filter("conv_id = 'c2' and change = 'insert'").count() == 0
    assert cdiff.filter("conv_id = 'c2' and change = 'delete'").count() > 0
    assert cdiff.filter("conv_id = 'c3' and change = 'delete'").count() == 0

    # vacuum expires v1 → the diff must raise, never silently read current
    store.vacuum(out)
    with pytest.raises(FileNotFoundError):
        store.diff_table(spark, "facts", v_from=1).count()


def test_diff_table_no_snapshot_raises(spark, tmp_path):
    store = StateStore(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        store.diff_table(spark, "facts", v_from=1)


def test_align_columns_schema_evolution(spark):
    a = spark.createDataFrame([(1, "x")], "id int, old_col string")
    b = spark.createDataFrame([(2, 3.5)], "id int, new_col double")
    a2, b2 = _align_columns(a, b)
    assert a2.columns == b2.columns
    assert set(a2.columns) == {"id", "old_col", "new_col"}
    # missing columns become typed NULLs (typed from the side that has them)
    assert dict(a2.dtypes)["new_col"] == "double"
    assert dict(b2.dtypes)["old_col"] == "string"
    ra, rb = a2.collect()[0], b2.collect()[0]
    assert ra["new_col"] is None and ra["old_col"] == "x"
    assert rb["old_col"] is None and rb["new_col"] == 3.5
    # exceptAll works across the aligned pair (the diff_table use case)
    assert a2.exceptAll(b2).count() == 1
