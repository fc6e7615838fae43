"""Upsert-only pipeline mode + the Structured Streaming indexer.

``run_pipeline(upsert_only=True)`` accepts a PARTIAL corpus (a streaming
micro-batch, a partner drop): conversations absent from the input are
CARRIED from the stored state, never read as deletions. These tests pin:

- an upsert over (1 changed + 1 new) conversation produces a store
  value-identical to a full-corpus run over the updated corpus;
- replaying the same batch is a no-op (same hash → unchanged);
- ``run_streaming_indexer`` (foreachBatch → upsert run_pipeline) drains a
  multi-file corpus into the same store a batch run builds, commits one
  snapshot per batch, and resumes from the checkpoint (a newly landed
  file is the only thing the next drain processes).
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


def test_upsert_carries_absent_convs_and_matches_full_run(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc calls store{i}_store ." for i in range(5)}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)

    # the update: one changed conversation + one brand-new one, delivered
    # as a PARTIAL input holding only those two
    texts["c2"] = "svc2_svc emits cache2_cache ."
    texts["c9"] = "svc9_svc imports store9_store ."
    batch = {k: texts[k] for k in ("c2", "c9")}
    r = run_pipeline(
        spark, _tdf(spark, batch), out_dir=out, state_dir=state, upsert_only=True
    )
    assert r.metrics["n_unchanged_convs"] == 4  # absent convs carried
    store = StateStore(state)
    st = store.read(spark)
    assert st.count() == 6  # nothing deleted, c9 added

    # reference: a fresh full-corpus run over the updated corpus
    out2, state2 = str(tmp_path / "o2"), str(tmp_path / "s2")
    run_pipeline(spark, _tdf(spark, texts), out_dir=out2, state_dir=state2)
    ref = StateStore(state2)
    assert _edge_rows(store.read_table(spark, "edges")) == _edge_rows(
        ref.read_table(spark, "edges")
    )
    assert _fact_rows(store.read_table(spark, "facts")) == _fact_rows(
        ref.read_table(spark, "facts")
    )
    # carried conversations kept their lineage (hash + pointer intact):
    # the upsert wrote only the batch's rows into its delta part
    snap = store.last_snapshot()
    delta = spark.read.parquet(snap["facts_parts"][-1]["path"])
    assert {r["conv_id"] for r in delta.select("conv_id").collect()} == {"c2", "c9"}


def test_upsert_replay_is_noop(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {f"c{i}": f"svc{i}_svc uses store{i}_store ." for i in range(4)}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    batch = {"c1": texts["c1"], "c3": texts["c3"]}
    store = StateStore(state)
    before = _edge_rows(store.read_table(spark, "edges"))
    r = run_pipeline(
        spark, _tdf(spark, batch), out_dir=out, state_dir=state, upsert_only=True
    )
    # identical content → unchanged; at-least-once replay is harmless
    assert r.metrics["n_unchanged_convs"] == 4
    assert _edge_rows(store.read_table(spark, "edges")) == before
    assert store.read(spark).count() == 4


def _write_conv_files(spark, texts: dict, input_dir: str) -> None:
    """One parquet file per conversation — the transcript-bundle layout the
    streaming indexer's whole-conversations-per-batch contract assumes."""
    import glob
    import shutil

    os.makedirs(input_dir, exist_ok=True)
    for conv, text in texts.items():
        tmp = f"{input_dir}__stage_{conv}"
        _tdf(spark, {conv: text}).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "*.parquet"))[0]
        os.replace(part, os.path.join(input_dir, f"{conv}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_indexer_builds_and_resumes_store(spark, tmp_path):
    from coco_search_spark.streaming.ingest import run_streaming_indexer

    input_dir = str(tmp_path / "in")
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    ckpt = str(tmp_path / "ckpt")
    texts = {f"c{i}": f"svc{i}_svc calls store{i}_store ." for i in range(6)}
    _write_conv_files(spark, texts, input_dir)

    q = run_streaming_indexer(
        spark, input_dir, out, state, ckpt, max_files_per_trigger=2
    )
    q.awaitTermination(120)
    store = StateStore(state)
    # one snapshot per non-empty micro-batch: 6 files / 2 per trigger = 3
    assert len(store.snapshots()) == 3
    assert store.read(spark).count() == 6

    # the drained store equals a batch run over the same corpus
    out2, state2 = str(tmp_path / "o2"), str(tmp_path / "s2")
    run_pipeline(spark, _tdf(spark, texts), out_dir=out2, state_dir=state2)
    assert _edge_rows(store.read_table(spark, "edges")) == _edge_rows(
        StateStore(state2).read_table(spark, "edges")
    )

    # a newly landed file is all the next drain processes (checkpointed
    # offsets): one more snapshot, the new conversation appears, nothing
    # else is touched
    _write_conv_files(spark, {"c9": "svc9_svc imports store9_store ."}, input_dir)
    q2 = run_streaming_indexer(
        spark, input_dir, out, state, ckpt, max_files_per_trigger=2
    )
    q2.awaitTermination(120)
    assert len(store.snapshots()) == 4
    resolved = store.read_table(spark, "edges")
    assert resolved.filter(F.col("conv_id") == "c9").count() > 0
    assert store.read(spark).count() == 7
