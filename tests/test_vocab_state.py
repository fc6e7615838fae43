"""Refcounted vocabulary maintenance (vocab_state.py).

The surface / binding-pair / standalone-mention sets and the per-kind fact
totals are maintained from the delta on warm runs (vocab_mode == "delta")
and must be value-identical to a from-scratch recompute after ANY edit
shape: content change, surface removal (the only conversation holding a
surface edited away), conversation deletion, and the no-op carry. A warm
run with the maintained vocabulary never materializes the corpus-wide
fact union (lean_facts) — these tests pin both the receipts and the
parity."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from coco_search_spark.pipeline import run_pipeline
from coco_search_spark.state import StateStore

TS = datetime.datetime(2025, 1, 1)


def _write_file(path: str, rows: list[tuple[str, int, str]]) -> None:
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array(["user"] * len(rows), pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
                "tool": pa.array([None] * len(rows), pa.string()),
                "ts": pa.array([TS] * len(rows), pa.timestamp("us")),
            }
        ),
        path,
    )
    crc = os.path.join(os.path.dirname(path), f".{os.path.basename(path)}.crc")
    if os.path.exists(crc):
        os.remove(crc)


FILES = {
    # shared_svc appears in TWO conversations (c0, c2) — editing one away
    # must keep it; rare_svc appears ONLY in c1 — editing c1 must drop it.
    # c3 carries an alias binding and a standalone mention.
    "a.parquet": [
        ("c0", 0, "shared_svc calls store0_store ."),
        ("c1", 0, "rare_svc uses store1_store ."),
    ],
    "b.parquet": [
        ("c2", 0, "shared_svc emits cache2_cache ."),
        ("c3", 0, "bind_target_svc as bt_alias . lonely_mention_svc ."),
    ],
}


def _corpus(root) -> str:
    d = str(root / "corpus")
    os.makedirs(d, exist_ok=True)
    for name, rows in FILES.items():
        _write_file(os.path.join(d, name), rows)
    return d


def _surface_set(res) -> set[str]:
    return {r["surface"] for r in res.canon.select("surface").collect()}


def _node_rows(res):
    return sorted(
        (r["entity_id"], r["out_degree"], r["in_degree"])
        for r in res.nodes.select("entity_id", "out_degree", "in_degree").collect()
    )


def _vocab_rows(spark, state_dir):
    snap = StateStore(state_dir).last_snapshot()
    assert snap.get("vocab_path"), "snapshot carries no vocab table"
    return sorted(
        tuple(r)
        for r in spark.read.parquet(snap["vocab_path"])
        .select("vkind", "k1", "k2", "cnt")
        .collect()
    )


def _run(spark, d, out, state):
    return run_pipeline(spark, spark.read.parquet(d), out_dir=out, state_dir=state)


def test_warm_run_maintains_vocab_with_full_parity(spark, tmp_path):
    """Edit that REMOVES a single-conversation surface and adds a new one:
    the maintained vocabulary, kind totals, surfaces, nodes and persisted
    tables all equal a from-scratch rebuild."""
    d = _corpus(tmp_path)
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    r1 = _run(spark, d, out, state)
    assert r1.metrics["vocab_mode"] == "full"
    assert not r1.metrics["lean_facts"]
    # rare_svc gone, fresh_svc new
    _write_file(
        os.path.join(d, "a.parquet"),
        [
            ("c0", 0, "shared_svc calls store0_store ."),
            ("c1", 0, "fresh_svc uses store1_store ."),
        ],
    )
    r2 = _run(spark, d, out, state)
    assert r2.metrics["vocab_mode"] == "delta"
    assert r2.metrics["lean_facts"]
    fresh = _run(spark, d, str(tmp_path / "o2"), str(tmp_path / "s2"))
    # vocabulary parity: set membership AND refcounts
    assert _vocab_rows(spark, state) == _vocab_rows(spark, str(tmp_path / "s2"))
    s2 = _surface_set(r2)
    assert "rare_svc" not in s2 and "fresh_svc" in s2 and "shared_svc" in s2
    assert s2 == _surface_set(fresh)
    assert r2.metrics["n_triples"] == fresh.metrics["n_triples"]
    assert r2.metrics["n_standalone_mentions"] == fresh.metrics["n_standalone_mentions"]
    assert r2.metrics["n_surfaces"] == fresh.metrics["n_surfaces"]
    assert _node_rows(r2) == _node_rows(fresh)
    store, store2 = StateStore(state), StateStore(str(tmp_path / "s2"))
    fr = lambda df: sorted(
        tuple(r) for r in df.select("conv_id", "kind", "subj", "pred", "obj").collect()
    )
    assert fr(store.read_table(spark, "facts")) == fr(store2.read_table(spark, "facts"))


def test_shared_surface_survives_single_conv_edit(spark, tmp_path):
    """shared_svc is held by c0 AND c2 — editing it out of c0 must NOT drop
    it from the vocabulary (the refcount decrements to 1, not 0)."""
    d = _corpus(tmp_path)
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    _run(spark, d, out, state)
    _write_file(
        os.path.join(d, "a.parquet"),
        [
            ("c0", 0, "other_svc calls store0_store ."),
            ("c1", 0, "rare_svc uses store1_store ."),
        ],
    )
    r2 = _run(spark, d, out, state)
    assert r2.metrics["vocab_mode"] == "delta"
    s2 = _surface_set(r2)
    assert "shared_svc" in s2 and "other_svc" in s2
    snap = StateStore(state).last_snapshot()
    cnts = {
        (r["vkind"], r["k1"]): r["cnt"]
        for r in __import__("pyspark").sql.SparkSession.getActiveSession()
        .read.parquet(snap["vocab_path"])
        .collect()
    }
    assert cnts[("surf", "shared_svc")] == 1
    assert cnts[("surf", "other_svc")] == 1


def test_deletion_retires_vocab_contributions(spark, tmp_path):
    """Deleting a file (tombstoning its conversations) must retire their
    vocabulary contributions — parity with a rebuild over the remaining
    corpus, including binding pairs and standalone mentions."""
    d = _corpus(tmp_path)
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    _run(spark, d, out, state)
    os.remove(os.path.join(d, "b.parquet"))
    crc = os.path.join(d, ".b.parquet.crc")
    if os.path.exists(crc):
        os.remove(crc)
    r2 = _run(spark, d, out, state)
    assert r2.metrics["vocab_mode"] == "delta"
    fresh = _run(spark, d, str(tmp_path / "o2"), str(tmp_path / "s2"))
    assert _vocab_rows(spark, state) == _vocab_rows(spark, str(tmp_path / "s2"))
    s2 = _surface_set(r2)
    assert "bind_target_svc" not in s2 and "lonely_mention_svc" not in s2
    assert s2 == _surface_set(fresh)
    assert r2.metrics["n_triples"] == fresh.metrics["n_triples"]
    assert _node_rows(r2) == _node_rows(fresh)


def test_noop_run_carries_vocab_pointer(spark, tmp_path):
    """An unchanged-corpus re-run carries the vocab pointer (no rewrite)
    and keeps the kind totals."""
    d = _corpus(tmp_path)
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    r1 = _run(spark, d, out, state)
    snap1 = StateStore(state).last_snapshot()
    r2 = _run(spark, d, out, state)
    snap2 = StateStore(state).last_snapshot()
    assert snap2["vocab_path"] == snap1["vocab_path"]
    assert snap2["fact_kind_counts"] == snap1["fact_kind_counts"]
    assert r2.metrics["n_triples"] == r1.metrics["n_triples"]


def test_corrupt_vocab_falls_back_loudly_correct(spark, tmp_path):
    """A vocab table that does not match the snapshot's facts (negative
    refcount on subtraction) must fall back to the full recompute — and the
    run's outputs stay correct."""
    d = _corpus(tmp_path)
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    _run(spark, d, out, state)
    snap = StateStore(state).last_snapshot()
    vp = snap["vocab_path"]
    # corrupt: zero out every count so any subtraction goes negative
    vdf = spark.read.parquet(vp)
    broken = vdf.withColumn("cnt", F.lit(0).cast("long")).localCheckpoint(eager=True)
    broken.write.mode("overwrite").parquet(vp)
    _write_file(
        os.path.join(d, "a.parquet"),
        [
            ("c0", 0, "shared_svc calls store0_store ."),
            ("c1", 0, "fresh_svc uses store1_store ."),
        ],
    )
    r2 = _run(spark, d, out, state)
    assert r2.metrics["vocab_mode"] == "full"  # loud fallback
    assert not r2.metrics["lean_facts"]
    fresh = _run(spark, d, str(tmp_path / "o2"), str(tmp_path / "s2"))
    assert _surface_set(r2) == _surface_set(fresh)
    # the fallback run re-seeds a correct vocab table for the NEXT run
    assert _vocab_rows(spark, state) == _vocab_rows(spark, str(tmp_path / "s2"))


def test_pre_vocab_snapshot_upgrades_then_goes_delta(spark, tmp_path):
    """A snapshot committed before the vocab table existed (simulated by
    dropping the manifest keys) runs full once — seeding the table — and
    the run after that maintains it."""
    import json

    d = _corpus(tmp_path)
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    _run(spark, d, out, state)
    store = StateStore(state)
    # strip the vocab keys from the manifest (pre-upgrade shape)
    mpath = store.manifest_path if hasattr(store, "manifest_path") else None
    snap = store.last_snapshot()
    assert snap.get("vocab_path")
    # simulate by renaming the table away — the os.path.exists gate fails
    os.rename(snap["vocab_path"], snap["vocab_path"] + "_gone")
    _write_file(
        os.path.join(d, "a.parquet"),
        [
            ("c0", 0, "shared_svc calls store0_store ."),
            ("c1", 0, "fresh_svc uses store1_store ."),
        ],
    )
    r2 = _run(spark, d, out, state)
    assert r2.metrics["vocab_mode"] == "full"
    r3 = _run(spark, d, out, state)  # no-op content-wise
    # pointer carried or delta — either way never wrong; a third edit
    _write_file(
        os.path.join(d, "b.parquet"),
        [
            ("c2", 0, "shared_svc emits queue9_queue ."),
            ("c3", 0, "bind_target_svc as bt_alias . lonely_mention_svc ."),
        ],
    )
    r4 = _run(spark, d, out, state)
    assert r4.metrics["vocab_mode"] == "delta"
    fresh = _run(spark, d, str(tmp_path / "o2"), str(tmp_path / "s2"))
    assert _vocab_rows(spark, state) == _vocab_rows(spark, str(tmp_path / "s2"))
    assert _surface_set(r4) == _surface_set(fresh)
