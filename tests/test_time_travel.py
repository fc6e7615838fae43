"""Snapshot history + time travel (round 5 — Iceberg snapshot-log analog).

- commit archives every manifest → StateStore.snapshots() enumerates the
  chain, snapshot(v) fetches one;
- read/read_table(version=) resolve tables AS OF an older snapshot,
  value-identical to what the reader saw when it was current;
- vacuum expires history (snapshot() → None, read_table(version=) raises);
- legacy stores (pre-archive) degrade to a single-entry history.
"""

import datetime
import os

import pytest

from coco_search_spark.pipeline import run_pipeline
from coco_search_spark.state import StateStore

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


def test_snapshot_history_and_time_travel_read(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {
        "c0": "alpha_svc calls beta_store .",
        "c1": "gamma_svc uses delta_store .",
    }
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    store = StateStore(state)
    v1_facts = _facts_set(store.read_table(spark, "facts"))

    texts["c0"] = "alpha_svc emits new_cache ."
    del texts["c1"]
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)

    # history: both commits enumerable, with stage + provenance fields
    snaps = store.snapshots()
    assert [s["version"] for s in snaps] == [1, 2]
    assert all(s["stage"] == "materialize" and "config_hash" in s for s in snaps)
    assert store.snapshot(1)["version"] == 1
    assert store.snapshot(2) == store.last_snapshot()

    # time travel: the v1 facts table is reproduced exactly — including
    # the since-deleted conversation and the pre-edit c0 rows
    old = _facts_set(store.read_table(spark, "facts", version=1))
    assert old == v1_facts
    assert any(r[0] == "c1" for r in old)
    cur = _facts_set(store.read_table(spark, "facts"))
    assert not any(r[0] == "c1" for r in cur)
    assert cur != old

    # the as-of state table matches too (c1 still has a row at v1)
    v1_state = store.read(spark, version=1)
    assert v1_state.filter(v1_state.conv_id == "c1").count() == 1
    assert store.read(spark).filter("conv_id = 'c1'").count() == 0

    # conv_ids pushdown composes with time travel
    only_c1 = store.read_table(spark, "facts", conv_ids=["c1"], version=1)
    assert {r["conv_id"] for r in only_c1.select("conv_id").collect()} == {"c1"}

    # unknown version: loud, never a silent fallback to current
    with pytest.raises(FileNotFoundError):
        store.read_table(spark, "facts", version=7)

    # expiry: vacuum retires v1 (Iceberg expire_snapshots trade)
    store.vacuum(out)
    assert store.snapshot(1) is None
    assert [s["version"] for s in store.snapshots()] == [2]
    with pytest.raises(FileNotFoundError):
        store.read(spark, version=1)
    # the current snapshot stays fully readable
    assert _facts_set(store.read_table(spark, "facts")) == cur


def test_rollback_restores_tables_and_keeps_history(spark, tmp_path):
    """StateStore.rollback (Iceberg rollback_to_snapshot analog): a NEW
    commit whose table references are the target snapshot's — readers see
    the old world, history is never rewritten, and the store stays fully
    functional (a later pipeline run diffs against the rolled-back state)."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {
        "c0": "alpha_svc calls beta_store .",
        "c1": "gamma_svc uses delta_store .",
    }
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    store = StateStore(state)
    v1_facts = _facts_set(store.read_table(spark, "facts"))

    texts["c0"] = "alpha_svc emits new_cache ."
    texts["c2"] = "eps_svc imports zeta_store ."
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    v2_facts = _facts_set(store.read_table(spark, "facts"))
    assert v2_facts != v1_facts

    # rollback → new commit (v3), content identical to v1
    m = store.rollback(1)
    assert (m["version"], m["stage"]) == (3, "rollback")
    assert (m["rolled_back_to"], m["rolled_back_from"]) == (1, 2)
    assert _facts_set(store.read_table(spark, "facts")) == v1_facts
    assert store.read(spark).filter("conv_id = 'c2'").count() == 0
    # history: all three commits enumerable; v2 still time-travel readable
    assert [s["version"] for s in store.snapshots()] == [1, 2, 3]
    assert _facts_set(store.read_table(spark, "facts", version=2)) == v2_facts

    # loud failure modes: current version, unknown version
    with pytest.raises(ValueError):
        store.rollback(3)
    with pytest.raises(FileNotFoundError):
        store.rollback(9)

    # the store is functional after rollback: re-running the v2-shaped
    # corpus diffs against the rolled-back world and lands on v2's content
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert store.last_snapshot()["version"] == 4
    assert _facts_set(store.read_table(spark, "facts")) == v2_facts

    # vacuum expires the rolled-past history; the current snapshot (and
    # the v1 parts it still references via rollback lineage) stay readable
    store.rollback(1)  # v5, back to the v1 world again
    store.vacuum(out)
    assert [s["version"] for s in store.snapshots()] == [5]
    assert _facts_set(store.read_table(spark, "facts")) == v1_facts
    with pytest.raises(FileNotFoundError):
        store.rollback(2)  # expired → loud


def test_tags_pin_snapshots_and_survive_vacuum(spark, tmp_path):
    """Named snapshots (Iceberg tag analog): a tag resolves anywhere a
    version does, protects its snapshot from vacuum expiry, and releasing
    it (untag) lets the next vacuum expire the history as usual."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {
        "c0": "alpha_svc calls beta_store .",
        "c1": "gamma_svc uses delta_store .",
    }
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    store = StateStore(state)
    v1_facts = _facts_set(store.read_table(spark, "facts"))

    texts["c0"] = "alpha_svc emits new_cache ."
    texts["c2"] = "eps_svc imports zeta_store ."
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)

    # create: explicit version, and default-to-current
    assert store.tag("golden", 1) == 1
    assert store.tag("latest") == 2
    assert store.tags() == {"golden": 1, "latest": 2}
    # loud failure modes
    with pytest.raises(ValueError):
        store.tag("7", 1)  # digit name would shadow a version literal
    with pytest.raises(FileNotFoundError):
        store.tag("nope", 9)  # unknown version
    with pytest.raises(KeyError):
        store.untag("missing")
    with pytest.raises(FileNotFoundError):
        store.read_table(spark, "facts", version="no_such_tag")

    # a tag resolves anywhere a version does
    assert _facts_set(store.read_table(spark, "facts", version="golden")) == v1_facts
    assert store.snapshot("golden")["version"] == 1
    assert store.snapshot("no_such_tag") is None

    # vacuum keeps the tagged snapshot: golden (v1) survives expiry
    store.vacuum(out)
    assert [s["version"] for s in store.snapshots()] == [1, 2]
    assert _facts_set(store.read_table(spark, "facts", version="golden")) == v1_facts

    # rollback by tag: v3, content == v1
    m = store.rollback("golden")
    assert (m["version"], m["rolled_back_to"]) == (3, 1)
    assert _facts_set(store.read_table(spark, "facts")) == v1_facts

    # untag releases it: the next vacuum expires v1's history entry
    # (the v1 PARTS survive — the current rollback commit references them)
    assert store.untag("golden") == 1
    store.vacuum(out)
    assert [s["version"] for s in store.snapshots()] == [2, 3]  # latest still pins 2
    with pytest.raises(FileNotFoundError):
        store.read(spark, version=1)
    assert _facts_set(store.read_table(spark, "facts")) == v1_facts


def test_legacy_store_without_archives_lists_current_only(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    run_pipeline(
        spark,
        _tdf(spark, {"c0": "alpha_svc calls beta_store ."}),
        out_dir=out,
        state_dir=state,
    )
    store = StateStore(state)
    # simulate a pre-archive store: drop the archive, keep the pointer
    os.remove(os.path.join(state, "manifest_v000001.json"))
    assert [s["version"] for s in store.snapshots()] == [1]
    assert store.snapshot(1) == store.last_snapshot()
    # an orphan archive NEWER than the pointer (crash between archive and
    # pointer swap) is invisible — the in-flight rule
    with open(os.path.join(state, "manifest_v000009.json"), "w") as f:
        f.write('{"version": 9}')
    assert [s["version"] for s in store.snapshots()] == [1]
    assert StateStore(str(tmp_path / "empty")).snapshots() == []
