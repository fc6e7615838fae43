"""Optimistic commit-conflict detection (the Iceberg concurrency rule).

A writer sizes its versioned part dirs against the snapshot it read; if
another writer commits meanwhile, publishing would produce a manifest
whose part references interleave two runs' files. ``StateStore.commit``
takes the version the writer assumed (``expected_version``) and raises
loudly on a mismatch — a lost update must never be silent.
"""

from __future__ import annotations

import datetime

import pytest

from coco_search_spark.pipeline import run_pipeline
from coco_search_spark.state import StateStore

TS = datetime.datetime(2025, 1, 1)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def test_commit_raises_on_concurrent_version_advance(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    tdf = spark.createDataFrame(
        [("c0", 0, "user", "alpha_svc calls beta_store .", None, TS)], SCHEMA
    )
    run_pipeline(spark, tdf, out_dir=out, state_dir=state)
    store = StateStore(state)
    rows = store.read(spark).drop("snapshot_id")

    # this writer plans to commit the next version...
    planned = store.next_version()
    # ...but a competing writer lands first
    StateStore(state).commit(rows, stage="other")
    assert store.next_version() == planned + 1

    with pytest.raises(RuntimeError, match="concurrent commit"):
        store.commit(rows, stage="materialize", expected_version=planned)
    # the guarded path committed nothing; an unguarded (legacy) commit
    # still works and self-versions against the current snapshot
    assert store.last_snapshot()["stage"] == "other"
    store.commit(rows, stage="materialize")
    assert store.last_snapshot()["version"] == planned + 1
