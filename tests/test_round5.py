"""Round-5 hardening: the four ADVICE r4 findings — legacy-snapshot
written_version upgrade (high), duplicate-insensitive catalog fingerprint,
vacuum vs in-flight runs, authority-form file:// URIs — plus guards for the
instr-gated block taxonomy."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from coco_search_spark import fixtures
from coco_search_spark.pipeline import run_pipeline
from coco_search_spark.state import StateStore


def _legacyfy(spark, state: str) -> None:
    """Rewrite a current-format snapshot into the pre-delta legacy format:
    no *_parts manifest keys, no written_version state column — exactly what
    a pre-round-4 engine would have committed."""
    store = StateStore(state)
    snap = store.last_snapshot()
    legacy_data = os.path.join(state, "state_legacy")
    spark.read.parquet(snap["data_path"]).drop("written_version").write.mode(
        "overwrite"
    ).parquet(legacy_data)
    snap.pop("facts_parts", None)
    snap.pop("chunks_parts", None)
    snap["data_path"] = legacy_data
    with open(os.path.join(state, "manifest.json"), "w") as f:
        json.dump(snap, f)


def test_legacy_snapshot_upgrade_written_version(spark, fx, tmp_path):
    """ADVICE r4 (high): resuming from a legacy snapshot must coalesce
    unchanged conversations' NULL written_version to the legacy part's
    version — otherwise the NEXT run's version resolution silently drops
    their facts/chunks. Upgrade path: legacy manifest → two incremental
    runs → full row parity."""
    state = str(tmp_path / "state")
    out = str(tmp_path / "o")
    sdf = fixtures.transcripts_sdf(spark, fx)
    r_full = run_pipeline(spark, sdf, out_dir=str(tmp_path / "ref"))
    run_pipeline(spark, sdf, out_dir=out, state_dir=state)
    _legacyfy(spark, state)

    convs = [r.conv_id for r in sdf.select("conv_id").distinct().orderBy("conv_id").collect()]
    delta1 = sdf.withColumn(
        "text",
        F.when(F.col("conv_id") == convs[0], F.concat(F.col("text"), F.lit(" p1")))
        .otherwise(F.col("text")),
    )
    r2 = run_pipeline(spark, delta1, out_dir=out, state_dir=state)
    assert r2.metrics["n_unchanged_convs"] == len(convs) - 1
    store = StateStore(state)
    # the pointer must not be NULL for any conversation after the upgrade run
    st = store.read(spark)
    assert st.filter(F.col("written_version").isNull()).count() == 0
    # unchanged conversations point at the legacy part's version (1)
    assert (
        st.filter(F.col("conv_id") != convs[0])
        .filter(F.col("written_version") == 1)
        .count()
        == len(convs) - 1
    )
    # second incremental run: version resolution over 3 parts must still
    # surface EVERY conversation's facts
    delta2 = delta1.withColumn(
        "text",
        F.when(F.col("conv_id") == convs[1], F.concat(F.col("text"), F.lit(" p2")))
        .otherwise(F.col("text")),
    )
    run_pipeline(spark, delta2, out_dir=out, state_dir=state)
    facts = store.read_table(spark, "facts")
    assert facts.select("conv_id").distinct().count() == len(convs)
    # triples of untouched conversations survive the two upgrades verbatim
    got = (
        facts.filter(F.col("kind") == "triple")
        .filter(~F.col("conv_id").isin(convs[0], convs[1]))
        .select("conv_id", "subj", "pred", "obj")
    )
    want = r_full.triples.filter(~F.col("conv_id").isin(convs[0], convs[1])).select(
        "conv_id", "subj", "pred", "obj"
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_catalog_fingerprint_duplicate_rows_distinguished(spark):
    """ADVICE r4: xor-fold alone cancels duplicate rows (x^x=0) — catalogs
    {x,x,y} and {y,z,z} used to share a fingerprint. The dual fold
    (xor + sum + count) must separate them, and stay order-independent."""
    from coco_search_spark.operators.link_state import catalog_fingerprint

    mk = lambda rows: spark.createDataFrame([(r,) for r in rows], "entity string")
    a = catalog_fingerprint(mk(["x", "x", "y"]))
    b = catalog_fingerprint(mk(["y", "z", "z"]))
    assert a != b
    # same multiset in a different order → identical fingerprint
    assert catalog_fingerprint(mk(["y", "x", "x"])) == a
    # and a plain content change is still detected
    assert catalog_fingerprint(mk(["x", "x", "z"])) != a


def test_vacuum_keeps_inflight_version_dirs(spark, fx, tmp_path):
    """ADVICE r4: run_pipeline writes its part dirs BEFORE committing the
    manifest, so vacuum must never delete a version dir NEWER than the
    current manifest — that is a concurrent run's in-flight snapshot."""
    state = str(tmp_path / "state")
    out = str(tmp_path / "o")
    sdf = fixtures.transcripts_sdf(spark, fx)
    run_pipeline(spark, sdf, out_dir=out, state_dir=state)
    store = StateStore(state)
    # superseded orphan (older than the manifest) vs in-flight candidate
    stale = os.path.join(out, "facts_v000000")
    inflight = os.path.join(out, "facts_v000009")
    os.makedirs(stale); os.makedirs(inflight)
    victims = store.vacuum(out)
    assert os.path.realpath(stale) in victims
    assert not os.path.exists(stale)
    assert os.path.exists(inflight)


def test_preflight_authority_file_uri(spark, tmp_path):
    """ADVICE r4: 'file://localhost/abs/path' is a valid local URI (the
    authority form) — prefix stripping used to mangle it into the relative
    path 'localhost/abs/path'. Non-local authorities fail explicitly."""
    from coco_search_spark.preflight import run_preflight

    local = tmp_path / "in.txt"
    local.write_text("x")
    uri_auth = f"file://localhost{local}"
    uri_remote = f"file://otherhost{local}"
    checks = {
        c["check"]: c
        for c in run_preflight(spark, input_paths=[uri_auth, uri_remote])
    }
    assert checks[f"input:{uri_auth}"]["ok"]
    assert not checks[f"input:{uri_remote}"]["ok"]
    assert "authority" in checks[f"input:{uri_remote}"]["detail"]


def test_block_taxonomy_instr_gates_preserve_semantics(spark):
    """The round-5 instr prefilters on log_dump / inline_tool_call must not
    change a single classification — each regex structurally requires the
    gated literal char."""
    from coco_search_spark.functions.text import classify_block_col

    rows = [
        ("plain prose without meta chars", None, "prose"),
        ("[ERROR] db down\nstack", None, "log_dump"),
        ("bracket [not a log] text", None, "prose"),
        ("calls fetch_data(x) inline", None, "inline_tool_call"),
        ("parens (but no ident call", None, "prose"),
        ("```py\ncode\n```", None, "fenced_code"),
        ("anything", "bash", "tool_output"),
    ]
    df = spark.createDataFrame(
        [(t, tool) for t, tool, _ in rows], "text string, tool string"
    ).withColumn("bt", classify_block_col(F.col("text"), F.col("tool")))
    got = [r.bt for r in df.collect()]
    assert got == [want for _, _, want in rows]
