"""Incremental surface linking: link(surface) is pure in (surface,
catalog, config), so unchanged vocabulary reuses previous links and only
the delta is scored — gated on catalog fingerprint + config identity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from coco_search_spark import fixtures
from coco_search_spark.operators.link_state import (
    catalog_fingerprint,
    merge_links,
    split_link_work,
)
from coco_search_spark.pipeline import run_pipeline
from coco_search_spark.state import StateStore


def test_catalog_fingerprint_properties(spark):
    cat = spark.createDataFrame(
        [("e1", "alias_a"), ("e2", "alias_b")], "entity_id string, alias string"
    )
    fp = catalog_fingerprint(cat)
    # partition/order independent
    assert catalog_fingerprint(cat.repartition(5)) == fp
    assert catalog_fingerprint(cat.orderBy(F.desc("alias"))) == fp
    # content sensitive (value edit, row add, row drop)
    assert catalog_fingerprint(cat.limit(1)) != fp
    edited = spark.createDataFrame(
        [("e1", "alias_a"), ("e2", "alias_X")], "entity_id string, alias string"
    )
    assert catalog_fingerprint(edited) != fp
    # row-count suffix defends the xor fold against pair cancellation:
    # duplicating every row xor-cancels to 0 but changes n
    assert catalog_fingerprint(cat.unionAll(cat)) != fp


def test_split_and_merge_roundtrip(spark):
    surfaces = spark.createDataFrame(
        [("m1",), ("m2",), ("m3",)], "mention string"
    )
    prev = spark.createDataFrame(
        [
            ("m1", "e1", 0.5, "both"),
            ("m9", "e9", 0.3, "keyword"),  # vanished surface — must drop
        ],
        "mention string, entity_id string, link_score double, match_type string",
    )
    to_link, reusable = split_link_work(surfaces, prev)
    assert sorted(r["mention"] for r in to_link.collect()) == ["m2", "m3"]
    assert [r["mention"] for r in reusable.collect()] == ["m1"]
    fresh = spark.createDataFrame(
        [("m2", "e2", 0.4, "semantic"), ("m3", None, None, None)],
        "mention string, entity_id string, link_score double, match_type string",
    )
    merged = {r["mention"]: r["entity_id"] for r in merge_links(fresh, reusable).collect()}
    assert merged == {"m1": "e1", "m2": "e2", "m3": None}


def _catalog(spark, fx):
    return spark.createDataFrame(fixtures.entity_catalog_pdf(fx.entities))


def test_pipeline_reuses_links_and_matches_full_relink(spark, fx, tmp_path):
    """Run 1 links everything; run 2 (one conversation mutated with a new
    surface) must (a) reuse every previously-linked surface, (b) link only
    the delta, and (c) produce links value-identical to a from-scratch run
    over the same input."""
    catalog = _catalog(spark, fx)
    state = str(tmp_path / "state")
    sdf = fixtures.transcripts_sdf(spark, fx)
    run_pipeline(
        spark, sdf, catalog=catalog, out_dir=str(tmp_path / "o1"), state_dir=state
    )
    snap1 = StateStore(state).last_snapshot()
    assert snap1.get("links_path") and os.path.exists(snap1["links_path"])
    assert snap1.get("catalog_fp")

    # mutate one conversation: inject a brand-new surface pair
    cid = sdf.select("conv_id").first()["conv_id"]
    mutated = sdf.withColumn(
        "text",
        F.when(
            (F.col("conv_id") == cid) & (F.col("turn_idx") == 0),
            F.concat(F.col("text"), F.lit(" brandnew_svc uses brandnew_store .")),
        ).otherwise(F.col("text")),
    )
    r2 = run_pipeline(
        spark,
        mutated,
        catalog=catalog,
        out_dir=str(tmp_path / "o2"),
        state_dir=state,
    )
    m = r2.metrics
    assert m["n_links_reused"] > 0
    assert 0 < m["n_links_fresh"] <= 4  # only the delta surfaces scored
    # ground truth: a cold full run over the same mutated input
    full = run_pipeline(
        spark, mutated, catalog=catalog, out_dir=str(tmp_path / "o3")
    )
    got = {
        (r["mention"], r["entity_id"], r["link_score"], r["match_type"])
        for r in r2.links.collect()
    }
    want = {
        (r["mention"], r["entity_id"], r["link_score"], r["match_type"])
        for r in full.links.collect()
    }
    assert got == want


def test_catalog_change_invalidates_link_reuse(spark, fx, tmp_path):
    catalog = _catalog(spark, fx)
    state = str(tmp_path / "state")
    sdf = fixtures.transcripts_sdf(spark, fx)
    run_pipeline(
        spark, sdf, catalog=catalog, out_dir=str(tmp_path / "o1"), state_dir=state
    )
    # same transcripts, EDITED catalog → fingerprint differs → full re-link
    cat2 = catalog.withColumn(
        "alias", F.concat(F.col("alias"), F.lit("x"))
    )
    r2 = run_pipeline(
        spark, sdf, catalog=cat2, out_dir=str(tmp_path / "o2"), state_dir=state
    )
    assert r2.metrics["n_links_reused"] == 0


def test_vocab_preserving_change_carries_links_pointer(spark, fx, tmp_path):
    """A content change that leaves the extracted vocabulary unchanged
    (appended text the grammar matches nothing in) must NOT rewrite the
    vocabulary-sized links table: the snapshot carries the previous
    links_path pointer (n_links_fresh == 0 and the canon-input fingerprint
    matched ⇒ value-identical table), and the resolved links still equal a
    from-scratch run's."""
    catalog = _catalog(spark, fx)
    state = str(tmp_path / "state")
    sdf = fixtures.transcripts_sdf(spark, fx)
    run_pipeline(
        spark, sdf, catalog=catalog, out_dir=str(tmp_path / "o1"), state_dir=state
    )
    snap1 = StateStore(state).last_snapshot()
    cid = sdf.select("conv_id").first()["conv_id"]
    mutated = sdf.withColumn(
        "text",
        F.when(
            (F.col("conv_id") == cid) & (F.col("turn_idx") == 0),
            F.concat(F.col("text"), F.lit(" trailing nongrammar filler")),
        ).otherwise(F.col("text")),
    )
    r2 = run_pipeline(
        spark,
        mutated,
        catalog=catalog,
        out_dir=str(tmp_path / "o1"),
        state_dir=state,
    )
    snap2 = StateStore(state).last_snapshot()
    assert r2.metrics["n_unchanged_convs"] > 0  # it WAS a warm run
    assert r2.metrics["n_links_fresh"] == 0
    assert r2.metrics["canon_reused"] is True
    assert snap2["links_path"] == snap1["links_path"]  # pointer carried
    full = run_pipeline(
        spark, mutated, catalog=catalog, out_dir=str(tmp_path / "o3")
    )
    got = {
        (r["mention"], r["entity_id"], r["link_score"], r["match_type"])
        for r in spark.read.parquet(snap2["links_path"])
        .filter(F.col("entity_id").isNotNull())
        .collect()
    }
    want = {
        (r["mention"], r["entity_id"], r["link_score"], r["match_type"])
        for r in full.links.collect()
    }
    assert got == want
