"""Canonicalization reuse (round 5): canonicalize_surfaces is pure in
(surface set, binding-pair set, canon config), so a warm run whose
canon-input fingerprint matches the previous snapshot's reloads the
persisted labels instead of re-running MinHash + CC. These tests pin:

- a content change that preserves the vocabulary reuses canon labels,
  value-identical to a fresh computation;
- a new surface recomputes (and labels stay correct);
- a NEW BINDING between existing surfaces recomputes — the fingerprint
  must cover binding pairs, not just surfaces (bindings are CC edges);
- a config change recomputes (provenance gate);
- vacuum never removes the referenced canon table.
"""

from __future__ import annotations

import datetime
import os

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


def _canon_rows(res):
    return sorted((r["surface"], r["canon_id"]) for r in res.canon.collect())


def test_vocab_preserving_change_reuses_canon(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {
        "c0": "alpha_svc calls beta_store .",
        "c1": "gamma_svc uses delta_store .",
    }
    r1 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r1.metrics["canon_reused"] is False  # cold
    # predicate swap: content hash changes, surface set does not
    texts["c0"] = "alpha_svc uses beta_store ."
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r2.metrics["canon_reused"] is True
    fresh = run_pipeline(
        spark,
        _tdf(spark, texts),
        out_dir=str(tmp_path / "fo"),
        state_dir=str(tmp_path / "fs"),
    )
    assert _canon_rows(r2) == _canon_rows(fresh)


def test_new_surface_recomputes_canon(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {"c0": "alpha_svc calls beta_store ."}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    texts["c0"] = "alpha_svc calls omega_cache ."
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r2.metrics["canon_reused"] is False
    assert any(s == "omega_cache" for s, _ in _canon_rows(r2))


def test_new_binding_between_existing_surfaces_recomputes(spark, tmp_path):
    """Surfaces identical, but a new 'TARGET as ALIAS' binding merges two
    clusters — the fingerprint must catch the binding-pair change."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {
        "c0": "core_svc uses payment_gateway .",
        "c1": "other_svc calls zz9 .",
    }
    r1 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    canon1 = dict(_canon_rows(r1))
    assert canon1["payment_gateway"] != canon1["zz9"]  # separate clusters
    # same surface set (all four already present), new binding pair
    texts["c0"] = "core_svc uses payment_gateway as zz9 ."
    r2 = run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    assert r2.metrics["canon_reused"] is False
    canon2 = dict(_canon_rows(r2))
    assert canon2["payment_gateway"] == canon2["zz9"]  # merged by binding


def test_config_change_recomputes_canon(spark, tmp_path):
    from coco_search_spark.config import EngineConfig

    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {"c0": "alpha_svc calls beta_store ."}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    r2 = run_pipeline(
        spark,
        _tdf(spark, texts),
        out_dir=out,
        state_dir=state,
        config=EngineConfig(jaccard_threshold=0.9),
    )
    assert r2.metrics["canon_reused"] is False


def test_vacuum_keeps_referenced_canon_table(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    texts = {"c0": "alpha_svc calls beta_store ."}
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    # vocab change → canon_v2 written, canon_v1 superseded
    texts["c0"] = "alpha_svc calls new_cache ."
    run_pipeline(spark, _tdf(spark, texts), out_dir=out, state_dir=state)
    store = StateStore(state)
    snap = store.last_snapshot()
    victims = store.vacuum(out)
    names = {os.path.basename(v) for v in victims}
    assert "canon_v000001" in names
    assert os.path.exists(snap["canon_path"])  # current table survives
