"""CLI front (tools/coco.py) — each verb end-to-end on a small on-disk
corpus, driven in-process through main(argv, spark=...). Pins the
scriptable-JSON contract (one document per invocation) and that the verbs
compose: index → stats → search → vacuum against one state dir."""

from __future__ import annotations

import datetime
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))

from coco import main as coco_main  # noqa: E402

TS = datetime.datetime(2025, 1, 1)


def _write_corpus(path: str) -> None:
    rows = [
        ("c0", 0, "alpha_svc calls beta_store . the cache layer is warm"),
        ("c0", 1, "beta_store uses gamma_cache ."),
        ("c1", 0, "delta_svc emits epsilon_queue ."),
        ("c1", 1, "unrelated chatter about the weather"),
    ]
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


def test_cli_verbs_end_to_end(spark, tmp_path, capsys):
    corpus = str(tmp_path / "t.parquet")
    _write_corpus(corpus)
    out_dir, state = str(tmp_path / "o"), str(tmp_path / "s")

    r = coco_main(
        ["index", corpus, "--out", out_dir, "--state", state], spark=spark
    )
    assert r["ok"] and r["metrics"]["n_triples"] > 0

    r = coco_main(["stats", "--state", state], spark=spark)
    assert r["ok"]
    assert r["n_conversations"] == 2 and r["n_turns"] == 4
    assert r["parts"] == {"facts": 1, "chunks": 1, "edges": 1}
    assert r["input_files"] == 1  # manifest committed from the file scan

    r = coco_main(
        ["search", "beta_store cache", "--state", state, "-k", "3"], spark=spark
    )
    assert r["ok"] and r["n"] >= 1
    assert r["results"][0]["search_rank"] == 1
    assert {"chunk_id", "rrf_score", "match_type"} <= set(r["results"][0])

    r = coco_main(
        [
            "search",
            "beta_store cache",
            "--state",
            state,
            "--context",
            "--transcripts",
            corpus,
        ],
        spark=spark,
    )
    assert r["ok"] and r["n"] >= 1
    top = r["results"][0]
    assert "content" in top and "ctx_before" in top and "ctx_after" in top

    # second index run (no-op) then vacuum: nothing to remove, dry-run safe
    coco_main(["index", corpus, "--out", out_dir, "--state", state], spark=spark)
    r = coco_main(
        ["vacuum", "--state", state, "--out", out_dir, "--dry-run"], spark=spark
    )
    assert r["ok"] and r["dry_run"]
    for p in r["removed"]:
        assert os.path.exists(p)  # dry run deletes nothing
    r = coco_main(["vacuum", "--state", state, "--out", out_dir], spark=spark)
    assert r["ok"]
    # CLI output is one parseable JSON document per invocation
    captured = capsys.readouterr().out.strip().splitlines()
    import json

    for line in captured:
        json.loads(line)


def test_cli_extended_verbs(spark, tmp_path):
    """analyze / list / graph / config / clear — the rest of the
    reference's engine-relevant verb surface (cli.py:2841 analyze, :2918
    list, :3221 deps tree/impact, :3113 config, :3010 clear)."""
    corpus = str(tmp_path / "t.parquet")
    _write_corpus(corpus)
    out_dir, state = str(tmp_path / "o"), str(tmp_path / "s")
    coco_main(["index", corpus, "--out", out_dir, "--state", state], spark=spark)

    # analyze: full stage panel, and its top-k equals the search verb's
    r = coco_main(
        ["analyze", "beta_store cache", "--state", state, "-k", "3"], spark=spark
    )
    assert r["ok"] and not r["rewritten"]
    assert [s["stage"] for s in r["stages"]] == [
        "candidates",
        "vector_prefetch",
        "keyword_prefetch",
        "rrf_fusion",
        "topk",
    ]
    assert r["stages"][-1]["rows"] == len(r["results"]) >= 1
    s = coco_main(
        ["search", "beta_store cache", "--state", state, "-k", "3"], spark=spark
    )
    assert [x["chunk_id"] for x in r["results"]] == [
        x["chunk_id"] for x in s["results"]
    ]

    # list: per-conversation inventory
    r = coco_main(["list", "--state", state], spark=spark)
    assert r["ok"] and r["n_conversations"] == 2
    assert [row["conv_id"] for row in r["rows"]] == ["c0", "c1"]
    assert all(row["written_version"] is not None for row in r["rows"])

    # graph tree/impact rooted at a real edge subject
    from coco_search_spark.state import StateStore

    root = (
        StateStore(state)
        .read_table(spark, "edges")
        .select("subj_id")
        .orderBy("subj_id")
        .first()["subj_id"]
    )
    r = coco_main(["graph", "tree", root, "--state", state], spark=spark)
    assert r["ok"] and r["n"] >= 2  # root + at least the edge target
    assert r["rows"][0] == {"node": root, "depth": 0, "parent": None}
    r = coco_main(["graph", "impact", root, "--state", state], spark=spark)
    assert r["ok"] and r["n"] == 1 and r["rows"][0]["root"] == root

    # config: show resolves defaults + overrides; check reports violations
    cfgp = tmp_path / "cfg.json"
    cfgp.write_text('{"rrf_k": 42}')
    r = coco_main(["config", str(cfgp)], spark=spark)
    assert r["ok"] and r["config"]["rrf_k"] == 42 and r["config_hash"]
    bad = tmp_path / "bad.json"
    bad.write_text('{"rrf_k": -1, "jaccard_threshold": 3}')
    r = coco_main(["config", str(bad), "--check"], spark=spark)
    assert not r["ok"] and len(r["problems"]) >= 2

    # export: one plain parquet dir holding the RESOLVED table — vanilla
    # spark.read.parquet sees the same rows read_table resolves
    dest = str(tmp_path / "edges_export")
    r = coco_main(
        ["export", "--state", state, "--dest", dest, "--table", "edges"],
        spark=spark,
    )
    want = StateStore(state).read_table(spark, "edges").count()
    assert r["ok"] and r["rows"] == want >= 1
    assert spark.read.parquet(dest).count() == want
    # existing dest refuses without --force, overwrites with it
    r = coco_main(
        ["export", "--state", state, "--dest", dest, "--table", "edges"],
        spark=spark,
    )
    assert not r["ok"]
    r = coco_main(
        ["export", "--state", state, "--dest", dest, "--table", "edges", "--force"],
        spark=spark,
    )
    assert r["ok"] and r["rows"] == want

    # clear: refuses without --force, deletes both dirs with it, and a
    # snapshot-less dir is never deleted (mistyped-path guard)
    r = coco_main(["clear", "--state", state, "--out", out_dir], spark=spark)
    assert not r["ok"]
    r = coco_main(
        ["clear", "--state", state, "--out", out_dir, "--force"], spark=spark
    )
    assert r["ok"] and sorted(r["removed"]) == sorted([state, out_dir])
    assert not os.path.exists(state) and not os.path.exists(out_dir)
    r = coco_main(
        ["clear", "--state", state, "--out", out_dir, "--force"], spark=spark
    )
    assert not r["ok"]


def test_cli_graph_analytics_modes(spark, tmp_path):
    """graph pagerank / communities / kcore / suggest — the whole-graph
    analytics front over the materialized edge table; tree/impact without
    roots must fail loudly instead of walking an empty frontier."""
    corpus = str(tmp_path / "t.parquet")
    _write_corpus(corpus)
    out_dir, state = str(tmp_path / "o"), str(tmp_path / "s")
    coco_main(["index", corpus, "--out", out_dir, "--state", state], spark=spark)

    r = coco_main(["graph", "pagerank", "--state", state, "--top", "5"], spark=spark)
    assert r["ok"] and r["n"] >= 1
    ranks = [row["rank"] for row in r["rows"]]
    assert ranks == sorted(ranks, reverse=True) and all(x > 0 for x in ranks)

    r = coco_main(["graph", "communities", "--state", state], spark=spark)
    assert r["ok"] and r["n"] >= 1
    assert all(row["size"] >= 1 and row["label"] for row in r["rows"])

    # k=1 core = every non-isolated node; a huge k is a valid empty result
    r = coco_main(["graph", "kcore", "--state", state, "-k", "1"], spark=spark)
    assert r["ok"] and r["n"] >= 1
    assert all(row["core_degree"] >= 1 for row in r["rows"])
    r = coco_main(["graph", "kcore", "--state", state, "-k", "99"], spark=spark)
    assert r["ok"] and r["n"] == 0

    r = coco_main(["graph", "suggest", "--state", state], spark=spark)
    assert r["ok"]  # tiny fixture graphs may have no non-adjacent pairs
    assert all(row["node_u"] < row["node_v"] for row in r["rows"])

    # related: personalized PageRank from a real edge subject — the root
    # itself is excluded (it is the query), everything returned scored > 0
    from coco_search_spark.state import StateStore

    root = (
        StateStore(state)
        .read_table(spark, "edges")
        .select("subj_id")
        .orderBy("subj_id")
        .first()["subj_id"]
    )
    r = coco_main(["graph", "related", root, "--state", state], spark=spark)
    assert r["ok"] and r["n"] >= 1
    assert all(row["node"] != root and row["rank"] > 0 for row in r["rows"])

    r = coco_main(["graph", "hits", "--state", state, "--top", "5"], spark=spark)
    assert r["ok"] and r["n"] >= 1
    auths = [row["authority"] for row in r["rows"]]
    assert auths == sorted(auths, reverse=True)

    r = coco_main(["graph", "tree", "--state", state], spark=spark)
    assert not r["ok"] and "root" in r["error"]
    r = coco_main(["graph", "related", "--state", state], spark=spark)
    assert not r["ok"] and "root" in r["error"]


def test_cli_info_and_init_no_jvm(tmp_path):
    """info / init are pure-driver verbs (reference: cli.py:2986 languages,
    :2999 grammars, :3037 init) — they must work with NO SparkSession, and
    init → config must round-trip to the default identity hash."""
    r = coco_main(["info"], spark=None)
    assert r["ok"] and r["grammar_version"] >= 3
    assert set(r["predicates"]) == set(r["relation_phrases"])
    assert r["block_types"][0] == "tool_output" and r["block_types"][-1] == "prose"
    assert len(r["triple_forms"]) == 5

    cfg = str(tmp_path / "engine.json")
    r = coco_main(["init", cfg], spark=None)
    assert r["ok"] and os.path.exists(cfg)
    default_hash = r["config_hash"]
    r = coco_main(["init", cfg], spark=None)
    assert not r["ok"]  # refuses silent overwrite
    r = coco_main(["init", cfg, "--force"], spark=None)
    assert r["ok"]
    # the written file parses, validates, and hashes to the same identity
    r = coco_main(["config", cfg], spark=None)
    assert r["ok"] and r["config_hash"] == default_hash and r["problems"] == []


def test_cli_history_and_as_of(spark, tmp_path):
    """history + --as-of (round 5 time travel): two index runs commit two
    snapshots; history lists both (no JVM), list/stats --as-of read the
    v1 state exactly, an unknown version fails loudly, and vacuum expires
    the history down to the current snapshot."""
    corpus = str(tmp_path / "t.parquet")
    _write_corpus(corpus)
    out_dir, state = str(tmp_path / "o"), str(tmp_path / "s")
    r = coco_main(["index", corpus, "--out", out_dir, "--state", state], spark=spark)
    assert r["ok"]

    # grow the corpus by one conversation → snapshot v2
    rows = [("c2", 0, "zeta_svc imports eta_store .")]
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
        str(tmp_path / "t2.parquet"),
    )
    corpus2 = str(tmp_path / "c2dir")
    os.makedirs(corpus2)
    os.link(corpus, os.path.join(corpus2, "t.parquet"))
    os.link(str(tmp_path / "t2.parquet"), os.path.join(corpus2, "t2.parquet"))
    r = coco_main(["index", corpus2, "--out", out_dir, "--state", state], spark=spark)
    assert r["ok"]

    # history: pure-driver snapshot log, both commits enumerable
    h = coco_main(["history", "--state", state], spark=None)
    assert h["ok"] and h["n_snapshots"] == 2
    assert [s["version"] for s in h["snapshots"]] == [1, 2]
    assert all(s["stage"] == "materialize" for s in h["snapshots"])

    # list --as-of 1: the pre-growth state table (2 conversations, not 3)
    cur = coco_main(["list", "--state", state], spark=spark)
    old = coco_main(["list", "--state", state, "--as-of", "1"], spark=spark)
    assert cur["n_conversations"] == 3 and old["n_conversations"] == 2
    assert {r["conv_id"] for r in old["rows"]} == {"c0", "c1"}

    # stats --as-of: historical snapshot identity; unknown version is loud
    s1 = coco_main(["stats", "--state", state, "--as-of", "1"], spark=spark)
    assert s1["ok"] and s1["version"] == 1 and s1["n_conversations"] == 2
    bad = coco_main(["stats", "--state", state, "--as-of", "9"], spark=spark)
    assert not bad["ok"] and "unknown or expired" in bad["error"]

    # diff: the CDC changelog between the two snapshots is exactly the
    # grown conversation's edges as inserts — nothing deleted, and the two
    # untouched conversations pruned (n_changed_convs == 1)
    d = coco_main(["diff", "--state", state, "--from", "1"], spark=spark)
    assert d["ok"] and d["table"] == "edges" and (d["v_from"], d["v_to"]) == (1, 2)
    assert d["n_delete"] == 0 and d["n_insert"] >= 1
    assert d["n_changed_convs"] == 1
    assert {r["conv_id"] for r in d["rows"]} == {"c2"}
    assert all(r["change"] == "insert" for r in d["rows"])

    # search/graph --as-of: query the index as it was at snapshot v1 —
    # the conversation that only exists in v2 is invisible there
    cur_s = coco_main(["search", "zeta_svc", "--state", state], spark=spark)
    old_s = coco_main(
        ["search", "zeta_svc", "--state", state, "--as-of", "1"], spark=spark
    )
    assert any(r["chunk_id"].startswith("c2#") for r in cur_s["results"])
    assert not any(r["chunk_id"].startswith("c2#") for r in old_s["results"])
    g = coco_main(
        ["graph", "pagerank", "--state", state, "--as-of", "1"], spark=spark
    )
    assert g["ok"] and g["n"] >= 1

    # rollback (pure-driver): back to the v1 world — a NEW commit v3
    rb = coco_main(["rollback", "--state", state, "--to", "1"], spark=None)
    assert rb["ok"] and rb["version"] == 3
    assert (rb["rolled_back_to"], rb["rolled_back_from"]) == (1, 2)
    back = coco_main(["list", "--state", state], spark=spark)
    assert back["n_conversations"] == 2
    # ...and forward again: rollback targets ANY committed snapshot
    rf = coco_main(["rollback", "--state", state, "--to", "2"], spark=None)
    assert rf["ok"] and rf["version"] == 4
    assert coco_main(["list", "--state", state], spark=spark)["n_conversations"] == 3
    bad = coco_main(["rollback", "--state", state, "--to", "4"], spark=None)
    assert not bad["ok"] and "already current" in bad["error"]

    # tag (pure-driver): pin v1, resolve it anywhere a version is accepted
    t = coco_main(["tag", "golden", "--state", state, "--at", "1"], spark=None)
    assert t["ok"] and t["version"] == 1
    assert coco_main(["tag", "--state", state], spark=None)["tags"] == {"golden": 1}
    by_tag = coco_main(["list", "--state", state, "--as-of", "golden"], spark=spark)
    assert by_tag["n_conversations"] == 2
    assert coco_main(["history", "--state", state], spark=None)["tags"] == {
        "golden": 1
    }
    d2 = coco_main(
        ["diff", "--state", state, "--from", "golden", "--to", "2"], spark=spark
    )
    assert d2["ok"] and (d2["v_from"], d2["v_to"]) == (1, 2)
    gone = coco_main(["tag", "golden", "--state", state, "--delete"], spark=None)
    assert gone["ok"] and gone["version"] == 1
    assert coco_main(["tag", "--state", state], spark=None)["tags"] == {}

    # vacuum expires history: only the current snapshot remains listed
    r = coco_main(["vacuum", "--state", state, "--out", out_dir], spark=None)
    assert r["ok"]
    h = coco_main(["history", "--state", state], spark=None)
    assert h["ok"] and [s["version"] for s in h["snapshots"]] == [4]
