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
