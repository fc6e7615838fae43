#!/usr/bin/env python
"""Operational CLI — the reference's four core verbs (reference:
src/cocosearch/cli.py:2665-2690 subcommand registry; index/search/stats/
delete-analog) fronted over the library surface:

  index   transcripts.parquet --out DIR --state DIR [--catalog P] [--config P]
  search  "query" --state DIR [-k N] [--min-score X] [--context] [--transcripts P]
  stats   --state DIR
  vacuum  --state DIR --out DIR [--dry-run]

Every verb prints ONE JSON document to stdout (rows as a list for search)
so the output is scriptable; human formatting is the caller's job — this
is an engine front, not a TUI. ``main`` accepts an injected SparkSession
so tests drive the verbs in-process without a per-verb JVM spin-up.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark_or(spark, cpus: str | int = "*"):
    if spark is not None:
        return spark, False
    from coco_search_spark.session import get_spark

    return get_spark(cores=cpus), True


def _cmd_index(args, spark) -> dict:
    from coco_search_spark.config import EngineConfig
    from coco_search_spark.pipeline import run_pipeline

    cfg = EngineConfig.from_file(args.config) if args.config else None
    catalog = spark.read.parquet(args.catalog) if args.catalog else None
    res = run_pipeline(
        spark,
        spark.read.parquet(args.transcripts),
        catalog=catalog,
        out_dir=args.out,
        state_dir=args.state,
        config=cfg,
    )
    return {"ok": True, "metrics": res.metrics}


def _cmd_search(args, spark) -> dict:
    from pyspark.sql import functions as F

    from coco_search_spark.state import StateStore

    store = StateStore(args.state)
    # the chunk store keys on (conv_id, turn_idx, seg_idx); the search API
    # wants one opaque id — same synthesis the driver queries use
    chunks = store.read_table(spark, "chunks").withColumn(
        "chunk_id", F.concat_ws("#", "conv_id", "turn_idx", "seg_idx")
    )
    kwargs = dict(k=args.k, rewrite=args.rewrite, min_score=args.min_score)
    if args.context:
        if not args.transcripts:
            raise SystemExit("--context requires --transcripts (the turn table)")
        from coco_search_spark.search import search_results

        out = search_results(
            chunks, spark.read.parquet(args.transcripts), args.query, **kwargs
        )
    else:
        from coco_search_spark.search import search_chunks

        out = search_chunks(chunks, args.query, **kwargs)
    rows = [r.asDict(recursive=True) for r in out.collect()]
    return {"ok": True, "query": args.query, "n": len(rows), "results": rows}


def _cmd_stats(args, spark) -> dict:
    from pyspark.sql import functions as F

    from coco_search_spark.state import StateStore

    store = StateStore(args.state)
    snap = store.last_snapshot()
    if snap is None:
        return {"ok": False, "error": "no snapshot committed"}
    state = store.read(spark)
    agg = state.agg(
        F.count(F.lit(1)).alias("n_conversations"),
        F.sum("rows_in").alias("n_turns"),
        F.sum("errors").alias("n_errors"),
    ).collect()[0]
    return {
        "ok": True,
        "snapshot_id": snap.get("snapshot_id"),
        "version": snap.get("version"),
        "config_hash": snap.get("config_hash"),
        "staleness_seconds": store.staleness_seconds(),
        "n_conversations": agg["n_conversations"],
        "n_turns": agg["n_turns"],
        "n_errors": agg["n_errors"],
        "parts": {
            kind: len(store.table_parts(kind) or [])
            for kind in ("facts", "chunks", "edges")
        },
        "input_files": len(snap.get("input_manifest") or {}) or None,
    }


def _cmd_vacuum(args, spark) -> dict:
    from coco_search_spark.state import StateStore

    victims = StateStore(args.state).vacuum(args.out, dry_run=args.dry_run)
    return {"ok": True, "dry_run": args.dry_run, "removed": victims}


def main(argv: list[str] | None = None, spark=None) -> dict:
    p = argparse.ArgumentParser(prog="coco", description=__doc__)
    p.add_argument("--cpus", default="*", help="local[N] cores (default all)")
    sub = p.add_subparsers(dest="verb", required=True)

    pi = sub.add_parser("index", help="run the KG pipeline over a transcript table")
    pi.add_argument("transcripts", help="parquet path of the turn table")
    pi.add_argument("--out", required=True)
    pi.add_argument("--state", required=True)
    pi.add_argument("--catalog", default=None, help="entity catalog parquet")
    pi.add_argument("--config", default=None, help="EngineConfig JSON file")

    ps = sub.add_parser("search", help="hybrid search over the chunk store")
    ps.add_argument("query")
    ps.add_argument("--state", required=True)
    ps.add_argument("-k", type=int, default=10)
    ps.add_argument("--min-score", type=float, default=None, dest="min_score")
    ps.add_argument("--rewrite", action="store_true", help="query expansion")
    ps.add_argument(
        "--context", action="store_true", help="attach content + context window"
    )
    ps.add_argument("--transcripts", default=None, help="turn table for --context")

    pt = sub.add_parser("stats", help="snapshot + state-table summary")
    pt.add_argument("--state", required=True)

    pv = sub.add_parser("vacuum", help="remove superseded/orphaned version dirs")
    pv.add_argument("--state", required=True)
    pv.add_argument("--out", required=True)
    pv.add_argument("--dry-run", action="store_true", dest="dry_run")

    args = p.parse_args(argv)
    spark, own = _spark_or(spark, args.cpus)
    try:
        out = {
            "index": _cmd_index,
            "search": _cmd_search,
            "stats": _cmd_stats,
            "vacuum": _cmd_vacuum,
        }[args.verb](args, spark)
    finally:
        if own:
            spark.stop()
    print(json.dumps(out, default=str))
    return out


if __name__ == "__main__":
    main()
