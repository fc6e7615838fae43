#!/usr/bin/env python
"""Operational CLI — the reference's four core verbs (reference:
src/cocosearch/cli.py:2665-2690 subcommand registry; index/search/stats/
delete-analog) fronted over the library surface:

  index   transcripts.parquet --out DIR --state DIR [--catalog P] [--config P]
          [--branch B] — run the pipeline; --branch commits to a staging
          branch instead of main (write-audit-publish)
  search  "query" --state DIR [-k N] [--min-score X] [--context] [--transcripts P]
          [--as-of V] — hybrid search, optionally against a past snapshot
  analyze "query" --state DIR [-k N] — per-stage search diagnostics
  list    --state DIR [--limit N] [--as-of V] — indexed conversations
  stats   --state DIR [--as-of V]
  history --state DIR — snapshot log (time-travel targets for --as-of)
  diff    --state DIR --from V [--to V] [--table facts|chunks|edges] [--limit N]
          — CDC changelog between two snapshots (insert/delete rows)
  rollback --state DIR --to V — roll the current pointer back to snapshot V
          (a NEW commit; history is never rewritten)
  tag     [NAME] --state DIR [--at V] [--delete] — named snapshots
          (vacuum-protected; accepted anywhere a version is)
  export  --state DIR --dest DIR [--table T] [--as-of V] [--force]
          — materialize a resolved table as one plain parquet dir
  branch  [NAME] --state DIR [--at V] [--drop] — branch refs (Iceberg
          branch analog); a branch name is accepted anywhere a version is
  publish NAME --state DIR — fast-forward main to a branch head
  files   --state DIR [--as-of V] — referenced data dirs + sizes
          (the Iceberg `files` metadata-table analog)
  graph   tree|impact ROOT... --state DIR [--reverse] [--depth N]
  graph   pagerank|related|hits|communities|kcore|suggest --state DIR [--top N]
          [--rounds R] [-k K] [--max-hub D] — whole-graph analytics
  config  PATH [--check] — resolved EngineConfig + identity hash
  info    — engine capabilities: grammar, predicates, block types, defaults
  init    PATH [--force] — write a starter config file
  clear   --state DIR --out DIR --force — delete the index
  vacuum  --state DIR --out DIR [--dry-run]
  compact --state DIR --out DIR [--dry-run] — fold multi-part delta tables
          into one part per table (Iceberg rewrite_data_files analog)
  delete  ID... --state DIR — remove conversations from the index
          (pointer-level snapshot; recoverable via rollback until vacuum)

``info``/``init``/``config``/``clear``/``vacuum``/``history``/``rollback``/
``tag``/``branch``/``publish``/``files`` are pure-driver verbs — they never
start the JVM, so they return in interactive time.

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
import time

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
        branch=args.branch,
    )
    return {"ok": True, "metrics": res.metrics, "branch": args.branch or "main"}


def _cmd_branch(args, spark) -> dict:
    """Branch refs (round 5 — the Iceberg branch / write-audit-publish
    verb), pure-driver: no NAME lists branches, --drop removes one,
    otherwise NAME forks a branch at --at (default: current main head).
    Index onto it with `index --branch NAME`, audit via `--as-of NAME`
    on list/stats/search/analyze/graph/diff, then `publish NAME`."""
    from coco_search_spark.state import StateStore

    store = StateStore(args.state)
    try:
        if args.name is None:
            if args.drop:
                # a typo'd `branch --drop` must not silently degrade into
                # a listing that looks like success (ADVICE r5, low)
                return {"ok": False, "error": "--drop requires a branch name"}
            return {"ok": True, "branches": store.branches()}
        if args.drop:
            return {
                "ok": True,
                "dropped": args.name,
                "version": store.drop_branch(args.name),
            }
        return {
            "ok": True,
            "branch": args.name,
            "version": store.create_branch(args.name, args.at),
        }
    except (ValueError, FileNotFoundError, KeyError) as e:
        return {"ok": False, "error": str(e)}


def _cmd_publish(args, spark) -> dict:
    """Fast-forward main to a branch head (the publish half of
    write-audit-publish), pure-driver: a pointer swap — the branch's
    already-written snapshots become main's history verbatim. Refuses if
    main advanced independently since the fork (re-branch instead)."""
    from coco_search_spark.state import StateStore

    store = StateStore(args.state)
    try:
        head = store.publish(args.name)
        return {
            "ok": True,
            "published": args.name,
            "version": head.get("version"),
            "stage": head.get("stage"),
        }
    except (ValueError, FileNotFoundError, KeyError, RuntimeError) as e:
        return {"ok": False, "error": str(e)}


def _cmd_search(args, spark) -> dict:
    # the chunk store keys on (conv_id, turn_idx, seg_idx); the search API
    # wants one opaque id — same synthesis the driver queries use
    chunks = _load_chunks(spark, args.state, args.as_of)
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


def _load_chunks(spark, state: str, as_of=None):
    from pyspark.sql import functions as F

    from coco_search_spark.state import StateStore

    return StateStore(state).read_table(spark, "chunks", version=as_of).withColumn(
        "chunk_id", F.concat_ws("#", "conv_id", "turn_idx", "seg_idx")
    )


def _cmd_analyze(args, spark) -> dict:
    """Per-stage search diagnostics (reference: cli.py:2841-2917 analyze)."""
    from coco_search_spark.search import analyze_search

    out = analyze_search(
        _load_chunks(spark, args.state, args.as_of),
        args.query,
        k=args.k,
        rewrite=args.rewrite,
        min_score=args.min_score,
        where=args.where,
    )
    out["ok"] = True
    return out


def _cmd_list(args, spark) -> dict:
    """Indexed conversations (reference: cli.py:2918-2929 list verb —
    per-index inventory; here per-conversation state rows). --as-of N
    lists the state table as an older snapshot committed it (time
    travel; raises loudly if N is unknown or vacuum-expired)."""
    from coco_search_spark.state import StateStore

    state = StateStore(args.state).read(spark, version=args.as_of)
    total = state.count()
    rows = [
        r.asDict()
        for r in state.select(
            "conv_id", "rows_in", "rows_out", "errors", "written_version", "edges_wv"
        )
        .orderBy("conv_id")
        .limit(args.limit)
        .collect()
    ]
    return {"ok": True, "n_conversations": total, "shown": len(rows), "rows": rows}


def _cmd_graph(args, spark) -> dict:
    """Dependency-graph queries + whole-graph analytics over the
    materialized edge table (reference: cli.py:3221-3263 deps tree / deps
    impact; the analytics modes expose the beyond-reference suite)."""
    from pyspark.sql import functions as F

    from coco_search_spark.operators.graph import (
        adamic_adar,
        blast_radius,
        k_core,
        label_propagation,
        pagerank,
        transitive_tree,
    )
    from coco_search_spark.state import StateStore

    edges = StateStore(args.state).read_table(spark, "edges", version=args.as_of)
    if args.mode in ("tree", "impact"):
        if not args.roots:
            return {"ok": False, "error": f"graph {args.mode} requires root ids"}
        roots = spark.createDataFrame([(r,) for r in args.roots], "node string")
        if args.mode == "tree":
            df = transitive_tree(
                edges,
                roots,
                direction="reverse" if args.reverse else "forward",
                max_depth=args.depth,
            ).orderBy("depth", "node")
        else:
            df = blast_radius(edges, roots, max_depth=args.depth).orderBy("root")
    elif args.mode == "pagerank":
        df = pagerank(edges).orderBy(F.desc("rank"), "node").limit(args.top)
    elif args.mode == "related":
        # personalized PageRank: rank mass teleports to the given roots —
        # "entities related to X" over the KG
        if not args.roots:
            return {"ok": False, "error": "graph related requires root ids"}
        from coco_search_spark.operators.graph import personalized_pagerank

        roots = spark.createDataFrame([(r,) for r in args.roots], "node string")
        df = (
            personalized_pagerank(edges, roots)
            .join(roots, "node", "left_anti")  # the roots themselves are given
            .filter(F.col("rank") > 0)
            .orderBy(F.desc("rank"), "node")
            .limit(args.top)
        )
    elif args.mode == "hits":
        from coco_search_spark.operators.graph import hits as _hits

        df = (
            _hits(edges)
            .orderBy(F.desc("authority"), F.desc("hub"), "node")
            .limit(args.top)
        )
    else:
        # the undirected analytics ignore unresolved (null-object) edges
        und = edges.filter(F.col("obj_id").isNotNull())
        if args.mode == "kcore":
            df = (
                k_core(und, k=args.k, src="subj_id", dst="obj_id")
                .orderBy(F.desc("core_degree"), "node")
                .limit(args.top)
            )
        elif args.mode == "communities":
            df = (
                label_propagation(und, rounds=args.rounds, src="subj_id", dst="obj_id")
                .groupBy("label")
                .agg(F.count(F.lit(1)).alias("size"))
                .orderBy(F.desc("size"), "label")
                .limit(args.top)
            )
        else:  # suggest: Adamic-Adar candidate links
            df = adamic_adar(
                und, top_k=args.top, max_hub_degree=args.max_hub,
                src="subj_id", dst="obj_id",
            )
    rows = [r.asDict() for r in df.collect()]
    return {"ok": True, "mode": args.mode, "n": len(rows), "rows": rows}


def _cmd_config(args, spark) -> dict:
    """Resolved config + identity hash (reference: cli.py:3113-3141
    config show / config check)."""
    from coco_search_spark.config import EngineConfig

    try:
        cfg = EngineConfig.from_file(args.path) if args.path else EngineConfig()
        cfg.validate()
    except (ValueError, OSError) as exc:
        # validate() packs every violation into one "; "-joined line
        return {
            "ok": False,
            "path": args.path,
            "problems": [p.strip() for p in str(exc).split("; ")],
        }
    out = {"ok": True, "path": args.path, "problems": []}
    if not args.check:
        out["config"] = cfg.to_dict()
        out["config_hash"] = cfg.config_hash()
        out["operational_keys"] = list(cfg._OPERATIONAL)
    return out


def _cmd_clear(args, spark) -> dict:
    """Delete the index — state dir + output dir (reference:
    cli.py:3010-3036 clear; confirmation there, --force here since this
    CLI is non-interactive JSON). Refuses unless the state dir actually
    holds a committed snapshot, so a mistyped path can't delete an
    arbitrary directory."""
    import shutil

    from coco_search_spark.state import StateStore

    if not args.force:
        return {"ok": False, "error": "clear is destructive; pass --force"}
    if StateStore(args.state).last_snapshot() is None:
        return {"ok": False, "error": f"{args.state}: no committed snapshot — not an index"}
    removed = []
    for path in (args.state, args.out):
        if path and os.path.isdir(path):
            shutil.rmtree(path)
            removed.append(path)
    return {"ok": True, "removed": removed}


def _cmd_info(args, spark) -> dict:
    """Static engine capability listing — what the installed engine
    supports, no state dir needed (reference: cli.py:2986-3009 languages +
    grammars verbs; here the closed extraction grammar replaces the
    per-language tree-sitter matrix)."""
    from coco_search_spark import __version__
    from coco_search_spark.config import EngineConfig
    from coco_search_spark.fixtures import PASSIVE_OF, RELATIONS
    from coco_search_spark.operators.extract import GRAMMAR_VERSION, STOP_IDENTS

    return {
        "ok": True,
        "engine_version": __version__,
        "grammar_version": GRAMMAR_VERSION,
        "predicates": sorted(pred for pred, _ in RELATIONS),
        "relation_phrases": {pred: ph for pred, ph in RELATIONS},
        "passive_phrases": dict(PASSIVE_OF),
        "triple_forms": [
            "active",
            "passive",
            "appositive",
            "conjunction",
            "alias_binding",
        ],
        "stop_identifiers": sorted(STOP_IDENTS),
        # functions/text.py block taxonomy, in precedence order
        "block_types": [
            "tool_output",
            "fenced_code",
            "log_dump",
            "inline_tool_call",
            "prose",
        ],
        "config_defaults": EngineConfig().to_dict(),
    }


def _cmd_init(args, spark) -> dict:
    """Write a starter config file (reference: cli.py:3037-3085 init)."""
    from coco_search_spark.config import EngineConfig

    if os.path.exists(args.path) and not args.force:
        return {"ok": False, "error": f"{args.path} exists; pass --force to overwrite"}
    cfg = EngineConfig()
    with open(args.path, "w") as f:
        json.dump(cfg.to_dict(), f, indent=2, sort_keys=True)
        f.write("\n")
    return {"ok": True, "path": args.path, "config_hash": cfg.config_hash()}


def _cmd_history(args, spark) -> dict:
    """Snapshot history (round 5 — the Iceberg snapshot-log verb): one row
    per committed version, oldest first. Any listed version is readable
    via `list --as-of` / `stats --as-of` until `vacuum` expires it. Pure
    driver-side: manifest JSONs only, no Spark session."""
    from coco_search_spark.state import StateStore

    store = StateStore(args.state, ref=args.ref)
    try:
        snaps = store.snapshots()
    except (KeyError, FileNotFoundError) as e:
        return {"ok": False, "error": str(e)}
    if not snaps:
        return {"ok": False, "error": "no snapshot committed"}
    rows = [
        {
            "version": s.get("version"),
            "snapshot_id": s.get("snapshot_id"),
            "stage": s.get("stage"),
            "committed_at": s.get("committed_at"),
            "config_hash": s.get("config_hash"),
            "parts": {
                kind: len(s.get(f"{kind}_parts") or ([1] if s.get(f"{kind}_path") else []))
                for kind in ("facts", "chunks", "edges")
            },
            "input_files": len(s.get("input_manifest") or {}) or None,
        }
        for s in snaps
    ]
    return {
        "ok": True,
        "n_snapshots": len(rows),
        "tags": store.tags(),
        "ref": args.ref or "main",
        "branches": store.branches(),
        "snapshots": rows,
    }


def _cmd_tag(args, spark) -> dict:
    """Named snapshots (round 5 — the Iceberg tag analog), pure-driver:
    no NAME lists the tags, --delete drops one, otherwise NAME is
    created/moved to --at (default: the current snapshot). A tagged
    snapshot is protected from vacuum's history expiry and is accepted
    anywhere a version is (`--as-of`, `rollback --to`, `diff --from/--to`)."""
    from coco_search_spark.state import StateStore

    store = StateStore(args.state)
    try:
        if args.name is None:
            return {"ok": True, "tags": store.tags()}
        if args.delete:
            return {"ok": True, "deleted": args.name, "version": store.untag(args.name)}
        return {"ok": True, "tag": args.name, "version": store.tag(args.name, args.at)}
    except (ValueError, FileNotFoundError, KeyError) as e:
        return {"ok": False, "error": str(e)}


def _cmd_diff(args, spark) -> dict:
    """CDC changelog between two committed snapshots (round 5 — the
    Iceberg changelog-read / create_changelog_view verb; the reference's
    tracking table, flow.py:436-448, can only be replayed forward): the
    rows of one state-pointed table inserted or deleted going
    --from → --to, tagged in a `change` column. O(delta): conversations
    whose version pointer is equal in both snapshots are pruned without
    reading a row (StateStore.diff_table)."""
    from pyspark.sql import functions as F

    from coco_search_spark.state import StateStore

    store = StateStore(args.state)
    cur = store.last_snapshot()
    if cur is None:
        return {"ok": False, "error": "no snapshot committed"}
    try:
        v_from = store.resolve_version(args.v_from)
        v_to = (
            store.resolve_version(args.v_to)
            if args.v_to is not None
            else cur["version"]
        )
    except FileNotFoundError as e:
        return {"ok": False, "error": str(e)}
    diff = store.diff_table(spark, args.table, v_from=v_from, v_to=v_to)
    n_changed = store.changed_convs(spark, args.table, v_from, v_to).count()
    counts = {
        r["change"]: r["n"]
        for r in diff.groupBy("change").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = [
        r.asDict()
        for r in diff.orderBy("change", "conv_id").limit(args.limit).collect()
    ]
    return {
        "ok": True,
        "table": args.table,
        "v_from": v_from,
        "v_to": v_to,
        "n_insert": counts.get("insert", 0),
        "n_delete": counts.get("delete", 0),
        "n_changed_convs": n_changed,
        "shown": len(rows),
        "rows": rows,
    }


def _cmd_rollback(args, spark) -> dict:
    """Roll the current pointer back to an earlier snapshot (round 5 —
    Iceberg rollback_to_snapshot analog): a NEW commit reusing the target
    snapshot's table references verbatim; history is never rewritten, the
    rolled-past snapshots stay time-travel readable until vacuum. Pure
    driver-side (manifest JSONs only) — no JVM."""
    from coco_search_spark.state import StateStore

    try:
        m = StateStore(args.state).rollback(args.to)
    except (ValueError, FileNotFoundError) as e:
        return {"ok": False, "error": str(e)}
    return {
        "ok": True,
        "version": m["version"],
        "snapshot_id": m["snapshot_id"],
        "rolled_back_to": m["rolled_back_to"],
        "rolled_back_from": m["rolled_back_from"],
    }


def _cmd_export(args, spark) -> dict:
    """Materialize a state-managed table as ONE plain parquet dir for
    downstream consumers — the RESOLVED view (per-conversation pointer
    resolution applied, deleted conversations dropped), not the raw
    versioned parts, optionally as of a historical version or tag. The
    downstream contract is a vanilla `spark.read.parquet(dest)` with no
    knowledge of the store."""
    from coco_search_spark.state import StateStore

    from pyspark.errors import AnalysisException

    store = StateStore(args.state)
    try:
        df = store.read_table(spark, args.table, version=args.as_of)
        df.write.mode("overwrite" if args.force else "errorifexists").parquet(
            args.dest
        )
    except FileNotFoundError as e:
        return {"ok": False, "error": str(e)}
    except AnalysisException as e:
        # dest already exists and --force not given
        return {"ok": False, "error": str(e)}
    return {
        "ok": True,
        "table": args.table,
        "dest": args.dest,
        "as_of": args.as_of,
        "rows": spark.read.parquet(args.dest).count(),
    }


def _cmd_stats(args, spark) -> dict:
    from pyspark.sql import functions as F

    from coco_search_spark.state import StateStore

    store = StateStore(args.state)
    if args.as_of is not None:
        snap = store.snapshot(args.as_of)
        if snap is None:
            return {
                "ok": False,
                "error": f"snapshot v{args.as_of} unknown or expired",
            }
    else:
        snap = store.last_snapshot()
    if snap is None:
        return {"ok": False, "error": "no snapshot committed"}
    state = store.read(spark, version=args.as_of)
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
        # staleness is age-of-THIS-snapshot: for --as-of that is the
        # historical commit's age, not the store's
        "staleness_seconds": max(0.0, time.time() - float(snap["committed_at"])),
        "n_conversations": agg["n_conversations"],
        "n_turns": agg["n_turns"],
        "n_errors": agg["n_errors"],
        "parts": {
            kind: len(store.table_parts(kind, version=args.as_of) or [])
            for kind in ("facts", "chunks", "edges")
        },
        "input_files": len(snap.get("input_manifest") or {}) or None,
    }


def _cmd_files(args, spark) -> dict:
    """Storage inspection (the Iceberg `files` metadata-table analog),
    pure-driver: every data dir the resolved snapshot references with
    file counts and bytes. --as-of accepts a version, tag, or branch."""
    from coco_search_spark.state import StateStore

    try:
        rows = StateStore(args.state).files(version=args.as_of)
    except (FileNotFoundError, KeyError) as e:
        return {"ok": False, "error": str(e)}
    return {
        "ok": True,
        "as_of": args.as_of or "current",
        "n_dirs": len(rows),
        "total_bytes": sum(r["bytes"] for r in rows),
        "files": rows,
    }


def _cmd_vacuum(args, spark) -> dict:
    from coco_search_spark.state import StateStore

    victims = StateStore(args.state).vacuum(
        args.out,
        dry_run=args.dry_run,
        retain_last=args.retain_last,
        older_than=args.older_than,
    )
    return {"ok": True, "dry_run": args.dry_run, "removed": victims}


def _cmd_delete(args, spark) -> dict:
    """Targeted conversation deletion (reference delete verb analog):
    pointer-level — a new snapshot whose state table omits the ids; no
    data file is touched, recoverable via rollback until vacuum."""
    from coco_search_spark.state import StateStore

    try:
        out = StateStore(args.state).delete_convs(spark, args.conv)
    except KeyError as exc:
        return {"ok": False, "error": str(exc)}
    out["ok"] = True
    return out


def _cmd_compact(args, spark) -> dict:
    """Explicit store maintenance (Iceberg rewrite_data_files analog):
    fold every multi-part delta table into one part as a new snapshot.
    The pre-compact snapshot stays time-travel readable until vacuum."""
    from coco_search_spark.state import StateStore

    out = StateStore(args.state).compact(spark, args.out, dry_run=args.dry_run)
    out["ok"] = True
    out["dry_run"] = args.dry_run
    return out


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
    pi.add_argument(
        "--branch", default=None,
        help="commit to this branch instead of main (write-audit-publish)",
    )

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
    ps.add_argument(
        "--as-of", default=None, dest="as_of",
        help="search the chunk store as of a snapshot version or tag",
    )

    pa_ = sub.add_parser("analyze", help="per-stage search diagnostics")
    pa_.add_argument("query")
    pa_.add_argument("--state", required=True)
    pa_.add_argument("-k", type=int, default=10)
    pa_.add_argument("--min-score", type=float, default=None, dest="min_score")
    pa_.add_argument("--rewrite", action="store_true")
    pa_.add_argument("--where", default=None, help="SQL predicate over chunk columns")
    pa_.add_argument(
        "--as-of", default=None, dest="as_of",
        help="analyze against the chunk store as of a snapshot version or tag",
    )

    pl = sub.add_parser("list", help="indexed conversations")
    pl.add_argument("--state", required=True)
    pl.add_argument("--limit", type=int, default=100)
    pl.add_argument(
        "--as-of", default=None, dest="as_of",
        help="read the state table as of snapshot version or tag (see history)",
    )

    pg = sub.add_parser(
        "graph", help="dependency tree / impact + whole-graph analytics"
    )
    pg.add_argument(
        "mode", choices=("tree", "impact", "pagerank", "related", "hits", "communities", "kcore", "suggest")
    )
    pg.add_argument("roots", nargs="*", help="root entity id(s) (tree/impact/related)")
    pg.add_argument("--state", required=True)
    pg.add_argument("--reverse", action="store_true", help="walk edges backwards (tree)")
    pg.add_argument("--depth", type=int, default=20)
    pg.add_argument("--top", type=int, default=20, help="rows returned (analytics)")
    pg.add_argument("-k", type=int, default=2, help="kcore: minimum core degree")
    pg.add_argument("--rounds", type=int, default=4, help="communities: LPA rounds")
    pg.add_argument(
        "--max-hub", type=int, default=1000, dest="max_hub",
        help="suggest: drop shared-neighbor buckets above this degree",
    )
    pg.add_argument(
        "--as-of", default=None, dest="as_of",
        help="walk the edge table as of a snapshot version or tag",
    )

    pc = sub.add_parser("config", help="resolved EngineConfig + identity hash")
    pc.add_argument("path", nargs="?", default=None, help="JSON/YAML config file")
    pc.add_argument("--check", action="store_true", help="validate only")

    pr = sub.add_parser("clear", help="delete the index (state + out dirs)")
    pr.add_argument("--state", required=True)
    pr.add_argument("--out", required=True)
    pr.add_argument("--force", action="store_true")

    sub.add_parser("info", help="engine capabilities: grammar, predicates, defaults")

    pn = sub.add_parser("init", help="write a starter EngineConfig JSON file")
    pn.add_argument("path")
    pn.add_argument("--force", action="store_true", help="overwrite an existing file")

    pt = sub.add_parser("stats", help="snapshot + state-table summary")
    pt.add_argument("--state", required=True)
    pt.add_argument(
        "--as-of", default=None, dest="as_of",
        help="summarize a historical snapshot version or tag (see history)",
    )

    ph = sub.add_parser("history", help="snapshot log (time-travel targets)")
    ph.add_argument("--state", required=True)
    ph.add_argument(
        "--ref", default=None, help="branch whose lineage to list (default main)"
    )

    pdf = sub.add_parser(
        "diff", help="changelog between two snapshots (insert/delete rows)"
    )
    pdf.add_argument("--state", required=True)
    pdf.add_argument(
        "--from", required=True, dest="v_from",
        help="older snapshot version or tag (see history)",
    )
    pdf.add_argument(
        "--to", default=None, dest="v_to",
        help="newer snapshot version or tag (default: current)",
    )
    pdf.add_argument("--table", default="edges", choices=("facts", "chunks", "edges"))
    pdf.add_argument("--limit", type=int, default=100)

    prb = sub.add_parser(
        "rollback", help="roll the current pointer back to an earlier snapshot"
    )
    prb.add_argument("--state", required=True)
    prb.add_argument(
        "--to", required=True,
        help="target snapshot version or tag (see history); commits a new snapshot",
    )

    pe = sub.add_parser(
        "export", help="materialize a resolved table as one plain parquet dir"
    )
    pe.add_argument("--state", required=True)
    pe.add_argument("--dest", required=True, help="output parquet directory")
    pe.add_argument("--table", default="edges", choices=("facts", "chunks", "edges"))
    pe.add_argument(
        "--as-of", default=None, dest="as_of",
        help="export as of a snapshot version or tag (default: current)",
    )
    pe.add_argument("--force", action="store_true", help="overwrite dest")

    ptg = sub.add_parser(
        "tag", help="named snapshots: create/move/list/delete (vacuum-protected)"
    )
    ptg.add_argument("name", nargs="?", default=None, help="tag name (omit to list)")
    ptg.add_argument("--state", required=True)
    ptg.add_argument(
        "--at", type=int, default=None,
        help="snapshot version to pin (default: current)",
    )
    ptg.add_argument("--delete", action="store_true", help="drop the tag")

    pb = sub.add_parser(
        "branch", help="branch refs: create/list/drop (write-audit-publish staging)"
    )
    pb.add_argument("name", nargs="?", default=None, help="branch name (omit to list)")
    pb.add_argument("--state", required=True)
    pb.add_argument(
        "--at", default=None,
        help="snapshot version/tag to fork at (default: current main head)",
    )
    pb.add_argument("--drop", action="store_true", help="drop the branch ref")

    pp = sub.add_parser(
        "publish", help="fast-forward main to a branch head (audit passed)"
    )
    pp.add_argument("name", help="branch to publish")
    pp.add_argument("--state", required=True)

    pf = sub.add_parser(
        "files", help="storage inspection: referenced data dirs + sizes"
    )
    pf.add_argument("--state", required=True)
    pf.add_argument(
        "--as-of", default=None, dest="as_of",
        help="snapshot version, tag, or branch (default: current)",
    )

    pv = sub.add_parser("vacuum", help="remove superseded/orphaned version dirs")
    pv.add_argument("--state", required=True)
    pv.add_argument("--out", required=True)
    pv.add_argument("--dry-run", action="store_true", dest="dry_run")
    pv.add_argument(
        "--retain-last", type=int, default=1, dest="retain_last",
        help="keep the last N snapshots of main's lineage readable",
    )
    pv.add_argument(
        "--older-than", type=float, default=None, dest="older_than",
        help="only expire snapshots committed before this epoch timestamp",
    )

    pd_ = sub.add_parser(
        "delete", help="remove conversations from the index (pointer-level)"
    )
    pd_.add_argument("conv", nargs="+", help="conversation ids to delete")
    pd_.add_argument("--state", required=True)

    pk = sub.add_parser(
        "compact", help="fold multi-part delta tables into one part per table"
    )
    pk.add_argument("--state", required=True)
    pk.add_argument("--out", required=True)
    pk.add_argument("--dry-run", action="store_true", dest="dry_run")

    args = p.parse_args(argv)
    verbs = {
        "index": _cmd_index,
        "search": _cmd_search,
        "analyze": _cmd_analyze,
        "list": _cmd_list,
        "graph": _cmd_graph,
        "config": _cmd_config,
        "clear": _cmd_clear,
        "info": _cmd_info,
        "init": _cmd_init,
        "stats": _cmd_stats,
        "history": _cmd_history,
        "diff": _cmd_diff,
        "rollback": _cmd_rollback,
        "tag": _cmd_tag,
        "export": _cmd_export,
        "branch": _cmd_branch,
        "publish": _cmd_publish,
        "files": _cmd_files,
        "vacuum": _cmd_vacuum,
        "compact": _cmd_compact,
        "delete": _cmd_delete,
    }
    # pure-driver verbs: no DataFrame work, so no JVM spin-up
    if args.verb in (
        "info", "init", "config", "clear", "vacuum", "history", "rollback",
        "tag", "branch", "publish", "files",
    ):
        out = verbs[args.verb](args, None)
        print(json.dumps(out, default=str))
        return out
    spark, own = _spark_or(spark, args.cpus)
    try:
        out = verbs[args.verb](args, spark)
    finally:
        if own:
            spark.stop()
    print(json.dumps(out, default=str))
    return out


if __name__ == "__main__":
    main()
