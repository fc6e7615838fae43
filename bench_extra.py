"""Extra benchmarks (guide §1.4): per-operator noop-sink isolation.

NOT part of the driver contract — bench.py stays the frozen measurement.
This file isolates the expensive pieces of the headline pipeline with the
noop sink so each transformation is timed without its output write, plus
the real parquet writes separately, so OPTIMIZATION_r06.md can attribute
stage seconds to compute vs I/O.

Usage:
  SPARK_GRAFT_CPUS=32 python bench_extra.py [piece ...]
Pieces: segment chunks_proj chunks_embed chunks_write extract link canon
        edges nodes edges_write (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main(pieces: list[str]) -> None:
    from pyspark.sql import functions as F

    import bench
    from coco_search_spark.operators.extract import extract_all, split_extracted
    from coco_search_spark.operators.linking import link_surfaces
    from coco_search_spark.operators.canonicalize import canonicalize_surfaces
    from coco_search_spark.operators.materialize import (
        build_nodes,
        resolve_edges,
        write_edges,
    )
    from coco_search_spark.operators.segments import segment_turns
    from coco_search_spark.session import get_spark

    sf = bench._sf_of(SF_DIR)
    fixture_path = bench._fixture_parquet(sf)
    replicas = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICAS", "4"))
    spark = get_spark(
        CPUS,
        app_name=f"bench_extra_local{CPUS}",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
        },
    )
    sc = spark.sparkContext
    base = spark.read.parquet(fixture_path)
    transcripts = (
        base.crossJoin(
            F.broadcast(spark.range(replicas).select(F.col("id").alias("rep")))
        )
        .withColumn("conv_id", F.concat_ws("_r", "conv_id", "rep"))
        .drop("rep")
        .repartition(CPUS * 4, "conv_id")
    )
    transcripts.count()  # warm page cache
    catalog = spark.read.parquet(
        os.path.join(os.path.dirname(fixture_path), "catalog.parquet")
    )
    timings: dict[str, float] = {}
    want = (lambda p: p in pieces) if pieces else (lambda p: True)

    segments = segment_turns(transcripts, with_offsets=True)

    if want("segment"):
        sc.setJobDescription("extra: segment noop")
        timings["segment_noop"] = noop(segments)

    if want("chunks_proj") or want("chunks_embed") or want("chunks_write"):
        from coco_search_spark.functions.embed import make_embed_udf
        from coco_search_spark.functions.text import (
            classify_block_col,
            section_col,
            tokenize_col,
        )

        embed = make_embed_udf(64)
        embed_input = F.concat_ws(
            "\n",
            F.concat(
                F.lit("Conv: "), F.col("conv_id"), F.lit(" role: "), F.col("role")
            ),
            F.col("seg_text"),
        )
        proj_no_embed = segments.select(
            "conv_id",
            "turn_idx",
            "seg_idx",
            "role",
            "tool",
            "start_word",
            "end_word",
            "seg_text",
            classify_block_col(F.col("seg_text"), F.col("tool")).alias("block_type"),
            section_col(F.col("seg_text")).alias("section"),
            F.array_join(tokenize_col(F.col("seg_text")), " ").alias("tsv_input"),
        )
        chunks = proj_no_embed.withColumn("embedding", embed(embed_input))
        if want("chunks_proj"):
            sc.setJobDescription("extra: chunk projection w/o embedding noop")
            timings["chunks_proj_noop"] = noop(proj_no_embed)
        if want("chunks_embed"):
            sc.setJobDescription("extra: chunk projection + embedding noop")
            timings["chunks_embed_noop"] = noop(chunks)
        if want("chunks_write"):
            sc.setJobDescription("extra: chunk parquet write")
            t0 = time.perf_counter()
            chunks.write.mode("overwrite").parquet("/tmp/coco_extra_chunks")
            timings["chunks_write_parquet"] = round(time.perf_counter() - t0, 3)

    facts = None
    if want("extract") or want("link") or want("canon") or want("edges") or want(
        "nodes"
    ) or want("edges_write"):
        sc.setJobDescription("extra: extract_all")
        t0 = time.perf_counter()
        facts = extract_all(segments).localCheckpoint(eager=True)
        timings["extract_checkpoint"] = round(time.perf_counter() - t0, 3)

    if facts is not None:
        triples, standalone, bindings = split_extracted(facts)
        surfaces = (
            triples.select(F.col("subj").alias("surface"))
            .distinct()
            .unionByName(triples.select(F.col("obj").alias("surface")).distinct())
            .unionByName(
                standalone.select(F.col("mention").alias("surface")).distinct()
            )
            .unionByName(bindings.select(F.col("target").alias("surface")).distinct())
            .unionByName(bindings.select(F.col("alias").alias("surface")).distinct())
            .distinct()
            .localCheckpoint(eager=True)
        )
        if want("link"):
            sc.setJobDescription("extra: link_surfaces")
            t0 = time.perf_counter()
            link_surfaces(
                surfaces.select(F.col("surface").alias("mention")), catalog
            ).localCheckpoint(eager=True)
            timings["link"] = round(time.perf_counter() - t0, 3)
        if want("canon"):
            sc.setJobDescription("extra: canonicalize")
            t0 = time.perf_counter()
            canon = canonicalize_surfaces(
                surfaces,
                extra_edges=bindings.select("target", "alias")
                .distinct()
                .select(F.col("target").alias("a"), F.col("alias").alias("b")),
            )
            canon.cache().count()
            timings["canon"] = round(time.perf_counter() - t0, 3)
        if want("edges") or want("nodes") or want("edges_write"):
            link_map = surfaces.select(
                F.col("surface").alias("mention"),
                F.col("surface").alias("canon_id"),
            )
            edges = resolve_edges(triples, link_map, links_small=True)
            if want("edges"):
                sc.setJobDescription("extra: resolve_edges noop")
                timings["edges_noop"] = noop(edges)
            if want("nodes"):
                sc.setJobDescription("extra: build_nodes noop")
                timings["nodes_noop"] = noop(build_nodes(edges))
            if want("edges_write"):
                sc.setJobDescription("extra: write_edges parquet")
                t0 = time.perf_counter()
                write_edges(edges, "/tmp/coco_extra_edges", sort_by_conv=True)
                timings["edges_write_parquet"] = round(time.perf_counter() - t0, 3)

    print(json.dumps({"cpus": CPUS, "sf": sf, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
