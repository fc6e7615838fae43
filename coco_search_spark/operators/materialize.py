"""Graph materialization: node/edge tables with hot-key skew defense.

The reference's sink layer is per-file DELETE+INSERT into PostgreSQL
(reference: flow.py:177-233, deps/db.py insert_edges) — single-process, no
skew concept. At 10^12-turn scale the north rule mandates explicit skew
handling on entity-id: one hot entity (a popular service mentioned in half
of all turns) would otherwise pin its entire groupBy partition on one task.

``salted_degree`` implements the canonical two-phase aggregate:
  phase 1: groupBy (entity_id, salt = pmod(hash(row), S)) — partial counts
           spread over S tasks;
  phase 2: groupBy entity_id over S partials — tiny.
Spark's partial aggregation already combines map-side, but for
count-DISTINCT-style or collect-style aggregates the salt is what prevents
a single reducer from owning the hot key; we keep the pattern explicit and
benchmarked (tests/test_materialize.py hot-entity fixture).

Writes are plain parquet partitioned by ``pred`` (Iceberg unavailable in
this sandbox; the writer isolates format-specific calls so swapping
``.writeTo(...).using("iceberg")`` in is a one-liner — see state.py for the
snapshot/lineage analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def resolve_edges(
    triples: DataFrame, links: DataFrame
) -> DataFrame:
    """triples(conv_id, turn_idx, subj, pred, obj) × links(mention →
    entity/canon id) → edges with canonical endpoint ids + provenance.

    links: (mention, canon_id). Unmatched surfaces keep null ids — the
    reference's unresolved-external semantics (models.py:33-35).
    """
    subj_link = links.select(
        F.col("mention").alias("subj"), F.col("canon_id").alias("subj_id")
    ).distinct()
    obj_link = links.select(
        F.col("mention").alias("obj"), F.col("canon_id").alias("obj_id")
    ).distinct()
    # note: the metadata map (JSONB analog) is attached at WRITE time by
    # write_graph — keeping it out of the cached intermediate halves the
    # cache's allocation/GC pressure (maps are the most expensive column
    # type to materialize)
    return (
        triples.join(F.broadcast(subj_link), "subj", "left")
        .join(F.broadcast(obj_link), "obj", "left")
        .select("subj_id", "pred", "obj_id", "subj", "obj", "conv_id", "turn_idx")
    )


def salted_degree(
    edges: DataFrame,
    key: str = "subj_id",
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase salted degree/count aggregation per entity:
    (entity_id, degree, n_convs_approx). The distinct-ish metric uses
    approx_count_distinct (SURVEY §2.4 note — appropriate at 10^12 scale)."""
    salted = edges.filter(F.col(key).isNotNull()).withColumn(
        "salt", F.pmod(F.xxhash64("conv_id", "turn_idx", "pred"), F.lit(salt_buckets))
    )
    partial = salted.groupBy(key, "salt").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.approx_count_distinct("conv_id").alias("acd"),
    )
    return partial.groupBy(key).agg(
        F.sum("cnt").alias("degree"),
        # upper-bound merge of per-salt sketches; exactness not required for
        # the metrics table (reference's stats are exact COUNTs but run on a
        # single box — stats.py:38-97)
        F.sum("acd").alias("n_convs_approx"),
    ).withColumnRenamed(key, "entity_id")


def build_nodes(edges: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Node table: every canonical endpoint with out/in degree.

    Single pass: both endpoints are stacked into (entity_id, is_out) rows
    first, so one salted two-phase aggregation computes both degrees — one
    shuffle instead of two plus a join."""
    endpoints = edges.select(
        F.col("subj_id").alias("entity_id"), F.lit(1).alias("is_out")
    ).unionAll(edges.select(F.col("obj_id").alias("entity_id"), F.lit(0).alias("is_out")))
    salted = endpoints.filter(F.col("entity_id").isNotNull()).withColumn(
        "salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial = salted.groupBy("entity_id", "salt").agg(
        F.sum("is_out").alias("o"), F.sum(1 - F.col("is_out")).alias("i")
    )
    return partial.groupBy("entity_id").agg(
        F.sum("o").alias("out_degree"), F.sum("i").alias("in_degree")
    )


def write_graph(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Materialize node/edge parquet tables; edges repartitioned by a salted
    subj_id so one hot entity cannot produce one giant output file."""
    out_edges = edges
    if "metadata" not in edges.columns:
        out_edges = edges.withColumn(
            "metadata",
            F.create_map(
                F.lit("subj_surface"), F.col("subj"),
                F.lit("obj_surface"), F.col("obj"),
            ),
        )
    out_edges.withColumn(
        "write_bucket", F.pmod(F.xxhash64("subj_id", "conv_id", "turn_idx"), F.lit(32))
    ).repartition(32, "write_bucket").drop("write_bucket").write.mode("overwrite").partitionBy(
        "pred"
    ).parquet(f"{out_dir}/edges")
    nodes.write.mode("overwrite").parquet(f"{out_dir}/nodes")
