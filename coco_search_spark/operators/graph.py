"""Graph queries over the triples/edges table.

Re-expresses the reference's dependency-graph query layer
(reference: src/cocosearch/deps/query.py):

- forward / reverse neighbor lookup  (get_dependencies :52-102,
  get_dependents :105-155) → partition-pruned filters;
- transitive BFS with visited-set cycle exclusion and depth cap
  (get_dependency_tree :179-243, get_impact :246-293, batch variants
  :296-421) → iterative frontier ⋈ edges joins with ``left_anti`` against
  the visited set, localCheckpoint per level;
- unresolved/external nodes (obj_id null, models.py:33-35) stay leaves —
  they never join the frontier, same termination semantics as the
  reference's external-node handling (query.py:214-230).

Scale: each BFS level is one equi-join keyed on the frontier side; the
visited set stays small relative to the edge table, so Catalyst/AQE
broadcast the frontier. Depth cap 5 matches the reference default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_DEPTH = 5  # reference default depth cap, deps/query.py:179-243


def forward_edges(edges: DataFrame, subj_id: str, pred: str | None = None) -> DataFrame:
    out = edges.filter(F.col("subj_id") == subj_id)
    if pred is not None:
        out = out.filter(F.col("pred") == pred)
    return out


def reverse_edges(edges: DataFrame, obj_id: str, pred: str | None = None) -> DataFrame:
    out = edges.filter(F.col("obj_id") == obj_id)
    if pred is not None:
        out = out.filter(F.col("pred") == pred)
    return out


def transitive_closure(
    edges: DataFrame,
    roots: DataFrame,
    direction: str = "forward",
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """Multi-root BFS (batch variant, deps/query.py:296-365 analog).

    roots: DataFrame with one column ``node``. Returns (node, depth) for all
    reached nodes with the minimal depth, roots at depth 0. Cycle exclusion
    via left_anti against the visited set each level.
    """
    if direction == "forward":
        step = edges.select(F.col("subj_id").alias("src"), F.col("obj_id").alias("dst"))
    elif direction == "reverse":
        step = edges.select(F.col("obj_id").alias("src"), F.col("subj_id").alias("dst"))
    else:
        raise ValueError(direction)
    # materialize once: levels must not re-run the upstream edge DAG
    step = step.filter(F.col("dst").isNotNull()).distinct().localCheckpoint(eager=True)

    visited = roots.select(F.col("node"), F.lit(0).alias("depth")).distinct().localCheckpoint(
        eager=True
    )
    frontier = visited.select("node")
    for depth in range(1, max_depth + 1):
        nxt = (
            step.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited


def transitive_closure_per_root(
    edges: DataFrame,
    roots: DataFrame,
    direction: str = "forward",
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """Per-root BFS: like transitive_closure but the visited set is keyed by
    (root, node), so each root gets its own reachability (the blast-radius /
    impact-set semantics, deps/query.py:296-421 batch analog). Returns
    (root, node, depth) with minimal per-root depth."""
    if direction == "forward":
        step = edges.select(F.col("subj_id").alias("src"), F.col("obj_id").alias("dst"))
    elif direction == "reverse":
        step = edges.select(F.col("obj_id").alias("src"), F.col("subj_id").alias("dst"))
    else:
        raise ValueError(direction)
    step = step.filter(F.col("dst").isNotNull()).distinct().localCheckpoint(eager=True)

    visited = (
        roots.select(F.col("node").alias("root"), F.col("node"), F.lit(0).alias("depth"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("root", "node")
    for depth in range(1, max_depth + 1):
        nxt = (
            step.join(frontier.withColumnRenamed("node", "src"), "src")
            .select("root", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("root", "node"), ["root", "node"], "left_anti")
            .withColumn("depth", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("root", "node")
    return visited


def transitive_tree(
    edges: DataFrame,
    roots: DataFrame,
    direction: str = "forward",
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """BFS closure WITH tree structure: (node, depth, parent) — the analog
    of the reference's DependencyTree (models.py:49-80, built at
    deps/query.py:179-243), which callers need for "why is X reachable"
    questions, not just the reachable set.

    depth = minimal hop count from any root; parent = the lexicographically
    smallest predecessor at depth-1 (deterministic under any partitioning —
    BFS tree choice is otherwise arbitrary). Roots carry parent = NULL.
    Computed as one post-hoc join over the closure: predecessors at
    depth-1 are grouped per node with min(), so no per-level parent state
    is threaded through the loop."""
    if direction == "forward":
        step = edges.select(F.col("subj_id").alias("src"), F.col("obj_id").alias("dst"))
    elif direction == "reverse":
        step = edges.select(F.col("obj_id").alias("src"), F.col("subj_id").alias("dst"))
    else:
        raise ValueError(direction)
    step = step.filter(F.col("dst").isNotNull()).distinct().localCheckpoint(eager=True)

    vis = transitive_closure(edges, roots, direction, max_depth)
    src_d = vis.select(F.col("node").alias("src"), F.col("depth").alias("src_depth"))
    dst_d = vis.select(F.col("node").alias("dst"), F.col("depth").alias("dst_depth"))
    parents = (
        step.join(src_d, "src")
        .join(dst_d, "dst")
        .filter(F.col("src_depth") + 1 == F.col("dst_depth"))
        .groupBy("dst")
        .agg(F.min("src").alias("parent"))
    )
    return vis.join(
        parents, vis.node == parents.dst, "left"
    ).select("node", "depth", "parent")


def blast_radius(edges: DataFrame, roots: DataFrame, max_depth: int = MAX_DEPTH) -> DataFrame:
    """(root, radius): how many nodes each root transitively impacts in
    reverse direction — the reference's impact/blast-radius metric."""
    reach = transitive_closure_per_root(edges, roots, "reverse", max_depth)
    return reach.groupBy("root").agg((F.count(F.lit(1)) - 1).alias("radius"))


def pagerank(
    edges: DataFrame,
    n_iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Deterministic PageRank over edges(subj_id, obj_id): a fixed number
    of unrolled power iterations,
    rank = (1-d)/N + d·(Σ incoming rank/deg + dangling_mass/N).

    Dangling mass (rank held by nodes with no out-edges) is redistributed
    uniformly each iteration — the standard formulation — so ranks sum to
    1.0 every iteration and dangling-heavy graphs do not skew low (the
    round-3 simplified variant dropped it). The redistribution costs one
    scalar aggregate per iteration: a 1-row DataFrame cross-joined in, no
    driver collect. The DuckDB oracle unrolls the identical formula, so
    every value stays checkable.

    Scale: nodes/contributions shuffle on node id per iteration (the
    classic PR shape); the per-iteration result is localCheckpointed so
    the plan stays flat across iterations (same rule as the CC loop).
    Returns (node, rank) with rank rounded to 6 dp — float addition order
    differs between engines/partitionings at ~1e-15, and rounding only at
    the END keeps intermediate precision while pinning the output."""
    e = edges.select("subj_id", "obj_id").filter(
        F.col("subj_id").isNotNull() & F.col("obj_id").isNotNull()
    )
    nodes = (
        e.select(F.col("subj_id").alias("node"))
        .unionByName(e.select(F.col("obj_id").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_total = nodes.agg(F.count(F.lit(1)).alias("_n"))
    out_deg = e.groupBy("subj_id").agg(F.count(F.lit(1)).alias("deg"))
    # dangling node set is iteration-invariant — compute once
    dangling = nodes.join(
        out_deg.select(F.col("subj_id").alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=True)
    ranks = nodes.crossJoin(F.broadcast(n_total)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    ).localCheckpoint(eager=True)
    for _ in range(n_iters):
        contrib = (
            e.join(ranks, e.subj_id == ranks.node)
            .join(out_deg, "subj_id")
            .select(
                F.col("obj_id").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        # scalar: rank mass sitting on dangling nodes this iteration
        dang = ranks.join(dangling, "node", "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_total))
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("_n")
                    + damping
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("_dm") / F.col("_n")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def triangle_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    undirected simple graph of ``edges`` → (node, degree, triangles,
    clustering_coeff).

    Beyond the reference's graph surface (like PageRank): community /
    cohesion analytics over the KG. Degree-ordered wedge enumeration — each
    undirected edge is oriented toward the higher (degree, id) endpoint, so
    wedges are only generated at their unique lowest-(degree, id) vertex:
    every triangle is enumerated exactly once and the join fan-out per
    vertex is bounded by its ORIENTED out-degree, O(sqrt(E)) in the worst
    case — a star hub generates zero wedges because all its edges point
    inward. This is the standard hub defense that keeps the wedge join
    feasible at 10^9 edges where a naive neighbor self-join explodes on the
    first hot vertex.

    Deterministic and engine-portable: ids compare as strings, the
    clustering coefficient (2·tri / deg·(deg−1), 0 below degree 2) is
    rounded to 6 dp — the DuckDB oracle replays every stage value-exactly.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)  # consumed by degrees, arcs AND closure
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    ed = (
        e.join(deg.select(F.col("n").alias("a"), F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("degree").alias("db")), "b")
    )
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    arcs = ed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    wedges = (
        arcs.select("u", F.col("v").alias("v1"))
        .join(arcs.select("u", F.col("v").alias("v2")), "u")
        .filter(F.col("v1") < F.col("v2"))
    )
    tris = wedges.join(
        e,
        (F.col("v1") == F.col("a")) & (F.col("v2") == F.col("b")),
        "left_semi",
    )
    per_node = (
        tris.select(F.explode(F.array("u", "v1", "v2")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return deg.join(per_node, "n", "left").select(
        F.col("n").alias("node"),
        "degree",
        F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles"),
        F.round(
            F.when(F.col("degree") < 2, F.lit(0.0)).otherwise(
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1.0))
            ),
            6,
        ).alias("clustering_coeff"),
    )
