"""Similarity search over embedding columns (array<float>).

The reference's vector leg is a pgvector ivfflat ANN scan
(reference: flow.py:80-83 index; hybrid.py:263-275 `ORDER BY embedding <=> q
LIMIT n`). Spark has no ANN scan, so (SURVEY §4):

- ``brute_force_topk``   — exact cosine + global/per-query top-k; the
  correctness baseline, O(n·q) but embarrassingly parallel.
- ``lsh_topk``           — sign-projection LSH buckets (deterministic
  hyperplanes) probe only same-bucket candidates; the scale path. Recall is
  tunable by n_planes / n_tables and measured against brute force in tests.

Both take a query-set DataFrame so many lookups run as ONE plan (the
reference computes one embedding per query and fans out per index,
multi.py:146-188; here the fan-out is a broadcast join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from coco_search_spark.functions.embed import cosine_expr
from coco_search_spark.ops.dedup import projection_bucket_col
from coco_search_spark.ops.globs import require_positive as _require_positive

TOPK_SALT_BUCKETS = 32


def per_query_topk(sims: DataFrame, k: int, n_salt: int = TOPK_SALT_BUCKETS) -> DataFrame:
    """Exact top-k per q_id in two phases, skew/scale-safe.

    A plain ``row_number().over(partitionBy(q_id))`` forces EVERY scored row
    for a query through the one task owning that q_id — at corpus scale the
    per-query ranking task is the bottleneck. Phase 1 ranks within
    (q_id, salt) — ``n_salt`` parallel partial top-ks — and keeps ≤ k rows
    each; phase 2 ranks the ≤ n_salt·k survivors per query. The global
    top-k is contained in the union of per-salt top-ks, so results are
    identical; the final window's input is bounded by n_salt·k, not corpus
    size. Deterministic tie-break (cos_sim desc, vec_id asc) keeps results
    stable under any partitioning."""
    order = [F.desc("cos_sim"), F.asc("vec_id")]
    salted = sims.withColumn("_salt", F.pmod(F.xxhash64("vec_id"), F.lit(n_salt)))
    w1 = Window.partitionBy("q_id", "_salt").orderBy(*order)
    cand = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_salt", "_r1")
    )
    w2 = Window.partitionBy("q_id").orderBy(*order)
    return cand.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") <= k)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """(q_id, vec_id, cos_sim, rk): exact top-k per query vector.

    queries is small (broadcast); embeddings is the big side — the cross
    join is a broadcast nested loop, cosine is a codegen'd fold, and the
    per-query window is the only shuffle (keyed by q_id).
    """
    _require_positive(k=k)
    q = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).cast("array<double>").alias("qv")
    )
    sims = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).crossJoin(F.broadcast(q)).select(
        "q_id",
        "vec_id",
        F.round(cosine_expr(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
    )
    return per_query_topk(sims, k).select("q_id", "vec_id", "cos_sim", "rk")


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: n_tables independent sign-projection tables; a
    candidate is any vector sharing a bucket with the query in ≥1 table;
    exact cosine re-ranks candidates. At 100 TB the bucket join replaces the
    full scan — candidates ≈ n/2^n_planes per table."""
    _require_positive(k=k, n_planes=n_planes, n_tables=n_tables)
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).cast("array<double>").alias("qv")
    )

    def bucketed(df, vcol, out):
        return df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            projection_bucket_col(F.col(vcol), n_planes, seed=f"t{t}_").alias("bkt"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select(*df.columns, F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias(out))

    emb_b = bucketed(base, "v", "bkt")
    q_b = bucketed(q, "qv", "bkt")
    cands = (
        emb_b.join(F.broadcast(q_b), ["tbl", "bkt"])
        .select("q_id", "qv", "vec_id", "v")
        .distinct()
    )
    sims = cands.select(
        "q_id", "vec_id", F.round(cosine_expr(F.col("v"), F.col("qv")), 6).alias("cos_sim")
    )
    return per_query_topk(sims, k).select("q_id", "vec_id", "cos_sim", "rk")


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_centroids: int = 8,
    n_iters: int = 2,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF-style ANN: coarse quantization (k-means-lite) + probe-list scan —
    the classic inverted-file index the reference's pgvector ivfflat uses
    (flow.py:80-83), re-expressed as DataFrame ops.

    Everything is deterministic so the whole index build + search is
    oracle-checkable: centroids initialize to the n_centroids vectors with
    the smallest ids, Lloyd iterations are UNROLLED (fixed n_iters, each =
    assign-to-max-cosine-centroid with smallest-cid tie-break, then
    per-dimension AVG), queries probe their nprobe nearest centroids, and
    candidates (vectors assigned to probed centroids) are re-ranked by
    exact cosine.

    Scale: assignment is a broadcast join against n_centroids rows; the
    probe join is an equi-join on cid (candidates ≈ n·nprobe/n_centroids
    per query); the final ranking is the salted two-phase per_query_topk.
    At 10^9+ vectors raise n_centroids (√n rule) and train on a sample —
    the plan shape is unchanged."""
    _require_positive(k=k, dim=dim, n_centroids=n_centroids, n_iters=n_iters, nprobe=nprobe)
    if nprobe > n_centroids:
        raise ValueError(f"nprobe ({nprobe}) cannot exceed n_centroids ({n_centroids})")
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).localCheckpoint(eager=True)

    def assign(vectors: DataFrame, cents: DataFrame) -> DataFrame:
        """(vec_id, v, cid): each vector's max-cosine centroid (ties → min cid)."""
        sims = vectors.crossJoin(F.broadcast(cents)).select(
            "vec_id", "v", "cid", cosine_expr(F.col("v"), F.col("cv")).alias("sim")
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
        return (
            sims.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("vec_id", "v", "cid")
        )

    def recompute(assigned: DataFrame) -> DataFrame:
        """Per-dimension mean of each cluster's members."""
        return assigned.groupBy("cid").agg(
            F.array(*[F.avg(F.col("v")[i]) for i in range(dim)]).alias("cv")
        )

    cents = (
        base.orderBy("vec_id")
        .limit(n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    for _ in range(n_iters):
        cents = recompute(assign(base, cents))
    cents = cents.localCheckpoint(eager=True)

    posting = assign(base, cents).select("vec_id", "v", "cid")

    q = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).cast("array<double>").alias("qv")
    )
    q_sims = q.crossJoin(F.broadcast(cents)).select(
        "q_id", "qv", "cid", cosine_expr(F.col("qv"), F.col("cv")).alias("sim")
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("cid"))
    probes = (
        q_sims.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= nprobe)
        .select("q_id", "qv", "cid")
    )

    cand = posting.join(F.broadcast(probes), "cid").select("q_id", "qv", "vec_id", "v")
    sims = cand.select(
        "q_id", "vec_id", F.round(cosine_expr(F.col("v"), F.col("qv")), 6).alias("cos_sim")
    )
    return per_query_topk(sims, k).select("q_id", "vec_id", "cos_sim", "rk")


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int = 10) -> float:
    """Fraction of exact top-k pairs recovered by the approximate search."""
    a = approx.filter(F.col("rk") <= k).select("q_id", "vec_id")
    e = exact.filter(F.col("rk") <= k).select("q_id", "vec_id")
    hit = a.join(e, ["q_id", "vec_id"], "inner").count()
    total = e.count()
    return hit / total if total else 1.0
