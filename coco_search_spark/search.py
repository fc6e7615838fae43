"""Hybrid search over the chunk store — the reference's user-facing
``cocosearch search`` operation (reference: src/cocosearch/search/hybrid.py:
106-481 — pgvector cosine leg + ts_rank keyword leg, per-leg prefetch, RRF
fusion k=60, deterministic tie-breaks) re-expressed over the chunks
relation ``run_pipeline`` materializes (seg_text, tsv_input tokens,
embedding).

Scale shape: each leg is a corpus-sized scan feeding an
``orderBy().limit(prefetch)`` — TakeOrderedAndProject, the per-partition
partial top-k that never drags the corpus through one task (the repo-wide
top-k rule, SCALE.md) — and everything downstream of the two prefetches is
prefetch-sized. The query vector/token-set are scalar expressions folded
into the scan, so the whole leg is one whole-stage-codegen pass; no join,
no shuffle until the (tiny) full-outer fusion.

The vector leg scores with the pure-Catalyst double-precision
``embed_expr``/``cosine_expr`` pair and the keyword leg with whitespace
token-set Jaccard, both DuckDB-replicable — the ``kg_search_chunks``
driver query value-checks the entire operator against a SQL replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from coco_search_spark.functions.embed import cosine_expr, embed_expr

RRF_K = 60          # hybrid.py:29
PREFETCH = 100      # hybrid.py:37


def _token_set(c):
    """Distinct lowercase whitespace tokens — the portable keyword unit
    (the full camelCase tokenizer feeds tsv_input at WRITE time; query-side
    matching is over the stored token text either way)."""
    return F.array_distinct(F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != ""))


def search_chunks(
    chunks: DataFrame,
    query: str,
    k: int = 10,
    prefetch: int = PREFETCH,
    rrf_k: int = RRF_K,
    embed_dim: int = 64,
    id_col: str = "chunk_id",
    rewrite: bool = False,
) -> DataFrame:
    """chunks(id_col, tsv_input, embedding) × query string → top-k fused
    hits: (chunk_id, vec_sim, kw_sim, rrf_score, match_type, search_rank).

    - vector leg: cosine(query embedding, chunk embedding), top ``prefetch``
      (hybrid.py:263-275 semantic leg);
    - keyword leg: token-set Jaccard vs the stored tsv_input, matches only
      (``kw_sim > 0`` — ts_rank returns no row without a lexeme match),
      top ``prefetch`` (hybrid.py:169-186);
    - fusion: RRF, score = Σ 1/(rrf_k + rank) per contributing leg
      (hybrid.py:306-416), tie-break keyword-present then stable chunk id
      (hybrid.py:409-414).

    Scores are rounded to 6 dp BEFORE ranking so the ordering is identical
    across engines and partitionings (the repo-wide oracle rule).

    ``rewrite=True`` expands the query through the deterministic
    query-rewrite stand-in (reference: search/query_rewrite.py, default
    OFF there too): the keyword leg matches the UNION of all variant
    tokens (the "user typed words, index stores identifiers" bridge),
    while the vector leg keeps the original query — morphological
    variants of a hash embedding are uncorrelated, and with a real model
    the original phrasing is the better semantic probe."""
    from coco_search_spark.ops.globs import require_positive

    require_positive(k=k, prefetch=prefetch, rrf_k=rrf_k, embed_dim=embed_dim)
    kw_query = query
    if rewrite:
        from coco_search_spark.functions.query_rewrite import rewrite_query

        kw_query = " ".join(rewrite_query(query))
    q_vec = embed_expr(F.lit(query), embed_dim)
    q_toks = _token_set(F.lit(kw_query))
    t_toks = _token_set(F.col("tsv_input"))
    union_n = F.size(F.array_union(t_toks, q_toks))
    scored = chunks.select(
        F.col(id_col).cast("string").alias("chunk_id"),
        F.round(cosine_expr(F.col("embedding"), q_vec), 6).alias("vec_sim"),
        F.round(
            F.when(union_n == 0, F.lit(0.0)).otherwise(
                F.size(F.array_intersect(t_toks, q_toks)) / union_n.cast("double")
            ),
            6,
        ).alias("kw_sim"),
    )
    leg_v = (
        scored.select("chunk_id", "vec_sim")
        .orderBy(F.desc("vec_sim"), F.asc("chunk_id"))
        .limit(prefetch)
        .withColumn(
            "rank_v",
            F.row_number().over(Window.orderBy(F.desc("vec_sim"), F.asc("chunk_id"))),
        )
    )
    leg_k = (
        scored.select("chunk_id", "kw_sim")
        .filter(F.col("kw_sim") > 0)
        .orderBy(F.desc("kw_sim"), F.asc("chunk_id"))
        .limit(prefetch)
        .withColumn(
            "rank_k",
            F.row_number().over(Window.orderBy(F.desc("kw_sim"), F.asc("chunk_id"))),
        )
    )
    fused = (
        leg_v.join(leg_k, "chunk_id", "full_outer")
        .withColumn(
            "rrf_score",
            F.round(
                F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rank_v")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rank_k")), F.lit(0.0)),
                9,
            ),
        )
        .withColumn(
            "match_type",
            F.when(
                F.col("rank_v").isNotNull() & F.col("rank_k").isNotNull(), "both"
            )
            .when(F.col("rank_v").isNotNull(), "vector")
            .otherwise("keyword"),
        )
    )
    order = [
        F.desc("rrf_score"),
        F.desc(F.col("rank_k").isNotNull()),
        F.asc("chunk_id"),
    ]
    return (
        fused.orderBy(*order)
        .limit(k)
        .withColumn("search_rank", F.row_number().over(Window.orderBy(*order)))
        .select(
            "chunk_id",
            "vec_sim",
            "kw_sim",
            "rrf_score",
            "match_type",
            "search_rank",
        )
    )


def search_chunks_cached(
    spark,
    chunks: DataFrame,
    query: str,
    cache,
    snapshot_id: str,
    **kwargs,
) -> tuple[DataFrame, str]:
    """``search_chunks`` through the two-level QueryResultCache
    (reference: search/cache.py:160-234): exact sha256 hit, then
    token-set-embedding cosine ≥ threshold, both scoped to ``snapshot_id``
    so a new pipeline commit invalidates stale results for free. Returns
    (result, status ∈ {exact, semantic, miss}); the result always reads
    from the cached parquet so hit and miss plans are identical."""
    return cache.get_or_compute(
        spark, query, snapshot_id, lambda: search_chunks(chunks, query, **kwargs)
    )
