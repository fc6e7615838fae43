"""Sequence packing: concat-then-chunk document layout for LLM pretraining.

Pretraining pipelines concatenate documents (separator-delimited) into one
token stream per shard and cut fixed-size context windows from it. This
operator computes each document's placement in that layout WITHOUT
materializing the stream: a per-shard cumulative token sum gives every
document its start offset, from which pack id / in-pack offset / boundary
straddle fall out arithmetically.

Scale: the cumulative sum is a window partitioned by the shard column —
one shuffle keyed by shard, each shard packed independently in parallel
(a global packing order would serialize the corpus through one task; at
10^12 turns sharding is also what the real tokenizer jobs do). Deterministic
under any partitioning: order within a shard is the stable id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    shard_col: str,
    window_tokens: int = 2048,
    sep_tokens: int = 1,
) -> DataFrame:
    """→ (id, shard, start_tok, pack_id, pack_offset, spans_boundary).

    start_tok = sum of (n_tokens + sep) over earlier docs in the shard
    (stable id order); pack_id = start_tok // window_tokens; pack_offset =
    start_tok % window_tokens; spans_boundary = 1 when the document crosses
    a window edge (training loaders mask or split those)."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(F.col(n_tokens_col) + sep_tokens).over(w), F.lit(0))
    end = start + F.col(n_tokens_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.col(shard_col).alias("shard"),
        start.alias("start_tok"),
        F.floor(start / window_tokens).cast("bigint").alias("pack_id"),
        F.pmod(start, F.lit(window_tokens)).cast("bigint").alias("pack_offset"),
        (
            F.floor(start / window_tokens) != F.floor((end - 1) / window_tokens)
        ).cast("int").alias("spans_boundary"),
    )
