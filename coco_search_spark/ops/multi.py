"""Cross-index merge with per-index partial-failure tolerance.

The reference queries several named indexes and tolerates individual index
failures — a broken index is skipped with a warning and the merge proceeds
over the healthy ones (reference: src/cocosearch/search/multi.py:180-192).
Spark analog: each index is a DataFrame-producing thunk; plan construction
and validation errors are caught per index, the merged global top-k runs
over the survivors, and the failures are reported alongside the result so
callers can surface them (the reference returns per-index error strings).

Scale: per-index prefetch is orderBy+limit (TakeOrderedAndProject), the
merge is a unionByName of k-row legs — constant-size final ranking.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class AllIndexesFailedError(RuntimeError):
    pass


def merge_ranked_indexes(
    indexes: dict[str, callable],
    k: int = 20,
    on_error: str = "skip",
) -> tuple[DataFrame, list[tuple[str, str]]]:
    """indexes: name → thunk returning a DataFrame(doc_id, score).

    Returns (top-k merged DataFrame(index_name, doc_id, score, global_rank),
    [(failed_index, error), ...]). on_error='skip' tolerates per-index
    thunk/analysis failures (multi.py:180-192 semantics); 'raise'
    propagates the first failure."""
    legs: list[DataFrame] = []
    failures: list[tuple[str, str]] = []
    for name, thunk in indexes.items():
        try:
            df = thunk()
            leg = (
                df.select(
                    F.lit(name).alias("index_name"),
                    F.col("doc_id"),
                    F.col("score"),
                )
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(2 * k)  # per-index prefetch = 2*limit (multi.py analog)
            )
            legs.append(leg)
        except Exception as e:  # noqa: BLE001 — per-index tolerance is the point
            if on_error != "skip":
                raise
            failures.append((name, str(e)))
    if not legs:
        raise AllIndexesFailedError(
            f"all {len(indexes)} indexes failed: {failures}"
        )
    merged = reduce(lambda a, b: a.unionByName(b), legs)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))  # ≤ 2k·n rows — constant
    out = (
        merged.withColumn("global_rank", F.row_number().over(w))
        .filter(F.col("global_rank") <= k)
    )
    return out, failures
