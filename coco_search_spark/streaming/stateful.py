"""Custom stateful streaming operator: per-conversation running progress.

The reference's incremental tracking is batch-only (flow.py:87-98 tracking
table); Structured Streaming's native analog for arbitrary per-key state is
``applyInPandasWithState`` — this module maintains a running
(n_turns, n_chars, max_turn_idx) aggregate per conversation across
micro-batches, emitting the updated row whenever a conversation receives
new turns. This is the building block for streaming-side conversation
completion detection (emit-on-idle via a timeout) and incremental
extraction triggers.

Scale: state is keyed by conv_id — the same key the batch pipeline
partitions on — and each group's state is a fixed-size tuple, so the state
store grows with |conversations|, not |turns|. Arrow-batched like every
other Python crossing in this engine.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = "conv_id string, n_turns bigint, n_chars bigint, max_turn_idx int"
_STATE_SCHEMA = "n_turns bigint, n_chars bigint, max_turn_idx int"


def _update_progress(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_turns, n_chars, max_ti = state.get if state.exists else (0, 0, -1)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n_turns += len(pdf)
        # fillna BEFORE astype: astype(str) would turn null into the literal
        # "None" (4 chars); nulls must contribute 0 exactly like the batch
        # twin's F.sum(F.length(...)) which skips nulls
        n_chars += int(pdf["text"].fillna("").astype(str).str.len().sum())
        max_ti = max(max_ti, int(pdf["turn_idx"].max()))
    state.update((n_turns, n_chars, max_ti))
    yield pd.DataFrame(
        [
            {
                "conv_id": key[0],
                "n_turns": n_turns,
                "n_chars": n_chars,
                "max_turn_idx": max_ti,
            }
        ]
    )


def conversation_progress(transcripts_stream: DataFrame) -> DataFrame:
    """stream(conv_id, turn_idx, text, ...) → updated per-conversation
    progress rows, one per conversation per micro-batch that touched it."""
    return (
        transcripts_stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update_progress,
            outputStructType=PROGRESS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_progress_truth(transcripts: DataFrame) -> DataFrame:
    """Batch twin of conversation_progress's FINAL state — the test oracle."""
    from pyspark.sql import functions as F

    return transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.length(F.col("text").cast("string"))).alias("n_chars"),
        F.max("turn_idx").alias("max_turn_idx"),
    )
