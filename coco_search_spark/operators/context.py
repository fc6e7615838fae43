"""Context expansion: neighbor-turn text attached to each turn.

The Spark re-expression of the reference's context expander
(reference: src/cocosearch/search/context_expander.py:302-411 — expand a
matched chunk with up to N neighboring lines, each capped, flagging when
the expansion clipped at beginning/end of file; tested by the 823-line
tests/unit/search/test_context_expander.py). Here the unit is a turn within
a conversation: each turn gets the text of its n_before/n_after neighbors
(each truncated to max_chars), plus BOF/EOF flags when the requested window
extends past the conversation bounds.

Scale: all windows are partitioned by conv_id — embarrassingly parallel
across conversations, no global state, one shuffle keyed by conv_id that
every per-conversation operator downstream can reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BEFORE = 2
N_AFTER = 2
MAX_CHARS = 200  # per-neighbor cap — context_expander.py's line-cap analog


def expand_context(
    transcripts: DataFrame,
    n_before: int = N_BEFORE,
    n_after: int = N_AFTER,
    max_chars: int = MAX_CHARS,
) -> DataFrame:
    """transcripts → (conv_id, turn_idx, ctx_before, ctx_after, is_bof,
    is_eof): neighbor texts (each truncated to max_chars) joined by
    newline in turn order; is_bof/is_eof = 1 when the window was clipped
    by the conversation boundary."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    clipped = F.substring(F.col("text"), 1, max_chars)
    before = F.collect_list(clipped).over(w.rowsBetween(-n_before, -1))
    after = F.collect_list(clipped).over(w.rowsBetween(1, n_after))
    rn = F.row_number().over(w)
    n_rows = F.count(F.lit(1)).over(Window.partitionBy("conv_id"))
    return transcripts.select(
        "conv_id",
        "turn_idx",
        F.array_join(before, "\n").alias("ctx_before"),
        F.array_join(after, "\n").alias("ctx_after"),
        ((rn - 1) < n_before).cast("int").alias("is_bof"),
        ((n_rows - rn) < n_after).cast("int").alias("is_eof"),
    )
