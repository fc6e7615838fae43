"""Parse-status detection + malformed-row quarantine (X5).

The reference tracks per-unit parse status ok/partial/error and persists it
(reference: src/cocosearch/indexer/parse_tracking.py:58-111) so one
malformed file degrades to a tracked error instead of failing the run. The
transcript analog: a turn is malformed when its identity keys are null, its
text is null/empty, or its text exceeds the size cap (a single pathological
multi-GB turn must not OOM an executor). Malformed turns are QUARANTINED —
routed to a side output and counted into the state table's ``errors``
column — while the pipeline proceeds over the clean rows.

Scale: the classifier is one codegen'd CASE expression; the split is two
filters over the same scan (Spark collapses them into one pass under AQE
plan reuse when both sides are consumed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one turn above this is almost certainly an ingestion bug (binary blob,
# runaway tool output); the reference's chunker would loop ~forever on it
MAX_TEXT_CHARS = 1_000_000

PARSE_OK = "ok"


def parse_status_col(max_chars: int = MAX_TEXT_CHARS):
    """Codegen'd status classifier, first matching rule wins."""
    return (
        F.when(F.col("conv_id").isNull() | F.col("turn_idx").isNull(), "null_key")
        .when(F.col("text").isNull(), "null_text")
        .when(F.length(F.col("text")) == 0, "empty_text")
        .when(F.length(F.col("text")) > max_chars, "oversize")
        .otherwise(PARSE_OK)
    )


def validate_turns(transcripts: DataFrame, max_chars: int = MAX_TEXT_CHARS) -> DataFrame:
    """transcripts + parse_status column."""
    return transcripts.withColumn("parse_status", parse_status_col(max_chars))


def split_quarantine(
    transcripts: DataFrame, max_chars: int = MAX_TEXT_CHARS
) -> tuple[DataFrame, DataFrame]:
    """→ (clean rows without the status column, quarantined rows with it)."""
    v = validate_turns(transcripts, max_chars)
    clean = v.filter(F.col("parse_status") == PARSE_OK).drop("parse_status")
    quarantined = v.filter(F.col("parse_status") != PARSE_OK)
    return clean, quarantined
