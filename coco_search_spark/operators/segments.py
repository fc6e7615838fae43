"""Turn ordering + segmentation (the chunking stage).

Analog of the reference's recursive chunk split (reference:
src/cocosearch/indexer/flow.py:177-233 ``_index_file`` loops chunks of
size 1000 / overlap 300, config.py:95-96) re-expressed as ONE Catalyst
expression: sliding word-windows built with ``sequence`` + ``transform`` +
``slice`` + ``explode`` — no Python at all, whole-stage codegen end to end.

Windows snap to word boundaries (never mid-identifier) so downstream regex
extraction can't hallucinate clipped identifiers; the overlap guarantees any
span shorter than ``overlap_words`` is fully contained in ≥1 window, which
is the correctness condition for extract-then-dedup equalling whole-turn
extraction. Stable intra-turn order is (conv_id, turn_idx, seg_idx) — the
analog of the reference's (filename, location) PK (flow.py:77).

Scale note: this is a narrow map — no shuffle. Partitioning by conv_id is
inherited from the scan; at 10^12 turns the stage is embarrassingly
parallel and bounded by scan throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~1000 chars / ~300 chars at ≈6.7 chars+space per word — the reference's
# byte defaults (config.py:95-96) mapped to word units.
SEG_SIZE_WORDS = 150
SEG_OVERLAP_WORDS = 40


def segment_turns(
    transcripts: DataFrame,
    seg_size: int = SEG_SIZE_WORDS,
    seg_overlap: int = SEG_OVERLAP_WORDS,
    with_offsets: bool = False,
) -> DataFrame:
    """transcripts → one row per segment.

    Output: conv_id, turn_idx, role, tool, ts, seg_idx, start_word,
    end_word, n_words, seg_text [, start_char].

    ``with_offsets`` adds ``start_char``: the number of characters of the
    turn text before this segment's first character (0 for segment 0), so
    char positions found inside ``seg_text`` map back to turn-level
    positions as ``start_char + pos`` — the coordinate transform provenance
    extraction needs. Splitting on single spaces means a contiguous word
    slice joined with " " reproduces the exact substring, so the prefix
    length is ``len(join(words[:start_word])) + 1``. Off by default: the
    prefix join makes segmentation O(n_words × n_segs) per turn instead of
    O(n_words + seg output), which only provenance consumers should pay.
    """
    if seg_overlap >= seg_size:
        raise ValueError("seg_overlap must be < seg_size")
    step = seg_size - seg_overlap
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    n_seg = F.when(n <= seg_size, F.lit(1)).otherwise(
        F.ceil((n - F.lit(seg_overlap)) / F.lit(step)).cast("int")
    )

    def seg_fields(i):
        fields = [
            i.cast("int").alias("seg_idx"),
            (i * step).cast("int").alias("start_word"),
            F.least(i * step + seg_size, n).cast("int").alias("end_word"),
            F.array_join(F.slice(words, i * step + 1, seg_size), " ").alias("seg_text"),
        ]
        if with_offsets:
            fields.append(
                F.when(i == 0, F.lit(0))
                .otherwise(F.length(F.array_join(F.slice(words, 1, i * step), " ")) + 1)
                .cast("int")
                .alias("start_char")
            )
        return F.struct(*fields)

    # fast path for turns that fit in ONE segment (the common case): the
    # segment text IS the turn text — array_join(split(t, " "), " ") == t
    # for every string (single-space split round-trips runs of spaces as
    # empty elements), so the per-window slice+join copy is skipped. Field
    # values match the general path exactly: seg_idx 0, start_word 0,
    # end_word = least(seg_size, n) = n, start_char 0.
    single_fields = [
        F.lit(0).alias("seg_idx"),
        F.lit(0).alias("start_word"),
        n.cast("int").alias("end_word"),
        F.col("text").alias("seg_text"),
    ]
    if with_offsets:
        single_fields.append(F.lit(0).alias("start_char"))
    seg_struct = F.when(n <= seg_size, F.array(F.struct(*single_fields))).otherwise(
        F.transform(F.sequence(F.lit(0), n_seg - 1), seg_fields)
    )
    passthrough = [c for c in transcripts.columns if c != "text"]
    out_cols = [
        F.col("seg.seg_idx").alias("seg_idx"),
        F.col("seg.start_word").alias("start_word"),
        F.col("seg.end_word").alias("end_word"),
        F.col("n_words"),
        F.col("seg.seg_text").alias("seg_text"),
    ]
    if with_offsets:
        out_cols.append(F.col("seg.start_char").alias("start_char"))
    return (
        transcripts.withColumn("n_words", n)
        .withColumn("seg", F.explode(seg_struct))
        .select(*passthrough, *out_cols)
    )


def reassemble_turns(segments: DataFrame) -> DataFrame:
    """Inverse of segment_turns for the per-turn text-equality invariant
    (BASELINE input_hint): concatenate each segment's NON-overlapped suffix
    in seg_idx order. Used by tests to assert text identity under stable
    (conv_id, turn_idx) ordering — the analog of the reference's
    content-hash identity check (flow.py:348-351)."""
    seg_words = F.split(F.col("seg_text"), " ")
    # words this segment contributes beyond what the previous one covered
    fresh = F.when(F.col("seg_idx") == 0, seg_words).otherwise(
        F.slice(
            seg_words,
            (F.col("prev_end") - F.col("start_word")) + 1,
            F.col("end_word") - F.col("prev_end"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id", "turn_idx").orderBy("seg_idx")
    with_prev = segments.withColumn(
        "prev_end", F.coalesce(F.lag("end_word").over(w), F.lit(0))
    )
    return (
        with_prev.withColumn("fresh_words", fresh)
        .groupBy("conv_id", "turn_idx")
        .agg(
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("seg_idx", "fresh_words"))
                        ),
                        lambda s: s["fresh_words"],
                    )
                ),
                " ",
            ).alias("text")
        )
    )
