"""Triple + mention extraction.

Analog of the reference's dependency-edge extractors (reference:
src/cocosearch/deps/extractors/python.py:32-213, orchestrated by
extractor.py:206-261) and symbol extraction (indexer/symbols.py:423-483):
per-segment text → (subj, pred, obj) rows with a closed predicate
vocabulary (models.py:13-18 analog) plus mention rows for linking.

Two interchangeable implementations, asserted equal in tests:

- ``extract_triples``   — pure Catalyst: three ``regexp_extract_all`` calls
  (one per capture group) zipped with ``arrays_zip`` and exploded. The whole
  extractor lives inside whole-stage codegen; at 10^12 turns this is the
  scale path (regex runs JVM-side, zero Python serde).
- ``extract_triples_arrow`` — Arrow-batched ``mapInPandas`` running the
  pure-Python reference rules per batch (the north star's "vectorized
  pandas/Arrow UDF extraction"); useful when rules outgrow regex.

Duplicates within a turn (including duplicates manufactured by segment
overlap) are removed exactly like the reference's ``_deduplicate_edges``
(extractor.py:181-203): distinct on the full triple key.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coco_search_spark.fixtures import RELATIONS
from coco_search_spark.functions.text import IDENT_RE

_PHRASE_ALT = "|".join(
    re.escape(p) for p in sorted((ph for _, ph in RELATIONS), key=len, reverse=True)
)
TRIPLE_RE = rf"\b({IDENT_RE}) ({_PHRASE_ALT}) ({IDENT_RE})\b"

PRED_OF_PHRASE = {phrase: pred for pred, phrase in RELATIONS}


def _pred_map_expr():
    pairs: list = []
    for pred, phrase in RELATIONS:
        pairs.extend([F.lit(phrase), F.lit(pred)])
    return F.create_map(*pairs)


def extract_triples(segments: DataFrame) -> DataFrame:
    """segments → distinct (conv_id, turn_idx, subj, pred, obj) triples.

    The distinct is the only shuffle, keyed by the full triple row —
    partial aggregation (map-side combine) collapses the overlap dupes
    before exchange, so the shuffle carries ≈unique triples only.
    """
    # ONE regex pass (group 0), then cheap array ops split the match —
    # "subj phrase obj" has single spaces by construction, so word 1 is the
    # subject, the last word is the object, the middle words are the phrase.
    matches = F.regexp_extract_all(F.col("seg_text"), F.lit(TRIPLE_RE), 0)
    words = F.split(F.col("m"), " ")
    exploded = (
        segments.select(
            "conv_id",
            "turn_idx",
            F.explode(matches).alias("m"),
        )
        .select(
            "conv_id",
            "turn_idx",
            F.element_at(words, 1).alias("subj"),
            _pred_map_expr()[
                F.array_join(F.slice(words, 2, F.size(words) - 2), " ")
            ].alias("pred"),
            F.element_at(words, -1).alias("obj"),
        )
    )
    return exploded.distinct()


_ARROW_PATTERN = re.compile(TRIPLE_RE)

TRIPLE_SCHEMA = "conv_id string, turn_idx int, subj string, pred string, obj string"


def extract_triples_arrow(segments: DataFrame) -> DataFrame:
    """Arrow-batched variant: mapInPandas over (conv_id, turn_idx, seg_text)
    batches; Python regex per batch, then the same distinct."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["seg_text"]
            ):
                for m in _ARROW_PATTERN.finditer(text or ""):
                    rows.append(
                        (conv_id, int(turn_idx), m.group(1), PRED_OF_PHRASE[m.group(2)], m.group(3))
                    )
            yield pd.DataFrame(rows, columns=["conv_id", "turn_idx", "subj", "pred", "obj"])

    return (
        segments.select("conv_id", "turn_idx", "seg_text")
        .mapInPandas(run, schema=TRIPLE_SCHEMA)
        .distinct()
    )


def extract_mentions(triples: DataFrame) -> DataFrame:
    """Triples → mention rows to be entity-linked: each subj/obj occurrence
    becomes (conv_id, turn_idx, mention, mention_role). Analog of the
    reference's symbol rows feeding the resolver (symbols.py:41-47 +
    resolver probe extractor.py:66-129)."""
    subj_side = triples.select(
        "conv_id", "turn_idx", F.col("subj").alias("mention"), F.lit("subj").alias("mention_role")
    )
    obj_side = triples.select(
        "conv_id", "turn_idx", F.col("obj").alias("mention"), F.lit("obj").alias("mention_role")
    )
    return subj_side.unionByName(obj_side).distinct()
