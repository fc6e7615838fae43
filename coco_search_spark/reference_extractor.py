"""Pure-Python reference triple extractor — the P/R oracle.

This is the independent, non-Spark implementation of the extraction rules
that the Spark pipeline must match at P/R ≥ 0.95 (BASELINE.json metric).
It plays the role the reference's per-language dependency extractors play
(reference: src/cocosearch/deps/extractors/python.py:32-213 — pure functions
text → list[DependencyEdge]), and like them it is deterministic and
side-effect free so tests are hermetic.

Extraction grammar (closed predicate vocabulary, models.py:13-18 analog):
a triple is an exact textual pattern

    <identifier> <relation-phrase> <identifier>

where <identifier> matches ``[A-Za-z_][A-Za-z0-9_]*`` (the reference's
identifier pattern, src/cocosearch/indexer/tsvector.py:103) and
<relation-phrase> is one of RELATIONS in fixtures.py. Duplicate triples
within a turn are deduplicated — the analog of the reference's
``_deduplicate_edges`` (src/cocosearch/deps/extractor.py:181-203).
"""

from __future__ import annotations

import re

import pandas as pd

from coco_search_spark.fixtures import RELATIONS

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"

# One alternation regex over all relation phrases; longest phrases first so
# overlapping phrases resolve deterministically.
_PHRASES = sorted((phrase, pred) for pred, phrase in RELATIONS)
_PATTERN = re.compile(
    r"\b(" + _IDENT + r") ("
    + "|".join(re.escape(p) for p, _ in sorted(_PHRASES, key=lambda x: -len(x[0])))
    + r") (" + _IDENT + r")\b"
)
_PRED_OF_PHRASE = {phrase: pred for pred, phrase in RELATIONS}


def extract_triples_from_text(text: str) -> list[tuple[str, str, str]]:
    """All (subj_surface, pred, obj_surface) matches in one turn's text,
    deduplicated, document order preserved."""
    seen: set[tuple[str, str, str]] = set()
    out: list[tuple[str, str, str]] = []
    for m in _PATTERN.finditer(text or ""):
        triple = (m.group(1), _PRED_OF_PHRASE[m.group(2)], m.group(3))
        if triple not in seen:
            seen.add(triple)
            out.append(triple)
    return out


def extract_reference(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Run the reference extractor over a transcripts pandas DataFrame.

    Returns columns (conv_id, turn_idx, subj, pred, obj) — surface forms,
    one row per distinct triple per turn.
    """
    rows = []
    for conv_id, turn_idx, text in zip(
        transcripts["conv_id"], transcripts["turn_idx"], transcripts["text"]
    ):
        for s, p, o in extract_triples_from_text(text):
            rows.append((conv_id, int(turn_idx), s, p, o))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "subj", "pred", "obj"])


def precision_recall(
    predicted: set[tuple], actual: set[tuple]
) -> tuple[float, float]:
    """Set-based P/R used by the BASELINE gate."""
    if not predicted:
        return (1.0 if not actual else 0.0), (1.0 if not actual else 0.0)
    tp = len(predicted & actual)
    precision = tp / len(predicted)
    recall = tp / len(actual) if actual else 1.0
    return precision, recall
