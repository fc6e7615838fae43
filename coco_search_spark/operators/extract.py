"""Triple + mention extraction.

Analog of the reference's dependency-edge extractors (reference:
src/cocosearch/deps/extractors/python.py:32-213, orchestrated by
extractor.py:206-261) and symbol extraction (indexer/symbols.py:423-483):
per-segment text → (subj, pred, obj) rows with a closed predicate
vocabulary (models.py:13-18 analog) plus mention rows for linking.

Grammar: three sentence forms over the closed predicate vocabulary, all
whitespace-tolerant (``\\s+`` between words — real transcripts have
newlines and double spaces), mirroring how the reference ships one
extractor per syntactic form (python.py handles plain import / from-import
/ aliased import etc., each a separate rule):

- ACTIVE      ``subj <phrase> obj``             → (subj, pred, obj)
- PASSIVE     ``obj is <passive-phrase> by subj`` → (subj, pred, obj)
- APPOSITIVE  ``subj , which <phrase> obj``     → (subj, pred, obj)

Function words (``which``/``is``/``by``) are excluded as subjects/objects —
the appositive tail "which <phrase> obj" would otherwise also match the
active form with subj="which" (the stop-filter is the cross-form
disambiguation rule, applied identically in every implementation).

Two interchangeable implementations, asserted equal in tests:

- ``extract_triples``   — pure Catalyst: per-form ``regexp_extract_all``
  capture groups zipped positionally and exploded once. The whole extractor
  lives inside whole-stage codegen; at 10^12 turns this is the scale path
  (regex runs JVM-side, zero Python serde).
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
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from coco_search_spark.fixtures import PASSIVE_OF, RELATIONS
from coco_search_spark.functions.text import IDENT_RE


def _ws_alt(phrases: list[str]) -> str:
    """Alternation over phrases with \\s+ between phrase words, longest
    first so overlapping phrases resolve deterministically."""
    return "|".join(
        r"\s+".join(re.escape(w) for w in p.split(" "))
        for p in sorted(phrases, key=len, reverse=True)
    )


_PHRASE_ALT = _ws_alt([ph for _, ph in RELATIONS])
_PASSIVE_ALT = _ws_alt(list(PASSIVE_OF.values()))

# form → (regex, swap): swap=True means group 3 is the subject (passive).
ACTIVE_RE = rf"\b({IDENT_RE})\s+({_PHRASE_ALT})\s+({IDENT_RE})\b"
PASSIVE_RE = rf"\b({IDENT_RE})\s+is\s+({_PASSIVE_ALT})\s+by\s+({IDENT_RE})\b"
APPOS_RE = rf"\b({IDENT_RE})\s*,\s*which\s+({_PHRASE_ALT})\s+({IDENT_RE})\b"
# conjunction: "A <phrase> B and C" → (A,p,B) + (A,p,C); group 4 = 2nd obj
CONJ_RE = rf"\b({IDENT_RE})\s+({_PHRASE_ALT})\s+({IDENT_RE})\s+and\s+({IDENT_RE})\b"

PRED_OF_PHRASE = {phrase: pred for pred, phrase in RELATIONS}
PRED_OF_PASSIVE = {phrase: pred for pred, phrase in PASSIVE_OF.items()}

# Function words that may syntactically occupy an identifier slot in one
# form while being part of another form's scaffolding — plus negation
# markers: "A never uses B" must yield NOTHING, and the only way the active
# pattern can fire on it is with subj="never"/"not", so stop-filtering the
# markers IS the negation rule (applied identically in every impl).
STOP_IDENTS = frozenset({"which", "is", "by", "and", "never", "not"})

# (regex, swap, pred map, required literal substrings): the literals gate
# the form's regex behind cheap instr() substring checks — a segment that
# never contains "which" cannot match the appositive form, so its regex
# scan is skipped entirely (false positives in the guard are fine, the
# regex still decides; false negatives are impossible for literal words).
# The conjunction form is 4-group: the extra object yields a second triple.
GRAMMAR: list[tuple[str, bool, dict[str, str], list[str]]] = [
    (ACTIVE_RE, False, PRED_OF_PHRASE, []),
    (PASSIVE_RE, True, PRED_OF_PASSIVE, ["is", "by"]),
    (APPOS_RE, False, PRED_OF_PHRASE, ["which"]),
    (CONJ_RE, False, PRED_OF_PHRASE, ["and"]),
]


def _map_expr(mapping: dict[str, str]) -> Column:
    pairs: list = []
    for phrase, pred in mapping.items():
        pairs.extend([F.lit(phrase), F.lit(pred)])
    return F.create_map(*pairs)


def _form_triples(
    seg: Column, regex: str, swap: bool, mapping: dict[str, str], guards: list[str]
) -> Column:
    """array<struct<subj,pred,obj>> of this form's matches in seg.

    ONE full-text regex scan per form (group 0); capture groups are then
    re-extracted from each short match string — O(match length), not
    another pass over the segment. Running 3 scans instead of 9 keeps the
    extractor's cost ≈ the single-form round-1 extractor despite 3× the
    grammar."""
    pred_map = _map_expr(mapping)
    matches = F.regexp_extract_all(seg, F.lit(regex), 0)
    for lit in guards:
        matches = F.when(F.instr(seg, lit) > 0, matches).otherwise(
            F.array().cast("array<string>")
        )
    g = lambda m, i: F.regexp_extract(m, regex, i)  # noqa: E731

    def triple(m, obj_group: int):
        return F.struct(
            g(m, 3 if swap else 1).alias("subj"),
            pred_map[F.regexp_replace(g(m, 2), r"\s+", " ")].alias("pred"),
            g(m, 1 if swap else obj_group).alias("obj"),
        )

    out = F.transform(matches, lambda m: triple(m, 3))
    if re.compile(regex).groups >= 4:  # conjunction: second object → second triple
        out = F.concat(out, F.transform(matches, lambda m: triple(m, 4)))
    return out


def extract_triples(segments: DataFrame) -> DataFrame:
    """segments → distinct (conv_id, turn_idx, subj, pred, obj) triples.

    One projection computes every form's match array, a single explode
    flattens their concatenation, and the distinct is the only shuffle —
    partial aggregation (map-side combine) collapses the overlap dupes
    before exchange, so the shuffle carries ≈unique triples only.
    """
    seg = F.col("seg_text")
    all_forms = F.concat(
        *[_form_triples(seg, rx, sw, mp, gd) for rx, sw, mp, gd in GRAMMAR]
    )
    exploded = (
        segments.select("conv_id", "turn_idx", F.explode(all_forms).alias("t"))
        .select(
            "conv_id",
            "turn_idx",
            F.col("t.subj").alias("subj"),
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj"),
        )
        .filter(
            ~F.col("subj").isin(*STOP_IDENTS) & ~F.col("obj").isin(*STOP_IDENTS)
        )
    )
    return exploded.distinct()


_ARROW_GRAMMAR = [
    (re.compile(rx), swap, mapping) for rx, swap, mapping, _ in GRAMMAR
]

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
                for pattern, swap, mapping in _ARROW_GRAMMAR:
                    for m in pattern.finditer(text or ""):
                        pred = mapping[re.sub(r"\s+", " ", m.group(2))]
                        objs = [m.group(3)]
                        if pattern.groups >= 4:  # conjunction second object
                            objs.append(m.group(4))
                        for o in objs:
                            subj, obj = (o, m.group(1)) if swap else (m.group(1), o)
                            if subj in STOP_IDENTS or obj in STOP_IDENTS:
                                continue
                            rows.append((conv_id, int(turn_idx), subj, pred, obj))
            yield pd.DataFrame(rows, columns=["conv_id", "turn_idx", "subj", "pred", "obj"])

    return (
        segments.select("conv_id", "turn_idx", "seg_text")
        .mapInPandas(run, schema=TRIPLE_SCHEMA)
        .distinct()
    )


# "X <phrase> Y as Z" — Z is a local alias for Y (the reference's aliased
# import, deps/extractors/python.py aliased-import rules); the triple
# (X, pred, Y) itself is already produced by the active form.
ALIAS_BINDING_RE = rf"\b(?:{IDENT_RE})\s+(?:{_PHRASE_ALT})\s+({IDENT_RE})\s+as\s+({IDENT_RE})\b"


def extract_alias_bindings(segments: DataFrame) -> DataFrame:
    """segments → distinct (conv_id, turn_idx, target, alias) rows from
    'X <phrase> TARGET as ALIAS' sentences. These bindings are explicit
    same-entity evidence for canonicalization (canonicalize_surfaces'
    extra_edges) — the only evidence when the alias shares no tokens or
    shingles with the target."""
    m0 = F.regexp_extract_all(F.col("seg_text"), F.lit(ALIAS_BINDING_RE), 0)
    guarded = F.when(F.instr(F.col("seg_text"), "as") > 0, m0).otherwise(
        F.array().cast("array<string>")
    )
    return (
        segments.select("conv_id", "turn_idx", F.explode(guarded).alias("m"))
        .select(
            "conv_id",
            "turn_idx",
            F.regexp_extract(F.col("m"), ALIAS_BINDING_RE, 1).alias("target"),
            F.regexp_extract(F.col("m"), ALIAS_BINDING_RE, 2).alias("alias"),
        )
        .filter(~F.col("target").isin(*STOP_IDENTS) & ~F.col("alias").isin(*STOP_IDENTS))
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
