"""Deterministic synthetic transcript generator.

Produces the pipeline's input table
``transcripts(conv_id, turn_idx, role, text, tool, ts)`` (schema from
BASELINE.json ``input_hint``) together with ground-truth triples, the analog
of the reference's hermetic deterministic-mock test strategy
(reference: tests/mocks/ollama.py:10-38 — same-input→same-output philosophy;
tests/conftest.py:104-127 ``tmp_codebase`` factory fixture).

Everything derives from a seeded ``numpy.random.Generator``; no wall-clock,
no external data. A ``hot_fraction`` knob concentrates relation subjects on
one entity to reproduce hot-key skew (the north rule's 10^12-turn concern —
the reference has no skew handling, single-process by design).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

# Closed predicate vocabulary — analog of the reference's dep_type vocabulary
# {import, call, reference} (reference: src/cocosearch/deps/models.py:13-18).
RELATIONS: list[tuple[str, str]] = [
    ("depends_on", "depends on"),
    ("calls", "calls"),
    ("imports", "imports"),
    ("uses", "uses"),
    ("emits", "emits"),
]

# Passive-voice surface of each predicate ("obj is <passive> by subj") —
# the inverse sentence form the extractor must recognize with swapped roles.
PASSIVE_OF: dict[str, str] = {
    "depends_on": "depended on",
    "calls": "called",
    "imports": "imported",
    "uses": "used",
    "emits": "emitted",
}

_ENTITY_WORDS = [
    "payment", "user", "order", "billing", "auth", "search", "index",
    "cache", "token", "stream", "queue", "graph", "vector", "shard",
    "ledger", "session", "metric", "event", "audit", "policy", "quota",
    "replica", "catalog", "broker", "worker", "parser", "planner",
]
_ENTITY_KINDS = ["service", "gateway", "client", "store", "engine", "manager", "router"]

_FILLER = (
    "the pipeline then checks state and retries if needed . meanwhile "
    "latency stays low because partitions are balanced . we observed that "
    "config reloads propagate within seconds across regions . note that "
    "timeouts are tuned per tier and alerts page the oncall"
).split()

_TOOLS = ["grep", "deploy", "profiler", "tracer", "migrator"]

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def snake_to_camel(name: str) -> str:
    parts = name.split("_")
    return parts[0] + "".join(p.capitalize() for p in parts[1:])


def snake_to_pascal(name: str) -> str:
    return "".join(p.capitalize() for p in name.split("_"))


@dataclass
class Entity:
    canonical: str            # snake_case canonical id
    aliases: list[str] = field(default_factory=list)

    @classmethod
    def from_words(cls, words: list[str]) -> "Entity":
        snake = "_".join(words)
        return cls(canonical=snake, aliases=[snake, snake_to_camel(snake), snake_to_pascal(snake)])


def build_entities(n: int, rng: np.random.Generator) -> list[Entity]:
    """Deterministic entity vocabulary: two-word snake_case canonical names
    with camelCase / PascalCase alias surface forms (the alias clusters that
    canonicalization must recover)."""
    if n > len(_ENTITY_WORDS) * len(_ENTITY_KINDS):
        raise ValueError("entity vocabulary exhausted")
    seen: set[str] = set()
    out: list[Entity] = []
    while len(out) < n:
        w = _ENTITY_WORDS[int(rng.integers(len(_ENTITY_WORDS)))]
        k = _ENTITY_KINDS[int(rng.integers(len(_ENTITY_KINDS)))]
        name = f"{w}_{k}"
        if name in seen:
            continue  # resample — names must differ by a full word, not a
            # numeric suffix, so canonicalization clusters stay well-separated
        seen.add(name)
        out.append(Entity.from_words(name.split("_")))
    return out


@dataclass
class Fixture:
    transcripts: pd.DataFrame        # conv_id, turn_idx, role, text, tool, ts
    ground_truth: pd.DataFrame       # conv_id, turn_idx, subj, pred, obj (canonical ids)
    entities: list[Entity]


def generate(
    n_conversations: int = 20,
    avg_turns: int = 8,
    n_entities: int = 24,
    seed: int = 42,
    hot_fraction: float = 0.0,
    long_turn_every: int = 7,
) -> Fixture:
    """Generate transcripts + ground-truth triples.

    Each relation sentence has the exact form ``"<subjAlias> <rel phrase>
    <objAlias> ."`` embedded in filler prose, so a pure-Python reference
    extractor (reference_extractor.py) reproduces the ground truth exactly.
    Every ``long_turn_every``-th turn is stretched past the segmenter's
    chunk size to exercise split+overlap (reference chunk defaults 1000/300,
    src/cocosearch/indexer/config.py:95-96).
    """
    rng = np.random.default_rng(seed)
    entities = build_entities(n_entities, rng)
    alias_of = {e.canonical: e.aliases for e in entities}

    rows = []
    gt = []
    roles_cycle = ["user", "assistant", "tool", "assistant"]
    for c in range(n_conversations):
        conv_id = f"conv-{c:05d}"
        n_turns = max(2, int(rng.poisson(avg_turns)))
        for t in range(n_turns):
            role = roles_cycle[t % len(roles_cycle)]
            tool = _TOOLS[int(rng.integers(len(_TOOLS)))] if role == "tool" else None
            n_rel = int(rng.integers(0, 4))
            is_long = long_turn_every > 0 and (t % long_turn_every == long_turn_every - 1)
            sent_parts: list[str] = []
            for _ in range(n_rel):
                if hot_fraction > 0 and rng.random() < hot_fraction:
                    subj_e = entities[0]
                else:
                    subj_e = entities[int(rng.integers(len(entities)))]
                obj_e = entities[int(rng.integers(len(entities)))]
                pred, phrase = RELATIONS[int(rng.integers(len(RELATIONS)))]
                subj = subj_e.aliases[int(rng.integers(len(subj_e.aliases)))]
                obj = obj_e.aliases[int(rng.integers(len(obj_e.aliases)))]
                # four sentence forms × whitespace variance (real
                # transcripts have newlines / double spaces) — the grammar
                # the extractor must cover; all forms stay ≤ 11 word-tokens
                # so the segmenter's overlap-containment guarantee holds
                form = int(rng.integers(4))
                ws = [" ", "  ", " \n "][int(rng.integers(3))]
                if form == 0:
                    sent = f"{subj}{ws}{phrase}{ws}{obj} ."
                elif form == 1:
                    sent = f"{obj}{ws}is{ws}{PASSIVE_OF[pred]}{ws}by{ws}{subj} ."
                elif form == 2:
                    sent = f"{subj} , which{ws}{phrase}{ws}{obj} ."
                else:
                    # conjunction: second object → second ground-truth row
                    obj2_e = entities[int(rng.integers(len(entities)))]
                    obj2 = obj2_e.aliases[int(rng.integers(len(obj2_e.aliases)))]
                    sent = f"{subj}{ws}{phrase}{ws}{obj} and {obj2} ."
                    gt.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": t,
                            "subj": subj_e.canonical,
                            "pred": pred,
                            "obj": obj2_e.canonical,
                            "subj_surface": subj,
                            "obj_surface": obj2,
                        }
                    )
                sent_parts.append(sent)
                # negated distractor: must yield NO triple (negation rule)
                if rng.random() < 0.1:
                    ne1 = entities[int(rng.integers(len(entities)))]
                    ne2 = entities[int(rng.integers(len(entities)))]
                    _, nphrase = RELATIONS[int(rng.integers(len(RELATIONS)))]
                    neg = "never" if rng.random() < 0.5 else "not"
                    sent_parts.append(
                        f"{ne1.aliases[0]} {neg} {nphrase} {ne2.aliases[0]} ."
                    )
                gt.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": t,
                        "subj": subj_e.canonical,
                        "pred": pred,
                        "obj": obj_e.canonical,
                        "subj_surface": subj,
                        "obj_surface": obj,
                    }
                )
            n_fill = int(rng.integers(5, 30)) * (12 if is_long else 1)
            filler = " ".join(
                _FILLER[int(rng.integers(len(_FILLER)))] for _ in range(n_fill)
            )
            # interleave: filler, relations, filler — relations never straddle
            # a sentence boundary marker, segmentation may still split them
            # apart and the overlap window must recover them.
            text = " ".join([filler[: len(filler) // 2], *sent_parts, filler[len(filler) // 2 :]]).strip()
            ts = _EPOCH + timedelta(hours=c, minutes=t)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": ts,
                }
            )

    transcripts = pd.DataFrame(rows)
    ground_truth = pd.DataFrame(
        gt, columns=["conv_id", "turn_idx", "subj", "pred", "obj", "subj_surface", "obj_surface"]
    )
    _ = alias_of
    return Fixture(transcripts=transcripts, ground_truth=ground_truth, entities=entities)


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def transcripts_sdf(spark, fixture: Fixture):
    """Fixture → Spark DataFrame with the input_hint schema."""
    return spark.createDataFrame(fixture.transcripts, schema=TRANSCRIPT_SCHEMA)


def entity_catalog_pdf(entities: list[Entity]) -> pd.DataFrame:
    """The entity catalog used for linking candidate generation — the analog
    of the reference resolver's module→file index
    (reference: src/cocosearch/deps/resolver.py:109-133 build_index)."""
    rows = []
    for e in entities:
        for a in e.aliases:
            rows.append({"entity_id": e.canonical, "alias": a})
    return pd.DataFrame(rows)
