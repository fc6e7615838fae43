"""Deterministic query rewrite / expansion (X7 stand-in).

The reference can rewrite search queries through an LLM before retrieval
(reference: src/cocosearch/search/query_rewrite.py — default OFF). An LLM
call is neither deterministic nor available here, so this module provides
the rule-based expansion the retrieval legs actually benefit from, as the
declared swap-point: spelling-variant expansion over identifier morphology
(snake/camel/Pascal/kebab of the same normalized form) plus token-subset
probes, exactly the variants the alias catalog and normalizer understand.
Swap ``rewrite_query`` for an LLM-backed function in deployment; its
contract (query → ordered list of query strings, original first) is the
stable part.
"""

from __future__ import annotations

from coco_search_spark.functions.text import py_normalize_name


def _variants_of_norm(norm: str) -> list[str]:
    parts = [p for p in norm.split("_") if p]
    if not parts:
        return []
    snake = "_".join(parts)
    camel = parts[0] + "".join(p.capitalize() for p in parts[1:])
    pascal = "".join(p.capitalize() for p in parts)
    kebab = "-".join(parts)
    return [snake, camel, pascal, kebab]


def rewrite_query(query: str, max_variants: int = 8) -> list[str]:
    """query → ordered, deduplicated expansion list (original first).

    Each whitespace token contributes its morphological variants; multi-token
    queries additionally contribute the fully-joined identifier forms (the
    "user typed words, index stores identifiers" bridge)."""
    out: list[str] = [query]
    seen = {query}
    tokens = query.split()
    cands: list[str] = []
    for tok in tokens:
        cands.extend(_variants_of_norm(py_normalize_name(tok)))
    if len(tokens) > 1:
        cands.extend(_variants_of_norm(py_normalize_name("_".join(tokens))))
    for c in cands:
        if c and c not in seen:
            seen.add(c)
            out.append(c)
        if len(out) >= max_variants:
            break
    return out
