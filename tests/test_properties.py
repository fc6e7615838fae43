"""Property-based tests (hypothesis) over the pure-Python twins and pure
logic — the functions whose Spark forms are pinned to these twins by
example-based parity tests elsewhere. No SparkSession needed, so hypothesis
can run hundreds of examples cheaply."""

from __future__ import annotations

import fnmatch
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from coco_search_spark.functions.text import (
    py_normalize_name,
    py_split_identifier,
    py_tokenize,
)
from coco_search_spark.ops.clean import PII_RULES
from coco_search_spark.ops.globs import glob_to_like

IDENT = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,30}", fullmatch=True)
TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"), whitelist_characters="_-.@\n"),
    max_size=200,
)


@settings(max_examples=300, deadline=None)
@given(IDENT)
def test_normalize_idempotent(ident):
    once = py_normalize_name(ident)
    assert py_normalize_name(once) == once
    assert once == once.lower()


@settings(max_examples=300, deadline=None)
@given(IDENT)
def test_split_identifier_properties(ident):
    toks = py_split_identifier(ident)
    assert toks[0] == ident  # original always preserved, first
    for t in toks:
        assert t in ident or t in ident.replace("_", "").replace("-", "")


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_tokenize_contains_lower_words(text):
    toks = py_tokenize(text)
    for w in re.findall(r"\w+", text.lower()):
        assert w in toks


GLOB = st.from_regex(r"[a-z0-9*?]{1,12}", fullmatch=True)
PLAIN = st.from_regex(r"[a-z0-9]{0,12}", fullmatch=True)


def _like_match(pattern: str, s: str) -> bool:
    """Reference LIKE evaluator: % = any run, _ = one char, \\ escapes."""
    rx = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            rx.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if ch == "%":
            rx.append(".*")
        elif ch == "_":
            rx.append(".")
        else:
            rx.append(re.escape(ch))
        i += 1
    return re.fullmatch("".join(rx), s, re.S) is not None


@settings(max_examples=300, deadline=None)
@given(GLOB, PLAIN)
def test_glob_to_like_matches_fnmatch(glob, s):
    # on metachar-free subject strings, LIKE(glob_to_like(g)) ≡ fnmatch(g)
    assert _like_match(glob_to_like(glob), s) == fnmatch.fnmatchcase(s, glob)


def _redact(text: str) -> str:
    for pat, rep in PII_RULES:
        text = re.sub(pat, rep, text)
    return text


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_pii_redaction_idempotent_and_complete(text):
    once = _redact(text)
    assert _redact(once) == once  # placeholders are fixed points
    for pat, _ in PII_RULES:
        assert re.search(pat, once) is None  # nothing redactable remains
