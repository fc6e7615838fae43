"""Corpus cleaning: frequency-based boilerplate line removal.

The C4/RefinedWeb-style rule: a LINE that appears in more than
``max_doc_frac`` of all documents is boilerplate (nav bars, license
headers, code-fence markers, cookie banners) and is stripped from every
document; short lines are exempt (blank lines and punctuation are
structure, not boilerplate).

Scale design — the asymmetry is the whole trick:

1. the line-frequency table is corpus-sized, but its per-line distinct-doc
   count uses the salted two-phase pattern (materialize.
   salted_distinct_count) because a hot boilerplate line IS the skew case
   — exact countDistinct would funnel every occurrence of "```" to one
   reducer;
2. the DROP LIST (lines above the threshold) is tiny — boilerplate
   vocabularies are thousands of lines, not billions — so the corpus-sized
   line table anti-joins against a **broadcast** of the drop list: no
   shuffle of the corpus by line key;
3. reassembly groups by document with an order-preserving
   sort_array(collect_list(struct(pos, line))) — partitioned by the
   document key, the same key the scan delivers.

The total-document count rides a 1-row aggregate cross-joined in
(broadcast), not an eager ``.count()`` on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coco_search_spark.operators.materialize import salted_distinct_count
from coco_search_spark.ops.globs import require_fraction, require_positive


# PII patterns — RE2-safe (no lookahead/backreferences) so the identical
# pattern runs in Spark (Java regex) and the DuckDB oracle. Replacement
# ORDER is part of the contract: emails first (their local part can contain
# digits a later rule would mangle), then IPv4, then phone-shaped numbers.
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[- ]\d{3,4}[- ]\d{4}\b", "<PHONE>"),
]


def redact_pii_col(text):
    """Sequential global regexp_replace chain over PII_RULES — pure
    Catalyst, whole-stage codegen; no Python in the path. The standard
    pre-training scrub (emails / IPv4 / phone-shaped numbers → typed
    placeholders)."""
    out = text
    for pat, rep in PII_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_rules_duckdb_sql(text_expr: str) -> str:
    """The same chain as DuckDB SQL (regexp_replace with the 'g' flag),
    built from the SAME PII_RULES list so the two engines cannot drift."""
    out = text_expr
    for pat, rep in PII_RULES:
        escaped = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{escaped}', '{rep}', 'g')"
    return out


def boilerplate_lines(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
    max_doc_frac: float = 0.05,
    min_chars: int = 3,
) -> DataFrame:
    """(line, n_docs): the drop list — lines of >= min_chars appearing in
    more than max_doc_frac of all documents."""
    require_fraction(max_doc_frac=max_doc_frac)
    require_positive(min_chars=min_chars)
    # '|'-separated so ('conv-1', 23) can never collide with ('conv-12', 3)
    doc_key = F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols])
    lines = df.select(
        doc_key.alias("_doc"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).filter(F.length("line") >= min_chars)
    freq = salted_distinct_count(lines, key="line", value="_doc").withColumnRenamed(
        "n_distinct__doc", "n_docs"
    )
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    return (
        freq.crossJoin(F.broadcast(total))
        .filter(F.col("n_docs") > F.col("_total") * max_doc_frac)
        .select("line", "n_docs")
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
    max_doc_frac: float = 0.05,
    min_chars: int = 3,
) -> DataFrame:
    """df → (id_cols..., clean_text) with boilerplate lines stripped and
    the remaining lines rejoined in original order. NULL text is treated
    as one empty line, so the document survives with clean_text = '';
    documents whose EVERY line was boilerplate (nothing kept at all) do
    disappear from the output — callers needing tombstones should
    anti-join the output ids against the input."""
    drop = boilerplate_lines(df, id_cols, text_col, max_doc_frac, min_chars)
    # coalesce: a NULL text must yield one empty line (split(NULL) explodes
    # to NOTHING, which would silently drop the document from the output)
    lines = df.select(
        *id_cols,
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "pos", "line"
        ),
    )
    kept = lines.join(F.broadcast(drop.select("line")), "line", "left_anti")
    return (
        kept.groupBy(*id_cols)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text")
        )
    )
