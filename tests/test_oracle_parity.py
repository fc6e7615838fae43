"""Fast oracle-parity regression guard.

The driver's correctness gate compares every ``queries()`` entry against its
``oracle_sql()`` in DuckDB at sf0.01. This test runs the same comparison for
a representative subset at sf0.001 so a parity regression fails `pytest`
before the driver ever sees it. Full sweep: tools/compare_oracle.py.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from coco_search_spark.entry_queries import ORACLES, QUERIES, TABLES

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "kg_extract_triples",
    "kg_conv_hash",
    "kg_link_mentions",
    "kg_canonicalize",
    "kg_context_expand",
    "rrf_fusion_docs",
    "rollup_revenue",
    "doc_minhash",
    "doc_simhash",
    "dedup_near_pairs",
    "ann_topk",
    "ann_ivf_topk",
    "graph_reach",
    "graph_tree",
    "multi_index_merge",
    "transcript_quarantine",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_parity(spark, duck, name):
    got = _canon(QUERIES[name](spark, SF_DIR).toPandas())
    want = _canon(duck.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-6, atol=1e-9)
