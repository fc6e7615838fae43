"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG query end-to-end on sf0.001;
``queries()``/``oracle_sql()`` expose one entry per implemented operator
family from SURVEY.md §2, oracle-checked against DuckDB where the operator
is SQL-expressible (see coco_search_spark/entry_queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from coco_search_spark.entry_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full KG construction over
    the derived transcripts (segment → extract → link → canonicalize →
    materialize) and return the predicate histogram of the resolved edges.
    The alias catalog is built from the derived surfaces so the run
    exercises BOTH resolution paths end to end: hybrid-RRF entity linking
    (non-null entity ids) and LSH+CC canonicalization (fallback ids)."""
    from pyspark.sql import functions as F

    from coco_search_spark.entry_queries import (
        _surfaces_and_catalog,
        derived_transcripts,
    )
    from coco_search_spark.pipeline import run_pipeline

    sf_dir = "/root/testdata/sf0.001"
    t = derived_transcripts(spark, sf_dir)
    _, catalog = _surfaces_and_catalog(spark, sf_dir)
    res = run_pipeline(spark, t, catalog=catalog)
    return (
        res.edges.groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.countDistinct("subj_id").alias("n_subjects"),
            F.countDistinct("obj_id").alias("n_objects"),
        )
        .orderBy(F.desc("n_edges"), F.asc("pred"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
