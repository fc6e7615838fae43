"""Shared fixtures — hermetic, deterministic (reference test philosophy:
tests/conftest.py autouse mock pool + deterministic embeddings,
tests/mocks/ollama.py; everything seeded, no external services)."""

from __future__ import annotations

import os

import pytest

from coco_search_spark import fixtures
from coco_search_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Bound the test JVM's heap: the suite's session lives for ~200 tests,
    # and with the bench-sized 48g default + ParallelGC the heap only ever
    # grows (never shrinks), so a long run's RSS climbs tens of GB for no
    # benefit on fixture-scale data — and has been observed to get the JVM
    # killed mid-suite on constrained hosts. 12g is ample at local[8].
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    s = get_spark(cores=8, app_name="coco_search_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fx():
    """Unit-tier fixture: 20 conversations × ~8 turns, seed 42."""
    return fixtures.generate(n_conversations=20, avg_turns=8, seed=42)


@pytest.fixture(scope="session")
def transcripts(spark, fx):
    df = fixtures.transcripts_sdf(spark, fx)
    df.cache().count()
    return df
