from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from topic_modeling_ajin_spark.session import get_spark

    # default.parallelism 8 (not the 32-core default): tests build
    # hundreds of tiny createDataFrame frames, each parallelized into
    # defaultParallelism PYTHON partitions — every scan pays that many
    # Python-worker evaluations, and the staging writes' coalesce(1)
    # evaluates them SERIALLY (measured ~5 s per one-file staging write
    # at 32). 8 keeps multi-partition semantics (partition-invariance
    # tests still see real parallelism) at a quarter of the per-frame
    # Python-boundary tax.
    spark = get_spark(
        "tests",
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "8"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
