"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``topic_modeling_ajin_spark.registry`` — one entry per
implemented operator from SURVEY.md §2 (plus the beyond-reference scale
operators). This file is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from topic_modeling_ajin_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the word-frequency pipeline
    (SURVEY §3.1 — scan → clean → tokenize → explode → count → top-k)."""
    registry = load_all()
    return registry["word_count"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query; ML /
    sketch ops with engine-specific results are omitted (rows-only check)."""
    return {name: spec.sql for name, spec in load_all().items() if spec.sql is not None}
