"""Query registry: the single source of truth wiring operator functions to
their DuckDB oracle SQL.

Each operator module registers ``name -> (fn, oracle_sql | None)``. The
driver contract (``__spark_entry__.py``) exposes ``queries()`` /
``oracle_sql()`` straight from here; ``tools/check_oracles.py`` and
``bench.py`` iterate the same registry, so an operator is added in exactly
one place.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None => rows-only check (non-SQL op)
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QuerySpec] = {}

_OPERATOR_MODULES = (
    "topic_modeling_ajin_spark.operators.frequency",
    "topic_modeling_ajin_spark.operators.prep",
    "topic_modeling_ajin_spark.operators.dedup",
    "topic_modeling_ajin_spark.operators.similarity",
    "topic_modeling_ajin_spark.operators.encoding",
    "topic_modeling_ajin_spark.operators.text_analysis",
    "topic_modeling_ajin_spark.operators.bpe",
    "topic_modeling_ajin_spark.operators.unigram_lm",
    "topic_modeling_ajin_spark.operators.quality_model",
    "topic_modeling_ajin_spark.operators.topics",
    "topic_modeling_ajin_spark.operators.clustering",
    "topic_modeling_ajin_spark.operators.plsa",
    "topic_modeling_ajin_spark.operators.metrics",
    "topic_modeling_ajin_spark.operators.multimodal",
    "topic_modeling_ajin_spark.operators.curation",
    "topic_modeling_ajin_spark.operators.selection",
    "topic_modeling_ajin_spark.operators.retrieval",
    "topic_modeling_ajin_spark.operators.relational",
    "topic_modeling_ajin_spark.operators.events",
    "topic_modeling_ajin_spark.report",
)


def register(name: str, sql: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn=fn, sql=sql, tags=tuple(tags))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (triggering registration) and return
    the full registry."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return REGISTRY
