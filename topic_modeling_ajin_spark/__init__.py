"""topic_modeling_ajin_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query / data-processing capabilities of
``koreatechbigdatalab/Topic_Modeling_Ajin`` (single-node pandas Korean
text-analytics + topic modeling; see SURVEY.md) as idiomatic Spark
DataFrame / SQL / MLlib operators designed for 100 TB scale:

- ``sources``    — table loaders + explicit schemas (Parquet-first).
- ``functions``  — column-level expression builders (text, vectors, hashing).
- ``operators``  — DataFrame -> DataFrame operators (prep, frequency, dedup,
                   similarity, text analysis, topics, metrics, relational,
                   events).
- ``plans``      — plan-inspection helpers (explain capture, shuffle count).
- ``streaming``  — Structured Streaming variants of the batch operators.

Everything is declarative DataFrame API so Catalyst gets predicate pushdown,
column pruning and join planning for free; Python UDFs appear only where the
semantics genuinely require them (and then as Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"

from .cache import clear_caches  # noqa: E402  (public unpersist hook)

__all__ = ["clear_caches"]
