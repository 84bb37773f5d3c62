"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting handles joins; a *single hot grouping key* in an
aggregate can still pin one reducer at 100 TB (one language dominating a
corpus, one user dominating an event stream). Salting splits each key into
``n_salt`` sub-keys for the first (heavy) shuffle, then merges the partials
in a second (tiny, one row per (key, salt)) shuffle.

Only algebraic aggregates (sum/count/min/max and compositions) can be
merged this way; avg must travel as (sum, count) — ``salted_agg`` handles
count/sum directly and derives avg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    n_salt: int = 16,
    sum_col: str | None = None,
) -> DataFrame:
    """count(*) (and optionally sum/avg of ``sum_col``) per ``key``, with
    the heavy shuffle split ``n_salt`` ways.

    The salt is a deterministic hash of the whole input row (xxhash64 over
    all columns mod n_salt) — uniform for repeated identical keys without
    random-ness (reruns produce identical partials)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    )
    partial_aggs: list[Column] = [F.count("*").alias("_cnt")]
    if sum_col is not None:
        partial_aggs.append(F.sum(sum_col).alias("_sum"))
    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    final_aggs: list[Column] = [F.sum("_cnt").alias("cnt")]
    if sum_col is not None:
        final_aggs.append(F.sum("_sum").alias("total"))
        final_aggs.append((F.sum("_sum") / F.sum("_cnt")).alias("mean"))
    return partial.groupBy(key).agg(*final_aggs)
