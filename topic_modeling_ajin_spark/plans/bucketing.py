"""Bucketed tables: shuffle-free co-located joins.

A join between two tables bucketed (and sorted) on the join key with the
same bucket count needs NO exchange at query time — each task zips bucket i
of both sides. At 100 TB this converts every fact⋈fact join on the
pre-declared key from a full shuffle of both inputs into a local merge:
the shuffle is paid once at write time, amortized over every later join.

Spark only applies bucketed reads to *tables* (metastore metadata carries
the bucket spec), hence ``saveAsTable`` with an explicit ``path`` rather
than a bare ``.parquet()`` write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int,
    path: str,
) -> None:
    """Write ``df`` as a bucketed+sorted table at ``path``. Overwrites."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table_name)
    )
