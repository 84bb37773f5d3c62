"""Vector math over ``array<float|double>`` columns as pure expressions.

The reference does embedding math driver-side with numpy/sklearn
(``BERTopic_Analysis.py:471-496,574-589``). Here dot products / norms /
cosine are Catalyst higher-order-function expressions (``zip_with`` +
``aggregate``) that run JVM-side inside codegen, distribute with the rows,
and match a DuckDB oracle bit-for-bit at double precision (sequential
left-to-right summation in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-sum dot product: exact same association order as the
    DuckDB oracle's ``list_dot_product`` on DOUBLE[]."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 distance, sequential summation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
