"""Property-based tests (hypothesis) for the column-expression layer.

The reference has no property tests (SURVEY §5); these pin the algebraic
invariants the engine's text/hash expressions rely on, using one shared
Spark round-trip per property batch (collect inputs → evaluate expressions
→ assert per-row in Python)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from topic_modeling_ajin_spark.functions import text as TX

TEXTS = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs", "Po", "Sm"),
        max_codepoint=0xD7A3,  # include Hangul syllable block
    ),
    max_size=200,
)


def _eval(spark, texts: list[str], col) -> list:
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    return [r["out"] for r in df.select(col.alias("out")).collect()]


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=20))
def test_cleaned_is_idempotent_and_charset_bounded(spark, texts):
    once = _eval(spark, texts, TX.cleaned("text"))
    twice = _eval(spark, once, TX.cleaned("text"))
    assert once == twice  # cleaning a cleaned string is a no-op
    for s in once:
        assert re.fullmatch(r"[가-힣a-z0-9 ]*", s), s
        assert "  " not in s and s == s.strip()


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=20))
def test_tokens_never_empty_string_and_lowercase(spark, texts):
    toks = _eval(spark, texts, TX.tokens("text"))
    for ts in toks:
        assert "" not in ts
        assert all(t == t.lower() for t in ts)


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=20))
def test_truncated_bounds_length(spark, texts):
    out = _eval(spark, texts, TX.truncated("text", 50))
    for orig, t in zip(texts, out):
        if len(orig) > 50:
            assert t == orig[:50] + "..."
        else:
            assert t == orig


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(st.floats(-1e3, 1e3), min_size=4, max_size=4), min_size=2, max_size=8))
def test_vector_cosine_bounds_and_symmetry(spark, vecs):
    from topic_modeling_ajin_spark.functions import vectors as V

    rows = [(a, b) for a in vecs for b in vecs]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = df.select(
        V.dot(V.as_double("a"), V.as_double("b")).alias("ab"),
        V.dot(V.as_double("b"), V.as_double("a")).alias("ba"),
        V.norm(V.as_double("a")).alias("na"),
        V.norm(V.as_double("b")).alias("nb"),
    ).collect()
    for r in out:
        assert abs(r["ab"] - r["ba"]) <= 1e-9 * max(1.0, abs(r["ab"]))  # symmetric
        if r["na"] > 0 and r["nb"] > 0:
            cos = r["ab"] / (r["na"] * r["nb"])
            assert -1.0 - 1e-9 <= cos <= 1.0 + 1e-9  # Cauchy-Schwarz
