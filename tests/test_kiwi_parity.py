"""Kiwi-native golden parity (VERDICT r2 item 2).

The reference's recorded goldens (BASELINE.md: 모델=845, 콘텐츠=736 …) come
from kiwi POS tagging over the canonical preprocessed table
(``preprocessing.py:227-235,374-386``: tags NNG/NNP/VA/VV, form length
≥ 2, stopwords.txt filter, Counter over all docs). The engine's kiwi
branch (``functions/morph.py``) is import-gated and this container ships
no ``kiwipiepy`` — so this module is the skip-if-absent parity harness
that makes the branch testable the moment the wheel is present, instead
of dead code.
"""

from __future__ import annotations

import os

import pytest

REFERENCE_PRE = "/root/reference/Results/pre_dataframe.xlsx"
REFERENCE_STOPWORDS = "/root/reference/stopwords.txt"

# 단어빈도수 sheet of Results/word_frequency_analysis.xlsx (BASELINE.md)
GOLDEN_TOP = {
    "모델": 845,
    "콘텐츠": 736,
    "미디어": 333,
    "동영상": 206,
    "카피": 152,
    "문구": 151,
}


def _kiwi_available() -> bool:
    try:
        import kiwipiepy  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _kiwi_available(), reason="kiwipiepy not installed: kiwi parity runs only where the native analyzer exists"
)
@pytest.mark.skipif(
    not os.path.exists(REFERENCE_PRE), reason="reference snapshot not present"
)
def test_kiwi_word_frequency_golden_parity(spark):
    """With kiwi present, the engine's morphological pipeline over the
    reference's own canonical table must reproduce the reference's top
    word-frequency goldens exactly (``preprocessing.py:374-389``)."""
    from pyspark.sql import functions as F

    from topic_modeling_ajin_spark.functions import text as TX
    from topic_modeling_ajin_spark.functions.morph import analyzer_kind, morph_tokens
    from topic_modeling_ajin_spark.sources import read_stopwords
    from topic_modeling_ajin_spark.sources.io import read_xlsx

    assert analyzer_kind() == "kiwi"
    sw = read_stopwords(spark, REFERENCE_STOPWORDS)

    df = read_xlsx(spark, REFERENCE_PRE)
    toks = df.select(
        TX.without_stopwords(
            morph_tokens(F.coalesce(F.col("cleaned_text"), F.lit(""))), sw
        ).alias("words")
    )
    counts = {
        r["word"]: r["n"]
        for r in (
            toks.select(F.explode("words").alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"))
            .limit(100)
            .collect()
        )
    }
    for word, golden in GOLDEN_TOP.items():
        assert counts.get(word) == golden, (word, counts.get(word), golden)
    top_word = max(counts, key=counts.get)
    assert top_word == "모델"
