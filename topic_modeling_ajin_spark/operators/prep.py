"""Canonical document preparation (SURVEY §2.2-§2.3, preprocessing.py's
``load_and_preprocess_data`` + cleaning stages, re-expressed declaratively).

Every operator is a pure projection/filter, so Catalyst pushes the work into
the Parquet scan (column pruning + predicate pushdown) — the `.explain`
check for these is "no Exchange at all, filters in PushedFilters".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..registry import register
from ..sources import load_table

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in TX.ENGLISH_STOPWORDS) + "]"


def prepped_documents(df: DataFrame) -> DataFrame:
    """The engine's canonical prep: project, clean (P6), normalize (P7),
    null-drop (F2), min-length filter (F3) — mirrors
    ``preprocessing.py:341-374`` / ``LDA_Analysis.py:128-129``."""
    return (
        df.select(
            "doc_id",
            "lang",
            "source",
            TX.normalized_ai(TX.cleaned("text")).alias("cleaned_text"),
        )
        .na.drop(subset=["cleaned_text"])
        .filter(F.length(F.trim("cleaned_text")) > 10)
    )


@register(
    "clean_project",
    sql=r"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^가-힣a-zA-Z0-9 ]', '', 'g'),
                           '\s+', ' ', 'g')) AS cleaned_text
FROM documents
""",
    tags=("text", "prep"),
)
def q_clean_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY P1/P2/P6: projection + regex clean."""
    df = load_table(spark, sf_dir, "documents")
    return df.select("doc_id", TX.cleaned("text").alias("cleaned_text"))


@register(
    "normalize_ai",
    sql=r"""
SELECT doc_id,
       regexp_replace(lower(text), '(?i)\bai\b', '인공지능', 'g') AS normalized_text
FROM documents
""",
    tags=("text", "prep"),
)
def q_normalize_ai(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY P7: standalone 'AI' → 인공지능 (``preprocessing.py:279-284``)."""
    df = load_table(spark, sf_dir, "documents")
    return df.select(
        "doc_id", TX.normalized_ai(F.lower(F.col("text"))).alias("normalized_text")
    )


@register(
    "filter_minlen",
    sql="""
SELECT doc_id, n_chars
FROM documents
WHERE text IS NOT NULL AND length(trim(text)) > 10
""",
    tags=("text", "prep"),
)
def q_filter_minlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY F2/F3: null-drop + min-length predicate. Pushes to the scan."""
    df = load_table(spark, sf_dir, "documents")
    return (
        df.na.drop(subset=["text"])
        .filter(F.length(F.trim("text")) > 10)
        .select("doc_id", "n_chars")
    )


@register(
    "tokens_filtered",
    sql=r"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       w -> w <> '' AND length(w) BETWEEN 2 AND 15) AS toks
    FROM documents
)
SELECT doc_id, length(toks) AS n_tokens
FROM t
WHERE length(toks) >= 3
""",
    tags=("text", "prep"),
)
def q_tokens_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY P8/F4/F5: tokenize, token length band 2..15, keep docs with
    >= 3 surviving tokens (``LDA_Analysis.py:147-164``)."""
    df = load_table(spark, sf_dir, "documents")
    toks = TX.length_band(TX.tokens("text"), 2, 15)
    return (
        df.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.size("toks").alias("n_tokens"))
    )


@register(
    "stopword_removal",
    sql=rf"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       w -> w <> '' AND NOT list_contains({_STOP_SQL}, w)) AS toks
    FROM documents
)
SELECT doc_id, length(toks) AS n_content_tokens
FROM t
""",
    tags=("text", "prep"),
)
def q_stopword_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY F6: stopword drop as an order-preserving array filter against
    a literal (broadcastable) stopword set (``preprocessing.py:174-176``)."""
    df = load_table(spark, sf_dir, "documents")
    toks = TX.without_stopwords(TX.tokens("text"), TX.ENGLISH_STOPWORDS)
    return df.select("doc_id", F.size(toks).alias("n_content_tokens"))


@register(
    "truncate_preview",
    sql="""
SELECT doc_id,
       CASE WHEN length(text) > 80 THEN substr(text, 1, 80) || '...' ELSE text END AS preview
FROM documents
""",
    tags=("text", "prep"),
)
def q_truncate_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY P11: example-sentence truncation (``LDA_Analysis.py:452``)."""
    df = load_table(spark, sf_dir, "documents")
    return df.select("doc_id", TX.truncated("text", 80).alias("preview"))


@register(
    "concat_title_body",
    sql="""
SELECT doc_id,
       trim(concat_ws(' ', coalesce(source, ''), coalesce(text, ''))) AS title_contents
FROM documents
""",
    tags=("text", "prep"),
)
def q_concat_title_body(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY P4: null-safe two-column concat —
    ``title.fillna('') + ' ' + contents.fillna('')`` then strip
    (``preprocessing.py:353``); here source+text stand in for
    title+contents."""
    df = load_table(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        F.trim(
            F.concat_ws(
                " ",
                F.coalesce(F.col("source"), F.lit("")),
                F.coalesce(F.col("text"), F.lit("")),
            )
        ).alias("title_contents"),
    )
