"""Report composition layer (SURVEY §2.1 S5/S6, ``preprocessing.py:518-639``,
``LDA_Analysis.py:509-612``).

The reference renders multi-sheet Excel workbooks and a formatted text
report from driver-side pandas. The engine computes every report table as a
distributed aggregate first — only the final, already-tiny results are
collected; rendering (text / Excel shim / parquet) is a sink concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.frequency import word_count
from .sources import load_table


def summary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """분석요약 equivalent (``preprocessing.py:579-607``): corpus-level
    one-row summary. One pass over documents (distributed aggregates), one
    over the token stream for the distinct-word count."""
    from .functions import text as TX

    d = load_table(spark, sf_dir, "documents")
    base = d.agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )
    words = (
        d.select(F.explode(TX.tokens("text")).alias("w"))
        .filter(F.length("w") >= 2)
        .agg(F.countDistinct("w").alias("n_distinct_words"))
    )
    return base.crossJoin(words)


def frequency_stats_table(spark: SparkSession, sf_dir: str, top_n: int = 100) -> DataFrame:
    """통계정보 equivalent (``preprocessing.py:609-639``): stats OF the
    top-N frequency list (mean/median/std/min/max of the counts)."""
    wc = word_count(load_table(spark, sf_dir, "documents"), top_n)
    return wc.agg(
        F.count("*").alias("n_words"),
        F.round(F.avg("cnt"), 2).alias("mean_count"),
        F.round(F.median("cnt"), 2).alias("median_count"),
        F.round(F.stddev("cnt"), 2).alias("std_count"),
        F.min("cnt").alias("min_count"),
        F.max("cnt").alias("max_count"),
    )


def render_text_report(spark: SparkSession, sf_dir: str, path: str) -> str:
    """Formatted text report sink (S6, ``LDA_Analysis.py:570-608``):
    collect the (tiny) summary tables and write one human-readable file.
    Returns the rendered text."""
    s = summary_table(spark, sf_dir).collect()[0]
    f = frequency_stats_table(spark, sf_dir).collect()[0]
    top = word_count(load_table(spark, sf_dir, "documents"), 10).collect()
    lines = [
        "=" * 60,
        "CORPUS ANALYSIS REPORT",
        "=" * 60,
        "",
        "[Summary]",
        f"  documents:        {s['n_docs']:,}",
        f"  avg chars/doc:    {s['avg_chars']}",
        f"  chars range:      {s['min_chars']} .. {s['max_chars']}",
        f"  languages:        {s['n_langs']}",
        f"  sources:          {s['n_sources']}",
        f"  distinct words:   {s['n_distinct_words']:,}",
        "",
        "[Top-100 word-frequency statistics]",
        f"  words counted:    {f['n_words']}",
        f"  mean count:       {f['mean_count']}",
        f"  median count:     {f['median_count']}",
        f"  std count:        {f['std_count']}",
        f"  count range:      {f['min_count']} .. {f['max_count']}",
        "",
        "[Top-10 words]",
        *[f"  {i + 1:>2}. {r['word']:<20} {r['cnt']:>8,}" for i, r in enumerate(top)],
        "",
    ]
    text = "\n".join(lines)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(text)
    return text


# ------------------------------------------------------------- registration

from .registry import register  # noqa: E402


@register(
    "analysis_summary",
    sql=r"""
WITH w AS (
    SELECT count(DISTINCT word) AS n_distinct_words
    FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents)
    WHERE length(word) >= 2
)
SELECT count(*) AS n_docs,
       round(avg(n_chars), 2) AS avg_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       (SELECT n_distinct_words FROM w) AS n_distinct_words
FROM documents
""",
    tags=("report",),
)
def q_analysis_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A2-A6 composed: the 분석요약 sheet as one distributed
    aggregate row (``preprocessing.py:579-607``)."""
    return summary_table(spark, sf_dir)
