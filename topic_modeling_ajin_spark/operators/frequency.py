"""Word-frequency analysis — the reference's flagship pipeline.

Re-expresses ``WordFrequencyAnalyzer.analyze_word_frequency``
(``preprocessing.py:367-392``: sequential per-row tokenize loop → one giant
Python list → ``collections.Counter`` → ``most_common``) as the canonical
distributed shape: ``explode → groupBy → count → orderBy/limit``. The
groupBy gets map-side partial aggregation for free, the top-k compiles to
``TakeOrderedAndProject`` (per-partition heaps, no global sort), and nothing
materializes driver-side — this is the plan that survives 100 TB.

Also covers the summary-statistics aggregates of
``preprocessing.py:579-639`` (SURVEY A2-A7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..registry import register
from ..sources import load_table, parallelized

TOP_N = 100


def tokenized_words(df: DataFrame) -> DataFrame:
    """documents → one row per (doc_id, word), whitespace-tokenized,
    lowercased, min length 2 (the reference's token floor,
    ``preprocessing.py:233``)."""
    return (
        parallelized(df)
        .select("doc_id", F.explode(TX.tokens("text")).alias("word"))
        .filter(F.length("word") >= 2)
    )


def word_count(df: DataFrame, top_n: int = TOP_N) -> DataFrame:
    """Top-N word frequency (SURVEY A1/T1). Deterministic tie-break on the
    word itself so the LIMIT boundary is stable under any parallelism."""
    return (
        tokenized_words(df)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(top_n)
    )


# Shared oracle fragment: tokenized (doc_id, word) pairs.
SQL_TOKS = r"""
SELECT doc_id,
       unnest(string_split_regex(lower(text), '\s+')) AS word
FROM documents
"""


@register(
    "word_count",
    sql=rf"""
WITH toks AS ({SQL_TOKS})
SELECT word, count(*) AS cnt
FROM toks
WHERE length(word) >= 2
GROUP BY word
ORDER BY cnt DESC, word
LIMIT 100
""",
    tags=("text", "flagship"),
)
def q_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_count(load_table(spark, sf_dir, "documents"))


@register(
    "distinct_word_count",
    sql=rf"""
WITH toks AS ({SQL_TOKS})
SELECT count(DISTINCT word) AS n_words,
       count(*) AS n_tokens
FROM toks
WHERE length(word) >= 2
""",
    tags=("text",),
)
def q_distinct_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A2: vocabulary size. Exact here; at 100 TB swap in
    ``approx_count_distinct`` (HLL) — see ``approx_distinct_words``."""
    toks = tokenized_words(load_table(spark, sf_dir, "documents"))
    return toks.agg(
        F.countDistinct("word").alias("n_words"), F.count("*").alias("n_tokens")
    )


@register(
    "word_freq_stats",
    sql=rf"""
WITH toks AS ({SQL_TOKS}),
counts AS (
    SELECT word, count(*) AS cnt
    FROM toks WHERE length(word) >= 2
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 100
)
SELECT round(avg(cnt), 6) AS mean_freq,
       round(median(cnt), 6) AS median_freq,
       round(stddev_samp(cnt), 6) AS std_freq,
       min(cnt) AS min_freq,
       max(cnt) AS max_freq
FROM counts
""",
    tags=("text", "stats"),
)
def q_word_freq_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A5: mean/median/std/min/max over the top-100 counts
    (``preprocessing.py:620-624``)."""
    counts = word_count(load_table(spark, sf_dir, "documents"))
    return counts.agg(
        F.round(F.avg("cnt"), 6).alias("mean_freq"),
        F.round(F.median("cnt"), 6).alias("median_freq"),
        F.round(F.stddev_samp("cnt"), 6).alias("std_freq"),
        F.min("cnt").alias("min_freq"),
        F.max("cnt").alias("max_freq"),
    )


@register(
    "doc_stats",
    sql="""
SELECT count(*) AS n_docs,
       round(avg(n_chars), 6) AS avg_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       round(avg(length(text)), 6) AS avg_len
FROM documents
""",
    tags=("text", "stats"),
)
def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A3/A4/A6: corpus summary (``preprocessing.py:586-611``)."""
    df = load_table(spark, sf_dir, "documents")
    return df.agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg(F.length("text")), 6).alias("avg_len"),
    )


@register(
    "lang_counts",
    sql="""
SELECT lang, source, count(*) AS cnt, round(avg(n_chars), 6) AS avg_chars
FROM documents
GROUP BY lang, source
""",
    tags=("text",),
)
def q_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A7-shaped grouped count over low-cardinality dims; partial
    (map-side) aggregation makes this a near-free scan at scale."""
    df = load_table(spark, sf_dir, "documents")
    return df.groupBy("lang", "source").agg(
        F.count("*").alias("cnt"), F.round(F.avg("n_chars"), 6).alias("avg_chars")
    )


@register(
    "approx_distinct_words",
    tags=("text", "scale"),
)
def q_approx_distinct_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-word estimate — the 100 TB path for SURVEY A2 (no
    exact-count shuffle of the full vocabulary). Rows-only check: DuckDB's
    approx_count_distinct uses a different sketch, so values can't match."""
    toks = tokenized_words(load_table(spark, sf_dir, "documents"))
    return toks.agg(F.approx_count_distinct("word", 0.01).alias("approx_words"))


K_KMV = 16  # sketch size; estimate error ~ 1/sqrt(K)
_SQL_WORD_U = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(word), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)


@register(
    "kmv_distinct_words",
    sql=rf"""
WITH toks AS ({SQL_TOKS}),
w AS (SELECT DISTINCT word FROM toks WHERE length(word) >= 2),
h AS (SELECT ({_SQL_WORD_U}) * 1.0 / 4294967296 AS u FROM w),
k AS (SELECT u FROM h ORDER BY u LIMIT {K_KMV})
SELECT {K_KMV} AS k,
       CAST(count(*) AS INT) AS n_mins,
       round(CASE WHEN count(*) < {K_KMV} THEN count(*) * 1.0
                  ELSE ({K_KMV} - 1) * 1.0 / max(u) END, 6) AS est_distinct
FROM k
""",
    tags=("text", "scale", "sketch"),
)
def q_kmv_distinct_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-word estimate — the oracle-checkable
    counterpart of ``approx_distinct_words``: unlike HLL (engine-specific
    sketch layout), KMV is pure order statistics over a portable hash, so
    DuckDB reproduces the estimate bit-for-bit.

    Estimator (Bar-Yossef et al. 2002): hash distinct values to U(0,1) via
    md5; with h_(k) the k-th smallest hash, distinct ≈ (k-1)/h_(k); exact
    count when fewer than k values exist. Scale shape: one map-side-deduped
    distinct shuffle (carries each partition's vocabulary once, not the
    token stream), then the k smallest hashes flow through
    ``TakeOrderedAndProject`` (constant-size per-partition heaps)."""
    from ..functions import hashing as H

    toks = tokenized_words(load_table(spark, sf_dir, "documents"))
    w = toks.select("word").distinct()
    u = (H.md5_base32(F.col("word")) * 1.0 / F.lit(4294967296.0)).alias("u")
    mins = w.select(u).orderBy("u").limit(K_KMV)
    est = F.when(
        F.count("*") < K_KMV, F.count("*").cast("double")
    ).otherwise((F.lit(K_KMV - 1) * 1.0) / F.max("u"))
    return mins.agg(
        F.lit(K_KMV).alias("k"),
        F.count("*").cast("int").alias("n_mins"),
        F.round(est, 6).alias("est_distinct"),
    )


CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_PROBE_K = 20


def _sql_cms_bucket(expr: str) -> str:
    from ..functions.hashing import sql_md5_base32

    return f"(({sql_md5_base32(expr)}) % {CMS_WIDTH})"


@register(
    "cms_word_counts",
    sql=rf"""
WITH toks AS ({SQL_TOKS}),
w AS (
    SELECT word, count(*) AS cnt FROM toks
    WHERE length(word) >= 2 GROUP BY word
),
rs AS (SELECT unnest(range({CMS_DEPTH})) AS r),
cells AS (
    SELECT rs.r,
           {_sql_cms_bucket("rs.r || '|' || t.word")} AS bucket,
           count(*) AS cnt
    FROM toks t CROSS JOIN rs
    WHERE length(t.word) >= 2
    GROUP BY 1, 2
),
probes AS (SELECT word, cnt FROM w ORDER BY cnt DESC, word LIMIT {CMS_PROBE_K})
SELECT p.word, p.cnt AS exact_cnt, min(c.cnt) AS est_cnt
FROM probes p
CROSS JOIN rs
JOIN cells c ON c.r = rs.r
            AND c.bucket = {_sql_cms_bucket("rs.r || '|' || p.word")}
GROUP BY p.word, p.cnt
""",
    tags=("text", "scale", "sketch"),
)
def q_cms_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation (Cormode & Muthukrishnan
    2005) with a portable md5 hash family — completing the engine's
    sketch ladder (HLL/KMV distinct, MinHash/SimHash similarity, CMS
    frequency). A2's heavy-hitter counts in O({CMS_DEPTH}x{CMS_WIDTH})
    memory: each of {CMS_DEPTH} hash rows buckets every token occurrence
    into {CMS_WIDTH} cells; a word's estimate is the MIN of its cells
    (overestimates only, by sketch construction).

    Scale shape: the sketch build is one aggregation whose map-side
    partial combine compresses every task to <= {CMS_DEPTH}*{CMS_WIDTH}
    cells regardless of corpus size — the shuffle is CONSTANT-width, the
    textbook mergeable-sketch layout — and the bounded sketch broadcasts
    into the probe join. Probes are the exact top-{CMS_PROBE_K} words, so
    the output pairs each exact count with its sketch estimate; the
    deterministic hash family makes DuckDB reproduce every cell, hence
    the whole estimate, bit-for-bit."""
    from ..functions import hashing as H

    toks = tokenized_words(load_table(spark, sf_dir, "documents"))
    rows = spark.range(CMS_DEPTH).select(F.col("id").cast("int").alias("r"))
    seeded = F.concat(
        F.col("r").cast("string"), F.lit("|"), F.col("word")
    )
    cells = (
        toks.crossJoin(F.broadcast(rows))
        .select("r", (H.md5_base32(seeded) % CMS_WIDTH).alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    probes = (
        toks.groupBy("word")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("word"))
        .limit(CMS_PROBE_K)
    )
    probe_cells = probes.crossJoin(F.broadcast(rows)).select(
        "word", "exact_cnt", "r", (H.md5_base32(seeded) % CMS_WIDTH).alias("bucket")
    )
    return (
        probe_cells.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("word", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )
