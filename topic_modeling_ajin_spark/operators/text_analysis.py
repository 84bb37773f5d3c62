"""Text-analysis operators for a training-data pipeline.

Beyond-reference surface (BASELINE.json north star): token counting,
quality scoring, language-id heuristics, and SimHash fingerprinting over
the ``documents`` table. All pure column expressions — the per-document
math is codegen'd, the only shuffles are final aggregates, and each op has
an exact DuckDB oracle (SimHash included: the bit math is written portably
on md5 nibbles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..registry import register
from ..sources import load_table, parallelized


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parallelized(load_table(spark, sf_dir, "documents"))

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in TX.ENGLISH_STOPWORDS) + "]"

# word tokens: split on non-alnum runs (shared SQL fragment).
# NULL text is coalesced to '' BOTH for the token array and the forwarded
# text column, so every length(text)/toks consumer treats a NULL document
# as an empty one — matching the Spark side (TX.word_tokens coalesces, and
# quality_exprs coalesces its text) on exactly the input class crawls
# deliver (r5 advice: without this, DuckDB's NULL-ignoring least() scored
# a NULL-text doc 0.75 while Spark scored 0.25).
_SQL_WORD_TOKS = f"""
SELECT doc_id, lang, n_chars, coalesce(text, '') AS text,
       {TX.SQL_WORD_TOKENS_EXPR} AS toks
FROM documents
"""


@register(
    "token_stats",
    sql=rf"""
WITH t AS ({_SQL_WORD_TOKS})
SELECT doc_id,
       CAST(length(toks) AS BIGINT) AS n_tokens,
       CAST(length(list_distinct(toks)) AS BIGINT) AS n_unique,
       round(CASE WHEN length(toks) > 0
                  THEN list_sum(list_transform(toks, w -> length(w))) * 1.0 / length(toks)
                  ELSE 0 END, 6) AS avg_token_len
FROM t
""",
    tags=("text_analysis",),
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + punctuation split): count, distinct
    count, mean token length — all array expressions, zero shuffles."""
    df = _docs(spark, sf_dir)
    toks = TX.word_tokens("text")
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    return df.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
        F.round(
            F.when(F.size(toks) > 0, total_len / F.size(toks)).otherwise(0.0), 6
        ).alias("avg_token_len"),
    )


@register(
    "quality_score",
    sql=rf"""
WITH t AS ({_SQL_WORD_TOKS}),
m AS (
    SELECT doc_id,
           length(toks) AS n_tokens,
           CASE WHEN length(toks) > 0
                THEN length(list_filter(toks, w -> list_contains({_STOP_SQL}, w))) * 1.0 / length(toks)
                ELSE 0 END AS stop_ratio,
           CASE WHEN length(text) > 0
                THEN (length(text) - length(regexp_replace(lower(text), '[^a-z0-9가-힣 ]', '', 'g'))) * 1.0 / length(text)
                ELSE 0 END AS punct_ratio
    FROM t
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(stop_ratio, 6) AS stop_ratio,
       round(punct_ratio, 6) AS punct_ratio,
       round(0.5 * least(n_tokens / 100.0, 1.0)
             + 0.25 * least(stop_ratio * 5, 1.0)
             + 0.25 * (1.0 - punct_ratio), 6) AS quality
FROM m
""",
    tags=("text_analysis", "flagship"),
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality score — the C4/Gopher-style signal mix:
    length saturation, stopword density (natural language has some),
    punctuation noise. Weights are fixed; the value is the *pipeline*:
    score 100 TB of text with zero Python in the loop.

    Memoized+persisted (the verdict-table discipline): the data card's
    token-mass and mean-quality figures, the PSI monitor, and the panel
    all compose this doc-sized table per call — each used to re-pay the
    full tokenize scan."""
    from ..cache import memo

    return memo(
        spark,
        ("quality_score", sf_dir),
        lambda: quality_stats(_docs(spark, sf_dir)),
        persist=True,
    )


def quality_exprs(
    text_col: str = "text", toks: Column | None = None
) -> dict[str, Column]:
    """The raw quality-signal column expressions over a ``text`` column —
    the single definition every consumer (batch query, trained-model
    features, streaming ingest gate) composes from.

    NULL text is treated as empty (crawls deliver NULLs; without the
    coalesce, NULL would ride through size()/length() into a NULL
    quality/feature/score that silently drops the row at the streaming
    gate — r5 review).

    ``toks`` lets a caller that has already staged the token array (the
    curation filter report shares it with the repetition grams) reuse it
    instead of re-deriving — the FORMULAS still live only here."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    if toks is None:
        toks = TX.word_tokens(txt)
    n_tokens = F.size(toks)
    stop_lit = F.array(*[F.lit(s) for s in TX.ENGLISH_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_lit, w)))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)
    kept = F.length(F.regexp_replace(F.lower(txt), r"[^a-z0-9가-힣 ]", ""))
    punct_ratio = F.when(
        F.length(txt) > 0, (F.length(txt) - kept) / F.length(txt)
    ).otherwise(0.0)
    quality = (
        0.5 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.25 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.25 * (1.0 - punct_ratio)
    )
    return {
        "n_tokens": n_tokens,
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "quality": quality,
    }


def quality_stats(df: DataFrame) -> DataFrame:
    """The quality-score projection over ANY (doc_id, text) DataFrame —
    batch table or a streaming micro-batch: (doc_id, n_tokens,
    stop_ratio, punct_ratio, quality), ratios 6-dp rounded. Pure column
    expressions, shuffle-free.

    The token array is STAGED as a column in a first projection and the
    signals reference it: inlined, the non-cheap tokenize subtree was
    re-evaluated inside several output columns (codegen subexpression
    elimination does not span the interpreted stop-filter HOF) —
    measured 1.5 → 1.0 s warm over sf0.1 for identical values."""
    txt = F.coalesce(F.col("text"), F.lit(""))
    staged = df.select(
        "doc_id", "text", TX.word_tokens(txt).alias("_toks")
    )
    e = quality_exprs(toks=F.col("_toks"))
    return staged.select(
        "doc_id",
        e["n_tokens"].cast("bigint").alias("n_tokens"),
        F.round(e["stop_ratio"], 6).alias("stop_ratio"),
        F.round(e["punct_ratio"], 6).alias("punct_ratio"),
        F.round(e["quality"], 6).alias("quality"),
    )


@register(
    "langid_heuristic",
    sql=rf"""
WITH t AS ({_SQL_WORD_TOKS}),
m AS (
    SELECT doc_id, lang,
           CASE WHEN length(text) > 0
                THEN length(regexp_replace(text, '[^가-힣]', '', 'g')) * 1.0 / length(text)
                ELSE 0 END AS hangul_ratio,
           CASE WHEN length(toks) > 0
                THEN length(list_filter(toks, w -> list_contains({_STOP_SQL}, w))) * 1.0 / length(toks)
                ELSE 0 END AS stop_ratio
    FROM t
)
SELECT doc_id, lang,
       CASE WHEN hangul_ratio > 0.3 THEN 'ko'
            WHEN stop_ratio >= 0.05 THEN 'en'
            ELSE 'unk' END AS predicted
FROM m
""",
    tags=("text_analysis",),
)
def q_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-id heuristic: script ratio (Hangul) then function-word
    density (English). N-gram-free and shuffle-free; a real pipeline swaps
    the rule for a per-language stopword bank, same plan shape."""
    df = _docs(spark, sf_dir)
    toks = TX.word_tokens("text")
    hangul = F.length(F.regexp_replace(F.col("text"), r"[^가-힣]", ""))
    hangul_ratio = F.when(F.length("text") > 0, hangul / F.length("text")).otherwise(0.0)
    stop_lit = F.array(*[F.lit(s) for s in TX.ENGLISH_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_lit, w)))
    stop_ratio = F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(0.0)
    predicted = (
        F.when(hangul_ratio > 0.3, "ko")
        .when(stop_ratio >= 0.05, "en")
        .otherwise("unk")
    )
    return df.select("doc_id", "lang", predicted.alias("predicted"))


def _register_langid_confusion() -> None:
    from ..registry import REGISTRY

    @register(
        "langid_confusion",
        sql=f"""
WITH lid AS ({REGISTRY["langid_heuristic"].sql})
SELECT lang AS label, predicted,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(count(*) * 1.0 /
             sum(count(*)) OVER (PARTITION BY lang), 6) AS label_share
FROM lid GROUP BY lang, predicted ORDER BY lang, predicted
""",
        tags=("text_analysis", "quality", "eval"),
    )
    def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Confusion matrix of the language-ID heuristic against the
        corpus's LABELED lang column — the calibration table an
        operator reads before trusting the heuristic as a gate (a
        label whose mass lands in 'unk' needs its own stopword bank;
        cross-label leakage means the thresholds are wrong for that
        pair). Label-bounded aggregate + a label-partitioned share
        window; the only corpus-sized work is the langid scan it
        composes."""
        lid = q_langid_heuristic(spark, sf_dir)
        cnt = (
            lid.groupBy(F.col("lang").alias("label"), "predicted")
            .agg(F.count("*").cast("bigint").alias("n_docs"))
        )
        w = Window.partitionBy("label")
        return (
            cnt.withColumn(
                "label_share",
                F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6),
            )
            .orderBy("label", "predicted")
        )


_register_langid_confusion()


def _nibble_sql(h: str, i: int) -> str:
    return f"(strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1)"


_SIMHASH_BITS = 16


@register(
    "simhash16",
    sql=rf"""
WITH t AS ({_SQL_WORD_TOKS}),
tok AS (
    SELECT doc_id, unnest(toks) AS word FROM t WHERE length(toks) > 0
),
hv AS (
    SELECT doc_id,
           {_nibble_sql("md5(word)", 1)} * 4096
         + {_nibble_sql("md5(word)", 2)} * 256
         + {_nibble_sql("md5(word)", 3)} * 16
         + {_nibble_sql("md5(word)", 4)} AS v
    FROM tok
),
bits AS (
    SELECT doc_id,
           {", ".join(f"sum(CASE WHEN (v >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}" for b in range(_SIMHASH_BITS))}
    FROM hv GROUP BY doc_id
)
SELECT doc_id,
       CAST({" + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIMHASH_BITS))} AS BIGINT) AS simhash
FROM bits
""",
    tags=("text_analysis", "dedup", "scale"),
)
def q_simhash16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document fingerprint (16-bit here; same construction widens
    to 64). Near-dup docs land on nearby hashes — grouping by simhash (or
    by bit-bands of it) is an O(N) near-dup prefilter, the cheap cousin of
    MinHash-LSH. Hash source is md5 nibbles so the DuckDB oracle verifies
    the *exact* bit math.

    Computed as an Arrow-batched kernel (the ``minhash_signatures``
    pattern): each doc's fingerprint is a row-local function of its own
    token array, so the previous explode + groupBy(doc_id) shuffled
    every token row only to regroup rows that were never apart —
    doc_id is unique per input row (guide §2.4: remove shuffles
    outright). The kernel hashes each token once in C (hashlib md5 ==
    Spark md5 == DuckDB md5 on UTF-8 bytes) and takes vectorized ±1 bit
    votes; integer arithmetic throughout, values byte-identical to the
    aggregate form. Token-less docs emit no row, exactly as the explode
    dropped them."""
    import hashlib

    import numpy as np
    import pandas as pd

    df = _docs(spark, sf_dir).select(
        "doc_id", TX.word_tokens("text").alias("toks")
    )
    bit_idx = np.arange(_SIMHASH_BITS, dtype=np.int64)
    weights = np.int64(1) << bit_idx

    def kernel(batches):
        for pdf in batches:
            ids: list = []
            out: list = []
            for doc_id, toks in zip(pdf["doc_id"], pdf["toks"]):
                n = len(toks)
                if n == 0:
                    continue
                v = np.fromiter(
                    (
                        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:4], 16)
                        for t in toks
                    ),
                    dtype=np.int64,
                    count=n,
                )
                votes = (((v[:, None] >> bit_idx) & 1) * 2 - 1).sum(axis=0)
                ids.append(doc_id)
                out.append(int(((votes > 0) * weights).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "simhash": pd.Series(out, dtype="int64"),
                }
            )

    return df.mapInPandas(kernel, schema="doc_id long, simhash long")


@register(
    "source_quality_report",
    sql=rf"""
WITH t AS ({_SQL_WORD_TOKS}),
m AS (
    SELECT doc_id, text, length(toks) AS n_tokens,
           CASE WHEN length(toks) > 0
                THEN length(list_filter(toks, w -> list_contains({_STOP_SQL}, w))) * 1.0 / length(toks)
                ELSE 0 END AS stop_ratio
    FROM t
),
d AS (SELECT source, lang, doc_id FROM documents)
SELECT d.source,
       count(*) AS n_docs,
       round(avg(m.n_tokens), 6) AS avg_tokens,
       round(avg(m.stop_ratio), 6) AS avg_stop_ratio
FROM d JOIN m ON m.doc_id = d.doc_id
GROUP BY d.source
""",
    tags=("text_analysis",),
)
def q_source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-curation rollup: per-source document counts + mean quality
    signals (the aggregate a data-mixing decision actually consumes)."""
    df = _docs(spark, sf_dir)
    toks = TX.word_tokens("text")
    stop_lit = F.array(*[F.lit(s) for s in TX.ENGLISH_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_lit, w)))
    stop_ratio = F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(0.0)
    per_doc = df.select("source", F.size(toks).alias("n_tokens"), stop_ratio.alias("stop_ratio"))
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.round(F.avg("stop_ratio"), 6).alias("avg_stop_ratio"),
    )


TFIDF_TOP_K = 5


@register(
    "tfidf_top_terms",
    sql=f"""
WITH toks AS ({_SQL_WORD_TOKS}),
tf AS (
    SELECT doc_id, word, count(*) AS tf
    FROM (SELECT doc_id, unnest(toks) AS word FROM toks)
    WHERE length(word) >= 2
    GROUP BY doc_id, word
),
dfc AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
n AS (SELECT count(*) AS n_docs FROM documents),
w AS (
    SELECT tf.doc_id, tf.word,
           tf.tf * (ln((1.0 + n.n_docs) / (1.0 + dfc.df)) + 1.0) AS tfidf
    FROM tf JOIN dfc USING (word) CROSS JOIN n
)
SELECT doc_id, word, round(tfidf, 6) AS tfidf,
       row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rank
FROM w
QUALIFY rank <= {TFIDF_TOP_K}
""",
    tags=("text", "vectorize"),
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY M16: TF-IDF vectorization (sklearn ``TfidfVectorizer``
    semantics — smooth idf ln((1+N)/(1+df))+1, ``BERTopic_Analysis.py:
    595-607``) kept in long form; top-{TFIDF_TOP_K} terms per document.

    The MLlib route (``CountVectorizer`` + ``IDF``) produces SparseVectors
    for model input; this explicit-algebra form is the queryable twin — at
    scale the df table is vocabulary-sized (fits in a broadcast) and the tf
    table shuffles once on (doc, word)."""
    d = _docs(spark, sf_dir)
    from pyspark.sql import Window

    toks = TX.word_tokens("text")
    # one explicit doc_id partitioning serves BOTH the (doc_id, word)
    # aggregation (hash(doc_id) co-locates every (doc_id, word) group) and
    # the per-doc rank window — two shuffles collapse into this one
    tf = (
        d.select("doc_id", F.explode(toks).alias("word"))
        .filter(F.length("word") >= 2)
        .repartition("doc_id")
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    # document frequency FROM the tf table (tf rows are unique per
    # (doc, word), so counting them per word IS df) — exactly the oracle
    # SQL's formulation, and it spares a second tokenize pass over the
    # corpus (measured 1.86s -> 1.52s median at sf0.1; the duplicated tf
    # subtree is coalesced at runtime)
    dfc = tf.groupBy("word").agg(F.count("*").alias("df"))
    # corpus-constant scalar, memoized per session (parquet-footer count,
    # but still one driver job per invocation un-memoized)
    from ..cache import memo

    # key namespaced to the source table (r13 ADVICE): a future memo of
    # a DIFFERENT document count (filtered, post-dedup) under a generic
    # ("n_docs", sf_dir) key would silently collide with this one
    n_docs = memo(spark, ("documents_n_docs", sf_dir), d.count)
    # dfc is vocab-sized — corpus-unbounded — and NOT persisted (a
    # count-based vocab_broadcast would re-run the tokenize), so the
    # join carries no forced hint: AQE sees dfc's true runtime size and
    # broadcasts it when small, shuffle-joins when a web-scale vocab
    # wouldn't fit (r10 verdict task 1 — the OOM-proof default)
    w = tf.join(dfc, "word").withColumn(
        "tfidf",
        F.col("tf") * (F.log((1.0 + n_docs) / (1.0 + F.col("df"))) + 1.0),
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "word", F.round("tfidf", 6).alias("tfidf"), "rank")
    )


TOP_BIGRAMS = 30


@register(
    "bigram_counts",
    sql=f"""
WITH toks AS ({_SQL_WORD_TOKS}),
grams AS (
    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i + 1])) AS bigram
    FROM toks
)
SELECT bigram, count(*) AS cnt
FROM grams
GROUP BY bigram
ORDER BY cnt DESC, bigram
LIMIT {TOP_BIGRAMS}
""",
    tags=("text", "vectorize"),
)
def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY M14's ngram_range=(1,2) leg (``BERTopic_Analysis.py:224-229``;
    MLlib ``NGram(n=2)`` equivalent) as a pure array expression: adjacent
    token pairs, global top-{TOP_BIGRAMS}. The explode emits n-1 bigrams per
    doc and partial aggregation collapses them map-side before the single
    shuffle."""
    d = _docs(spark, sf_dir)
    toks = d.select(TX.word_tokens("text").alias("toks"))
    bigrams = toks.select(
        F.explode(
            F.filter(
                F.transform(
                    "toks",
                    lambda t, i: F.when(
                        i < F.size("toks") - 1,
                        F.concat_ws(" ", t, F.element_at("toks", i + 2)),
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(TOP_BIGRAMS)
    )


@register(
    "morph_token_counts",
    sql=r"""
WITH m AS (
    SELECT doc_id,
           regexp_extract_all(lower(text), '[가-힣]{2,}|[a-z0-9]{2,}') AS morphs
    FROM documents
)
SELECT doc_id,
       CAST(length(morphs) AS INT) AS n_morphs,
       array_to_string(morphs[1:5], ' ') AS head_morphs
FROM m
""",
    tags=("text", "udf", "morph"),
)
def q_morph_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY P9: the morphological-tokenizer pandas UDF — Arrow-batched,
    analyzer lazily built once per executor (``functions.morph``). In this
    container kiwipiepy is absent, so the UDF runs the reference's own
    regex fallback (``preprocessing.py:266-277``), which the DuckDB oracle
    mirrors exactly; with Kiwi installed the same query runs morphological
    analysis and the check downgrades to rows-only semantics."""
    from ..functions.morph import morph_tokens

    d = _docs(spark, sf_dir)
    m = d.select("doc_id", morph_tokens("text").alias("morphs"))
    return m.select(
        "doc_id",
        F.size("morphs").alias("n_morphs"),
        F.concat_ws(" ", F.slice("morphs", 1, 5)).alias("head_morphs"),
    )


_SIMHASH_HAM_MAX = 2
_SQL_SIMHASH = None  # filled below to reuse the simhash16 oracle body

# reuse the simhash CTE body by re-deriving it (keeps one source of truth
# for the bit math): everything up to the final SELECT
_SIMHASH_BODY = rf"""
t AS ({_SQL_WORD_TOKS}),
tok AS (
    SELECT doc_id, unnest(toks) AS word FROM t WHERE length(toks) > 0
),
hv AS (
    SELECT doc_id,
           {_nibble_sql("md5(word)", 1)} * 4096
         + {_nibble_sql("md5(word)", 2)} * 256
         + {_nibble_sql("md5(word)", 3)} * 16
         + {_nibble_sql("md5(word)", 4)} AS v
    FROM tok
),
bits AS (
    SELECT doc_id,
           {", ".join(f"sum(CASE WHEN (v >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}" for b in range(_SIMHASH_BITS))}
    FROM hv GROUP BY doc_id
),
sh AS (
    SELECT doc_id,
           CAST({" + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIMHASH_BITS))} AS BIGINT) AS simhash
    FROM bits
)
"""


@register(
    "simhash_near_dup",
    sql=f"""
WITH {_SIMHASH_BODY},
banded AS (
    SELECT doc_id, simhash,
           simhash % 256 AS band_lo, simhash // 256 AS band_hi
    FROM sh
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.simhash AS ha, b.simhash AS hb
    FROM banded a
    JOIN banded b
      ON a.doc_id < b.doc_id
     AND (a.band_lo = b.band_lo OR a.band_hi = b.band_hi)
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= {_SIMHASH_HAM_MAX}
""",
    tags=("text_analysis", "dedup", "scale"),
)
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidate pairs: band the 16-bit fingerprint into
    two bytes; candidates form via two equi-joins (union), never a
    similarity scan, and verification is ``bit_count(xor)`` — pure integer
    codegen. Recall guarantee (pigeonhole): a pair within Hamming distance
    b-1 of b bands always shares an exact band — here b=2, so distance ≤ 1
    is guaranteed and distance-2 pairs are found only when both flipped
    bits land in the same band (LSH-style partial recall, identical in the
    oracle). At 100 TB: 64-bit simhash, 4 bands ⇒ guaranteed ≤ 3."""
    from ..cache import memo

    # both band-joins below branch from the simhash table; memoized persist
    # keeps one cached copy per (session, dataset)
    sh = memo(
        spark, ("simhash16", sf_dir), lambda: q_simhash16(spark, sf_dir), persist=True
    )
    banded = sh.select(
        "doc_id",
        "simhash",
        (F.col("simhash") % 256).alias("band_lo"),
        (F.col("simhash") / 256).cast("long").alias("band_hi"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("ha"),
        "band_lo",
        "band_hi",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("hb"),
        F.col("band_lo").alias("blo"),
        F.col("band_hi").alias("bhi"),
    )
    lo = a.join(b, (F.col("band_lo") == F.col("blo")) & (F.col("doc_a") < F.col("doc_b")))
    hi = a.join(b, (F.col("band_hi") == F.col("bhi")) & (F.col("doc_a") < F.col("doc_b")))
    cand = lo.select("doc_a", "doc_b", "ha", "hb").union(
        hi.select("doc_a", "doc_b", "ha", "hb")
    ).distinct()
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int")
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= _SIMHASH_HAM_MAX
    )


@register(
    "simhash_hamming_histogram",
    sql=f"""
WITH {_SIMHASH_BODY},
banded AS (
    SELECT doc_id, simhash,
           simhash % 256 AS band_lo, simhash // 256 AS band_hi
    FROM sh
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.simhash AS ha, b.simhash AS hb
    FROM banded a
    JOIN banded b
      ON a.doc_id < b.doc_id
     AND (a.band_lo = b.band_lo OR a.band_hi = b.band_hi)
)
SELECT CAST(bit_count(xor(ha, hb)) AS INT) AS hamming,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM cand
GROUP BY 1
""",
    tags=("text_analysis", "dedup", "eval"),
)
def q_simhash_hamming_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-tuning companion to ``simhash_near_dup``: the full Hamming-
    distance histogram of the BANDED candidate pairs (no threshold) —
    what an operator reads before moving ``_SIMHASH_HAM_MAX``: mass just
    above the current gate means the corpus has a near-dup population
    the gate is splitting. Candidates only, deliberately: the band join
    IS the scale path (the histogram of all N² pairs would be the scan
    this family exists to avoid), and the band-recall caveat is the same
    one the gate itself carries. Same memoized simhash table, same two
    equi-joins, one bounded aggregate."""
    from ..cache import memo

    sh = memo(
        spark, ("simhash16", sf_dir), lambda: q_simhash16(spark, sf_dir), persist=True
    )
    banded = sh.select(
        "doc_id",
        "simhash",
        (F.col("simhash") % 256).alias("band_lo"),
        (F.col("simhash") / 256).cast("long").alias("band_hi"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("ha"),
        "band_lo",
        "band_hi",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("hb"),
        F.col("band_lo").alias("blo"),
        F.col("band_hi").alias("bhi"),
    )
    lo = a.join(
        b, (F.col("band_lo") == F.col("blo")) & (F.col("doc_a") < F.col("doc_b"))
    )
    hi = a.join(
        b, (F.col("band_hi") == F.col("bhi")) & (F.col("doc_a") < F.col("doc_b"))
    )
    cand = (
        lo.select("doc_a", "doc_b", "ha", "hb")
        .union(hi.select("doc_a", "doc_b", "ha", "hb"))
        .distinct()
    )
    return (
        cand.select(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            .cast("int")
            .alias("hamming")
        )
        .groupBy("hamming")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )


# -------------------------------------------- repetition & decontamination

REPETITION_NGRAM = 3
REPETITION_THRESHOLD = 0.3  # Gopher-style "too repetitive" cut


@register(
    "repetition_ratio",
    sql=rf"""
WITH t AS ({_SQL_WORD_TOKS}),
g AS (
    SELECT doc_id,
           CASE WHEN length(toks) >= {REPETITION_NGRAM}
                THEN list_transform(range(1, length(toks) - {REPETITION_NGRAM - 2}),
                                    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
                ELSE []::VARCHAR[] END AS grams
    FROM t
)
SELECT doc_id,
       CAST(length(grams) AS BIGINT) AS n_trigrams,
       CAST(length(list_distinct(grams)) AS BIGINT) AS n_unique,
       round(CASE WHEN length(grams) > 0
                  THEN (length(grams) - length(list_distinct(grams))) * 1.0 / length(grams)
                  ELSE 0 END, 6) AS dup_ratio,
       CASE WHEN length(grams) > 0
             AND (length(grams) - length(list_distinct(grams))) * 1.0 / length(grams)
                 > {REPETITION_THRESHOLD}
            THEN true ELSE false END AS repetitive
FROM g
""",
    tags=("text_analysis", "quality", "scale"),
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition filter (the Gopher-rules signal): the
    fraction of word trigram occurrences that are repeats of an earlier
    trigram in the same document. Crawl/boilerplate text scores high and
    gets flagged. Pure per-row array expressions — zero shuffles, so the
    100 TB plan is a single scan + project.

    Staged selects on purpose: the tokenize → n-gram → count steps each
    reference their input several times, and higher-order functions are
    CodegenFallback (interpreted), so inlining one projection would
    re-evaluate the regex split per n-gram per reference (measured 15 s
    for 500 rows vs ~0.3 s staged — CollapseProject keeps multiply-
    referenced non-cheap aliases in their own project node)."""
    from ..functions import hashing as H

    df = _docs(spark, sf_dir)
    counts = (
        df.select("doc_id", TX.word_tokens("text").alias("toks"))
        .select(
            "doc_id",
            H.token_ngrams(F.col("toks"), REPETITION_NGRAM).alias("grams"),
        )
        .select(
            "doc_id",
            F.size("grams").cast("bigint").alias("n_trigrams"),
            F.size(F.array_distinct("grams")).cast("bigint").alias("n_unique"),
        )
    )
    dup = F.when(
        F.col("n_trigrams") > 0,
        (F.col("n_trigrams") - F.col("n_unique")) * 1.0 / F.col("n_trigrams"),
    ).otherwise(0.0)
    return counts.select(
        "doc_id",
        "n_trigrams",
        "n_unique",
        F.round(dup, 6).alias("dup_ratio"),
        (dup > REPETITION_THRESHOLD).alias("repetitive"),
    )


DECON_NGRAM = 5
DECON_BENCH_MAX_DOC_ID = 50  # doc_id < 50 plays the held-out benchmark set

# the bench/corpus gram CTE chain shared by the overlap scan and the
# provenance view — one tokenizer, one gram builder, one bench split
_DECON_GRAMS_SQL = rf"""t AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS toks
    FROM documents
),
g AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, length(toks) - {DECON_NGRAM - 2}),
               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                    || ' ' || toks[i + 3] || ' ' || toks[i + 4]))) AS gram
    FROM t
    WHERE length(toks) >= {DECON_NGRAM}
),
bench AS (SELECT doc_id, gram FROM g WHERE doc_id < {DECON_BENCH_MAX_DOC_ID}),
corpus AS (SELECT doc_id, gram FROM g WHERE doc_id >= {DECON_BENCH_MAX_DOC_ID})"""


def _decon_gram_frames(spark: SparkSession, sf_dir: str):
    """(bench, corpus) distinct-gram DataFrames — the Spark twin of
    ``_DECON_GRAMS_SQL``, shared by the overlap scan and provenance."""
    from ..functions import hashing as H

    d = _docs(spark, sf_dir)
    # tokenize in its own projection: inlined into the n-gram transform
    # lambda, the regex split would re-evaluate per element_at reference
    # per gram (5× n_grams times per row, interpreted)
    grams = d.select("doc_id", TX.tokens("text").alias("toks")).select(
        "doc_id",
        F.explode(H.shingles(F.col("toks"), DECON_NGRAM)).alias("gram"),
    )
    bench = grams.filter(F.col("doc_id") < DECON_BENCH_MAX_DOC_ID).select(
        F.col("doc_id").alias("bench_doc"), "gram"
    )
    corpus = grams.filter(F.col("doc_id") >= DECON_BENCH_MAX_DOC_ID)
    return bench, corpus


@register(
    "decontamination_overlap",
    sql=f"""
WITH {_DECON_GRAMS_SQL}
SELECT c.doc_id,
       count(DISTINCT c.gram) AS n_shared_grams,
       count(DISTINCT b.doc_id) AS n_bench_docs
FROM corpus c JOIN bench b ON b.gram = c.gram
GROUP BY c.doc_id
""",
    tags=("text_analysis", "dedup", "scale"),
)
def q_decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the eval-leakage scan every training
    pipeline runs before a model sees the data: flag corpus documents that
    share any {DECON_NGRAM}-gram with the held-out benchmark set (here the
    docs with doc_id < {DECON_BENCH_MAX_DOC_ID} stand in for it). Scale
    shape: the benchmark side is tiny by construction, so its exploded
    gram set BROADCASTS and the corpus side never shuffles — a 100 TB scan
    with a hash-probe per gram, aggregated per document."""
    bench, corpus = _decon_gram_frames(spark, sf_dir)
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.countDistinct("bench_doc").alias("n_bench_docs"),
        )
    )


@register(
    "decontam_provenance",
    sql=f"""
WITH {_DECON_GRAMS_SQL}
SELECT b.doc_id AS bench_doc,
       count(DISTINCT b.gram) AS n_leaked_grams,
       count(DISTINCT c.doc_id) AS n_corpus_docs
FROM bench b JOIN corpus c ON c.gram = b.gram
GROUP BY b.doc_id
""",
    tags=("text_analysis", "dedup", "eval"),
)
def q_decontam_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INVERSE view of ``decontamination_overlap``: per BENCHMARK
    document, how many of its {DECON_NGRAM}-grams leaked into the
    training corpus and how many corpus documents carry them — the
    table an eval owner reads to decide which benchmark items are
    compromised (and must be re-drawn or score-adjusted) rather than
    which corpus docs to drop. Same shared gram split, same broadcast:
    here the AGGREGATION is benchmark-sized, so the output is bounded
    by the benchmark itself."""
    bench, corpus = _decon_gram_frames(spark, sf_dir)
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy(F.col("bench_doc").alias("bench_doc"))
        .agg(
            F.countDistinct("gram").alias("n_leaked_grams"),
            F.countDistinct("doc_id").alias("n_corpus_docs"),
        )
    )


# a single shared benchmark n-gram marks a doc contaminated — the
# standard (strict) decontamination policy: eval leakage is not a
# matter of degree for a held-out benchmark
DECON_MIN_SHARED = 1


def _doc_decontam_sql() -> str:
    from ..registry import REGISTRY

    return f"""
WITH ov AS ({REGISTRY["decontamination_overlap"].sql})
SELECT d.doc_id,
       CAST(coalesce(ov.n_shared_grams, 0) AS BIGINT) AS n_shared_grams,
       CAST(coalesce(ov.n_bench_docs, 0) AS BIGINT) AS n_bench_docs,
       coalesce(ov.n_shared_grams, 0) >= {DECON_MIN_SHARED} AS flagged
FROM documents d
LEFT JOIN ov ON ov.doc_id = d.doc_id
WHERE d.doc_id >= {DECON_BENCH_MAX_DOC_ID}
"""


@register(
    "doc_decontam",
    sql=_doc_decontam_sql(),
    tags=("text_analysis", "curation", "dedup", "scale"),
)
def q_doc_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document decontamination VERDICT: every corpus doc (the
    non-benchmark side) with its benchmark {DECON_NGRAM}-gram overlap and
    a flagged bit at >= {DECON_MIN_SHARED} shared gram — the decision
    table ``training_corpus_manifest_decontam`` gates on.
    ``decontamination_overlap`` (composed verbatim) reports only the
    overlapping docs; the verdict LEFT-joins it back over the corpus so
    clean docs surface as flagged=false rather than vanishing. Same
    broadcast-bench scale shape; the LEFT join is doc-keyed.

    Memoized+persisted (the verdict-table discipline): the manifest
    composes this, and the 5-gram corpus scan behind it is the gate's
    whole cost — the persisted verdict is doc-sized."""
    from ..cache import memo

    def build() -> DataFrame:
        ov = q_decontamination_overlap(spark, sf_dir)
        d = _docs(spark, sf_dir).filter(
            F.col("doc_id") >= DECON_BENCH_MAX_DOC_ID
        ).select("doc_id")
        return d.join(ov, "doc_id", "left").select(
            "doc_id",
            F.coalesce("n_shared_grams", F.lit(0)).cast("bigint").alias(
                "n_shared_grams"
            ),
            F.coalesce("n_bench_docs", F.lit(0)).cast("bigint").alias(
                "n_bench_docs"
            ),
            (
                F.coalesce("n_shared_grams", F.lit(0)) >= DECON_MIN_SHARED
            ).alias("flagged"),
        )

    return memo(spark, ("doc_decontam", sf_dir), build, persist=True)


def _decontam_gap_sql() -> str:
    from ..registry import REGISTRY

    return f"""
WITH dc AS ({REGISTRY["doc_decontam"].sql}),
sd AS ({REGISTRY["semantic_decontam_full"].sql}),
j AS (
    SELECT dc.flagged AS ng, sd.flagged AS sm, sd.space AS space
    FROM dc LEFT JOIN sd ON sd.doc_id = dc.doc_id
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN sm IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_no_embedding,
       CAST(sum(CASE WHEN space = 'hash' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hash_fallback,
       CAST(sum(CASE WHEN ng THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ngram_flagged,
       CAST(sum(CASE WHEN sm THEN 1 ELSE 0 END) AS BIGINT)
           AS n_semantic_flagged,
       CAST(sum(CASE WHEN ng AND sm THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       CAST(sum(CASE WHEN ng AND sm = false THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ngram_only,
       CAST(sum(CASE WHEN sm AND NOT ng THEN 1 ELSE 0 END) AS BIGINT)
           AS n_semantic_only,
       CAST(sum(CASE WHEN ng AND sm IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ngram_unevaluated
FROM j
"""


# NOTE: decontam_gap_report is REGISTERED from curation.py (the module
# that already imports every gate source): dedup's module-level SQL
# construction imports THIS module mid-import, so registering here would
# run before dedup's semantic_decontam registration exists.


def q_decontam_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row diff of the two decontamination gates — the number an
    eval owner reads to judge whether n-gram matching is ENOUGH on this
    corpus: ``n_ngram_only`` (verbatim copies the embedding gate's
    threshold misses), ``n_both`` (agreement), and the one that matters,
    ``n_semantic_only`` — docs near a benchmark item in embedding space
    that share NO {DECON_NGRAM}-gram with it, i.e. the paraphrased
    leakage a string-matching decontam pipeline ships. Composes the two
    registered verdicts verbatim (same doc_id < {DECON_BENCH_MAX_DOC_ID}
    held-out split); both are memo-backed doc-sized tables, the join is
    doc-keyed, the output is one row.

    Since r10 the semantic side is ``semantic_decontam_full``, so EVERY
    corpus doc has a semantic verdict (docs without a table embedding go
    through the hash-fallback encoder against the hash-encoded bench).
    ``n_hash_fallback`` reports how many verdicts came from the fallback
    space — the honest residual: a hash-space verdict is a weaker
    paraphrase detector than a real encoder's. ``n_no_embedding`` and
    ``n_ngram_unevaluated`` remain as structurally-zero tripwires (both
    gates now cover the identical doc_id >= split set; a nonzero value
    means the two verdicts' doc sets drifted); ``n_ngram_only`` counts
    docs where both gates evaluated (sm = false, not sm IS NULL)."""
    from .dedup import q_semantic_decontam  # noqa: F401 (table-space twin)
    from ..registry import REGISTRY

    ng = q_doc_decontam(spark, sf_dir).select(
        "doc_id", F.col("flagged").alias("ng")
    )
    sm = REGISTRY["semantic_decontam_full"].fn(spark, sf_dir).select(
        "doc_id", F.col("flagged").alias("sm"), "space"
    )
    j = ng.join(sm, "doc_id", "left")

    def n(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)

    return j.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        n(F.col("sm").isNull(), "n_no_embedding"),
        n(F.col("space") == "hash", "n_hash_fallback"),
        n(F.col("ng"), "n_ngram_flagged"),
        n(F.col("sm"), "n_semantic_flagged"),
        n(F.col("ng") & F.col("sm"), "n_both"),
        n(F.col("ng") & (F.col("sm") == F.lit(False)), "n_ngram_only"),
        n(F.col("sm") & ~F.col("ng"), "n_semantic_only"),
        n(F.col("ng") & F.col("sm").isNull(), "n_ngram_unevaluated"),
    )


MIN_KEEP_TOKENS = 10
MAX_KEEP_DUP = 0.3
MIN_KEEP_QUALITY = 0.35


@register(
    "curation_filter_report",
    sql=rf"""
WITH t AS ({_SQL_WORD_TOKS}),
m AS (
    SELECT doc_id,
           length(toks) AS n_tokens,
           CASE WHEN length(toks) >= {REPETITION_NGRAM}
                THEN length(list_transform(range(1, length(toks) - {REPETITION_NGRAM - 2}),
                                           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
                ELSE 0 END AS n_grams,
           CASE WHEN length(toks) >= {REPETITION_NGRAM}
                THEN length(list_distinct(list_transform(range(1, length(toks) - {REPETITION_NGRAM - 2}),
                                          i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])))
                ELSE 0 END AS n_uniq,
           CASE WHEN length(toks) > 0
                THEN length(list_filter(toks, w -> list_contains({_STOP_SQL}, w))) * 1.0 / length(toks)
                ELSE 0 END AS stop_ratio,
           CASE WHEN length(text) > 0
                THEN (length(text) - length(regexp_replace(lower(text), '[^a-z0-9가-힣 ]', '', 'g'))) * 1.0 / length(text)
                ELSE 0 END AS punct_ratio,
           CASE WHEN length(text) > 0
                THEN length(regexp_replace(text, '[^가-힣]', '', 'g')) * 1.0 / length(text)
                ELSE 0 END AS hangul_ratio
    FROM t
),
s AS (
    SELECT doc_id, n_tokens,
           CASE WHEN n_grams > 0 THEN (n_grams - n_uniq) * 1.0 / n_grams ELSE 0 END AS dup_ratio,
           0.5 * least(n_tokens / 100.0, 1.0)
             + 0.25 * least(stop_ratio * 5, 1.0)
             + 0.25 * (1.0 - punct_ratio) AS quality,
           CASE WHEN hangul_ratio > 0.3 THEN 'ko'
                WHEN stop_ratio >= 0.05 THEN 'en'
                ELSE 'unk' END AS predicted
    FROM m
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(dup_ratio, 6) AS dup_ratio,
       round(quality, 6) AS quality,
       predicted AS lang,
       CASE WHEN n_tokens < {MIN_KEEP_TOKENS} THEN 'too_short'
            WHEN dup_ratio > {MAX_KEEP_DUP} THEN 'repetitive'
            WHEN quality < {MIN_KEEP_QUALITY} THEN 'low_quality'
            WHEN predicted = 'unk' THEN 'unknown_lang'
            ELSE 'keep' END AS decision,
       CASE WHEN n_tokens >= {MIN_KEEP_TOKENS} AND dup_ratio <= {MAX_KEEP_DUP}
             AND quality >= {MIN_KEEP_QUALITY} AND predicted <> 'unk'
            THEN true ELSE false END AS keep
FROM s
""",
    tags=("text_analysis", "quality", "curation", "scale"),
)
def q_curation_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite keep/drop gate a training pipeline runs per document
    (Gopher/C4-style rule stack): length floor → repetition cap → quality
    floor → language gate, with the FIRST failing rule recorded as the
    decision (the audit-trail shape quality dashboards need). One pass,
    one projection, zero shuffles — every signal reuses the staged token
    array, so 100 TB costs exactly one scan.

    The report is memoized+persisted: it is the most-composed verdict
    table in the repo (manifest, strict manifest, staged pipeline), and
    — measured at sf0.1 — a downstream ``.filter(keep)`` on the raw plan
    collapses the projection into the filter, re-inlining the staged
    token/ngram expression tree per column reference (113 s vs 8 s for
    the report itself). Persisting the doc-sized verdict table makes
    every consumer a scan of ~7 narrow columns — which is also the
    100 TB posture (materialize the gate verdicts, join the manifests)."""
    from ..cache import memo

    return memo(
        spark,
        ("curation_filter_report", sf_dir),
        lambda: _curation_filter_report_plan(spark, sf_dir),
        persist=True,
    )


def _curation_filter_report_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation_filter_report_for(_docs(spark, sf_dir))


def curation_filter_report_for(df: DataFrame) -> DataFrame:
    """The rule-gate verdict for ANY (doc_id, text) DataFrame — the
    row-local, stateless core of ``curation_filter_report``, factored
    out (r10) so the incremental-manifest stream applies the EXACT same
    expression tree per micro-batch as the registered batch query (one
    definition; the two faces cannot drift)."""
    from ..functions import hashing as H

    staged = df.select(
        "doc_id", "text", TX.word_tokens("text").alias("toks")
    ).select(
        "doc_id",
        "text",
        "toks",
        H.token_ngrams(F.col("toks"), REPETITION_NGRAM).alias("grams"),
    )
    n_grams = F.size("grams")
    n_uniq = F.size(F.array_distinct("grams"))
    dup = F.when(n_grams > 0, (n_grams - n_uniq) * 1.0 / n_grams).otherwise(0.0)
    # the length/stopword/punct/quality formulas come from quality_exprs
    # — ONE definition shared with the heuristic query, the trained
    # model's features, and the streaming gate (r5 review); the staged
    # token array is passed in so the scan stays single-pass
    e = quality_exprs("text", toks=F.col("toks"))
    n_tokens, stop_ratio, punct_ratio, quality = (
        e["n_tokens"],
        e["stop_ratio"],
        e["punct_ratio"],
        e["quality"],
    )
    hangul = F.length(F.regexp_replace(F.col("text"), r"[^가-힣]", ""))
    hangul_ratio = F.when(
        F.length("text") > 0, hangul / F.length("text")
    ).otherwise(0.0)
    predicted = (
        F.when(hangul_ratio > 0.3, "ko")
        .when(stop_ratio >= 0.05, "en")
        .otherwise("unk")
    )
    scored = staged.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(dup, 6).alias("dup_ratio"),
        F.round(quality, 6).alias("quality"),
        predicted.alias("lang"),
        dup.alias("_dup"),
        quality.alias("_q"),
    )
    decision = (
        F.when(F.col("n_tokens") < MIN_KEEP_TOKENS, "too_short")
        .when(F.col("_dup") > MAX_KEEP_DUP, "repetitive")
        .when(F.col("_q") < MIN_KEEP_QUALITY, "low_quality")
        .when(F.col("lang") == "unk", "unknown_lang")
        .otherwise("keep")
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "dup_ratio",
        "quality",
        "lang",
        decision.alias("decision"),
        (decision == "keep").alias("keep"),
    )


@register(
    "token_entropy",
    sql=rf"""
WITH t AS ({_SQL_WORD_TOKS}),
tok AS (SELECT doc_id, unnest(toks) AS word FROM t),
c AS (SELECT doc_id, word, count(*) AS cnt FROM tok GROUP BY doc_id, word),
n AS (SELECT doc_id, CAST(sum(cnt) AS DOUBLE) AS n FROM c GROUP BY doc_id)
SELECT c.doc_id,
       CAST(n.n AS BIGINT) AS n_tokens,
       round(-sum((c.cnt / n.n) * ln(c.cnt / n.n)), 6) AS entropy,
       round(CASE WHEN n.n > 1
                  THEN -sum((c.cnt / n.n) * ln(c.cnt / n.n)) / ln(n.n)
                  ELSE 0 END, 6) AS norm_entropy
FROM c JOIN n ON n.doc_id = c.doc_id
GROUP BY c.doc_id, n.n
""",
    tags=("text_analysis", "quality", "scale"),
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram entropy (and its ln(n)-normalized form) — the
    information-theoretic repetitiveness signal: boilerplate and
    keyword-stuffed text score low, natural prose high. One (doc, word)
    aggregation then a per-doc reduce — shuffle keys are document-local, so
    at 100 TB this is a map-side-combined two-level aggregate."""
    df = _docs(spark, sf_dir)
    tok = df.select("doc_id", F.explode(TX.word_tokens("text")).alias("word"))
    c = tok.groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))
    n = c.groupBy("doc_id").agg(F.sum("cnt").cast("double").alias("n"))
    j = c.join(n, "doc_id")
    p = F.col("cnt") / F.col("n")
    ent = -F.sum(p * F.log(p))
    return j.groupBy("doc_id", "n").agg(
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round(ent, 6).alias("entropy"),
        F.round(
            F.when(F.col("n") > 1, ent / F.log(F.col("n"))).otherwise(0.0), 6
        ).alias("norm_entropy"),
    ).select("doc_id", "n_tokens", "entropy", "norm_entropy")


ZIPF_TOP = 100


@register(
    "zipf_fit",
    sql=rf"""
WITH t AS ({_SQL_WORD_TOKS}),
tok AS (SELECT unnest(toks) AS word FROM t),
freq AS (
    SELECT word, count(*) AS cnt,
           row_number() OVER (ORDER BY count(*) DESC, word) AS rank
    FROM tok GROUP BY word
    QUALIFY rank <= {ZIPF_TOP}
),
xy AS (SELECT ln(rank) AS x, ln(cnt) AS y FROM freq)
SELECT CAST(count(*) AS INT) AS n_points,
       round((count(*) * sum(x * y) - sum(x) * sum(y))
             / (count(*) * sum(x * x) - sum(x) * sum(x)), 6) AS zipf_slope,
       round((sum(y) - (count(*) * sum(x * y) - sum(x) * sum(y))
                        / (count(*) * sum(x * x) - sum(x) * sum(x)) * sum(x))
             / count(*), 6) AS intercept
FROM xy
""",
    tags=("text_analysis", "stats"),
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the top-{ZIPF_TOP} word frequencies: closed-form
    least squares of ln(freq) on ln(rank). Natural corpora slope ≈ −1;
    synthetic or templated text deviates — a one-number corpus health
    check. The regression runs on a {ZIPF_TOP}-row table; everything before
    it is the standard word-count aggregate."""
    df = _docs(spark, sf_dir)
    tok = df.select(F.explode(TX.word_tokens("text")).alias("word"))
    from pyspark.sql import Window

    # Global top-k via orderBy().limit() -> TakeOrderedAndProject
    # (per-partition heaps); the rank window then runs over the
    # ZIPF_TOP survivors only — never a single-task sort of the
    # unbounded vocabulary aggregate.
    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    freq = (
        tok.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(ZIPF_TOP)
        .withColumn("rank", F.row_number().over(w))
    )
    xy = freq.select(
        F.log("rank").alias("x"), F.log("cnt").alias("y")
    )
    cnt = F.count("*")
    slope = (cnt * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")) / (
        cnt * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")
    )
    intercept = (F.sum("y") - slope * F.sum("x")) / cnt
    return xy.agg(
        cnt.cast("int").alias("n_points"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("intercept"),
    )


# -------------------------------------------------- TextRank keywords

TEXTRANK_DAMP = 0.85
TEXTRANK_ITERS = 4
TEXTRANK_VOCAB = 200  # graph nodes: top-V words by frequency (bounded)
TEXTRANK_TOP_K = 20
_TR_ROUND = 6
# Driver-side iteration budget (r3/r4 VERDICT ask): the PageRank loop
# collects the edge list, which is bounded by TEXTRANK_VOCAB^2 directed
# edges (40k at V=200 — trivially driver-sized). If someone raises
# TEXTRANK_VOCAB past this cap, fail loudly BEFORE the collect instead of
# silently materializing a multi-GB edge list on the driver.
TEXTRANK_MAX_DRIVER_EDGES = 250_000


def _sql_textrank() -> str:
    """Unrolled weighted-PageRank CTEs over the adjacency graph of the
    top-{TEXTRANK_VOCAB} words: pr{t}(word, pr)."""
    parts = [
        rf"""
t AS ({_SQL_WORD_TOKS}),
bg AS (
    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i + 1])) AS bigram
    FROM t
),
pairs AS (
    SELECT split_part(bigram, ' ', 1) AS a, split_part(bigram, ' ', 2) AS b
    FROM bg
    WHERE length(split_part(bigram, ' ', 1)) >= 2
      AND length(split_part(bigram, ' ', 2)) >= 2
),
topv AS (
    SELECT word FROM (
        SELECT word, count(*) AS cnt FROM (
            SELECT a AS word FROM pairs UNION ALL SELECT b FROM pairs
        ) GROUP BY word
    ) ORDER BY cnt DESC, word LIMIT {TEXTRANK_VOCAB}
),
und AS (
    SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
    FROM (
        SELECT a AS src, b AS dst FROM pairs
        UNION ALL
        SELECT b, a FROM pairs
    )
    WHERE src <> dst
      AND src IN (SELECT word FROM topv)
      AND dst IN (SELECT word FROM topv)
    GROUP BY src, dst
),
strength AS (SELECT src, sum(w) AS s FROM und GROUP BY src),
nodes AS (SELECT DISTINCT src AS word FROM und),
pr0 AS (SELECT word, 1.0 AS pr FROM nodes)"""
    ]
    for t in range(1, TEXTRANK_ITERS + 1):
        parts.append(
            f"""
pr{t} AS MATERIALIZED (
    SELECT n.word,
           round({1.0 - TEXTRANK_DAMP} + {TEXTRANK_DAMP} * coalesce(c.v, 0.0),
                 {_TR_ROUND}) AS pr
    FROM nodes n
    LEFT JOIN (
        SELECT e.dst AS word, sum(p.pr * e.w / s.s) AS v
        FROM und e
        JOIN pr{t - 1} p ON p.word = e.src
        JOIN strength s ON s.src = e.src
        GROUP BY e.dst
    ) c ON c.word = n.word
)"""
        )
    return ",".join(parts)


@register(
    "textrank_keywords",
    sql=f"""
WITH {_sql_textrank()}
SELECT word, pr,
       row_number() OVER (ORDER BY pr DESC, word) AS rank
FROM pr{TEXTRANK_ITERS}
QUALIFY rank <= {TEXTRANK_TOP_K}
""",
    tags=("text_analysis", "graph", "keywords", "scale"),
)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004) — weighted
    PageRank over the word co-occurrence graph, the classic unsupervised
    complement to the engine's c-TF-IDF keywords (SURVEY T2/M14 family).
    Nodes are the top-{TEXTRANK_VOCAB} words of the adjacency graph (a
    BOUNDED vocabulary at any corpus size); edges are adjacent-token
    co-occurrences; {TEXTRANK_ITERS} damped iterations
    PR(i) = {1 - TEXTRANK_DAMP} + {TEXTRANK_DAMP} * sum_j w_ji/s_j PR(j),
    6-dp rounded per round (the clustering.py determinism recipe), so
    DuckDB replays every iteration exactly.

    Scale shape: the corpus-sized work is ONE bigram aggregation with
    map-side combine; the graph itself is <= {TEXTRANK_VOCAB} nodes, so
    every PageRank round is a join over a broadcast-sized edge table —
    iterative graph analytics whose per-round cost is independent of
    corpus size."""
    # the adjacent-pair stream IS the memoized LM pair table (same
    # tokenizer, same adjacency) — reusing it makes the cold edge build
    # read one persisted table instead of re-exploding the corpus under
    # each of the counts/edge-union branches (guide §1.2 step 1)
    bigrams = (
        _doc_bigram_pairs(spark, sf_dir)
        .select("a", "b")
        .filter((F.length("a") >= 2) & (F.length("b") >= 2))
    )
    counts = (
        bigrams.select(F.col("a").alias("word"))
        .union(bigrams.select("b"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(TEXTRANK_VOCAB)
        .select("word")
    )
    und = (
        bigrams.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(bigrams.select("b", "a"))
        .filter(F.col("src") != F.col("dst"))
        .join(F.broadcast(counts.withColumnRenamed("word", "src")), "src", "leftsemi")
        .join(F.broadcast(counts.withColumnRenamed("word", "dst")), "dst", "leftsemi")
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )
    from ..cache import memo

    und = memo(
        spark,
        ("textrank_edges", sf_dir),
        lambda: und,
        persist=True,
    )
    # The graph is model-sized (<= {TEXTRANK_VOCAB} nodes) — iterate
    # DRIVER-side on the collected edge list, like topic_reduction's K x K
    # merge: launching a cluster job per PageRank round for a 200-node
    # graph is pure scheduling overhead (measured 3.1s -> ~0.1s warm at
    # sf0.1). Rounding uses decimal HALF_UP — the same semantics as
    # Spark's F.round and DuckDB's round - so the replay stays exact.
    from decimal import ROUND_HALF_UP, Decimal

    q6 = Decimal("0.000001")

    def round6(x: float) -> float:
        return float(Decimal(x).quantize(q6, rounding=ROUND_HALF_UP))

    # budget check BEFORE the collect: the count runs distributed (and
    # warms the persisted edge cache the collect reuses). Beyond the cap,
    # driver-side iteration is the wrong plan — refuse with the
    # distributed alternative named rather than OOM the driver.
    # The collected list is itself memoized (the fitted-model
    # discipline, like _qm_fit's weights): un-memoized, every call
    # re-paid the count + collect jobs for an identical model-sized
    # edge list.
    def build_edges() -> list:
        n_edges = und.count()
        if n_edges > TEXTRANK_MAX_DRIVER_EDGES:
            raise ValueError(
                f"TextRank edge table has {n_edges} rows, over the driver "
                f"budget TEXTRANK_MAX_DRIVER_EDGES={TEXTRANK_MAX_DRIVER_EDGES}."
                " Lower TEXTRANK_VOCAB, or iterate distributed: keep pr as a"
                " DataFrame and replay each round as the contribution join +"
                " aggregate that _sql_textrank() spells out (join und on src,"
                " sum pr*w/s per dst, damp, round), persisting pr per round."
            )
        return sorted((r["src"], r["dst"], r["w"]) for r in und.collect())

    edges = memo(spark, ("textrank_edges_list", sf_dir), build_edges)
    strength: dict = {}
    for s, _, wgt in edges:
        strength[s] = strength.get(s, 0.0) + wgt
    nodes = sorted(strength)
    pr = {n: 1.0 for n in nodes}
    for _ in range(TEXTRANK_ITERS):
        contrib = dict.fromkeys(nodes, 0.0)
        for s, d, wgt in edges:
            contrib[d] += pr[s] * wgt / strength[s]
        pr = {
            n: round6((1.0 - TEXTRANK_DAMP) + TEXTRANK_DAMP * contrib[n])
            for n in nodes
        }
    top = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:TEXTRANK_TOP_K]
    return spark.createDataFrame(
        [(wd, p, i + 1) for i, (wd, p) in enumerate(top)],
        "word string, pr double, rank int",
    )


# ------------------------------------------------ vocabulary drift (JS)

DRIFT_VOCAB = 100


@register(
    "vocab_drift",
    sql=f"""
WITH tw AS (
    SELECT half, word FROM (
        SELECT doc_id % 2 AS half, unnest(toks) AS word
        FROM ({_SQL_WORD_TOKS})
    ) WHERE length(word) >= 2
),
vocab AS (
    SELECT word, ca, cb FROM (
        SELECT word,
               sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cb,
               count(*) AS tot
        FROM tw GROUP BY word
    ) ORDER BY tot DESC, word LIMIT {DRIFT_VOCAB}
),
tots AS (SELECT sum(ca) * 1.0 AS ta, sum(cb) * 1.0 AS tb FROM vocab),
terms AS (
    SELECT ca / ta AS p, cb / tb AS q,
           (ca / ta + cb / tb) / 2 AS m2
    FROM vocab CROSS JOIN tots
)
SELECT round(0.5 * sum(CASE WHEN p > 0 THEN p * ln(p / m2) ELSE 0 END)
           + 0.5 * sum(CASE WHEN q > 0 THEN q * ln(q / m2) ELSE 0 END),
             6) AS js_divergence,
       count(*) AS n_vocab
FROM terms
""",
    tags=("text_analysis", "quality", "drift"),
)
def q_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the word distributions of the
    two doc_id-parity halves of the corpus — the drift detector a
    continuously-ingesting pipeline runs between yesterday's and today's
    data (or train vs serve): JS == 0 means identical distributions,
    ln 2 is the maximum. Restricted to the top-{DRIFT_VOCAB} words
    (renormalized), so the statistic — like the shuffle behind it — is
    vocabulary-bounded at any corpus size: one map-side-combined word
    count is the only corpus-scaled work."""
    d = _docs(spark, sf_dir)
    tw = (
        d.select(
            (F.col("doc_id") % 2).alias("half"),
            F.explode(TX.word_tokens("text")).alias("word"),
        )
        .filter(F.length("word") >= 2)
    )
    vocab = (
        tw.groupBy("word")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("cb"),
            F.count("*").alias("tot"),
        )
        .orderBy(F.desc("tot"), F.asc("word"))
        .limit(DRIFT_VOCAB)
    )
    tots = vocab.agg(
        (F.sum("ca") * 1.0).alias("ta"), (F.sum("cb") * 1.0).alias("tb")
    )
    p = F.col("ca") / F.col("ta")
    q = F.col("cb") / F.col("tb")
    m2 = (p + q) / 2
    terms = vocab.crossJoin(F.broadcast(tots)).select(
        p.alias("p"), q.alias("q"), m2.alias("m2")
    )
    kl = lambda x: F.when(F.col(x) > 0, F.col(x) * F.log(F.col(x) / F.col("m2"))).otherwise(0.0)  # noqa: E731
    return terms.agg(
        F.round(0.5 * F.sum(kl("p")) + 0.5 * F.sum(kl("q")), 6).alias(
            "js_divergence"
        ),
        F.count("*").alias("n_vocab"),
    )


# ---------------------------------------------------- PMI collocations

COLLOC_MIN_COUNT = 5
COLLOC_TOP_K = 20


@register(
    "collocations",
    sql=f"""
WITH t AS ({_SQL_WORD_TOKS}),
uni AS (
    SELECT word, count(*) AS c FROM (
        SELECT unnest(toks) AS word FROM t
    ) WHERE length(word) >= 2 GROUP BY word
),
tot AS (SELECT sum(c) * 1.0 AS n FROM uni),
bg AS (
    SELECT a, b, count(*) AS cab FROM (
        SELECT split_part(bigram, ' ', 1) AS a,
               split_part(bigram, ' ', 2) AS b
        FROM (
            SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                         i -> toks[i] || ' ' || toks[i + 1])) AS bigram
            FROM t
        )
    )
    WHERE length(a) >= 2 AND length(b) >= 2
    GROUP BY a, b
),
btot AS (SELECT sum(cab) * 1.0 AS nb FROM bg),
scored AS (
    SELECT bg.a, bg.b, bg.cab,
           ln((bg.cab / btot.nb) / ((ua.c / tot.n) * (ub.c / tot.n))) AS pmi
    FROM bg
    JOIN uni ua ON ua.word = bg.a
    JOIN uni ub ON ub.word = bg.b
    CROSS JOIN tot CROSS JOIN btot
    WHERE bg.cab >= {COLLOC_MIN_COUNT}
)
SELECT a, b, cab AS n_pair, round(pmi, 6) AS pmi,
       row_number() OVER (ORDER BY pmi DESC, a, b) AS rank
FROM scored
QUALIFY rank <= {COLLOC_TOP_K}
""",
    tags=("text_analysis", "keywords"),
)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-ranked collocations (Church & Hanks 1990) — the statistically
    over-represented adjacent word pairs, with a minimum-count floor so
    rare coincidences don't dominate. Complements raw ``bigram_counts``
    (frequency) and ``textrank_keywords`` (centrality). Two map-side-
    combined aggregates (unigrams, bigrams); totals broadcast back; the
    top-k is `TakeOrderedAndProject`-shaped over the thresholded pairs."""
    d = _docs(spark, sf_dir)
    toks = TX.word_tokens("text")
    uni = (
        d.select(F.explode(toks).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    tot = uni.agg((F.sum("c") * 1.0).alias("n"))
    pairs = d.select(
        F.explode(
            F.filter(
                F.transform(
                    toks,
                    lambda t, i: F.when(
                        i < F.size(toks) - 1,
                        F.struct(
                            t.alias("a"), F.element_at(toks, i + 2).alias("b")
                        ),
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("p")
    ).select("p.a", "p.b").filter(
        (F.length("a") >= 2) & (F.length("b") >= 2)
    )
    bg = pairs.groupBy("a", "b").agg(F.count("*").alias("cab"))
    btot = bg.agg((F.sum("cab") * 1.0).alias("nb"))
    ua = uni.select(F.col("word").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("word").alias("b"), F.col("c").alias("cb"))
    scored = (
        bg.filter(F.col("cab") >= COLLOC_MIN_COUNT)
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            "a",
            "b",
            "cab",
            F.log(
                (F.col("cab") / F.col("nb"))
                / ((F.col("ca") / F.col("n")) * (F.col("cb") / F.col("n")))
            ).alias("pmi"),
        )
    )
    # Global top-k via orderBy().limit() -> TakeOrderedAndProject; the
    # rank window only re-ranks the COLLOC_TOP_K survivors (never a
    # single-task sort of the full PMI pair table).
    w = Window.orderBy(F.desc("pmi"), F.asc("a"), F.asc("b"))
    return (
        scored.orderBy(F.desc("pmi"), F.asc("a"), F.asc("b"))
        .limit(COLLOC_TOP_K)
        .withColumn("rank", F.row_number().over(w))
        .select(
            "a", "b", F.col("cab").alias("n_pair"), F.round("pmi", 6).alias("pmi"), "rank"
        )
    )


# --------------------------------------------- BPE-ish regex tokenizer

# GPT-2-style pre-tokenization pattern: contraction suffixes, then
# space-prefixed letter runs / digit runs / punctuation runs. Written in
# the common subset of Java regex (Spark) and RE2 (DuckDB) so both
# engines extract byte-identical tokens.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
_BPE_SQL_PATTERN = (
    "'''(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'"
)
BPE_TOP_K = 30


@register(
    "bpe_regex_tokens",
    sql=f"""
WITH tok AS (
    SELECT unnest(regexp_extract_all(text, {_BPE_SQL_PATTERN})) AS token
    FROM documents
)
SELECT token, count(*) AS cnt,
       row_number() OVER (ORDER BY count(*) DESC, token) AS rank
FROM tok
GROUP BY token
QUALIFY rank <= {BPE_TOP_K}
""",
    tags=("text_analysis", "tokenize"),
)
def q_bpe_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization (the GPT-2 regex family): space-aware
    letter/digit/punctuation runs plus contraction suffixes — the token
    stream a byte-pair tokenizer trains on, and the honest token-count
    basis for sequence packing budgets (whitespace tokenization
    undercounts punctuation-heavy text). Top-{BPE_TOP_K} tokens with
    counts; the extraction is a codegen'd regexp over the scan, one
    map-side-combined aggregate, top-k via per-partition heaps. The
    pattern is written in the Java-regex/RE2 common subset, so DuckDB
    extracts byte-identical tokens."""
    d = _docs(spark, sf_dir)
    tok = d.select(
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))
        ).alias("token")
    )
    # Global top-k via orderBy().limit() -> TakeOrderedAndProject
    # (per-partition heaps), then a rank window over the BPE_TOP_K
    # survivors only — the docstring's claim made true.
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return (
        tok.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(BPE_TOP_K)
        .withColumn("rank", F.row_number().over(w))
    )


# ------------------------------------------- fuzzy vocabulary matching

FUZZY_MIN_LEN = 4
FUZZY_MIN_COUNT = 3


@register(
    "edit_distance_pairs",
    sql=f"""
WITH t AS ({_SQL_WORD_TOKS}),
vocab AS (
    SELECT word, count(*) AS c FROM (
        SELECT unnest(toks) AS word FROM t
    )
    WHERE length(word) >= {FUZZY_MIN_LEN}
    GROUP BY word HAVING count(*) >= {FUZZY_MIN_COUNT}
),
vars AS (
    SELECT word, c,
           unnest(list_distinct(list_prepend(word, list_transform(
               range(1, length(word) + 1),
               i -> substr(word, 1, i - 1) || substr(word, i + 1, length(word))
           )))) AS variant
    FROM vocab
),
cand AS (
    SELECT DISTINCT a.word AS word_a, b.word AS word_b,
           any_value(a.c) AS cnt_a, any_value(b.c) AS cnt_b
    FROM vars a JOIN vars b ON a.variant = b.variant AND a.word < b.word
    GROUP BY a.word, b.word
)
SELECT word_a, word_b, cnt_a, cnt_b
FROM cand
WHERE levenshtein(word_a, word_b) = 1
""",
    tags=("text_analysis", "fuzzy", "scale"),
)
def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy vocabulary matching at edit distance 1 (typo/variant
    detection — the generalization of the reference's hand-written
    AI → 인공지능 normalization, ``preprocessing.py:227-235``'s spirit)
    via the SymSpell deletion-neighborhood trick: every word emits its
    |w| single-deletion variants, candidate pairs are an EQUI-JOIN on the
    variant key, and only candidates pay the Levenshtein verification.
    The quadratic vocab x vocab cross never happens — candidate
    generation is one hash join on short strings, the scale-correct
    fuzzy-match shape."""
    d = _docs(spark, sf_dir)
    vocab = (
        d.select(F.explode(TX.word_tokens("text")).alias("word"))
        .filter(F.length("word") >= FUZZY_MIN_LEN)
        .groupBy("word")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= FUZZY_MIN_COUNT)
    )
    return fuzzy_pairs_from_vocab(vocab)


def fuzzy_pairs_from_vocab(vocab: DataFrame) -> DataFrame:
    """The deletion-neighborhood join over any (word, c) vocabulary —
    exposed separately so planted-typo fixtures can exercise the pair
    finding directly (the driver's synthetic vocabulary contains no
    natural edit-distance-1 neighbors)."""
    vars_ = vocab.select(
        "word",
        "c",
        # SymSpell neighborhood = the word itself (distance 0) plus its
        # single deletions — the self entry is what lets pure-insertion
        # pairs (hash vs hashs) meet on a shared key
        F.explode(
            F.array_distinct(
                F.expr(
                    "concat(array(word), "
                    "transform(sequence(1, length(word)), "
                    "i -> concat(substring(word, 1, i - 1), "
                    "substring(word, i + 1, length(word)))))"
                )
            )
        ).alias("variant"),
    )
    a = vars_.select(
        F.col("word").alias("word_a"), F.col("c").alias("cnt_a"), "variant"
    )
    b = vars_.select(
        F.col("word").alias("word_b"), F.col("c").alias("cnt_b"), "variant"
    )
    cand = (
        a.join(b, "variant")
        .filter(F.col("word_a") < F.col("word_b"))
        .select("word_a", "word_b", "cnt_a", "cnt_b")
        .distinct()
    )
    return cand.filter(F.levenshtein("word_a", "word_b") == 1)


# ------------------------------------------------- n-gram LM perplexity

LM_ADD_K = 1  # Laplace smoothing: (cab + 1) / (ctx + V) is pure-integer


def _doc_bigram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, a, b) adjacent-token pairs for every document — memoized
    and persisted because the LM trains on it AND scores with it (two
    consumers, one corpus-sized explode)."""
    from ..cache import memo

    def build() -> DataFrame:
        d = _docs(spark, sf_dir)
        toks = d.select("doc_id", TX.word_tokens("text").alias("toks"))
        return (
            toks.select(
                "doc_id",
                F.explode(
                    F.filter(
                        F.transform(
                            "toks",
                            lambda t, i: F.when(
                                i < F.size("toks") - 1,
                                F.struct(
                                    t.alias("a"),
                                    F.element_at("toks", i + 2).alias("b"),
                                ),
                            ),
                        ),
                        lambda x: x.isNotNull(),
                    )
                ).alias("p"),
            )
            .select("doc_id", "p.a", "p.b")
        )

    return memo(spark, ("doc_bigram_pairs", sf_dir), build, persist=True)


@register(
    "ngram_lm_perplexity",
    sql=f"""
WITH t AS ({_SQL_WORD_TOKS}),
pair AS (
    SELECT doc_id,
           split_part(bigram, ' ', 1) AS a,
           split_part(bigram, ' ', 2) AS b
    FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM t
    )
),
bmodel AS (SELECT a, b, count(*) AS cab FROM pair GROUP BY a, b),
ctx AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM bmodel GROUP BY a),
vocab AS (
    SELECT count(DISTINCT word) AS v
    FROM (SELECT unnest(toks) AS word FROM t)
),
model AS (
    SELECT m.a, m.b, ln((m.cab + {LM_ADD_K}) * 1.0 / (c.ca + vb.v)) AS logp
    FROM bmodel m JOIN ctx c ON c.a = m.a CROSS JOIN vocab vb
)
SELECT p.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(sum(md.logp) / count(*), 6) AS avg_logp,
       round(exp(-sum(md.logp) / count(*)), 6) AS perplexity
FROM pair p JOIN model md ON md.a = p.a AND md.b = p.b
GROUP BY p.doc_id
""",
    tags=("text_analysis", "quality", "curation", "scale"),
)
def q_ngram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-perplexity quality signal (the CCNet/Gopher curation pillar the
    heuristic gate and the trained classifier don't cover): train a
    Laplace-smoothed bigram LM on the corpus itself, then score each doc's
    per-bigram average log-prob and perplexity. High perplexity = text
    unlike the corpus (noise, wrong language, garbled encoding); docs with
    fewer than 2 tokens emit no bigrams and are absent by definition.

    Scale shape: the model is vocabulary-bounded — context totals and the
    vocab scalar fold INTO the (a, b) model table (model-sized joins), so
    per-pair log-probs are precomputed once and scoring is ONE shuffle
    join of the memoized pair table against the model on its natural
    (a, b) key plus a doc_id rollup. Laplace (+1) keeps every probability
    a ratio of integers, so both engines compute ln() of identical
    doubles; the only fp nondeterminism is the per-doc summation order,
    absorbed by the 6-dp rounds."""
    pairs = _doc_bigram_pairs(spark, sf_dir)
    bmodel = pairs.groupBy("a", "b").agg(F.count("*").alias("cab"))
    ctx = bmodel.groupBy("a").agg(F.sum("cab").alias("ca"))
    # the Laplace V is a corpus constant (one row) that cannot be derived
    # from the pair table (single-token docs and final tokens are absent
    # there) — memoized+persisted so only the FIRST scoring call per
    # session pays the vocabulary scan; un-memoized, every call
    # re-tokenized the whole corpus for one integer (guide §1.2 step 1)
    from ..cache import memo

    vocab = memo(
        spark,
        ("lm_vocab_size", sf_dir),
        lambda: _docs(spark, sf_dir)
        .select(F.explode(TX.word_tokens("text")).alias("w"))
        .agg(F.countDistinct("w").alias("v")),
        persist=True,
    )
    model = (
        bmodel.join(ctx, "a")
        .crossJoin(F.broadcast(vocab))
        .select(
            "a",
            "b",
            F.log(
                (F.col("cab") + F.lit(LM_ADD_K)) / (F.col("ca") + F.col("v"))
            ).alias("logp"),
        )
    )
    return (
        pairs.join(model, ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum("logp") / F.count("*"), 6).alias("avg_logp"),
            F.round(F.exp(-F.sum("logp") / F.count("*")), 6).alias("perplexity"),
        )
    )


# ------------------------------------- CCNet-style perplexity bucketing


def _ccnet_sql() -> str:
    from ..registry import REGISTRY

    ppl = REGISTRY["ngram_lm_perplexity"].sql
    lid = REGISTRY["langid_heuristic"].sql
    return f"""
WITH ppl AS ({ppl}),
lid AS ({lid}),
j AS (
    SELECT lid.predicted AS lang_pred, p.doc_id, p.perplexity
    FROM ppl p JOIN lid ON lid.doc_id = p.doc_id
),
t AS (
    SELECT lang_pred, perplexity,
           ntile(3) OVER (PARTITION BY lang_pred
                          ORDER BY perplexity, doc_id) AS tercile
    FROM j
)
SELECT lang_pred,
       CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(perplexity), 6) AS mean_ppl,
       round(max(perplexity), 6) AS max_ppl
FROM t GROUP BY lang_pred, bucket
"""


@register(
    "ccnet_ppl_buckets",
    sql=_ccnet_sql(),
    tags=("text_analysis", "quality", "curation"),
)
def q_ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split: per predicted language, rank docs
    by LM perplexity and cut into terciles — 'head' (most corpus-like) is
    what CCNet ships to training, 'tail' is review-or-drop. Composes the
    two registered, individually exact-oracled signals (the langid
    heuristic and the bigram-LM perplexity); docs too short to emit a
    bigram are absent from the LM signal and therefore unbucketed,
    identically in both engines.

    Scale shape: the join is doc-keyed; the ntile window partitions by
    language — per-language sorts, the same partitioning CCNet shards
    by in production. The rank key is the 6-dp-rounded perplexity (both
    engines hold identical doubles) with doc_id tiebreak, so tercile
    boundaries are deterministic."""
    ppl = q_ngram_lm_perplexity(spark, sf_dir).select("doc_id", "perplexity")
    lid = q_langid_heuristic(spark, sf_dir).select(
        "doc_id", F.col("predicted").alias("lang_pred")
    )
    j = ppl.join(lid, "doc_id")
    w = Window.partitionBy("lang_pred").orderBy("perplexity", "doc_id")
    t = j.withColumn("tercile", F.ntile(3).over(w))
    bucket = (
        F.when(F.col("tercile") == 1, "head")
        .when(F.col("tercile") == 2, "middle")
        .otherwise("tail")
    )
    return (
        t.withColumn("bucket", bucket)
        .groupBy("lang_pred", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.avg("perplexity"), 6).alias("mean_ppl"),
            F.round(F.max("perplexity"), 6).alias("max_ppl"),
        )
    )
