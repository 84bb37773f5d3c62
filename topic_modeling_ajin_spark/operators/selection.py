"""Data-selection operators: choosing WHICH documents feed a training run.

Beyond-reference surface (the reference analyzes one fixed 5k-row crawl,
``preprocessing.py:344-356``; at 100 TB the corpus is assembled, not
given): per-domain caps (C4/RefinedWeb-style anti-domination), DSIR
importance resampling (Xie et al., "Data Selection for Language Models
via Importance Resampling", NeurIPS 2023 — hashed-ngram importance
weights toward a target domain), and the pairwise source-level
Jensen-Shannon divergence matrix a mixture designer reads before setting
``mixture_plan`` rates.

Everything is deterministic (md5-keyed hashing and Gumbel noise, no RNG
state) so every op has an exact DuckDB oracle; all per-token math stays
in column expressions — no Python in the hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..registry import REGISTRY, register
from ..sources import load_table, parallelized

# importing text_analysis registers quality_score, whose SQL the domain-cap
# oracle embeds verbatim (so the oracle-gate CTE cache reuses it)
from . import text_analysis as TA


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parallelized(load_table(spark, sf_dir, "documents"))


# shared tokenizer fragment — the canonical per-engine pair lives in
# functions/text.py (word_tokens / SQL_WORD_TOKENS_EXPR)
_SQL_TOKS = f"""
SELECT doc_id, lang, source,
       {TX.SQL_WORD_TOKENS_EXPR} AS toks
FROM documents
"""


# canonical md5-u32 pair lives in functions/hashing.py — one definition
# per engine so the hash convention can never diverge between modules
from ..functions.hashing import md5_base32 as _md5_u32  # noqa: E402
from ..functions.hashing import sql_md5_base32 as _md5_u32_sql  # noqa: E402


# ------------------------------------------------------------- domain caps

DOMAIN_CAP = 15  # max docs shipped per source


@register(
    "domain_cap_sample",
    sql=f"""
WITH q AS (
    SELECT m.doc_id, d.source, m.quality
    FROM ({REGISTRY["quality_score"].sql}) m
    JOIN documents d ON d.doc_id = m.doc_id
),
r AS (
    SELECT doc_id, source, quality,
           row_number() OVER (PARTITION BY source
                              ORDER BY quality DESC, doc_id) AS rk
    FROM q
)
SELECT doc_id, source, quality, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {DOMAIN_CAP}
""",
    tags=("selection", "curation", "scale"),
)
def q_domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap — the C4/RefinedWeb anti-domination step: a
    crawl where one site contributes half the corpus must not contribute
    half the training set. Keeps the top-{DOMAIN_CAP} docs per source by
    (quality DESC, doc_id) using the registered heuristic quality score,
    so the cap prefers the best of each domain rather than a random
    subset.

    Scale shape: one quality projection (pure column expressions) and ONE
    rank window partitioned by source. The window's per-domain sort is the
    honest cost; a pathologically hot domain (half the corpus behind one
    partition key) is the known skew case — there the two-phase variant
    applies (per-salt top-{DOMAIN_CAP} first, then a {DOMAIN_CAP}·n_salts
    re-rank), which composes from this same definition. Output is bounded
    by {DOMAIN_CAP} x n_domains regardless of corpus size."""
    e = TA.quality_exprs()
    q = _docs(spark, sf_dir).select(
        "doc_id", "source", F.round(e["quality"], 6).alias("quality")
    )
    w = Window.partitionBy("source").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        q.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= DOMAIN_CAP)
        .select("doc_id", "source", "quality", "rk")
    )


DOMAIN_CAP_SALTS = 8  # phase-1 parallelism of the salted variant


@register(
    "domain_cap_salted",
    sql=f"""
WITH q AS (
    SELECT m.doc_id, d.source, m.quality
    FROM ({REGISTRY["quality_score"].sql}) m
    JOIN documents d ON d.doc_id = m.doc_id
),
r AS (
    SELECT doc_id, source, quality,
           row_number() OVER (PARTITION BY source
                              ORDER BY quality DESC, doc_id) AS rk
    FROM q
)
SELECT doc_id, source, quality, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {DOMAIN_CAP}
""",
    tags=("selection", "curation", "scale"),
)
def q_domain_cap_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-domain-safe twin of ``domain_cap_sample``: identical output
    (the oracle IS the single-window definition), different physical plan.
    Phase 1 ranks within (source, doc_id % {DOMAIN_CAP_SALTS}) — a domain
    holding half the corpus sorts as {DOMAIN_CAP_SALTS} bounded partitions
    instead of one giant one — and keeps each salt-group's top-{DOMAIN_CAP}.
    Phase 2 re-ranks only the survivors (<= {DOMAIN_CAP} x
    {DOMAIN_CAP_SALTS} rows per source). Exact by dominance: every global
    top-{DOMAIN_CAP} doc is also in its salt-group's top-{DOMAIN_CAP}, and
    every doc ranked above a survivor survives too, so phase-2 ranks equal
    the global ranks. Parity with the one-window variant is pinned in
    tests."""
    e = TA.quality_exprs()
    q = _docs(spark, sf_dir).select(
        "doc_id", "source", F.round(e["quality"], 6).alias("quality")
    )
    salt = (F.col("doc_id") % DOMAIN_CAP_SALTS).alias("salt")
    w1 = Window.partitionBy("source", "salt").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    survivors = (
        q.withColumn("salt", salt)
        .withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= DOMAIN_CAP)
    )
    w2 = Window.partitionBy("source").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        survivors.withColumn("rk", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rk") <= DOMAIN_CAP)
        .select("doc_id", "source", "quality", "rk")
    )


# --------------------------------------------- DSIR importance resampling

DSIR_BUCKETS = 256  # hashed-ngram feature buckets (paper: 10k at web scale)
DSIR_TARGET_LANG = "en"  # stand-in target domain: the English slice
DSIR_SELECT_K = 100  # docs kept by the Gumbel top-k resample


# (doc_id, lang, bucket): one row per unigram+bigram occurrence, hashed
# into {DSIR_BUCKETS} md5 buckets. Shared by the weights and both corpus
# distributions.
_SQL_DSIR_FEATS = f"""
SELECT doc_id, lang,
       CAST(({_md5_u32_sql("f")}) % {DSIR_BUCKETS} AS BIGINT) AS bucket
FROM (
    SELECT doc_id, lang,
           unnest(list_concat(
               toks,
               list_transform(generate_series(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i + 1])
           )) AS f
    FROM ({_SQL_TOKS})
)
"""

_SQL_DSIR_LOGW = f"""
WITH feats AS ({_SQL_DSIR_FEATS}),
raw AS (SELECT bucket, count(*) AS craw FROM feats GROUP BY bucket),
tgt AS (SELECT bucket, count(*) AS ctgt FROM feats
        WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY bucket),
tots AS (
    SELECT (SELECT count(*) FROM feats) AS traw,
           (SELECT count(*) FROM feats WHERE lang = '{DSIR_TARGET_LANG}') AS ttgt
),
w AS (
    SELECT r.bucket,
           ln((coalesce(t.ctgt, 0) + 1) * 1.0 / (tots.ttgt + {DSIR_BUCKETS}))
         - ln((r.craw + 1) * 1.0 / (tots.traw + {DSIR_BUCKETS})) AS lw
    FROM raw r LEFT JOIN tgt t ON t.bucket = r.bucket CROSS JOIN tots
)
SELECT f.doc_id,
       CAST(count(*) AS BIGINT) AS n_feats,
       round(sum(w.lw), 6) AS log_w
FROM feats f JOIN w ON w.bucket = f.bucket
GROUP BY f.doc_id
"""


def _dsir_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, bucket) hashed-feature occurrences, memoized+persisted:
    the raw distribution, the target distribution, and the per-doc scoring
    join all rescan it."""
    from ..cache import memo

    def build():
        d = _docs(spark, sf_dir)
        toks = TX.word_tokens("text")
        # guard: F.sequence(0, -1) would step DOWN to [0, -1], not empty
        bigrams = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat(
                    F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array_repeat(F.lit(""), 0))
        feats = F.concat(toks, bigrams)
        return d.select(
            "doc_id", "lang", F.explode(feats).alias("f")
        ).select(
            "doc_id", "lang", (_md5_u32(F.col("f")) % DSIR_BUCKETS).alias("bucket")
        )

    return memo(spark, ("dsir_feats", sf_dir), build, persist=True)


def dsir_logweights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc DSIR log importance weight (unrounded): sum over the doc's
    hashed-ngram occurrences of ln p_target(bucket) - ln p_raw(bucket),
    both Laplace-smoothed over {DSIR_BUCKETS} buckets."""
    feats = _dsir_feats(spark, sf_dir)

    # bucket-weight table: <= {DSIR_BUCKETS} rows, broadcast into scoring.
    # Memoized+persisted — it is a corpus constant shared by three
    # registered faces (logweights, select, curated_select), and built in
    # ONE aggregation pass: raw and target counts fold into a single
    # groupBy (a bucket with no target rows yields ctgt = 0, exactly the
    # old left-join's coalesce(ctgt, 0)), and the totals are the sums of
    # that {DSIR_BUCKETS}-bounded table — the previous raw/tgt/tots trio
    # re-scanned the feature table three times per call (guide §1.2
    # step 1 / §2.3).
    from ..cache import memo

    def build_w() -> DataFrame:
        bc = feats.groupBy("bucket").agg(
            F.count("*").alias("craw"),
            F.sum(
                F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
            ).alias("ctgt"),
        )
        tots = bc.agg(
            F.sum("craw").alias("traw"), F.sum("ctgt").alias("ttgt")
        )
        return bc.crossJoin(F.broadcast(tots)).select(
            "bucket",
            (
                F.log(
                    (F.col("ctgt") + 1)
                    / (F.col("ttgt") + F.lit(DSIR_BUCKETS))
                )
                - F.log(
                    (F.col("craw") + 1) / (F.col("traw") + F.lit(DSIR_BUCKETS))
                )
            ).alias("lw"),
        )

    w = memo(spark, ("dsir_bucket_weights", sf_dir), build_w, persist=True)
    return (
        feats.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_feats"), F.sum("lw").alias("log_w_raw"))
    )


@register(
    "dsir_logweights",
    sql=_SQL_DSIR_LOGW,
    tags=("selection", "curation", "scale"),
)
def q_dsir_logweights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) importance weights: how much more likely is
    this document under the target domain's hashed-ngram distribution
    than under the raw corpus's? The target here is the corpus's
    '{DSIR_TARGET_LANG}' slice (the stand-in for "high-quality in-domain
    text"); features are unigrams+bigrams md5-hashed into {DSIR_BUCKETS}
    buckets, both distributions Laplace-smoothed so every probability is
    a ratio of integers — both engines take ln() of identical doubles.

    Scale shape: the feature table is the one corpus-scaled object (one
    tokenize pass, memoized+persisted); the two distributions are
    {DSIR_BUCKETS}-bounded map-side-combined counts; scoring is a
    broadcast join of the {DSIR_BUCKETS}-row weight table + one doc_id
    rollup. Nothing quadratic, nothing driver-side."""
    d = dsir_logweights(spark, sf_dir)
    return d.select(
        "doc_id",
        F.col("n_feats").cast("bigint").alias("n_feats"),
        F.round("log_w_raw", 6).alias("log_w"),
    )


@register(
    "dsir_select",
    sql=f"""
WITH lw AS ({_SQL_DSIR_LOGW}),
g AS (
    SELECT doc_id, n_feats, log_w,
           log_w - ln(-ln((({_md5_u32_sql("'dsir' || CAST(doc_id AS VARCHAR)")}) + 0.5)
                          / 4294967296.0)) AS score
    FROM lw
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk,
       doc_id, n_feats, log_w, round(score, 6) AS score
FROM g
QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= {DSIR_SELECT_K}
""",
    tags=("selection", "curation", "scale"),
)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's resampling step: Gumbel top-k over the importance weights —
    equivalent to sampling {DSIR_SELECT_K} docs without replacement with
    probability proportional to their importance weight. The Gumbel noise
    is md5-derived from doc_id (u = (md5_u32 + 0.5) / 2^32, g = -ln(-ln u)),
    so the draw is deterministic and both engines rank IDENTICAL doubles:
    the 6-dp-rounded log_w plus a noise term computed from the same
    integer hash.

    Scale shape: the score is a column expression over the per-doc weight
    rollup; the global top-k runs as TakeOrderedAndProject (orderBy+limit,
    never a full sort), and only the {DSIR_SELECT_K} survivors pay the
    single-partition rank window."""
    lw = q_dsir_logweights(spark, sf_dir)
    u = (
        _md5_u32(F.concat(F.lit("dsir"), F.col("doc_id").cast("string")))
        + 0.5
    ) / F.lit(4294967296.0)
    g = lw.withColumn("score", F.col("log_w") - F.log(-F.log(u)))
    topk = g.orderBy(F.desc("score"), F.asc("doc_id")).limit(DSIR_SELECT_K)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        F.row_number().over(w).cast("bigint").alias("rk"),
        "doc_id",
        "n_feats",
        "log_w",
        F.round("score", 6).alias("score"),
    )


# ------------------------------------- pairwise source JS-divergence matrix

JS_VOCAB = 500  # global vocabulary bound (renormalized per source)


@register(
    "source_js_divergence",
    sql=f"""
WITH tw AS (
    SELECT source, word FROM (
        SELECT source, unnest(toks) AS word FROM ({_SQL_TOKS})
    ) WHERE length(word) >= 2
),
vocab AS (
    SELECT word FROM (
        SELECT word, count(*) AS tot FROM tw GROUP BY word
        ORDER BY tot DESC, word LIMIT {JS_VOCAB}
    )
),
cw AS (
    SELECT t.source, t.word, count(*) AS c
    FROM tw t JOIN vocab v ON v.word = t.word
    GROUP BY t.source, t.word
),
tots AS (SELECT source, sum(c) AS t FROM cw GROUP BY source),
p AS (
    SELECT cw.source, cw.word, cw.c * 1.0 / tots.t AS p
    FROM cw JOIN tots ON tots.source = cw.source
),
shared AS (
    SELECT a.source AS s1, b.source AS s2,
           count(*) AS n_shared,
           sum(a.p) AS spa, sum(b.p) AS spb,
           sum(a.p * ln(2 * a.p / (a.p + b.p))) AS ka,
           sum(b.p * ln(2 * b.p / (a.p + b.p))) AS kb
    FROM p a JOIN p b ON b.word = a.word AND a.source < b.source
    GROUP BY a.source, b.source
)
SELECT x.source AS s1, y.source AS s2,
       CAST(coalesce(sh.n_shared, 0) AS BIGINT) AS n_shared,
       round(0.5 * (coalesce(sh.ka, 0) + (1 - coalesce(sh.spa, 0)) * ln(2))
           + 0.5 * (coalesce(sh.kb, 0) + (1 - coalesce(sh.spb, 0)) * ln(2)),
             6) AS jsd
FROM tots x JOIN tots y ON x.source < y.source
LEFT JOIN shared sh ON sh.s1 = x.source AND sh.s2 = y.source
""",
    tags=("selection", "drift", "scale"),
)
def q_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between per-source word
    distributions — the matrix a mixture designer reads before setting
    ``mixture_plan`` rates (two sources with JSD ~ 0 are redundant; a
    source far from every other adds coverage). Distributions are over
    the global top-{JS_VOCAB} vocabulary, renormalized per source; words
    one source lacks contribute their missing mass at the ln 2 ceiling
    (the closed form of the zero-side KL terms), so no dense vocab x
    source materialization and no full outer join.

    Scale shape: ONE map-side-combined (source, word) count is the only
    corpus-scaled pass (memoized+persisted — the global vocab and the
    per-source distributions both derive from it); everything after is
    bounded by {JS_VOCAB} x n_sources (the per-pair stage is the inherent
    O(V * S^2) of a pairwise matrix, like the topic-similarity matrix —
    at thousands of sources you shard the pair grid, not this plan).
    Sums of p*ln(ratio-of-integer-ratios) with the 6-dp round absorbing
    summation order, the established cross-engine convention."""
    from ..cache import memo

    swc = memo(
        spark,
        ("source_word_counts", sf_dir),
        lambda: _docs(spark, sf_dir)
        .select("source", F.explode(TX.word_tokens("text")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("source", "word")
        .agg(F.count("*").alias("c")),
        persist=True,
    )
    # the renormalized per-source distribution and its totals are
    # corpus constants bounded by {JS_VOCAB} x n_sources / n_sources
    # rows — memoized+persisted (the dsir_bucket_weights discipline) so
    # a repeated call re-runs only the pair grid, not the vocabulary
    # TakeOrdered + the two distribution joins with their broadcast
    # builds; the headliner carries a bench cold entry
    def build_p() -> tuple:
        vocab = (
            swc.groupBy("word")
            .agg(F.sum("c").alias("tot"))
            .orderBy(F.desc("tot"), F.asc("word"))
            .limit(JS_VOCAB)
            .select("word")
        )
        cw = swc.join(F.broadcast(vocab), "word")
        tots = cw.groupBy("source").agg(F.sum("c").alias("t"))
        p = cw.join(tots, "source").select(
            "source", "word", (F.col("c") / F.col("t")).alias("p")
        )
        return p.persist(), tots.persist()

    p, tots = memo(spark, ("source_js_p", sf_dir), build_p)
    a, b = p.alias("a"), p.alias("b")
    pa, pb = F.col("a.p"), F.col("b.p")
    shared = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("s1"), F.col("b.source").alias("s2")
        )
        .agg(
            F.count("*").alias("n_shared"),
            F.sum(pa).alias("spa"),
            F.sum(pb).alias("spb"),
            F.sum(pa * F.log(2 * pa / (pa + pb))).alias("ka"),
            F.sum(pb * F.log(2 * pb / (pa + pb))).alias("kb"),
        )
    )
    x, y = tots.alias("x"), tots.alias("y")
    base = x.join(y, F.col("x.source") < F.col("y.source")).select(
        F.col("x.source").alias("s1"), F.col("y.source").alias("s2")
    )
    ln2 = math.log(2.0)
    z = F.lit(0.0)
    return base.join(shared, ["s1", "s2"], "left").select(
        "s1",
        "s2",
        F.coalesce(F.col("n_shared"), F.lit(0)).cast("bigint").alias("n_shared"),
        F.round(
            0.5 * (F.coalesce(F.col("ka"), z) + (1 - F.coalesce(F.col("spa"), z)) * ln2)
            + 0.5
            * (F.coalesce(F.col("kb"), z) + (1 - F.coalesce(F.col("spb"), z)) * ln2),
            6,
        ).alias("jsd"),
    )


def _curated_dsir_sql() -> str:
    # late-bound: the manifest registers in curation.py, which imports
    # after this module in load_all order — so resolve at call time and
    # register this query from curation.py's module tail instead of here
    from ..registry import REGISTRY

    lw = REGISTRY["dsir_logweights"].sql
    manifest = REGISTRY["training_corpus_manifest"].sql
    return f"""
WITH lw AS ({lw}),
m AS ({manifest}),
g AS (
    SELECT m.doc_id, m.lang, m.quality, m.n_bpe_tokens, lw.log_w,
           lw.log_w - ln(-ln((({_md5_u32_sql("'dsir' || CAST(m.doc_id AS VARCHAR)")}) + 0.5)
                          / 4294967296.0)) AS score
    FROM m JOIN lw ON lw.doc_id = m.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk,
       doc_id, lang, quality, n_bpe_tokens, log_w, round(score, 6) AS score
FROM g
QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= {DSIR_SELECT_K}
"""


def q_curated_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curate THEN select — the order a real pipeline ships: restrict the
    DSIR Gumbel top-{DSIR_SELECT_K} to documents that survived the full
    curation manifest (rule stack, exact/near/semantic dedup, mixture),
    carrying the manifest's lang/quality/BPE-token columns so the output
    IS a training-set spec. Composes the two registered chains verbatim;
    the top-k is TakeOrderedAndProject over the (tiny) curated join."""
    from .curation import q_training_corpus_manifest

    return curated_dsir_from_tables(
        q_training_corpus_manifest(spark, sf_dir),
        q_dsir_logweights(spark, sf_dir),
    )


def curated_dsir_from_tables(
    manifest: DataFrame, logweights: DataFrame, k: int = DSIR_SELECT_K
) -> DataFrame:
    """The curate-then-select join/score/top-k over ALREADY-BUILT
    manifest and DSIR-logweight tables — the stage the materialized
    pipeline (``run_curation_pipeline(select=True)``) runs against its
    parquet outputs, and the single source of the Gumbel-score
    expression for both the one-query and staged paths (parity pinned in
    tests). Inputs are manifest-sized; the top-k is
    TakeOrderedAndProject."""
    u = (
        _md5_u32(F.concat(F.lit("dsir"), F.col("doc_id").cast("string")))
        + 0.5
    ) / F.lit(4294967296.0)
    g = manifest.join(logweights.select("doc_id", "log_w"), "doc_id").withColumn(
        "score", F.col("log_w") - F.log(-F.log(u))
    )
    topk = g.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        F.row_number().over(w).cast("bigint").alias("rk"),
        "doc_id",
        "lang",
        "quality",
        "n_bpe_tokens",
        "log_w",
        F.round("score", 6).alias("score"),
    )


@register(
    "doc_length_percentiles_by_source",
    sql=f"""
WITH t AS ({_SQL_TOKS}),
n AS (SELECT source, CAST(length(toks) AS BIGINT) AS n FROM t)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(n, 0.25), 6) AS p25,
       round(quantile_cont(n, 0.50), 6) AS p50,
       round(quantile_cont(n, 0.75), 6) AS p75,
       round(quantile_cont(n, 0.95), 6) AS p95,
       round(sum(n) * 1.0 / count(*), 6) AS mean_tokens
FROM n GROUP BY source
""",
    tags=("selection", "curation", "eval"),
)
def q_doc_length_percentiles_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact interpolated token-length percentiles per source — the
    length-distribution table that sizes ``pack_sequences``' budget and
    exposes sources whose docs straddle pack boundaries (a source with
    p95 >> PACK_BUDGET wastes slots to truncation; one with p50 << it
    packs many docs per sequence). Percentiles are exact here to match
    the oracle (Spark ``percentile`` == DuckDB ``quantile_cont`` on
    integer lengths); at 100 TB swap to approx_percentile (t-digest),
    the documented trade everywhere exact percentiles appear. One
    tokenize pass; everything after is source-bounded."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.size(TX.word_tokens("text")).cast("bigint").alias("n")
    )
    return d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.expr("percentile(n, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(n, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(n, 0.75)"), 6).alias("p75"),
        F.round(F.expr("percentile(n, 0.95)"), 6).alias("p95"),
        F.round(F.sum("n") * F.lit(1.0) / F.count("*"), 6).alias(
            "mean_tokens"
        ),
    )
