"""Deterministic distributed PLSA — an exact-oracle topic model.

The reference's topic models are library calls (gensim LDA,
``LDA_Analysis.py:264-276``; BERTopic, ``BERTopic_Analysis.py:329-373``),
whose sampling/BLAS internals make cross-library results incomparable —
the MLlib LDA queries are therefore rows-only by design (SURVEY §4).
This module adds the missing piece: a topic model whose every number the
DuckDB oracle reproduces. PLSA (Hofmann 1999) is the EM precursor of LDA
— same (topic | doc) / (word | topic) factorization, no Dirichlet priors —
and its EM updates are pure multiply/normalize arithmetic: no sampling, no
digamma, no library.

Determinism recipe (as ``operators.clustering``):
- init: φ₀(w|z) ∝ 1 + ((md5₃₂(word) + z) mod 13) — portable integer hash,
  bit-identical on both engines; θ₀(z|d) = 1/K exactly;
- E-step responsibilities stay raw (engines differ ~1e-15 in the K-sum
  denominators); M-step posteriors round at 6 dp after their normalizing
  divisions (structure-free digits). 6, not 9: the outputs re-round at
  6 dp, and re-rounding a 9 dp decimal at 6 dp hits an exact decimal tie
  with ~1e-3 probability per value — which Spark (shortest-string
  BigDecimal, HALF_UP) and DuckDB (scaled float) resolve differently.
  At 6 dp the output rounding is the identity and the tie class vanishes;
- fixed iteration count.

Scale shape per iteration: the E-step joins the (doc, word, n) count table
with φ (K×V — broadcast) and θ (co-partitioned on doc_id); the M-step is
two aggregations — (z, word) for φ and (doc, z) for θ. θ never leaves the
cluster; φ is vocabulary-bounded. This is the textbook distributed-EM
layout, all expressed as DataFrame algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import memo
from ..functions.joins import vocab_broadcast
from ..registry import register
from ..sources import load_table

PLSA_K = 5
PLSA_ITERS = 3
PLSA_TOP_WORDS = 5
_ROUND = 6

# DuckDB twin of functions.hashing.md5_base32 for the 'word' column
_SQL_H32 = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(word), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)


def _counts(spark: SparkSession, sf_dir: str, mod: int | None = None) -> DataFrame:
    """(doc_id, word, n) bag-of-words counts — SURVEY M1's corpus.

    ``mod`` keeps every doc with ``doc_id % mod == 0`` — the deterministic
    subsample the K-sweep trains on (model selection runs on a sample at
    any scale; the chosen K is then fit on the full corpus)."""
    from .frequency import tokenized_words

    def build():
        d = load_table(spark, sf_dir, "documents")
        if mod:
            d = d.filter(F.col("doc_id") % mod == 0)
        return (
            tokenized_words(d)
            .groupBy("doc_id", "word")
            .agg(F.count("*").cast("double").alias("n"))
        )

    return memo(spark, ("plsa_counts", sf_dir, mod), build, persist=True)


def _fit(spark: SparkSession, sf_dir: str, k: int = PLSA_K, mod: int | None = None):
    """Returns (phi, theta) DataFrames after {PLSA_ITERS} EM rounds:
    phi(z, word, phi), theta(doc_id, z, theta)."""
    from ..functions.hashing import md5_base32

    def build():
        c = _counts(spark, sf_dir, mod)
        zs = spark.range(k).select(F.col("id").cast("int").alias("z"))

        vocab = c.select("word").distinct()
        g = vocab.crossJoin(F.broadcast(zs)).select(
            "z",
            "word",
            (1.0 + (md5_base32(F.col("word")) + F.col("z")) % 13).alias("g"),
        )
        # integer-valued g summed over an integer-exact range: the
        # normalization is bit-identical on both engines without rounding
        phi = g.select(
            "z",
            "word",
            (F.col("g") / F.sum("g").over(Window.partitionBy("z"))).alias("phi"),
        )
        theta = (
            c.select("doc_id")
            .distinct()
            .crossJoin(F.broadcast(zs))
            .select("doc_id", "z", F.lit(1.0 / k).alias("theta"))
        )

        prev_cached: list[DataFrame] = []
        for _ in range(PLSA_ITERS):
            # phi is K x |V| — vocab-sized, corpus-unbounded — so the
            # hint is size-aware (vocab_broadcast, r10 verdict task 1):
            # each round's phi is persisted below, making the count a
            # cache scan; past the cap the E-step degrades to a linear
            # shuffle join on word (production PLSA also df-prunes the
            # vocabulary upstream, doc_frequency_pruning)
            num = (
                c.join(vocab_broadcast(phi), "word")
                .join(theta, ["doc_id", "z"])
                .select(
                    "doc_id",
                    "word",
                    "z",
                    "n",
                    (F.col("phi") * F.col("theta")).alias("num"),
                )
            )
            r = num.select(
                "doc_id",
                "word",
                "z",
                (
                    F.col("n")
                    * F.col("num")
                    / F.sum("num").over(Window.partitionBy("doc_id", "word"))
                ).alias("nr"),
            )
            sz = Window.partitionBy("z")
            phi = (
                r.groupBy("z", "word")
                .agg(F.sum("nr").alias("s"))
                .select(
                    "z",
                    "word",
                    F.round(F.col("s") / F.sum("s").over(sz), _ROUND).alias("phi"),
                )
            )
            sd = Window.partitionBy("doc_id")
            theta = (
                r.groupBy("doc_id", "z")
                .agg(F.sum("nr").alias("s"))
                .select(
                    "doc_id",
                    "z",
                    F.round(F.col("s") / F.sum("s").over(sd), _ROUND).alias(
                        "theta"
                    ),
                )
            )
            # cut the EM lineage per round: phi is K×V, θ is doc-count-sized
            # but slim (doc, z, value) — persisting both keeps each round's
            # plan one join deep instead of stacking all previous rounds.
            # Materialize eagerly, then release the PREVIOUS round's cache:
            # unlike RDD checkpoint blocks, DataFrame caches are never
            # GC-cleaned, and only the final pair is memoized — without this
            # every round of every sweep K would stay in executor storage.
            phi = phi.persist()
            theta = theta.persist()
            phi.count()
            theta.count()
            for old in prev_cached:
                old.unpersist()
            prev_cached = [phi, theta]
        return (phi, theta)

    return memo(spark, ("plsa_fit", sf_dir, k, mod), build)


def _sql_counts(mod: int | None = None) -> str:
    where = f"WHERE doc_id % {mod} = 0" if mod else ""
    return rf"""
toks AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '\s+')) AS word
    FROM documents {where}
),
counts AS MATERIALIZED (
    SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS n
    FROM toks WHERE length(word) >= 2
    GROUP BY doc_id, word
)"""


_SQL_COUNTS = _sql_counts()


def _sql_plsa(iters: int, k: int = PLSA_K, sfx: str = "") -> str:
    """Unrolled EM CTEs; produces phi{iters}{sfx} (z, word, phi) and
    theta{iters}{sfx} (doc_id, z, theta). ``sfx`` namespaces the CTEs so a
    K-sweep can unroll several fits in one statement; the shared ``toks``/
    ``counts`` CTEs are emitted only for the unsuffixed fit (callers of a
    suffixed fit emit them once, first)."""
    parts = []
    if not sfx:
        parts.append(_SQL_COUNTS)
    parts.append(
        rf"""
zs{sfx} AS (SELECT unnest(range({k})) AS z),
phi0{sfx} AS MATERIALIZED (
    SELECT z, word,
           g / sum(g) OVER (PARTITION BY z) AS phi
    FROM (
        SELECT z.z, v.word, 1.0 + (({_SQL_H32}) + z.z) % 13 AS g
        FROM (SELECT DISTINCT word FROM counts) v CROSS JOIN zs{sfx} z
    )
),
theta0{sfx} AS MATERIALIZED (
    SELECT doc_id, z, 1.0 / {k} AS theta
    FROM (SELECT DISTINCT doc_id FROM counts) CROSS JOIN zs{sfx}
)"""
    )
    for t in range(1, iters + 1):
        parts.append(
            f"""
r{t}{sfx} AS MATERIALIZED (
    SELECT c.doc_id, c.word, p.z,
           c.n * p.phi * th.theta /
           sum(p.phi * th.theta) OVER (PARTITION BY c.doc_id, c.word) AS nr
    FROM counts c
    JOIN phi{t - 1}{sfx} p ON p.word = c.word
    JOIN theta{t - 1}{sfx} th ON th.doc_id = c.doc_id AND th.z = p.z
),
phi{t}{sfx} AS MATERIALIZED (
    SELECT z, word, round(s / sum(s) OVER (PARTITION BY z), {_ROUND}) AS phi
    FROM (SELECT z, word, sum(nr) AS s FROM r{t}{sfx} GROUP BY z, word)
),
theta{t}{sfx} AS MATERIALIZED (
    SELECT doc_id, z,
           round(s / sum(s) OVER (PARTITION BY doc_id), {_ROUND}) AS theta
    FROM (SELECT doc_id, z, sum(nr) AS s FROM r{t}{sfx} GROUP BY doc_id, z)
)"""
        )
    return ",".join(parts)


@register(
    "plsa_topic_terms",
    sql=f"""
WITH {_sql_plsa(PLSA_ITERS)}
SELECT z, word, round(phi, 6) AS phi,
       row_number() OVER (PARTITION BY z ORDER BY phi DESC, word) AS rank
FROM phi{PLSA_ITERS}
QUALIFY rank <= {PLSA_TOP_WORDS}
""",
    tags=("topics", "ml", "plsa", "scale"),
)
def q_plsa_topic_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY M2/M9 in exact-oracle form: per-topic top-{PLSA_TOP_WORDS}
    words of a {PLSA_K}-topic PLSA fitted by {PLSA_ITERS} deterministic EM
    rounds — the topic-word table (``LDA_Analysis.py:427-429``'s shape)
    with every weight hash-checked against DuckDB's replay of the same
    EM."""
    phi, _ = _fit(spark, sf_dir)
    w = Window.partitionBy("z").orderBy(F.desc("phi"), F.asc("word"))
    return (
        phi.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PLSA_TOP_WORDS)
        .select("z", "word", F.round("phi", 6).alias("phi"), "rank")
    )


@register(
    "plsa_doc_topics",
    sql=f"""
WITH {_sql_plsa(PLSA_ITERS)}
SELECT doc_id, z AS topic, round(theta, 6) AS theta
FROM theta{PLSA_ITERS}
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY theta DESC, z) = 1
""",
    tags=("topics", "ml", "plsa", "scale"),
)
def q_plsa_doc_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant PLSA topic per document (SURVEY M8/T4's argmax shape,
    ``LDA_Analysis.py:653-657``), exact-oracle: the doc-topic posterior is
    replayed by DuckDB and the per-doc argmax (ties to the lowest topic id)
    must hash-match."""
    _, theta = _fit(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.desc("theta"), F.asc("z"))
    return (
        theta.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("z").alias("topic"), F.round("theta", 6).alias("theta"))
    )


SWEEP_KS = (2, 3, 4, 5)
# the sweep trains on the doc_id % 4 == 0 quarter-sample: optimal-K model
# selection runs on a sample at any corpus scale (the reference's K=2..15
# sweep is itself a diagnostic, LDA_Analysis.py:179-248); the sampled
# corpus CTEs are replayed identically by DuckDB, so exactness is kept
# while the oracle's 4-fit unrolled replay costs ~1/4 of the full corpus.
SWEEP_SAMPLE_MOD = 4


def _sweep_sql() -> str:
    """One statement unrolling a full EM fit per candidate K (shared
    sampled-corpus CTEs), scoring each fit."""
    fits = [_sql_counts(SWEEP_SAMPLE_MOD)]
    scores = []
    for k in SWEEP_KS:
        sfx = f"_k{k}"
        fits.append(_sql_plsa(PLSA_ITERS, k, sfx))
        scores.append(
            f"""
SELECT {k} AS k,
       (SELECT round(count(DISTINCT word) * 1.0 / count(*), 6) FROM (
            SELECT z, word,
                   row_number() OVER (PARTITION BY z ORDER BY phi DESC, word) AS rn
            FROM phi{PLSA_ITERS}{sfx} QUALIFY rn <= {PLSA_TOP_WORDS}
       )) AS diversity,
       -- 4 dp, not 6: the mean of 6-dp decimals lives on a ~2e-9
       -- decimal grid, so a 6-dp round can hit an exact tie (~2e-3/value);
       -- the coarser grid makes that a ~2e-5 fluke
       (SELECT round(avg(theta), 4) FROM (
            SELECT doc_id, max(theta) AS theta
            FROM theta{PLSA_ITERS}{sfx} GROUP BY doc_id
       )) AS avg_confidence"""
        )
    return "WITH " + ",".join(fits) + "\nUNION ALL".join(scores)


@register(
    "plsa_k_sweep",
    sql=_sweep_sql(),
    tags=("topics", "ml", "plsa", "sweep"),
)
def q_plsa_k_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY M3 in exact-oracle form: the optimal-K sweep over one cached
    corpus (the reference trains K=2..15 on one gensim corpus,
    ``LDA_Analysis.py:179-248``). Per candidate K: topic diversity
    (distinct top-{PLSA_TOP_WORDS} words / total — SURVEY M5) and mean
    dominant-topic confidence. Every fit reuses the memoized (doc, word, n)
    counts of the deterministic doc_id % {SWEEP_SAMPLE_MOD} == 0 sample
    (model selection on a sample — the scale-correct shape); DuckDB
    replays all {len(SWEEP_KS)} fits in one statement."""
    rows = []
    for k in SWEEP_KS:
        phi, theta = _fit(spark, sf_dir, k, mod=SWEEP_SAMPLE_MOD)
        w = Window.partitionBy("z").orderBy(F.desc("phi"), F.asc("word"))
        topw = phi.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= PLSA_TOP_WORDS
        )
        div = topw.agg(
            F.round(F.countDistinct("word") / F.count("*"), 6)
        ).collect()[0][0]
        conf = (
            theta.groupBy("doc_id")
            .agg(F.max("theta").alias("t"))
            .agg(F.round(F.avg("t"), 4))
            .collect()[0][0]
        )
        rows.append((k, float(div), float(conf)))
    return spark.createDataFrame(rows, ["k", "diversity", "avg_confidence"])


# ------------------------------------------------------------ fold-in (M8)

FOLD_ITERS = 2


def _sql_fold_in() -> str:
    """Sampled-corpus training fit (suffix ``_f``) + unrolled theta-only
    fold-in iterations over the held-out counts."""
    k = PLSA_K
    parts = [
        _sql_counts(SWEEP_SAMPLE_MOD),
        _sql_plsa(PLSA_ITERS, k, "_f"),
        rf"""
counts_new AS MATERIALIZED (
    SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS n
    FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+')) AS word
        FROM documents WHERE doc_id % {SWEEP_SAMPLE_MOD} <> 0
    )
    WHERE length(word) >= 2
    GROUP BY doc_id, word
),
thf0 AS (
    SELECT doc_id, z, 1.0 / {k} AS theta
    FROM (SELECT DISTINCT doc_id FROM counts_new) CROSS JOIN zs_f
)""",
    ]
    for t in range(1, FOLD_ITERS + 1):
        parts.append(
            f"""
rf{t} AS MATERIALIZED (
    SELECT c.doc_id, p.z,
           c.n * p.phi * th.theta /
           sum(p.phi * th.theta) OVER (PARTITION BY c.doc_id, c.word) AS nr
    FROM counts_new c
    JOIN phi{PLSA_ITERS}_f p ON p.word = c.word
    JOIN thf{t - 1} th ON th.doc_id = c.doc_id AND th.z = p.z
),
thf{t} AS MATERIALIZED (
    SELECT doc_id, z,
           round(s / sum(s) OVER (PARTITION BY doc_id), {_ROUND}) AS theta
    FROM (SELECT doc_id, z, sum(nr) AS s FROM rf{t} GROUP BY doc_id, z)
)"""
        )
    return ",".join(parts)


@register(
    "plsa_fold_in",
    sql=f"""
WITH {_sql_fold_in()}
SELECT doc_id, z AS topic, round(theta, 6) AS theta
FROM thf{FOLD_ITERS}
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY theta DESC, z) = 1
""",
    tags=("topics", "ml", "plsa", "serving", "scale"),
)
def q_plsa_fold_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PLSA fold-in (Hofmann 1999 §4): infer doc-topic posteriors for
    UNSEEN documents against a FROZEN topic-word model — the serving path
    of SURVEY M8 (the reference scores new docs with a trained model via
    ``get_document_topics``, ``LDA_Analysis.py:653-657``; here the model
    is the deterministic PLSA twin). Train on the doc_id % 4 == 0 sample
    (the K-sweep's fit, memo-shared), fold in the other three quarters
    with {FOLD_ITERS} theta-only EM rounds.

    Scale shape: phi is K x V and BROADCAST, so fold-in is embarrassingly
    parallel over documents — no shuffle grows with the corpus except the
    per-doc normalize (co-partitioned on doc_id). This is how a 100 TB
    corpus is scored by a model fitted on a sample. Held-out docs sharing
    no vocabulary with the training sample carry no evidence and are
    dropped by the inner join on both engines identically."""
    theta = memo(spark, ("plsa_fold_theta", sf_dir), lambda: _fold_theta(spark, sf_dir))
    w = Window.partitionBy("doc_id").orderBy(F.desc("theta"), F.asc("z"))
    return (
        theta.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id", F.col("z").alias("topic"), F.round("theta", 6).alias("theta")
        )
    )


def _fold_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {FOLD_ITERS}-round theta-only EM over the held-out counts;
    memoized per dataset (the final round stays persisted, intermediates
    are released eagerly)."""
    from .frequency import tokenized_words

    phi, _ = _fit(spark, sf_dir, PLSA_K, mod=SWEEP_SAMPLE_MOD)
    cnew = memo(
        spark,
        ("plsa_counts_holdout", sf_dir),
        lambda: tokenized_words(
            load_table(spark, sf_dir, "documents").filter(
                F.col("doc_id") % SWEEP_SAMPLE_MOD != 0
            )
        )
        .groupBy("doc_id", "word")
        .agg(F.count("*").cast("double").alias("n")),
        persist=True,
    )
    zs = spark.range(PLSA_K).select(F.col("id").cast("int").alias("z"))
    theta = (
        cnew.select("doc_id")
        .distinct()
        .crossJoin(F.broadcast(zs))
        .select("doc_id", "z", F.lit(1.0 / PLSA_K).alias("theta"))
    )
    prev_cached = None
    for _ in range(FOLD_ITERS):
        # phi comes persisted from _fit; same size-aware hint as the
        # training E-step (vocab-sized, corpus-unbounded)
        num = (
            cnew.join(vocab_broadcast(phi), "word")
            .join(theta, ["doc_id", "z"])
            .select(
                "doc_id",
                "word",
                "z",
                "n",
                (F.col("phi") * F.col("theta")).alias("num"),
            )
        )
        r = num.select(
            "doc_id",
            "z",
            (
                F.col("n")
                * F.col("num")
                / F.sum("num").over(Window.partitionBy("doc_id", "word"))
            ).alias("nr"),
        )
        sd = Window.partitionBy("doc_id")
        theta = (
            r.groupBy("doc_id", "z")
            .agg(F.sum("nr").alias("s"))
            .select(
                "doc_id",
                "z",
                F.round(F.col("s") / F.sum("s").over(sd), _ROUND).alias("theta"),
            )
        )
        # cut the per-round lineage as _fit does: without this, round t's
        # plan re-executes every earlier round's corpus-sized E-step
        theta = theta.persist()
        theta.count()
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = theta
    return theta
