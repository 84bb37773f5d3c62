"""Model-scored document quality gate (LLM-pipeline surface).

``quality_score`` (``text_analysis.py``) is a fixed heuristic rule mix;
production pipelines score documents with a TRAINED linear classifier
(fastText-style: hashed text features -> logistic regression), retrained
as the corpus drifts. This module implements that shape end-to-end:

- **features** (20 dims): the 16-dim signed-feature-hashing embedding from
  ``functions/encoder.py`` (the fastText n-gram-bucket analogue, exact
  DuckDB twin) + 3 structural signals (capped length, stopword ratio,
  punctuation ratio, each 6-dp-rounded so both engines see identical
  inputs) + a bias term;
- **labels**: distilled from the heuristic gate (teacher =
  ``quality >= MIN_KEEP_QUALITY``) — the standard bootstrap when no human
  labels exist (C4 trained its filter against "looks like Wikipedia"
  labels the same way);
- **training**: ``QM_ITERS`` full-batch gradient-descent rounds of
  logistic loss. Weights are rounded to ``QM_W_ROUND`` decimals after
  every update — the ``clustering.py`` GMM recipe — which both makes the
  fit reproducible under repartitioning (summation-order ulp noise is
  absorbed) and lets the DuckDB oracle replay every round exactly as
  unrolled CTEs;
- **inference**: broadcast the 20 learned weights into one column
  expression — zero Python in the scoring path, the part that runs over
  100 TB. Training cost is ``QM_ITERS`` corpus passes of one slim
  aggregate each (p is a scalar per doc; the gradient shuffles 20 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import memo
from ..functions.encoder import ENCODER_DIM, sql_hash_embedding
from ..registry import register
from ..sources import load_table, parallelized

QM_ITERS = 8
QM_LR = 4.0
QM_W_ROUND = 9  # per-round weight rounding: > fp drift, < real signal
QM_DIM = ENCODER_DIM + 4  # 16 hash dims + length + stop + punct + bias


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parallelized(load_table(spark, sf_dir, "documents"))


# ------------------------------------------------------------ features


def _structural_feats(text_col: str = "text", toks=None) -> F.Column:
    """The 4 trailing feature slots (length, stop, punct, bias) as one
    array expression — shared by both feature faces below. ``toks`` lets
    a batch caller that has staged the token array as a column pass it
    through (quality_exprs' own seam), so the tokenize subtree is
    evaluated once per row instead of once per referencing signal."""
    from ..operators.text_analysis import quality_exprs

    e = quality_exprs(text_col, toks=toks)
    length_feat = F.round(
        F.least(e["n_tokens"] / F.lit(100.0), F.lit(1.0)), 6
    )
    return F.array(
        length_feat,
        F.round(e["stop_ratio"], 6),
        F.round(e["punct_ratio"], 6),
        F.lit(1.0),
    )


def feature_expr(text_col: str = "text") -> F.Column:
    """The QM_DIM feature vector as ONE column expression over ``text``:
    the hash embedding (``hash_embedding_expr`` — bit-identical to the
    mapInPandas kernel, parity-tested) ++ 6-dp-rounded structural signals
    ++ bias. Row-local and shuffle-free, so a streaming micro-batch can
    score documents with zero extra stages."""
    from ..functions.encoder import hash_embedding_expr

    return F.concat(
        hash_embedding_expr(text_col), _structural_feats(text_col)
    )


def feature_batch_col(text_col: str = "text", toks=None) -> F.Column:
    """The SAME QM_DIM feature vector for batch sites: the embedding
    slots come from the Arrow-batched UDF face (md5 in C + numpy — see
    ``hash_embedding_udf``; bit-identical to the expression by the
    pinned kernel parity), the structural slots from the shared
    expression. Still row-local (ArrowEvalPython, no shuffle); only the
    per-token interpreted HOF fold is gone. The streaming gate keeps
    ``feature_expr`` — a micro-batch filter must stay a stateless
    column predicate."""
    from ..functions.encoder import hash_embedding_udf

    return F.concat(
        hash_embedding_udf(text_col), _structural_feats(text_col, toks)
    )


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, feat array<double>[QM_DIM], y) — hash embedding ++
    structural signals ++ bias, teacher label from the heuristic gate.
    One shuffle-free projection over the scan (the round-4 join of the
    embedding kernel against the quality query is gone: both sides were
    row-local expressions all along). The token array is staged as a
    column (the quality_stats discipline) so the feat slots and the
    teacher label share ONE tokenize per row instead of re-evaluating
    the subtree inside each referencing signal."""
    from ..functions import text as TX
    from ..operators.text_analysis import MIN_KEEP_QUALITY, quality_exprs

    txt = F.coalesce(F.col("text"), F.lit(""))
    staged = _docs(spark, sf_dir).select(
        "doc_id", "text", TX.word_tokens(txt).alias("_toks")
    )
    toks = F.col("_toks")
    q = F.round(quality_exprs(toks=toks)["quality"], 6)
    return staged.select(
        "doc_id",
        feature_batch_col(toks=toks).alias("feat"),
        (q >= F.lit(MIN_KEEP_QUALITY)).cast("int").alias("y"),
    )


def score_expr(weights: list, text_col: str = "text") -> F.Column:
    """sigmoid(w . feat(text)) rounded to 6 dp — the trained gate as a
    single broadcast-weights column expression (the shape that scores
    100 TB, and that the streaming ingest gate applies per micro-batch).

    The weight count is validated up front: zip_with NULL-pads a length
    mismatch, which would make every score NULL and the streaming gate's
    ``score >= threshold`` silently drop 100% of documents (r5 review)."""
    if len(weights) != QM_DIM:
        raise ValueError(
            f"score_expr needs exactly QM_DIM={QM_DIM} weights, got "
            f"{len(weights)} — a mismatched vector would NULL-pad through "
            "zip_with and score every document NULL"
        )
    w_lit = F.array(*[F.lit(float(v)) for v in weights])
    margin = F.aggregate(
        F.zip_with(feature_expr(text_col), w_lit, lambda x, wd: x * wd),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 6)


# ------------------------------------------------------------- training


def fit_quality_weights(feats: DataFrame, iters: int = QM_ITERS) -> list:
    """Full-batch logistic GD over (feat array, y) rows; returns the
    QM_DIM weight list. Each round is ONE slim aggregate (the per-dim
    gradient — QM_DIM rows collected) plus a count; per-round weight
    rounding keeps the trajectory engine- and partitioning-independent.
    Rounding uses decimal HALF_UP — the repo's one documented tie rule
    (same as ``textrank_keywords``), matching DuckDB's ``round()``
    half-away-from-zero rather than numpy's banker's rounding, so a
    gradient landing on a grid boundary cannot diverge across engines
    (r4 ADVICE)."""
    from decimal import ROUND_HALF_UP, Decimal

    qw = Decimal(1).scaleb(-QM_W_ROUND)

    def round_w(x: float) -> float:
        return float(Decimal(x).quantize(qw, rounding=ROUND_HALF_UP))

    feats = feats.persist()
    n = feats.count()
    w = [0.0] * QM_DIM
    if n == 0:
        # empty corpus: the 1-row aggregate returns NULL sums — degrade
        # to zero weights (the pre-r6 posexplode form's behavior, which
        # downstream empty-input sweeps rely on) instead of a TypeError
        feats.unpersist()
        return w
    for _ in range(iters):
        g = gradient_frame(feats, w).collect()[0]
        grad = [g[f"g{d}"] / n for d in range(QM_DIM)]
        w = [round_w(w[d] - QM_LR * grad[d]) for d in range(QM_DIM)]
    feats.unpersist()
    return [float(v) for v in w]


def gradient_frame(feats: DataFrame, w: list) -> DataFrame:
    """One GD round's per-dim gradient sums as a 1-row, QM_DIM-column
    aggregate: err = sigmoid(w.x) - y is staged once per row, then each
    dim is ``sum(err * feat[d])`` — QM_DIM parallel aggregate buffers
    over the SAME scan, partial-aggregated map-side. No
    ``posexplode``/Generate (r4+r5 verdict: the exploded form inflated
    every row 20x and shuffled doc*dim rows just to regroup by dim; this
    shuffles exactly QM_DIM partial sums per partition). Summation-order
    ulp drift vs the exploded form is absorbed by the per-round
    {QM_W_ROUND}-dp HALF_UP weight rounding — the invariant that already
    makes the DuckDB replay exact."""
    # same unrolled left-associated dot as the scoring face: identical
    # IEEE addition order to the aggregate(zip_with(...)) fold, but in
    # codegen — the fold ran interpreted once per row per GD round
    # (8 rounds x the whole feature table)
    margin = F.lit(0.0)
    for d, v in enumerate(w):
        margin = margin + F.element_at("feat", d + 1) * F.lit(float(v))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return feats.select((p - F.col("y")).alias("err"), "feat").agg(
        *[
            F.sum(F.col("feat")[d] * F.col("err")).alias(f"g{d}")
            for d in range(QM_DIM)
        ]
    )


def _qm_fit(spark: SparkSession, sf_dir: str) -> list:
    return memo(
        spark,
        ("qm_fit", sf_dir),
        lambda: fit_quality_weights(_features(spark, sf_dir)),
    )


# --------------------------------------------------------------- oracle


def _sql_rounds(iters: int, train_only: bool = False) -> str:
    """Unrolled GD rounds over the MATERIALIZED feature table. With
    ``train_only`` the gradient (and its normalizing count) sees ONLY the
    md5 train split (the ``train_val_test_split`` assignment, pct <
    {SPLIT_BOUNDS[0]}); margins/scores still cover every document so the
    held-out rows can be scored downstream without ever influencing a
    weight update."""
    from .curation import SPLIT_BOUNDS, _md5_u32_sql
    from .dedup import _sql_quality_block
    from .text_analysis import _SQL_WORD_TOKS, MIN_KEEP_QUALITY

    if train_only:
        spl = f"""
spl AS MATERIALIZED (
    SELECT doc_id,
           ({_md5_u32_sql("'split|' || CAST(doc_id AS VARCHAR)")}) % 100 AS pct
    FROM documents
),"""
        nn_src = f"(SELECT doc_id FROM spl WHERE pct < {SPLIT_BOUNDS[0]})"
        g_join = "JOIN spl s ON s.doc_id = f.doc_id"
        g_where = f"WHERE s.pct < {SPLIT_BOUNDS[0]}"
    else:
        spl, g_join, g_where = "", "", ""
        nn_src = "documents"

    parts = [
        f"""
t AS ({_SQL_WORD_TOKS}),
{_sql_quality_block()},
lab AS MATERIALIZED (
    SELECT doc_id,
           CASE WHEN round(quality, 6) >= {MIN_KEEP_QUALITY}
                THEN 1 ELSE 0 END AS y
    FROM q
),
{sql_hash_embedding()},
feat AS MATERIALIZED (
    SELECT doc_id, dim, v FROM hemb
    UNION ALL
    SELECT qm.doc_id, {ENCODER_DIM} AS dim,
           round(least(qm.n_tokens / 100.0, 1.0), 6) AS v FROM qm
    UNION ALL
    SELECT qm.doc_id, {ENCODER_DIM + 1}, round(qm.stop_ratio, 6) FROM qm
    UNION ALL
    SELECT qm.doc_id, {ENCODER_DIM + 2}, round(qm.punct_ratio, 6) FROM qm
    UNION ALL
    SELECT doc_id, {ENCODER_DIM + 3}, 1.0 FROM documents
),
{spl}nn AS (SELECT count(*) AS c FROM {nn_src}),
w0 AS (SELECT unnest(range(0, {QM_DIM})) AS dim, 0.0 AS wv)"""
    ]
    for t in range(1, iters + 2):
        parts.append(
            f"""
mar{t} AS (
    SELECT f.doc_id, sum(f.v * w.wv) AS m
    FROM feat f JOIN w{t - 1} w ON w.dim = f.dim
    GROUP BY f.doc_id
),
p{t} AS MATERIALIZED (
    SELECT doc_id, 1.0 / (1.0 + exp(-m)) AS p FROM mar{t}
)"""
        )
        if t <= iters:
            parts.append(
                f"""
g{t} AS (
    SELECT f.dim,
           sum((p.p - l.y) * f.v) / (SELECT c FROM nn) AS g
    FROM feat f
    JOIN p{t} p ON p.doc_id = f.doc_id
    JOIN lab l ON l.doc_id = f.doc_id
    {g_join}
    {g_where}
    GROUP BY f.dim
),
w{t} AS MATERIALIZED (
    SELECT w.dim, round(w.wv - {QM_LR} * g.g, {QM_W_ROUND}) AS wv
    FROM w{t - 1} w JOIN g{t} g ON g.dim = w.dim
)"""
            )
    return ",".join(parts)


# -------------------------------------------------------------- queries


@register(
    "quality_model_score",
    sql=f"""
WITH {_sql_rounds(QM_ITERS)}
SELECT p.doc_id, l.y AS teacher_label, round(p.p, 6) AS score,
       CASE WHEN round(p.p, 6) >= 0.5 THEN 1 ELSE 0 END AS predicted
FROM p{QM_ITERS + 1} p JOIN lab l ON l.doc_id = p.doc_id
""",
    tags=("text_analysis", "quality", "ml", "scale"),
)
def q_quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the TRAINED logistic quality model:
    (doc_id, teacher_label, sigmoid score, predicted keep/drop). The
    scoring pass is one broadcast-weights column expression over the
    feature columns — the inference shape that runs over 100 TB; the
    training loop behind it is memoized per (session, sf_dir). DuckDB
    replays the entire fit (8 unrolled GD rounds) and the final scores
    must hash-match — the model, not just the plumbing, is the oracle
    contract."""
    w = _qm_fit(spark, sf_dir)
    feats = _features(spark, sf_dir)
    # the dot product unrolled as an explicit left-associated sum of
    # element_at terms: ((0 + f0*w0) + f1*w1) + ... is the identical
    # IEEE addition order as the old aggregate(zip_with(...)) fold, but
    # runs in whole-stage codegen instead of the interpreted HOF path
    # (guide §4.1: HOF lambdas are CodegenFallback — measured ~0.75 s of
    # the warm scoring pass for QM_DIM=20 terms over sf0.1)
    margin = F.lit(0.0)
    for i, v in enumerate(w):
        margin = margin + F.element_at("feat", i + 1) * F.lit(float(v))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    # two-step select: `score` and `predicted` previously each carried
    # their own copy of round(sigmoid(w . feat(text))) — and feat() is
    # the full hash-embedding fold, a higher-order-function tree that
    # runs interpreted (HOFs have no whole-stage codegen), so the
    # duplicate was genuinely evaluated twice per row. Referencing the
    # non-cheap `score` attribute from a second projection evaluates the
    # tree once (CollapseProject does not inline non-cheap expressions
    # referenced more than once); values are unchanged — `predicted` is
    # derived from the identical rounded score either way.
    scored = feats.select(
        "doc_id",
        F.col("y").alias("teacher_label"),
        F.round(p, 6).alias("score"),
    )
    return scored.select(
        "doc_id",
        "teacher_label",
        "score",
        (F.col("score") >= 0.5).cast("int").alias("predicted"),
    )


@register(
    "quality_model_weights",
    sql=f"""
WITH {_sql_rounds(QM_ITERS)}
SELECT dim, round(wv, 6) AS weight FROM w{QM_ITERS}
""",
    tags=("text_analysis", "quality", "ml"),
)
def q_quality_model_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fitted weight vector itself (dim, weight) — the shippable
    model artifact, and the sharpest oracle: any divergence anywhere in
    the 8-round trajectory surfaces here undiluted by the sigmoid."""
    w = _qm_fit(spark, sf_dir)
    return spark.createDataFrame(
        [(d, round(v, 6)) for d, v in enumerate(w)],
        "dim long, weight double",
    )


# ------------------------------------------------------ held-out eval


def _sql_eval() -> str:
    from .curation import SPLIT_BOUNDS

    return f"""
WITH {_sql_rounds(QM_ITERS, train_only=True)},
ev AS (
    SELECT CASE WHEN l.y = 1 AND round(p.p, 6) >= 0.5 THEN 1 ELSE 0 END AS tp,
           CASE WHEN l.y = 0 AND round(p.p, 6) >= 0.5 THEN 1 ELSE 0 END AS fp,
           CASE WHEN l.y = 1 AND round(p.p, 6) <  0.5 THEN 1 ELSE 0 END AS fn,
           CASE WHEN l.y = 0 AND round(p.p, 6) <  0.5 THEN 1 ELSE 0 END AS tn
    FROM p{QM_ITERS + 1} p
    JOIN lab l ON l.doc_id = p.doc_id
    JOIN spl s ON s.doc_id = p.doc_id
    WHERE s.pct >= {SPLIT_BOUNDS[0]}
),
conf AS (
    SELECT CAST(sum(tp) AS BIGINT) AS tp, CAST(sum(fp) AS BIGINT) AS fp,
           CAST(sum(fn) AS BIGINT) AS fn, CAST(sum(tn) AS BIGINT) AS tn,
           CAST(count(*) AS BIGINT) AS n_heldout
    FROM ev
)
SELECT (SELECT CAST(c AS BIGINT) FROM nn) AS n_train,
       n_heldout, tp, fp, fn, tn,
       round(CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp * 1.0 / (tp + fp) END, 6)
           AS precision_keep,
       round(CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp * 1.0 / (tp + fn) END, 6)
           AS recall_keep,
       round((tp + tn) * 1.0 / n_heldout, 6) AS accuracy
FROM conf
"""


def _qm_fit_train(spark: SparkSession, sf_dir: str) -> list:
    """Weights trained on the md5 TRAIN split only (the
    ``train_val_test_split`` assignment) — held-out docs never reach a
    gradient."""
    from .curation import SPLIT_BOUNDS, _md5_u32

    def build() -> list:
        feats = _features(spark, sf_dir)
        pct = (
            _md5_u32(F.concat(F.lit("split|"), F.col("doc_id").cast("string")))
            % 100
        )
        return fit_quality_weights(feats.filter(pct < SPLIT_BOUNDS[0]))

    return memo(spark, ("qm_fit_train", sf_dir), build)


@register(
    "quality_model_eval",
    sql=_sql_eval(),
    tags=("text_analysis", "quality", "ml", "eval"),
)
def q_quality_model_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure the trained quality model (r4 VERDICT task 4): retrain on
    the md5 train split only, score the held-out docs (val+test of
    ``train_val_test_split``), report confusion counts and
    precision/recall/accuracy vs the heuristic teacher — all
    integer-count and ratio math, so DuckDB replays the train-restricted
    fit AND the evaluation exactly. Scoring stays the broadcast-weights
    column expression; the only new work over ``quality_model_score`` is
    the split predicate (a row-local md5)."""
    held, n_train = _heldout_scores(spark, sf_dir, with_n_train=True)
    held = held.select("y", (F.col("p") >= 0.5).cast("int").alias("pred"))
    conf = held.agg(
        F.sum(((F.col("y") == 1) & (F.col("pred") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("y") == 0) & (F.col("pred") == 1)).cast("long")).alias("fp"),
        F.sum(((F.col("y") == 1) & (F.col("pred") == 0)).cast("long")).alias("fn"),
        F.sum(((F.col("y") == 0) & (F.col("pred") == 0)).cast("long")).alias("tn"),
        F.count("*").alias("n_heldout"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return conf.select(
        F.lit(n_train).cast("long").alias("n_train"),
        "n_heldout",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            F.when(tp + fp == 0, 0.0).otherwise(tp / (tp + fp)), 6
        ).alias("precision_keep"),
        F.round(
            F.when(tp + fn == 0, 0.0).otherwise(tp / (tp + fn)), 6
        ).alias("recall_keep"),
        F.round((tp + tn) / F.col("n_heldout"), 6).alias("accuracy"),
    )


def _heldout_scores(
    spark: SparkSession, sf_dir: str, with_n_train: bool = False
):
    """(held, n_train): the held-out docs scored by the train-split-fit
    weights — ``held`` is (y, p) with p the 6-dp-rounded sigmoid, the
    SINGLE scoring convention ``quality_model_eval`` and
    ``quality_model_calibration`` share (r7 review: the block was
    copy-pasted and a convention change would silently de-reconcile the
    two tables). n_train is an eager count, computed only when asked
    (the calibration query doesn't report it)."""
    from .curation import SPLIT_BOUNDS, _md5_u32

    w = _qm_fit_train(spark, sf_dir)
    feats = _features(spark, sf_dir)
    pct = (
        _md5_u32(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))) % 100
    )
    w_lit = F.array(*[F.lit(float(v)) for v in w])
    margin = F.aggregate(
        F.zip_with("feat", w_lit, lambda x, wd: x * wd),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 6)
    held = feats.filter(pct >= SPLIT_BOUNDS[0]).select("y", p.alias("p"))
    if not with_n_train:
        return held, None
    return held, feats.filter(pct < SPLIT_BOUNDS[0]).count()


# ------------------------------------------------- calibration bins

CAL_BINS = 10


def _sql_calibration() -> str:
    from .curation import SPLIT_BOUNDS

    return f"""
WITH {_sql_rounds(QM_ITERS, train_only=True)},
hp AS (
    SELECT round(p.p, 6) AS p, l.y
    FROM p{QM_ITERS + 1} p
    JOIN lab l ON l.doc_id = p.doc_id
    JOIN spl s ON s.doc_id = p.doc_id
    WHERE s.pct >= {SPLIT_BOUNDS[0]}
)
SELECT least(CAST(floor(p * {CAL_BINS}) AS BIGINT), {CAL_BINS - 1}) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(y) AS BIGINT) AS n_pos,
       round(sum(y) * 1.0 / count(*), 6) AS acc,
       round(CAST(sum(CAST(p AS DECIMAL(18, 6))) AS DOUBLE) / count(*), 6)
           AS conf
FROM hp GROUP BY 1
""".replace("\n\n", "\n")


@register(
    "quality_model_calibration",
    sql=_sql_calibration(),
    tags=("quality", "ml", "eval"),
)
def q_quality_model_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the trained quality gate on the held-out
    split: {CAL_BINS} predicted-probability bins, each with its count,
    positive-label count, empirical accuracy and mean confidence — the
    table that says whether a 0.8 score MEANS 80% (and therefore whether
    thresholding at MIN_KEEP_QUALITY-equivalents is honest). |acc − conf|
    summed n-weighted is ECE; the bins are emitted raw so the consumer
    picks the aggregation.

    Exactness: p is the 6-dp-rounded sigmoid (the eval query's
    convention), binning is integer floor of that identical double, and
    mean confidence sums the 6-dp values as DECIMAL — associative-exact
    — before one final division. Scale: scoring is the broadcast-weights
    expression; the rollup is {CAL_BINS}-bounded."""
    held, _ = _heldout_scores(spark, sf_dir)
    return (
        held.groupBy(
            F.least(
                F.floor(F.col("p") * CAL_BINS).cast("bigint"),
                F.lit(CAL_BINS - 1),
            ).alias("bin")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.round(F.sum("y") * F.lit(1.0) / F.count("*"), 6).alias("acc"),
            F.round(
                F.sum(F.col("p").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("conf"),
        )
    )


# ------------------------------------------- three-signal quality panel

# the three registered quality signals this module's panel composes
# verbatim; importing text_analysis here guarantees their registrations
# exist even when this module is imported directly (load_all-order
# independence — the curation.py pattern)
from ..registry import REGISTRY as _REG  # noqa: E402
from . import text_analysis as _ta_mod  # noqa: E402,F401


@register(
    "quality_panel",
    sql=f"""
WITH qs AS ({_REG["quality_score"].sql}),
ms AS ({_REG["quality_model_score"].sql}),
lm AS ({_REG["ngram_lm_perplexity"].sql})
SELECT qs.doc_id, qs.quality, ms.score AS model_score, lm.perplexity
FROM qs
JOIN ms ON ms.doc_id = qs.doc_id
LEFT JOIN lm ON lm.doc_id = qs.doc_id
""",
    tags=("text_analysis", "quality", "curation", "scale"),
)
def q_quality_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three-tier quality stack side by side, per document: heuristic
    rule score (``quality_score``), trained-classifier probability
    (``quality_model_score``), and corpus-LM perplexity
    (``ngram_lm_perplexity``) — the report a curation engineer reads
    before picking thresholds. All three are registered exact-oracle
    queries composed verbatim; the panel adds only doc-keyed joins
    (LEFT on the LM side: docs with <2 tokens emit no bigrams and carry
    NULL perplexity rather than vanishing from the report).

    Memoized+persisted (verdict-table discipline, r9):
    ``quality_panel_agreement`` re-joins the panel per call, and the
    table is doc-sized with four fixed-width columns."""
    from ..cache import memo

    def build() -> DataFrame:
        from ..cache import build_concurrently
        from .text_analysis import q_ngram_lm_perplexity, q_quality_score

        # three independent tiers until the doc-keyed join (guide §2.6):
        # the trained-model fit's per-round collects overlap the LM's
        # bigram-model build instead of serializing the cold panel
        from ..cache import materialized

        qs, ms, lm = build_concurrently(
            [
                # persisted verdict: materialize in-thread so its lazy
                # body overlaps the trained-model fit
                lambda: materialized(
                    q_quality_score(spark, sf_dir).select(
                        "doc_id", "quality"
                    )
                ),
                # scoring is an unmemoized projection (the fit behind it
                # IS the eager part) — an in-thread count would score
                # the corpus twice, so construction only
                lambda: q_quality_model_score(spark, sf_dir).select(
                    "doc_id", F.col("score").alias("model_score")
                ),
                lambda: q_ngram_lm_perplexity(spark, sf_dir).select(
                    "doc_id", "perplexity"
                ),
            ]
        )
        return qs.join(ms, "doc_id").join(lm, "doc_id", "left")

    return memo(spark, ("quality_panel", sf_dir), build, persist=True)


PSI_BINS = 10  # fixed-width bins over quality's [0, 1] range


@register(
    "source_quality_psi",
    sql=f"""
WITH qs AS ({_REG["quality_score"].sql}),
j AS (
    SELECT d.source,
           least(CAST(floor(qs.quality * {PSI_BINS}) AS BIGINT),
                 {PSI_BINS - 1}) AS bin
    FROM qs JOIN documents d ON d.doc_id = qs.doc_id
),
sb AS (SELECT source, bin, count(*) AS c FROM j GROUP BY source, bin),
stot AS (SELECT source, sum(c) AS n FROM sb GROUP BY source),
ab AS (SELECT bin, sum(c) AS c FROM sb GROUP BY bin),
atot AS (SELECT sum(c) AS n FROM ab),
grid AS (
    SELECT s.source, b.bin
    FROM stot s, (SELECT unnest(range(0, {PSI_BINS})) AS bin) b
),
p AS (
    SELECT g.source, st.n,
           (coalesce(sb.c, 0) + 1) * 1.0 / (st.n + {PSI_BINS}) AS ps,
           (coalesce(ab.c, 0) + 1) * 1.0 / (at.n + {PSI_BINS}) AS pa
    FROM grid g
    JOIN stot st ON st.source = g.source
    LEFT JOIN sb ON sb.source = g.source AND sb.bin = g.bin
    LEFT JOIN ab ON ab.bin = g.bin
    CROSS JOIN atot at
)
SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
       CAST(sum(CAST(round((ps - pa) * ln(ps / pa), 6)
                AS DECIMAL(18, 6))) AS DOUBLE) AS psi
FROM p GROUP BY source
""",
    tags=("quality", "drift", "eval", "scale"),
)
def q_source_quality_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index of the heuristic quality-score
    distribution, per source vs the whole corpus — the drift monitor a
    data-ops team wires to an alert: PSI < 0.1 is stable, 0.1-0.25
    drifting, > 0.25 a source whose quality profile has shifted enough
    to re-examine before the next training mix (the credit-scoring PSI
    convention). Composes the registered ``quality_score`` verbatim.

    Exactness: bins are integer (floor of the 6-dp-rounded score x 10,
    clamped); every probability is a Laplace-smoothed ratio of integers
    — identical doubles on both engines — and the 10 per-source terms
    are 6-dp-rounded then summed as DECIMAL, so the total is
    associative-exact under any aggregation order. Scale: one corpus
    pass to bin, then everything is (sources x {PSI_BINS})-bounded."""
    from .text_analysis import q_quality_score

    from ..sources import load_table

    qs = q_quality_score(spark, sf_dir).select("doc_id", "quality")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    j = qs.join(src, "doc_id").select(
        "source",
        F.least(
            F.floor(F.col("quality") * PSI_BINS).cast("bigint"),
            F.lit(PSI_BINS - 1),
        ).alias("bin"),
    )
    sb = j.groupBy("source", "bin").agg(F.count("*").alias("c"))
    stot = sb.groupBy("source").agg(F.sum("c").alias("n"))
    ab = sb.groupBy("bin").agg(F.sum("c").alias("c_all"))
    atot = ab.agg(F.sum("c_all").alias("n_all"))
    grid = stot.crossJoin(
        F.broadcast(
            ab.sparkSession.range(PSI_BINS).select(
                F.col("id").cast("bigint").alias("bin")
            )
        )
    )
    p = (
        grid.join(sb, ["source", "bin"], "left")
        .join(F.broadcast(ab), "bin", "left")
        .crossJoin(F.broadcast(atot))
        .select(
            "source",
            "n",
            (
                (F.coalesce("c", F.lit(0)) + 1)
                * F.lit(1.0)
                / (F.col("n") + PSI_BINS)
            ).alias("ps"),
            (
                (F.coalesce("c_all", F.lit(0)) + 1)
                * F.lit(1.0)
                / (F.col("n_all") + PSI_BINS)
            ).alias("pa"),
        )
    )
    term = (F.col("ps") - F.col("pa")) * F.log(F.col("ps") / F.col("pa"))
    return p.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.sum(F.round(term, 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("psi"),
    )


def _value_frac_ranks(
    df: DataFrame, col: str, out: str, memo_key: tuple
) -> DataFrame:
    """Exact fractional ranks per DISTINCT value of ``df[col]`` without a
    global-order window: frac_rank(v) = (#rows < v) + (count(v)+1)/2,
    identical to rank() + (ties-1)/2 over the row set.

    Two-phase ranked prefix-sum (the distributed sort-rank idiom):
    (1) per-value counts (one shuffle on the value); (2) range-partition
    the distinct-value table so partition i holds strictly smaller
    values than partition i+1, cumsum WITHIN each partition (partitioned
    window — parallel); (3) per-partition totals are at most
    one row per shuffle partition — a model-sized collect — prefix-summed
    on the driver and broadcast back as offsets. All terms are integers
    plus an exactly-representable half, so the ranks are bit-identical
    to the single-window formulation on any partitioning."""
    from pyspark.sql import Window

    spark = df.sparkSession
    # persisted (through the cache REGISTRY, so clear_caches can release
    # it — r7 review: a bare .persist() here leaked one table per call)
    # BEFORE the offsets collect: the offsets and the ranked path must
    # see the IDENTICAL value->pid mapping, and pinning the
    # range-partitioned table is what guarantees the second consumer
    # reads the same partitioning the totals were computed from (range
    # boundaries come from a sampling pass; recomputing could not change
    # same-key co-location, but the offset bookkeeping keys on pid)
    g = memo(
        spark,
        memo_key,
        lambda: df.groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .repartitionByRange(F.col(col))
        .withColumn("pid", F.spark_partition_id()),
        persist=True,
    )
    totals = sorted(
        g.groupBy("pid").agg(F.sum("cnt").alias("tot")).collect(),
        key=lambda r: r["pid"],
    )
    offs, acc = [], 0
    for row in totals:
        offs.append((row["pid"], acc))
        acc += row["tot"]
    off_df = spark.createDataFrame(offs, "pid int, off long")
    w = (
        Window.partitionBy("pid")
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        g.withColumn("cum", F.sum("cnt").over(w))
        .join(F.broadcast(off_df), "pid")
        .select(
            col,
            (
                F.col("off")
                + F.col("cum")
                - F.col("cnt")
                + (F.col("cnt") + 1) / 2.0
            ).alias(out),
        )
    )


@register(
    "quality_panel_agreement",
    sql=f"""
WITH p AS ({_REG["quality_panel"].sql}),
c AS (
    SELECT quality, model_score, perplexity FROM p
    WHERE perplexity IS NOT NULL
),
r AS (
    SELECT
        rank() OVER (ORDER BY quality)
          + (count(*) OVER (PARTITION BY quality) - 1) / 2.0 AS rq,
        rank() OVER (ORDER BY model_score)
          + (count(*) OVER (PARTITION BY model_score) - 1) / 2.0 AS rm,
        rank() OVER (ORDER BY perplexity)
          + (count(*) OVER (PARTITION BY perplexity) - 1) / 2.0 AS rp
    FROM c
),
s AS (
    SELECT count(*) AS n,
           sum(rq) AS sq, sum(rm) AS sm, sum(rp) AS sp,
           sum(rq * rq) AS sqq, sum(rm * rm) AS smm, sum(rp * rp) AS spp,
           sum(rq * rm) AS sqm, sum(rq * rp) AS sqp, sum(rm * rp) AS smp
    FROM r
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CASE WHEN (n * sqq - sq * sq) * (n * smm - sm * sm) > 0
            THEN round((n * sqm - sq * sm)
                 / sqrt((n * sqq - sq * sq) * (n * smm - sm * sm)), 6)
       END AS rho_heuristic_model,
       CASE WHEN (n * sqq - sq * sq) * (n * spp - sp * sp) > 0
            THEN round((n * sqp - sq * sp)
                 / sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)), 6)
       END AS rho_heuristic_lm,
       CASE WHEN (n * smm - sm * sm) * (n * spp - sp * sp) > 0
            THEN round((n * smp - sm * sp)
                 / sqrt((n * smm - sm * sm) * (n * spp - sp * sp)), 6)
       END AS rho_model_lm
FROM s
""",
    tags=("text_analysis", "quality", "stats"),
)
def q_quality_panel_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Spearman rank correlation between the three quality
    signals over complete cases (perplexity non-NULL): do the heuristic,
    the trained model, and the LM agree on which documents are good?
    (Expect heuristic-model strongly positive — the model distills the
    heuristic — and the LM signal near-independent; a strong LM
    correlation would mean perplexity adds nothing to the panel.)

    Exactness: Spearman = Pearson on FRACTIONAL ranks, computed in
    closed form from sums. Ranks are k or k+0.5 (rank() + (ties-1)/2) —
    exactly representable binary fractions, so every sum is exact and
    ORDER-INDEPENDENT in fp (no summation-order drift to absorb); the
    only rounding is the final 6-dp on the structure-free
    division/sqrt, identical on both engines.

    Scale (r6 verdict): ranks are computed WITHOUT a global-order
    window. frac_rank(v) = (#rows < v) + (count(v)+1)/2 depends only on
    the VALUE, so each signal's rank table is built per distinct value
    by a two-phase range-partitioned count-prefix-sum
    (``_value_frac_ranks``): range-partition the (value, cnt) table,
    cumsum inside each partition (a PARTITIONED window), add the
    partition offsets (a <=shuffle-partitions-row driver prefix-sum —
    model-sized by construction), then join the ranks back on the value.
    Every stage is parallel; no ``WindowExec: No Partition Defined``
    anywhere. Rank values are bit-identical to the textbook
    rank()+(ties-1)/2 the DuckDB oracle uses."""
    # the complete-case panel is memoized+persisted: the three rank
    # builders each run an eager offsets collect whose lineage would
    # otherwise recompute the full three-signal panel (the module's most
    # expensive composition) once per signal plus once for the final
    # probe side — four passes instead of one (r7 review)
    p = memo(
        spark,
        ("qpa_panel", sf_dir),
        lambda: q_quality_panel(spark, sf_dir).filter(
            F.col("perplexity").isNotNull()
        ),
        persist=True,
    )

    r = (
        p.select("quality", "model_score", "perplexity")
        .join(_value_frac_ranks(p, "quality", "rq", ("qpa_rank", sf_dir, "q")), "quality")
        .join(_value_frac_ranks(p, "model_score", "rm", ("qpa_rank", sf_dir, "m")), "model_score")
        .join(_value_frac_ranks(p, "perplexity", "rp", ("qpa_rank", sf_dir, "p")), "perplexity")
        .select("rq", "rm", "rp")
    )
    s = r.agg(
        F.count("*").alias("n"),
        F.sum("rq").alias("sq"),
        F.sum("rm").alias("sm"),
        F.sum("rp").alias("sp"),
        F.sum(F.col("rq") * F.col("rq")).alias("sqq"),
        F.sum(F.col("rm") * F.col("rm")).alias("smm"),
        F.sum(F.col("rp") * F.col("rp")).alias("spp"),
        F.sum(F.col("rq") * F.col("rm")).alias("sqm"),
        F.sum(F.col("rq") * F.col("rp")).alias("sqp"),
        F.sum(F.col("rm") * F.col("rp")).alias("smp"),
    )
    n, sq, sm, sp = (F.col(c) for c in ("n", "sq", "sm", "sp"))
    sqq, smm, spp = (F.col(c) for c in ("sqq", "smm", "spp"))
    sqm, sqp, smp = (F.col(c) for c in ("sqm", "sqp", "smp"))

    # a signal with zero rank variance (constant column, or n == 1) has
    # no defined Spearman rho: emit NULL identically on both engines —
    # unguarded, DuckDB's float division yields NaN where Spark yields
    # NULL and the oracle hash would diverge on degenerate corpora
    def rho(cov, var1, var2) -> F.Column:
        denom2 = var1 * var2
        return F.when(denom2 > 0, F.round(cov / F.sqrt(denom2), 6))

    return s.select(
        n.cast("bigint").alias("n_docs"),
        rho(n * sqm - sq * sm, n * sqq - sq * sq, n * smm - sm * sm).alias(
            "rho_heuristic_model"
        ),
        rho(n * sqp - sq * sp, n * sqq - sq * sq, n * spp - sp * sp).alias(
            "rho_heuristic_lm"
        ),
        rho(n * smp - sm * sp, n * smm - sm * sm, n * spp - sp * sp).alias(
            "rho_model_lm"
        ),
    )


def _sql_ece() -> str:
    from ..registry import REGISTRY

    return f"""
WITH b AS ({REGISTRY["quality_model_calibration"].sql})
SELECT CAST(sum(n) AS BIGINT) AS n_heldout,
       CAST(count(*) AS BIGINT) AS n_bins,
       round(sum(n * abs(acc - conf)) / sum(n), 6) AS ece,
       round(max(abs(acc - conf)), 6) AS max_gap
FROM b
"""


def _register_ece() -> None:
    register(
        "quality_model_ece",
        sql=_sql_ece(),
        tags=("quality", "ml", "eval"),
    )(q_quality_model_ece)


def q_quality_model_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error of the trained quality gate: the
    n-weighted mean |accuracy - confidence| over the reliability bins
    (plus the worst single-bin gap) — the one number that says whether
    the gate's probabilities can be thresholded as probabilities.
    Composes the registered calibration table verbatim; acc and conf are
    already 6-dp-exact per bin, so the rollup is arithmetic over at most
    {CAL_BINS} identical doubles, rounded once."""
    b = q_quality_model_calibration(spark, sf_dir)
    gap = F.abs(F.col("acc") - F.col("conf"))
    return b.agg(
        F.sum("n").cast("bigint").alias("n_heldout"),
        F.count("*").cast("bigint").alias("n_bins"),
        F.round(F.sum(F.col("n") * gap) / F.sum("n"), 6).alias("ece"),
        F.round(F.max(gap), 6).alias("max_gap"),
    )


_register_ece()
