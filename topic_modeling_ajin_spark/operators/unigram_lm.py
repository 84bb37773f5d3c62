"""Unigram-LM (SentencePiece-style) tokenizer TRAINING and segmentation.

Completes the tokenizer family next to ``bpe.py``: where BPE greedily
merges pairs, the unigram LM (Kudo 2018, "Subword Regularization") keeps
a piece inventory with probabilities and segments each word by Viterbi.
This is a deterministic hard-EM variant with a FIXED inventory:

1. aggregate the corpus ONCE into a (word, cnt) vocabulary — the only
   corpus-sized shuffle (the ``bpe.py`` discipline); words are capped at
   {UNI_MAXW} chars (the SentencePiece max-length analog);
2. seed inventory: the top-{UNI_TOPM} substrings (length <=
   {UNI_MAXPIECE}) by corpus frequency, UNION every single character —
   so every word stays segmentable; seed log-probs ln(n / total);
3. {UNI_EM_ROUNDS} hard-EM rounds: E = per-word Viterbi segmentation
   under the current log-probs (min total cost, ties to the
   lexicographically-smallest segmentation string — total-ordered);
   M = piece counts from the segmentations, Laplace-smoothed over the
   fixed inventory.

Cross-engine exactness: counts are integers; every log-prob is
ln(ratio-of-integers) rounded to {_UROUND} decimals at the model
boundary (the Lloyd-centroid convention), so both engines run the DP on
bit-identical weights; the DP itself adds the same operands in the same
recursion order, and cost ties break on the segmentation STRING
(UTF-8/code-point order agree), so the DuckDB oracle replays training
exactly as unrolled per-position CTEs.

Scale shape: everything after the word-count iterates on the vocabulary
table (|V| rows); the E-step is one Arrow-batched ``mapInPandas`` pass
over it (per-word DP is O(len * {UNI_MAXPIECE}), pure local work); the
M-step is a vocab-sized aggregate; the only collects are the
model-sized piece tables (<= {UNI_TOPM} + alphabet rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import memo
from ..registry import register
from ..sources import load_table, parallelized

UNI_MAXW = 16  # trainer word-length cap (SentencePiece analog)
UNI_MAXPIECE = 4  # max piece length
UNI_TOPM = 48  # seed inventory size before the alphabet union
UNI_EM_ROUNDS = 2  # hard-EM rounds (E under p0 -> M -> E under p1 -> M)
_UROUND = 9  # model-boundary log-prob rounding (Lloyd-centroid convention)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parallelized(load_table(spark, sf_dir, "documents"))


# ------------------------------------------------------------ Spark side


def _uni_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, cnt) over the shared word-token split, words capped at
    {UNI_MAXW} chars; memoized+persisted — every E-step rescans it."""
    from ..functions import text as TX

    return memo(
        spark,
        ("uni_vocab", sf_dir),
        lambda: _docs(spark, sf_dir)
        .select(F.explode(TX.word_tokens("text")).alias("word"))
        .filter(F.length("word") <= UNI_MAXW)
        .groupBy("word")
        .agg(F.count("*").alias("cnt")),
        persist=True,
    )


def _candidate_counts(vocab: DataFrame) -> DataFrame:
    """(piece, n): corpus frequency of every substring of length
    1..{UNI_MAXPIECE} (overlapping starts each count), weighted by word
    count. Pure array expressions over the vocab table."""
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(UNI_MAXPIECE), F.length("word") - i + 1),
                ),
                lambda l: F.substring(F.col("word"), i, l),  # noqa: E741
            ),
        )
    )
    return (
        vocab.select("cnt", F.explode(pieces).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("n"))
    )


def _seed_pieces(spark: SparkSession, sf_dir: str) -> list[tuple[str, int, float]]:
    """Seed inventory [(piece, n, lp)]: top-{UNI_TOPM} by (n DESC, piece)
    UNION all single characters; lp = round(ln(n / total), {_UROUND}).
    Model-sized collect. The ln runs in Spark (JVM) — the engine pair the
    oracle convention is proven on."""
    cand = _candidate_counts(_uni_vocab(spark, sf_dir))
    topm = cand.orderBy(F.desc("n"), F.asc("piece")).limit(UNI_TOPM)
    pset = topm.union(cand.filter(F.length("piece") == 1)).distinct()
    tot = pset.agg(F.sum("n").alias("t"))
    rows = (
        pset.crossJoin(F.broadcast(tot))
        .select(
            "piece",
            "n",
            F.round(F.log(F.col("n") / F.col("t")), _UROUND).alias("lp"),
        )
        .collect()
    )
    return sorted((r["piece"], int(r["n"]), float(r["lp"])) for r in rows)


def viterbi_path(word: str, pieces: dict[str, float]) -> str:
    """Best segmentation of ``word`` under piece log-probs: minimize total
    cost (sum of -lp), ties to the lexicographically-smallest segmentation
    string. dp[j] = min over i in [j-{UNI_MAXPIECE}, j) with word[i:j] in
    the inventory of (dp_cost[i] - lp, dp_seg[i] + ' ' + piece), compared
    as the (cost, seg) tuple — the exact recursion the oracle unrolls per
    position. Returns '' when the word is unsegmentable (cannot happen
    for corpus words: the inventory contains their full alphabet)."""
    L = len(word)
    dp: list[tuple[float, str] | None] = [None] * (L + 1)
    dp[0] = (0.0, "")
    for j in range(1, L + 1):
        best = None
        for i in range(max(0, j - UNI_MAXPIECE), j):
            if dp[i] is None:
                continue
            lp = pieces.get(word[i:j])
            if lp is None:
                continue
            c, s = dp[i]
            cand = (c - lp, word[i:j] if s == "" else s + " " + word[i:j])
            if best is None or cand < best:
                best = cand
        dp[j] = best
    return dp[L][1] if dp[L] is not None else ""


def _viterbi_segment(vocab: DataFrame, pieces: dict[str, float]) -> DataFrame:
    """(word, cnt, seg, n_pieces): per-word ``viterbi_path`` over the
    vocab table, Arrow-batched with the piece log-probs in the closure."""

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            segs = [viterbi_path(w, pieces) for w in pdf["word"]]
            out = pdf[["word", "cnt"]].copy()
            out["seg"] = segs
            out["n_pieces"] = [len(s.split(" ")) if s else 0 for s in segs]
            yield out

    return vocab.mapInPandas(
        kernel, schema="word string, cnt long, seg string, n_pieces long"
    )


def _mstep(
    spark: SparkSession,
    seg: DataFrame,
    inventory: list[str],
) -> tuple[list[tuple[str, int, float]], DataFrame]:
    """Laplace-smoothed re-estimation over the FIXED inventory:
    lp = round(ln((c + 1) / (total + |inventory|)), {_UROUND}).
    Returns ([(piece, c, lp)], counts_df). Model-sized collect."""
    counts = (
        seg.select("cnt", F.explode(F.split("seg", " ")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("c"))
    )
    inv = spark.createDataFrame([(p,) for p in inventory], "piece string")
    tot = counts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("t")
    ).withColumn("np", F.lit(len(inventory)))
    rows = (
        inv.join(counts, "piece", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "piece",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("t") + F.col("np"))
                ),
                _UROUND,
            ).alias("lp"),
        )
        .collect()
    )
    return sorted((r["piece"], int(r["c"]), float(r["lp"])) for r in rows), counts


def unigram_fit(spark: SparkSession, sf_dir: str):
    """Run {UNI_EM_ROUNDS} hard-EM rounds. Returns (final_pieces,
    final_seg): [(piece, count, laplace_lp)] from the LAST E-step and the
    persisted final (word, cnt, seg, n_pieces) segmentation table.
    Memoized per (session, sf_dir)."""

    def build():
        vocab = _uni_vocab(spark, sf_dir)
        seed = _seed_pieces(spark, sf_dir)
        inventory = [p for p, _, _ in seed]
        lps = {p: lp for p, _, lp in seed}
        seg = None
        final = []
        for _ in range(UNI_EM_ROUNDS):
            nxt = _viterbi_segment(vocab, lps).persist()
            nxt.count()  # materialize BEFORE dropping the parent
            if seg is not None:
                seg.unpersist()
            seg = nxt
            final, _counts = _mstep(spark, seg, inventory)
            lps = {p: lp for p, _, lp in final}
        return final, seg

    return memo(spark, ("unigram_fit", sf_dir), build)


# ----------------------------------------------------------- DuckDB side


def _sql_viterbi(src_pieces: str, suffix: str) -> str:
    """Unrolled Viterbi CTEs under piece table ``src_pieces`` (piece, lp):
    d{suffix}_{{j}} = best (cost, seg) for each word's length-j prefix,
    ties to the smallest seg string; exports seg{suffix} = (word, cnt,
    seg, n_pieces) for full words."""
    parts = [
        f"""
d{suffix}_0 AS MATERIALIZED (
    SELECT word, cnt, length(word) AS L, 0.0 AS cost, '' AS seg
    FROM uvocab
)"""
    ]
    for j in range(1, UNI_MAXW + 1):
        branches = []
        for i in range(max(0, j - UNI_MAXPIECE), j):
            branches.append(
                f"""
        SELECT word, cnt, L, cost, seg,
               substr(word, {i + 1}, {j - i}) AS pc
        FROM d{suffix}_{i} WHERE L >= {j}"""
            )
        union = "\n        UNION ALL".join(branches)
        parts.append(
            f"""
d{suffix}_{j} AS MATERIALIZED (
    -- MATERIALIZED is load-bearing: each step references the previous
    -- {UNI_MAXPIECE}; inline CTE expansion would grow the plan tree
    -- exponentially in {UNI_MAXW}
    SELECT word, cnt, L, cost, seg FROM (
        SELECT c.word, c.cnt, c.L, c.cost - p.lp AS cost,
               CASE WHEN c.seg = '' THEN c.pc
                    ELSE c.seg || ' ' || c.pc END AS seg
        FROM ({union}
        ) c JOIN {src_pieces} p ON p.piece = c.pc
    )
    QUALIFY row_number() OVER (PARTITION BY word ORDER BY cost, seg) = 1
)"""
        )
    finals = "\n    UNION ALL".join(
        f"""
    SELECT word, cnt, seg FROM d{suffix}_{j} WHERE L = {j}"""
        for j in range(1, UNI_MAXW + 1)
    )
    parts.append(
        f"""
seg{suffix} AS MATERIALIZED (
    SELECT word, cnt, seg, length(string_split(seg, ' ')) AS n_pieces
    FROM ({finals}
    )
)"""
    )
    return ",".join(parts)


def _sql_unigram() -> str:
    """The full training chain: uvocab -> seed inventory p0 -> E1 -> M ->
    p1 -> E2; exports ``seg2`` (final segmentation), ``p0set`` (fixed
    inventory), ``c2``/``meta2`` (final counts + Laplace denominator)."""
    return f"""
uvocab AS MATERIALIZED (
    SELECT word, count(*) AS cnt
    FROM (
        SELECT unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                     '[^a-z0-9가-힣]+'), w -> w <> '')) AS word
        FROM documents
    )
    WHERE length(word) <= {UNI_MAXW}
    GROUP BY word
),
ucand AS (
    SELECT piece, CAST(sum(cnt) AS BIGINT) AS n
    FROM (
        SELECT v.cnt, substr(v.word, s.i, l.l) AS piece
        FROM uvocab v,
             (SELECT unnest(range(1, {UNI_MAXW + 1})) AS i) s,
             (SELECT unnest(range(1, {UNI_MAXPIECE + 1})) AS l) l
        WHERE s.i + l.l - 1 <= length(v.word)
    )
    GROUP BY piece
),
utopm AS (SELECT piece, n FROM ucand ORDER BY n DESC, piece LIMIT {UNI_TOPM}),
p0set AS MATERIALIZED (
    SELECT piece, n FROM utopm
    UNION
    SELECT piece, n FROM ucand WHERE length(piece) = 1
),
p0 AS MATERIALIZED (
    SELECT piece,
           round(ln(n * 1.0 / (SELECT sum(n) FROM p0set)), {_UROUND}) AS lp
    FROM p0set
),
{_sql_viterbi("p0", "1")},
c1 AS (
    SELECT piece, CAST(sum(cnt) AS BIGINT) AS c
    FROM (SELECT cnt, unnest(string_split(seg, ' ')) AS piece FROM seg1)
    GROUP BY piece
),
meta1 AS (
    SELECT (SELECT coalesce(sum(c), 0) FROM c1) AS t,
           (SELECT count(*) FROM p0set) AS np
),
p1 AS MATERIALIZED (
    SELECT s.piece,
           round(ln((coalesce(c.c, 0) + 1) * 1.0 / (m.t + m.np)),
                 {_UROUND}) AS lp
    FROM p0set s LEFT JOIN c1 c ON c.piece = s.piece CROSS JOIN meta1 m
),
{_sql_viterbi("p1", "2")},
c2 AS (
    SELECT piece, CAST(sum(cnt) AS BIGINT) AS c
    FROM (SELECT cnt, unnest(string_split(seg, ' ')) AS piece FROM seg2)
    GROUP BY piece
),
meta2 AS (
    SELECT (SELECT coalesce(sum(c), 0) FROM c2) AS t,
           (SELECT count(*) FROM p0set) AS np
)"""


# -------------------------------------------------------------- queries


@register(
    "unigram_lm_vocab",
    sql=f"""
WITH {_sql_unigram()}
SELECT s.piece,
       CAST(coalesce(c.c, 0) AS BIGINT) AS n,
       round(ln((coalesce(c.c, 0) + 1) * 1.0 / (m.t + m.np)), 6) AS logp
FROM p0set s LEFT JOIN c2 c ON c.piece = s.piece CROSS JOIN meta2 m
""",
    tags=("tokenizer", "ml", "scale"),
)
def q_unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained unigram-LM piece table: every inventory piece with its
    final hard-EM usage count and Laplace-smoothed log-probability —
    what a serving tokenizer loads. DuckDB replays the full training
    (seed counts, both Viterbi E-steps, both M-steps) and the table must
    hash-match."""
    final, _seg = unigram_fit(spark, sf_dir)
    total = sum(c for _, c, _ in final)
    np_ = len(final)
    rows = [(p, c) for p, c, _ in final]
    df = spark.createDataFrame(rows, "piece string, n long")
    return df.select(
        "piece",
        "n",
        F.round(
            F.log((F.col("n") + 1) / F.lit(float(total + np_))), 6
        ).alias("logp"),
    )


@register(
    "unigram_lm_segment",
    sql=f"""
WITH {_sql_unigram()}
SELECT word, CAST(cnt AS BIGINT) AS cnt, seg,
       CAST(n_pieces AS BIGINT) AS n_pieces
FROM seg2
""",
    tags=("tokenizer", "ml", "scale"),
)
def q_unigram_lm_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final Viterbi segmentation of every corpus word under the trained
    unigram LM — the vocabulary-bounded encode table a corpus tokenizer
    broadcast-joins against (the ``bpe_encode`` counterpart)."""
    _final, seg = unigram_fit(spark, sf_dir)
    return seg.select(
        "word", F.col("cnt").cast("bigint").alias("cnt"), "seg", "n_pieces"
    )


@register(
    "unigram_lm_fertility",
    sql=f"""
WITH {_sql_unigram()}
SELECT CAST(sum(cnt) AS BIGINT) AS n_words,
       CAST(sum(cnt * n_pieces) AS BIGINT) AS n_pieces,
       round(sum(cnt * n_pieces) * 1.0 / sum(cnt), 6) AS fertility
FROM seg2
""",
    tags=("tokenizer", "eval"),
)
def q_unigram_lm_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus fertility (pieces per word occurrence) of the trained
    unigram tokenizer — the efficiency number used to compare tokenizers
    (the ``bpe_fertility`` counterpart); one vocab-sized aggregate."""
    _final, seg = unigram_fit(spark, sf_dir)
    return seg.agg(
        F.sum("cnt").cast("bigint").alias("n_words"),
        F.sum(F.col("cnt") * F.col("n_pieces")).cast("bigint").alias("n_pieces"),
        F.round(
            F.sum(F.col("cnt") * F.col("n_pieces")) / F.sum("cnt"), 6
        ).alias("fertility"),
    )


_SQL_UDW = r"""
udw AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                  '[^a-z0-9가-힣]+'), w -> w <> '')) AS word
    FROM documents
)"""


@register(
    "unigram_token_counts",
    sql=f"""
WITH {_sql_unigram()},
{_SQL_UDW},
agg AS (
    SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(CASE WHEN s.n_pieces IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_skipped,
           CAST(sum(coalesce(s.n_pieces, 0)) AS BIGINT) AS n_uni_tokens
    FROM udw w LEFT JOIN seg2 s ON s.word = w.word
    GROUP BY w.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(a.n_skipped, 0) AS BIGINT) AS n_skipped,
       CAST(coalesce(a.n_uni_tokens, 0) AS BIGINT) AS n_uni_tokens
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
""",
    tags=("tokenizer", "tokenize", "scale"),
)
def q_unigram_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the CORPUS with the trained unigram LM: per document, word
    count and trained-piece count — the ``bpe_token_counts`` counterpart.
    Unlike BPE, the unigram trainer caps words at {UNI_MAXW} chars, so
    over-cap words are counted in ``n_skipped`` rather than silently
    dropped (a real pipeline routes them to a byte-fallback); token-less
    documents report zeros on both engines.

    Scale shape: the segment table is |V| rows — corpus-unbounded, so
    the hint is size-aware (``vocab_broadcast``: broadcast under the
    cap, linear shuffle join on ``word`` past it; r10 verdict task 1);
    the corpus side pays one explode + one doc_id re-aggregate — the
    same plan as every tokenize pass."""
    from ..functions import text as TX
    from ..functions.joins import vocab_broadcast

    _final, seg = unigram_fit(spark, sf_dir)
    pieces = seg.select("word", "n_pieces")
    words = _docs(spark, sf_dir).select(
        "doc_id", F.explode(TX.word_tokens("text")).alias("word")
    )
    agg = (
        words.join(vocab_broadcast(pieces), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(
                F.when(F.col("n_pieces").isNull(), 1).otherwise(0)
            ).alias("n_skipped"),
            F.sum(F.coalesce("n_pieces", F.lit(0))).alias("n_uni_tokens"),
        )
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_skipped", F.lit(0)).cast("long").alias("n_skipped"),
            F.coalesce("n_uni_tokens", F.lit(0)).cast("long").alias("n_uni_tokens"),
        )
    )


def _tokenizer_compare_sql() -> str:
    from ..registry import REGISTRY
    from . import bpe as _bpe  # noqa: F401  (ensures bpe queries registered)

    bpe_counts = REGISTRY["bpe_token_counts"].sql
    uni_fert = REGISTRY["unigram_lm_fertility"].sql
    return f"""
WITH bt AS ({bpe_counts}),
ut AS ({uni_fert})
SELECT 'bpe' AS tokenizer,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       CAST(sum(n_bpe_tokens) AS BIGINT) AS n_tokens,
       round(CASE WHEN sum(n_words) > 0
                  THEN sum(n_bpe_tokens) * 1.0 / sum(n_words)
                  ELSE 0 END, 6) AS fertility
FROM bt
UNION ALL
SELECT 'unigram' AS tokenizer,
       n_words, n_pieces AS n_tokens, fertility
FROM ut
"""


@register(
    "tokenizer_compare",
    sql=_tokenizer_compare_sql(),
    tags=("tokenizer", "eval"),
)
def q_tokenizer_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level fertility of the two trained tokenizers side by side —
    the table an engineer reads to pick the tokenizer (fewer pieces per
    word = cheaper training sequences at the same vocab budget). Composes
    the two registered training chains verbatim; note the unigram side
    counts {UNI_MAXW}-capped words only (its trainer's documented word
    policy), the BPE side counts every word."""
    from .bpe import bpe_doc_lengths

    bt = (
        spark.createDataFrame([("bpe",)], "tokenizer string")
        .crossJoin(
            bpe_doc_lengths(spark, sf_dir)
            .agg(
                F.sum("n_words").cast("bigint").alias("n_words"),
                F.sum("n_bpe").cast("bigint").alias("n_tokens"),
                F.round(
                    F.when(
                        F.sum("n_words") > 0,
                        F.sum("n_bpe") / F.sum("n_words"),
                    ).otherwise(0.0),
                    6,
                ).alias("fertility"),
            )
        )
    )
    ut = q_unigram_lm_fertility(spark, sf_dir).select(
        F.lit("unigram").alias("tokenizer"),
        "n_words",
        F.col("n_pieces").alias("n_tokens"),
        "fertility",
    )
    return bt.union(ut)


# ------------------------------------------ packing on unigram tokens

UNI_PACK_BUDGET = 1024  # unigram pieces per training sequence


def _uni_pack_sql() -> str:
    from ..registry import REGISTRY

    counts = REGISTRY["unigram_token_counts"].sql
    return f"""
WITH t AS ({counts}),
c AS (
    SELECT doc_id, n_uni_tokens AS n,
           sum(n_uni_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
    FROM t
)
SELECT CAST(floor((cum - n) * 1.0 / {UNI_PACK_BUDGET}) AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c
GROUP BY 1
"""


@register(
    "pack_sequences_unigram",
    sql=_uni_pack_sql(),
    tags=("curation", "tokenize", "tokenizer", "scale"),
)
def q_pack_sequences_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing budgeted on trained UNIGRAM pieces — the
    ``pack_sequences_bpe`` counterpart, so a pipeline can compare packing
    efficiency under either tokenizer before committing to one. Same
    two-phase distributed prefix sum (shared ``pack_manifest`` — no
    global sort); each document's cost is its unigram piece count from
    the broadcast segment table."""
    from .curation import pack_manifest

    d = q_unigram_token_counts(spark, sf_dir).select(
        "doc_id", F.col("n_uni_tokens").alias("n")
    )
    return pack_manifest(d, UNI_PACK_BUDGET)


# -------------------------------------- per-source fertility (mix design)


def _fertility_by_source_sql() -> str:
    from ..registry import REGISTRY

    counts = REGISTRY["unigram_token_counts"].sql
    return f"""
WITH t AS ({counts})
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t.n_words) AS BIGINT) AS n_words,
       CAST(sum(t.n_skipped) AS BIGINT) AS n_skipped,
       CAST(sum(t.n_uni_tokens) AS BIGINT) AS n_uni_tokens,
       round(CASE WHEN sum(t.n_words) - sum(t.n_skipped) > 0
                  THEN sum(t.n_uni_tokens) * 1.0
                       / (sum(t.n_words) - sum(t.n_skipped))
                  ELSE 0 END, 6) AS fertility
FROM t JOIN documents d ON d.doc_id = t.doc_id
GROUP BY d.source
"""


@register(
    "tokenizer_fertility_by_source",
    sql=_fertility_by_source_sql(),
    tags=("tokenizer", "eval", "drift"),
)
def q_tokenizer_fertility_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trained-tokenizer fertility PER SOURCE — the mix-design
    diagnostic ``tokenizer_compare`` can't show: a source whose text the
    tokenizer fragments badly (high pieces-per-word) costs
    proportionally more sequence budget per document, so its mixture
    share should be set in TOKENS, not docs. Fertility is computed over
    segmentable words only (the trainer's documented cap policy routes
    over-cap words to n_skipped). Composes the registered
    ``unigram_token_counts`` verbatim; the rollup joins the doc-sized
    count table to documents on doc_id and aggregates per source —
    model-sized output, integer sums, one 6-dp division."""
    t = q_unigram_token_counts(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    seg_words = F.sum("n_words") - F.sum("n_skipped")
    return (
        t.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_skipped").cast("bigint").alias("n_skipped"),
            F.sum("n_uni_tokens").cast("bigint").alias("n_uni_tokens"),
            F.round(
                F.when(
                    seg_words > 0,
                    F.sum("n_uni_tokens") * F.lit(1.0) / seg_words,
                ).otherwise(0.0),
                6,
            ).alias("fertility"),
        )
    )
