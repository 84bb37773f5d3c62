"""Topic-modeling operators (SURVEY §2.7), Spark-first.

The BERTopic-equivalent path: cluster assignment (here the ``label`` column
of ``embeddings`` — in production an MLlib KMeans prediction, see
``kmeans_assign``) → class-based TF-IDF keywords (M14) → greedy cross-topic
keyword dedup (T5). The LDA path: CountVectorizer → ``ml.clustering.LDA``
→ long-form (topic, term, weight) tables (M2/M8/M9).

c-TF-IDF is pure DataFrame algebra: tf_{t,c} normalized by class mass ×
ln(1 + A / f_t) exactly as BERTopic defines it
(``BERTopic_Analysis.py:218-240`` configures the vectorizer; the weighting
lives in the bertopic lib). Every non-ML stage has an exact DuckDB oracle;
the MLlib stages are rows-only (cross-library weights differ by design —
SURVEY §4 non-determinism note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..registry import register
from ..sources import load_table, parallelized

TOP_K_KEYWORDS = 10

# ------------------------------------------------------------ SQL fragments

SQL_CLASS_TOKS = r"""
toks AS (
    SELECT d.doc_id, e.label,
           unnest(list_filter(string_split_regex(lower(d.text), '\s+'),
                              w -> w <> '' AND length(w) >= 2)) AS word
    FROM documents d
    JOIN embeddings e ON e.vec_id = d.doc_id
)
"""

SQL_CTFIDF = f"""
{SQL_CLASS_TOKS},
tc AS (SELECT label, word, count(*) AS tf FROM toks GROUP BY label, word),
ct AS (SELECT label, CAST(sum(tf) AS DOUBLE) AS total FROM tc GROUP BY label),
wf AS (SELECT word, CAST(sum(tf) AS DOUBLE) AS f FROM tc GROUP BY word),
avgc AS (SELECT avg(total) AS a FROM ct),
w AS (
    SELECT tc.label, tc.word,
           (tc.tf * 1.0 / ct.total) * ln(1 + avgc.a / wf.f) AS wt
    FROM tc
    JOIN ct ON ct.label = tc.label
    JOIN wf ON wf.word = tc.word
    CROSS JOIN avgc
),
topk AS (
    SELECT label, word, wt,
           row_number() OVER (PARTITION BY label ORDER BY wt DESC, word) AS rank
    FROM w
    QUALIFY rank <= {TOP_K_KEYWORDS}
)
"""


# ------------------------------------------------------- Spark counterparts

def class_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, word) token stream: documents joined to their cluster label.

    The label side is two slim columns — Catalyst broadcasts it; at real
    scale (N-row cluster assignment) this becomes a co-partitioned join on
    doc_id, which AQE plans without help."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    toks = (
        d.join(e, d.doc_id == e.vec_id)
        .select("label", F.explode(TX.tokens("text")).alias("word"))
        .filter(F.length("word") >= 2)
    )
    return toks


def class_term_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full c-TF-IDF weight table (label, word, wt) — the topic-term matrix
    in long form (SURVEY M14). Three small aggregates + two broadcast
    joins; the only full shuffle is the (label, word) count."""
    toks = class_tokens(spark, sf_dir)
    # (label, word) counts feed three consumers (class mass, term df, the
    # weight join) — persist the compact count table, not the token stream.
    tc = toks.groupBy("label", "word").agg(F.count("*").alias("tf")).persist()
    ct = tc.groupBy("label").agg(F.sum("tf").cast("double").alias("total"))
    wf = tc.groupBy("word").agg(F.sum("tf").cast("double").alias("f"))
    a = ct.agg(F.avg("total").alias("a"))
    return (
        tc.join(F.broadcast(ct), "label")
        .join(wf, "word")
        .crossJoin(F.broadcast(a))
        .withColumn(
            "wt",
            (F.col("tf") * 1.0 / F.col("total")) * F.log(1 + F.col("a") / F.col("f")),
        )
        .select("label", "word", "wt")
    )


def topk_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-topic top-k keyword table (SURVEY T2)."""
    w = class_term_weights(spark, sf_dir)
    win = Window.partitionBy("label").orderBy(F.desc("wt"), F.asc("word"))
    return (
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= TOP_K_KEYWORDS)
        .persist()  # K×k rows; reused 2-3× by every metric downstream
    )


@register(
    "ctfidf_keywords",
    sql=f"""
WITH {SQL_CTFIDF}
SELECT label, word AS keyword, round(wt, 6) AS weight, rank AS keyword_rank
FROM topk
""",
    tags=("topics", "flagship"),
)
def q_ctfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY M14: per-topic c-TF-IDF keywords, the BERTopic keyword table
    shape (``Topic, Keyword Rank, Keyword, Weight``,
    ``BERTopic_Analysis.py:711-721``)."""
    return topk_keywords(spark, sf_dir).select(
        "label",
        F.col("word").alias("keyword"),
        F.round("wt", 6).alias("weight"),
        F.col("rank").alias("keyword_rank"),
    )


@register(
    "ctfidf_dedup_keywords",
    sql=f"""
WITH {SQL_CTFIDF},
firstuse AS (
    SELECT label, word, wt, rank,
           min(label) OVER (PARTITION BY word) AS first_label
    FROM topk
)
SELECT label, word AS keyword, round(wt, 6) AS weight,
       row_number() OVER (PARTITION BY label ORDER BY rank) AS keyword_rank
FROM firstuse
WHERE label = first_label
""",
    tags=("topics",),
)
def q_ctfidf_dedup_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY T5: greedy cross-topic keyword dedup
    (``BERTopic_Analysis.py:692-717``). The reference's order-dependent
    loop (keyword kept by the first topic that uses it, topics ascending)
    becomes a min-over-window + filter + re-rank — deterministic under any
    parallelism, same output."""
    topk = topk_keywords(spark, sf_dir)
    first = topk.withColumn(
        "first_label", F.min("label").over(Window.partitionBy("word"))
    )
    kept = first.filter(F.col("label") == F.col("first_label"))
    rerank = Window.partitionBy("label").orderBy("rank")
    return kept.select(
        "label",
        F.col("word").alias("keyword"),
        F.round("wt", 6).alias("weight"),
        F.row_number().over(rerank).alias("keyword_rank"),
    )


@register(
    "doc_frequency_pruning",
    sql=r"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_distinct(list_filter(string_split_regex(lower(text), '\s+'),
                                            w -> w <> '' AND length(w) >= 2))) AS word
    FROM documents
),
df_counts AS (SELECT word, count(*) AS df FROM toks GROUP BY word),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT word, df
FROM df_counts CROSS JOIN n
WHERE df >= 5 AND df <= 0.7 * n_docs
""",
    tags=("topics", "vectorize"),
)
def q_doc_frequency_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY F7/M1: vocabulary pruning by document frequency — gensim's
    ``filter_extremes(no_below=5, no_above=0.7)`` (``LDA_Analysis.py:171``)
    as explicit algebra (CountVectorizer's minDF/maxDF does the same
    internally)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(TX.length_band(TX.tokens("text"), 2, 10_000))
        ).alias("word"),
    )
    dfc = toks.groupBy("word").agg(F.count("*").alias("df"))
    n_docs = d.count()  # scalar; at scale use a broadcast subquery instead
    return dfc.filter((F.col("df") >= 5) & (F.col("df") <= 0.7 * n_docs))


# --------------------------------------------------------------- MLlib path

def _vector_corpus(spark: SparkSession, sf_dir: str):
    """CountVectorizer pipeline over tokenized documents (SURVEY M1)."""
    from pyspark.ml.feature import CountVectorizer

    d = parallelized(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", TX.tokens("text").alias("tokens")).filter(
        F.size("tokens") >= 3
    )
    cv = CountVectorizer(
        inputCol="tokens", outputCol="features", minDF=2.0, vocabSize=50_000
    )
    model = cv.fit(toks)
    return model, model.transform(toks)


@register("lda_topic_terms", tags=("topics", "ml"))
def q_lda_topic_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY M2/M9: MLlib LDA (k=5, seed=42, online optimizer — the
    distributed analogue of gensim LdaModel at ``LDA_Analysis.py:264-276``;
    alpha/eta 'auto' has no MLlib analogue, fixed priors documented) →
    long-form (topic, term, weight, rank). Rows-only: topic-word weights
    are library-specific (SURVEY §4)."""
    from pyspark.ml.clustering import LDA

    cv_model, corpus = _vector_corpus(spark, sf_dir)
    lda = LDA(k=5, seed=42, maxIter=20, optimizer="online", featuresCol="features")
    model = lda.fit(corpus)
    vocab = cv_model.vocabulary
    topics = model.describeTopics(TOP_K_KEYWORDS)
    vocab_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(vocab)], ["term_idx", "term"]
    )
    exploded = topics.select(
        "topic",
        F.posexplode(F.arrays_zip("termIndices", "termWeights")).alias("pos", "tw"),
    ).select(
        "topic",
        F.col("tw.termIndices").alias("term_idx"),
        F.col("tw.termWeights").alias("weight"),
        (F.col("pos") + 1).alias("rank"),
    )
    return exploded.join(F.broadcast(vocab_df), "term_idx").select(
        "topic", "term", F.round("weight", 6).alias("weight"), "rank"
    )


@register("lda_doc_topics", tags=("topics", "ml"))
def q_lda_doc_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY M8/T4: per-document dominant topic + probability from the
    LDA topicDistribution (argmax over the simplex — the reference's
    ``max(doc_topic, key=...)`` at ``LDA_Analysis.py:655``)."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.functions import vector_to_array

    _, corpus = _vector_corpus(spark, sf_dir)
    lda = LDA(k=5, seed=42, maxIter=20, optimizer="online", featuresCol="features")
    model = lda.fit(corpus)
    dist = model.transform(corpus).select(
        "doc_id", vector_to_array("topicDistribution").alias("p")
    )
    return dist.select(
        "doc_id",
        (F.array_position(F.col("p"), F.array_max("p")) - 1).cast("int").alias("topic"),
        F.round(F.array_max("p"), 6).alias("prob"),
    )


@register("kmeans_assign", tags=("topics", "ml", "cluster"))
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY M13: MLlib KMeans (k=10, seed=42) over the embedding column —
    the exact-K clustering path the reference itself uses for its shipped
    result (``BERTopic_Analysis.py:1167-1169``). Output: cluster sizes +
    how pure each cluster is w.r.t. the generator's label."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    feat = e.select(
        "vec_id", "label", array_to_vector(F.col("embedding")).alias("features")
    )
    km = KMeans(k=10, seed=42, featuresCol="features", predictionCol="cluster")
    model = km.fit(feat)
    pred = model.transform(feat)
    return (
        pred.groupBy("cluster")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("label").alias("n_labels"),
        )
        .orderBy("cluster")
    )
