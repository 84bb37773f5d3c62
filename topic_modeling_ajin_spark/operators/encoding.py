"""Raw-text encoding operators — the SURVEY M10 seam made runnable.

The reference's BERTopic path starts from raw text and ENCODES it
(``BERTopic_Analysis.py:105,197-199``); until round 3 the engine consumed
only the driver's precomputed ``embeddings`` table. These queries close
that gap: ``functions/encoder.py``'s Arrow-batched ``mapInPandas`` kernel
(sentence-transformers when installed, deterministic md5 feature-hashing
otherwise) feeds the same ANN machinery ``operators/similarity.py`` runs
over precomputed vectors — end to end from the ``text`` column, with exact
DuckDB oracles because the fallback is integer-hash + one normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..functions.encoder import ENCODER_DIM, encode_documents, sql_hash_embedding
from ..registry import register
from ..sources import load_table, parallelized

ANN_QUERIES = 10
ANN_TOP_K = 5


def _hash_embedded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..cache import memo

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return encode_documents(parallelized(docs), method="hash")

    return memo(spark, ("hash_embedded", sf_dir), build, persist=True)


@register(
    "embed_documents",
    sql=f"""
WITH {sql_hash_embedding()}
SELECT doc_id, CAST(dim AS INT) AS dim, round(v, 6) AS value
FROM hemb
""",
    tags=("encoder", "udf", "scale"),
)
def q_embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY M10: encode raw ``text`` into a dense embedding via the
    gated encoder UDF, forced onto the deterministic hash fallback so the
    run is environment-independent and exactly oracle-checked. Output is
    the long form (doc_id, dim, value) — the registered-query convention
    for vector payloads. Plan shape: one Arrow-batched map over the
    document scan, no shuffle; per row {ENCODER_DIM} slim values out."""
    emb = _hash_embedded(spark, sf_dir)
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("dim", "value")
    ).select("doc_id", "dim", F.round("value", 6).alias("value"))


@register(
    "embed_ann_topk",
    sql=f"""
WITH {sql_hash_embedding()},
dense AS (
    SELECT doc_id, list(v ORDER BY dim) AS emb
    FROM hemb GROUP BY doc_id
),
nz AS (
    SELECT doc_id, emb FROM dense WHERE list_dot_product(emb, emb) > 0
)
SELECT q.doc_id AS query_id,
       c.doc_id AS neighbor_id,
       round(list_cosine_similarity(q.emb, c.emb), 6) AS cosine,
       row_number() OVER (
           PARTITION BY q.doc_id
           ORDER BY list_cosine_similarity(q.emb, c.emb) DESC, c.doc_id
       ) AS rank
FROM nz q JOIN nz c ON q.doc_id <> c.doc_id
WHERE q.doc_id < {ANN_QUERIES}
QUALIFY rank <= {ANN_TOP_K}
""",
    tags=("encoder", "similarity", "udf", "scale"),
)
def q_embed_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text → encoder UDF → brute-force cosine top-{ANN_TOP_K}: the
    full pipeline a user without a precomputed embeddings table runs
    (VERDICT r2 item 1). Same broadcast-query-side plan as
    ``ann_cosine_topk``; zero-norm (token-less) docs are excluded on both
    engines — a NaN cosine would otherwise sort first under Spark's
    NaN-greatest ordering while DuckDB drops it, the one place the two
    engines genuinely disagree."""
    emb = _hash_embedded(spark, sf_dir)
    nz = emb.filter(V.dot(F.col("embedding"), F.col("embedding")) > 0)
    q = nz.filter(F.col("doc_id") < ANN_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = nz.select(
        F.col("doc_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            V.cosine(F.col("q_emb"), F.col("c_emb")).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_TOP_K)
        .select(
            "query_id", "neighbor_id", F.round("cos_raw", 6).alias("cosine"), "rank"
        )
    )
