"""Similarity search over the ``embeddings`` table (``array<float>``).

The reference does all embedding math driver-side with numpy
(``BERTopic_Analysis.py:471-496,574-589``). Here every similarity is a
DataFrame expression over distributed rows:

- brute-force top-k: broadcast the (small) query set, cross-join against
  the corpus, rank per query — the exact baseline;
- label-bucketed search: IVF-style — restrict candidate pairs to the same
  coarse bucket (here the ``label`` column; in production the assignment of
  a KMeans coarse quantizer), turning O(N²) into O(Σ bucket²);
- centroids: per-label mean vector via posexplode/groupBy — the building
  block for J4 (doc↔topic-centroid similarity) and IVF assignment.

Vector math is double-precision sequential-sum (``functions.vectors``) so
DuckDB's ``list_cosine_similarity`` on DOUBLE[] matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..registry import register
from ..sources import load_table
from .clustering import _sql_lloyd

N_QUERIES = 10
TOP_K = 5


@register(
    "embedding_norms",
    sql="""
SELECT vec_id,
       CAST(length(embedding) AS INT) AS dim,
       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm
FROM embeddings
""",
    tags=("similarity",),
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-math warm-up: per-row L2 norm, pure codegen expression."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = V.as_double("embedding")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(V.norm(emb), 6).alias("l2_norm"),
    )


@register(
    "ann_cosine_topk",
    sql=f"""
SELECT q.vec_id AS query_id,
       c.vec_id AS neighbor_id,
       round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine,
       row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                    c.vec_id) AS rank
FROM embeddings q
JOIN embeddings c ON q.vec_id <> c.vec_id
WHERE q.vec_id < {N_QUERIES}
QUALIFY rank <= {TOP_K}
""",
    tags=("similarity", "flagship"),
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the correctness baseline for ANN.

    The query set is broadcast (it is small by construction), so the
    corpus-side scan never shuffles — each partition scores its rows
    against all queries and the per-query top-k window runs on a
    (n_queries × N) intermediate. The scale path is
    ``label_bucket_topk_pairs``.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), V.as_double("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), V.as_double("embedding").alias("c_emb"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            V.cosine(F.col("q_emb"), F.col("c_emb")).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "neighbor_id", F.round("cos_raw", 6).alias("cosine"), "rank"
        )
    )


@register(
    "label_bucket_topk_pairs",
    sql="""
SELECT a.label,
       a.vec_id AS vec_a,
       b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine,
       row_number() OVER (
           PARTITION BY a.label
           ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
                    a.vec_id, b.vec_id) AS rank
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
QUALIFY rank <= 10
""",
    tags=("similarity", "scale"),
)
def q_label_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style bucketed similarity: candidate pairs only within the same
    coarse bucket (label), shuffling both sides on the bucket key. Pair
    cost drops from O(N²) to O(Σ_b n_b²); at 100 TB the bucket key comes
    from a KMeans coarse quantizer instead of a given label."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select("label", F.col("vec_id").alias("vec_a"), V.as_double("embedding").alias("ea"))
    b = e.select("label", F.col("vec_id").alias("vec_b"), V.as_double("embedding").alias("eb"))
    pairs = a.join(b, "label").filter(F.col("vec_a") < F.col("vec_b"))
    scored = pairs.select(
        "label", "vec_a", "vec_b", V.cosine(F.col("ea"), F.col("eb")).alias("cos_raw")
    )
    w = Window.partitionBy("label").orderBy(
        F.desc("cos_raw"), F.asc("vec_a"), F.asc("vec_b")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("label", "vec_a", "vec_b", F.round("cos_raw", 6).alias("cosine"), "rank")
    )


@register(
    "centroid_by_label",
    sql="""
WITH pos AS (
    SELECT label,
           unnest(embedding)::DOUBLE AS v,
           unnest(range(1, length(embedding) + 1)) AS pos
    FROM embeddings
),
cent AS (
    SELECT label, pos, avg(v) AS c FROM pos GROUP BY label, pos
)
SELECT label,
       round(sqrt(sum(c * c)), 6) AS centroid_norm,
       CAST(count(*) AS INT) AS dim
FROM cent
GROUP BY label
""",
    tags=("similarity", "cluster"),
)
def q_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid via posexplode + two-level aggregation (SURVEY
    M13's cluster-center step as pure DataFrame algebra). The shuffle
    carries (label, pos) partial sums — dimension-parallel, no driver
    materialization of any matrix."""
    e = load_table(spark, sf_dir, "embeddings")
    pos = e.select(
        "label", F.posexplode(V.as_double("embedding")).alias("pos0", "v")
    )
    cent = pos.groupBy("label", "pos0").agg(F.avg("v").alias("c"))
    return (
        cent.groupBy("label")
        .agg(
            F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias("centroid_norm"),
            F.count("*").cast("int").alias("dim"),
        )
    )


@register(
    "doc_centroid_similarity",
    sql=f"""
WITH pos AS (
    SELECT label,
           unnest(embedding)::DOUBLE AS v,
           unnest(range(1, length(embedding) + 1)) AS pos
    FROM embeddings
),
cent AS (
    SELECT label, pos, avg(v) AS c FROM pos GROUP BY label, pos
),
centv AS (
    SELECT label, list(c ORDER BY pos) AS cvec FROM cent GROUP BY label
)
SELECT e.vec_id, e.label,
       round((list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) + 1) / 2, 6)
           AS norm_similarity
FROM embeddings e
JOIN centv c ON c.label = e.label
WHERE e.vec_id < 100
""",
    tags=("similarity", "cluster"),
)
def q_doc_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY J4: cosine(doc embedding, own-cluster centroid), normalized
    (x+1)/2 exactly as ``BERTopic_Analysis.py:574-589``. Centroids are tiny
    (K × d) → broadcast join against the member rows."""
    e = load_table(spark, sf_dir, "embeddings")
    pos = e.select("label", F.posexplode(V.as_double("embedding")).alias("pos0", "v"))
    cent = pos.groupBy("label", "pos0").agg(F.avg("v").alias("c"))
    centv = cent.groupBy("label").agg(
        F.array_sort(
            F.collect_list(F.struct("pos0", "c"))
        ).alias("pc")
    ).select("label", F.transform("pc", lambda s: s["c"]).alias("cvec"))
    docs = e.filter(F.col("vec_id") < 100).select(
        "vec_id", "label", V.as_double("embedding").alias("emb")
    )
    return docs.join(F.broadcast(centv), "label").select(
        "vec_id",
        "label",
        F.round((V.cosine(F.col("emb"), F.col("cvec")) + 1) / 2, 6).alias(
            "norm_similarity"
        ),
    )


LSH_BITS = 8  # axis-aligned hyperplane signs -> 2^8 buckets
# the synthetic corpus plants no embedding-level duplicates (max in-bucket
# cosine ~0.43) -- 0.3 keeps the pair path exercised with real output
NEAR_DUP_COS = 0.3

# --- hash-FALLBACK bucket-width seam (r12 verdict task 3) -------------
# The budget refusal in semantic_dedup_full's hash branch used to tell
# the operator to "widen the fallback bucket space (more sign bits)",
# but the only lever was a source edit of LSH_BITS that moved the TABLE
# space too. The fallback space now DERIVES its sign-bit count from the
# observed unembedded-tail size (fallback_lsh_bits below): the smallest
# b in [LSH_BITS, FALLBACK_MAX_BITS] whose 2^b buckets hold the tail at
# <= FALLBACK_TARGET_BUCKET_DOCS expected docs per bucket. Small tails
# (every test SF) resolve to LSH_BITS — behavior unchanged there — and
# a tail that outgrows the 8-bit space widens automatically, with the
# DuckDB oracle computing the identical integer rule from the same
# tail count (sql_fallback_bits_cte), so both engines move together.
# FALLBACK_MAX_BITS is bounded by the hash-embedding dimensionality
# (each sign bit consumes one component, encoder.ENCODER_DIM = 16).
FALLBACK_TARGET_BUCKET_DOCS = 64  # ~2k expected in-bucket pairs
FALLBACK_MAX_BITS = 16  # == functions.encoder.ENCODER_DIM


def fallback_lsh_bits(n_tail: int) -> int:
    """Sign-bit count for the hash-fallback space, derived from the
    observed tail size: smallest b in [LSH_BITS, FALLBACK_MAX_BITS]
    with n_tail <= FALLBACK_TARGET_BUCKET_DOCS * 2^b (pure integer
    arithmetic so the SQL oracle replays it exactly); capped at
    FALLBACK_MAX_BITS when even the widest space is over-full — the
    hot-bucket budget then remains the loud backstop."""
    for b in range(LSH_BITS, FALLBACK_MAX_BITS + 1):
        if n_tail <= FALLBACK_TARGET_BUCKET_DOCS << b:
            return b
    return FALLBACK_MAX_BITS


def sql_sign_bucket(col: str = "emb", bits: int = LSH_BITS) -> str:
    """DuckDB sum-of-sign-bits bucket expression for a FIXED bit count,
    generated from the same constants as ``sign_lsh_bucket`` (r12
    ADVICE: hand-copied range(8) bit weights in each SQL builder would
    silently desync the oracle from the gate when the bit count
    moves — there is now exactly one generator)."""
    return " + ".join(
        f"(CASE WHEN {col}[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )


def sql_fallback_bits_cte(tail_cte: str, name: str) -> str:
    """CTE computing the DERIVED fallback bit count from the tail
    count, in integer lockstep with ``fallback_lsh_bits``. ``name``
    must be unique per composed statement (DuckDB CTE names are global
    per statement)."""
    return f"""{name} AS (
    SELECT coalesce(min(b), {FALLBACK_MAX_BITS}) AS bits
    FROM (SELECT unnest(range({LSH_BITS}, {FALLBACK_MAX_BITS + 1})) AS b)
    WHERE (SELECT count(*) FROM {tail_cte})
          <= {FALLBACK_TARGET_BUCKET_DOCS} * (1 << b)
)"""


def sql_sign_bucket_dynamic(col: str, bits_cte: str) -> str:
    """DuckDB sign-bucket expression whose bit count comes from a
    ``sql_fallback_bits_cte`` scalar at query time — the oracle-side
    face of the derived fallback bucket width."""
    return " + ".join(
        f"(CASE WHEN {i} < (SELECT bits FROM {bits_cte}) "
        f"AND {col}[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(FALLBACK_MAX_BITS)
    )


def sign_lsh_bucket(emb: F.Column, bits: int = LSH_BITS) -> F.Column:
    """THE sign-LSH candidate-bucket rule: sum of 1<<i over the first
    ``bits`` components strictly > 0 (default {LSH_BITS}). Shared by
    the batch ``embedding_near_dup`` and the streaming ingest's vector
    store — bucket parity between the two IS the precondition that
    makes the store's partition pruning exact (candidates only form
    inside a bucket), so there must be exactly one copy of this
    expression. The hash-fallback space passes the DERIVED bit count
    (``fallback_lsh_bits``); every table-space face pins the default."""
    bucket = None
    for i in range(bits):
        bit = F.when(emb[i] > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket


@register(
    "embedding_near_dup",
    sql=f"""
WITH sig AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb,
           {sql_sign_bucket('embedding')} AS bucket
    FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
FROM sig a
JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= {NEAR_DUP_COS}
""",
    tags=("similarity", "dedup", "lsh"),
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-LSH (random-hyperplane
    LSH with axis-aligned planes — deterministic, oracle-reproducible).

    Scale path: bucket key = sign bits of the first {LSH_BITS} components;
    candidate pairs only form inside a bucket (equi-join on ``bucket``, a
    plain shuffle-hash join), then the exact cosine filter keeps pairs
    ≥ {NEAR_DUP_COS}. O(N²) → O(Σ bucket²); more planes = smaller buckets.
    In production the planes come from a seeded Gaussian matrix broadcast to
    executors; axis-aligned planes keep the DuckDB oracle exact."""
    e = load_table(spark, sf_dir, "embeddings")
    sig = e.select(
        "vec_id",
        V.as_double("embedding").alias("emb"),
        sign_lsh_bucket(F.col("embedding")).alias("bucket"),
    )
    a = sig.select(
        F.col("vec_id").alias("id_a"), F.col("emb").alias("ea"), "bucket"
    )
    b = sig.select(
        F.col("vec_id").alias("id_b"), F.col("emb").alias("eb"), "bucket"
    )
    cos = V.cosine(F.col("ea"), F.col("eb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= NEAR_DUP_COS)
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
    )


IVF_NLIST = 16  # coarse-quantizer cells
# synthetic test embeddings are ~uniform random -- the adversarial case for
# IVF (true neighbors spread across cells); 4/16 cells keeps recall useful.
# Clustered real-world embeddings do far better at the same nprobe.
IVF_NPROBE = 4  # cells searched per query


IVF_ITERS = 2  # Lloyd rounds for the coarse quantizer


@register(
    "ivf_cosine_topk",
    sql=f"""
WITH {_sql_lloyd(IVF_NLIST, IVF_ITERS)},
emb_d AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
    FROM embeddings
),
carr AS (
    SELECT cluster AS cell, list(val ORDER BY dim) AS cvec
    FROM c{IVF_ITERS - 1} GROUP BY cluster
),
probes AS (
    SELECT q.vec_id AS query_id, c.cell,
           list_cosine_similarity(q.emb, c.cvec) AS ccos
    FROM emb_d q, carr c
    WHERE q.vec_id < {N_QUERIES}
    QUALIFY row_number() OVER (PARTITION BY q.vec_id
                               ORDER BY ccos DESC, c.cell) <= {IVF_NPROBE}
),
cand AS (
    SELECT p.query_id, a.vec_id AS neighbor_id
    FROM probes p JOIN a{IVF_ITERS} a ON a.cluster = p.cell
    WHERE a.vec_id <> p.query_id
)
SELECT c.query_id, c.neighbor_id,
       round(list_cosine_similarity(q.emb, n.emb), 6) AS cosine,
       row_number() OVER (
           PARTITION BY c.query_id
           ORDER BY list_cosine_similarity(q.emb, n.emb) DESC, c.neighbor_id
       ) AS rank
FROM cand c
JOIN emb_d q ON q.vec_id = c.query_id
JOIN emb_d n ON n.vec_id = c.neighbor_id
QUALIFY rank <= {TOP_K}
""",
    tags=("similarity", "ann", "scale"),
)
def q_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbor — the production ANN path:

    1. fit a deterministic Lloyd coarse quantizer (k={IVF_NLIST},
       {IVF_ITERS} rounds — ``operators.clustering``);
    2. assign every vector to its cell (the inverted file);
    3. per query, probe the {IVF_NPROBE} nearest cells and rank only their
       members by exact cosine.

    At 100 TB the inverted file is a partitioned table clustered by cell —
    each probe is a partition-pruned scan, candidates shrink by
    ~nlist/nprobe, and the final top-k is a per-query rank window. The
    deterministic quantizer (pinned init/tie-breaks, 9-dp centroid
    rounding on both engines) makes the WHOLE index + search replayable in
    DuckDB — an exact value-hash oracle for an ANN pipeline; the
    recall-vs-brute-force contract is additionally pinned by a test."""
    from .clustering import lloyd_fit

    assigned_raw, centroids = lloyd_fit(spark, sf_dir, IVF_NLIST, IVF_ITERS)
    assigned = assigned_raw.select(
        "vec_id", "emb", F.col("cluster").alias("cell")
    )
    # the codebook: nlist × d doubles, already 9-dp rounded by the fit
    centers_df = spark.createDataFrame(
        [(c, list(v)) for c, v in centroids], ["cell", "cvec"]
    )

    queries = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    # probe the nprobe nearest cells per query (K×nlist tiny cross join)
    probe_rank = Window.partitionBy("query_id").orderBy(
        F.desc("ccos"), F.asc("cell")
    )
    probes = (
        queries.crossJoin(F.broadcast(centers_df))
        .select(
            "query_id",
            "qemb",
            "cell",
            V.cosine(F.col("qemb"), F.col("cvec")).alias("ccos"),
        )
        .withColumn("r", F.row_number().over(probe_rank))
        .filter(F.col("r") <= IVF_NPROBE)
        .select("query_id", "qemb", "cell")
    )
    # exact cosine only against members of probed cells
    cand = probes.join(assigned, "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    rank = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.cosine(F.col("qemb"), F.col("emb")), 6).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(rank))
        .filter(F.col("rank") <= TOP_K)
    )


@register(
    "embedding_quantize_int8",
    sql="""
WITH base AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
           list_max(list_transform(embedding,
                                   x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
    FROM embeddings
),
q AS (
    SELECT vec_id, emb, scale,
           list_transform(emb, x -> round(x / scale) * scale) AS deq
    FROM base
)
SELECT vec_id,
       round(scale, 6) AS scale,
       round(list_cosine_similarity(emb, deq), 6) AS fidelity,
       round(sqrt(list_dot_product(
                 list_transform(range(1, length(emb) + 1),
                                i -> emb[i] - deq[i]),
                 list_transform(range(1, length(emb) + 1),
                                i -> emb[i] - deq[i]))), 6) AS l2_err
FROM q
""",
    tags=("similarity", "quantization", "scale"),
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the 4×
    memory/storage reduction every 100 TB vector store applies before ANN:
    per-vector scale = max|x|/127, codes = round(x/scale). Reported per
    vector: the scale, cosine fidelity of the dequantized vector (≈1), and
    the L2 reconstruction error — all pure array expressions, zero
    shuffles, and the integer codes are engine-portable so the whole
    round-trip has an exact DuckDB oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        V.as_double("embedding").alias("emb"),
        (
            F.array_max(F.transform(V.as_double("embedding"), F.abs)) / 127.0
        ).alias("scale"),
    )
    q = base.select(
        "vec_id",
        "emb",
        "scale",
        F.transform(
            "emb", lambda x: F.round(x / F.col("scale"), 0) * F.col("scale")
        ).alias("deq"),
    )
    diff = F.zip_with("emb", "deq", lambda a, b: a - b)
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.round(V.cosine(F.col("emb"), F.col("deq")), 6).alias("fidelity"),
        F.round(F.sqrt(V.dot(diff, diff)), 6).alias("l2_err"),
    )


HN_TOP_K = 3


@register(
    "hard_negatives",
    sql=f"""
SELECT q.vec_id AS query_id,
       c.vec_id AS negative_id,
       c.label AS negative_label,
       round(list_cosine_similarity(q.embedding::DOUBLE[],
                                    c.embedding::DOUBLE[]), 6) AS cosine,
       row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                           c.embedding::DOUBLE[]) DESC,
                    c.vec_id) AS rank
FROM embeddings q
JOIN embeddings c ON c.label <> q.label
WHERE q.vec_id < {N_QUERIES}
QUALIFY rank <= {HN_TOP_K}
""",
    tags=("similarity", "training-data", "scale"),
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — the contrastive-training data op: for each
    anchor, the most-similar vectors with a DIFFERENT label (the examples
    an embedding model most needs to push apart). Same broadcast-anchor
    scan shape as the brute-force top-k (anchors broadcast, corpus never
    shuffles, `WindowGroupLimit` prunes per-anchor); at 100 TB swap the
    full scan for the IVF/PQ candidate generation and keep this ranking
    stage unchanged."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        V.as_double("embedding").alias("q_emb"),
    )
    c = e.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        V.as_double("embedding").alias("c_emb"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("negative_label") != F.col("q_label"))
        .select(
            "query_id",
            "negative_id",
            "negative_label",
            V.cosine(F.col("q_emb"), F.col("c_emb")).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("negative_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HN_TOP_K)
        .select(
            "query_id",
            "negative_id",
            "negative_label",
            F.round("cos_raw", 6).alias("cosine"),
            "rank",
        )
    )


# the recall harness composes the two registered oracles verbatim — one
# source of truth for both the search and its evaluation
from ..registry import REGISTRY as _REG  # noqa: E402


@register(
    "ivf_recall_eval",
    sql=f"""
WITH bf AS ({_REG["ann_cosine_topk"].sql}),
iv AS ({_REG["ivf_cosine_topk"].sql})
SELECT bf.query_id,
       count(iv.neighbor_id) AS n_hits,
       round(count(iv.neighbor_id) * 1.0 / {TOP_K}, 6) AS recall_at_k
FROM bf
LEFT JOIN iv ON iv.query_id = bf.query_id AND iv.neighbor_id = bf.neighbor_id
GROUP BY bf.query_id
ORDER BY bf.query_id
""",
    tags=("similarity", "ann", "eval"),
)
def q_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality harness: per-query recall@k of the IVF path against the
    exact brute-force top-k — the evaluation every production ANN index
    ships with (FAISS-style recall@k).

    Both inputs are the already-registered, individually exact-oracled
    queries; this composes their results with a tiny (n_queries × k)-row
    left join + rollup, so the eval costs nothing beyond the two searches
    it grades. At 100 TB the brute-force side runs on a sampled query set
    (it is the ground truth, not the serving path)."""
    bf = q_ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    iv = (
        q_ivf_cosine_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        bf.join(iv, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("n_hits"),
            F.round(F.count("hit") / F.lit(float(TOP_K)), 6).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )
