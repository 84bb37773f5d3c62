"""Structured Streaming surface (SURVEY §2.8 / §7.2 step 8).

The reference is batch-only — its docs list "online topic modeling of
real-time streams" as future work (``BERTopic_guideline.md:175``). The
engine exposes its event/text pipeline over Structured Streaming as the
scale extension: the SAME column expressions used by the batch operators
(``operators/events.py``, ``operators/frequency.py``) are applied to a
``readStream`` DataFrame, so batch and streaming stay semantically twinned
— each streaming pipeline here has a batch query in the registry whose
results the tests compare against.

Design notes for real deployments:
- File source here (the driver testdata is static parquet); swap for Kafka
  by replacing ``read_events_stream`` only — everything downstream is
  source-agnostic.
- Watermarks bound state: windowed aggregates drop state once the watermark
  passes the window end, so state size is O(windows-in-flight), not O(data).
- ``session_window`` is the streaming-native sessionization; the batch twin
  (``sessionize_events``) uses the lag/cumsum pattern. Both use the same
  30-minute gap.
- The stateful per-user totals operator uses ``applyInPandasWithState`` —
  the PySpark arbitrary-stateful-processing hook (Arrow-batched per group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions import hashing as H
from ..functions import text as TX
from ..operators.events import SESSION_GAP_SECONDS

WATERMARK = "2 hours"


def _one_row_audit(spark: SparkSession, schema: str, *values) -> DataFrame:
    """One-row audit/card DataFrame built as a single JVM partition.

    ``spark.createDataFrame([row])`` parallelizes the Python list into
    defaultParallelism Python-RDD partitions, and the sink-side
    ``coalesce(1)`` then evaluates every one of those Python partitions
    SERIALLY in one task — measured ~5 s per one-row card write at
    local[32], a fixed tax on every micro-batch of every pipeline that
    writes a delta card (guide §4: the boundary crossing is the cost,
    not the row). Projecting the values as literals over ``range(1)``
    keeps the whole row one codegen'd JVM task (~0.1 s) with identical
    values and column types."""
    cols = []
    for spec, v in zip(schema.split(", "), values):
        name, typ = spec.rsplit(" ", 1)
        cols.append(F.lit(v).cast(typ).alias(name))
    return spark.range(1).select(*cols).coalesce(1)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table.

    The file source replays existing files then tails the directory — the
    standard pattern for reprocessing + live ingest. Schema comes from a
    metadata-only batch read (streaming sources require an explicit schema;
    inferring from the footer costs nothing and keeps one source of truth).
    ``ts`` is normalized to a microsecond timestamp exactly like the batch
    loader (handles both TIMESTAMP(NANOS)-as-int64 and native timestamp
    files) so batch/stream results compare equal.
    """
    from ..sources.tables import _read_nanos_parquet, normalize_event_ts

    path = f"{sf_dir}/events.parquet"
    schema = _read_nanos_parquet(spark, path).schema
    # the file source wants a directory; glob-filter selects this table's
    # file(s) from the shared dataset directory
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(raw)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def read_documents_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Streaming JSON-lines document source — the streaming face of
    ``sources.read_jsonl`` (crawls and annotation vendors deliver JSONL;
    this feeds it straight into the ingest/incremental-manifest gates).
    Same contract as the batch reader: explicit schema, PERMISSIVE with
    a named corrupt column, so malformed lines arrive as quarantine rows
    (nulls + raw text) instead of silently vanishing mid-stream — drop
    or sink them in the first stage of the consuming pipeline. The
    returned stream EXCLUDES the corrupt column from downstream gate
    columns only when the caller selects; it is carried so a
    foreachBatch consumer can count/audit bad lines per batch."""
    from pyspark.sql.types import StringType, StructField, StructType

    if corrupt_col not in schema.fieldNames():
        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType())]
        )
    return (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def hourly_event_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type with a 2-hour watermark —
    the streaming twin of the batch ``events_hourly`` query."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def sliding_type_counts(events: DataFrame) -> DataFrame:
    """Sliding 1-hour window, 15-minute slide: each event lands in 4
    overlapping windows (late-data handled by the watermark)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "cnt",
        )
    )


def session_event_counts(events: DataFrame) -> DataFrame:
    """Streaming sessionization with ``session_window`` (30-min inactivity
    gap, same constant as the batch lag/cumsum sessionizer)."""
    gap = f"{SESSION_GAP_SECONDS} seconds"
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def streaming_word_count(docs: DataFrame) -> DataFrame:
    """The flagship word-frequency pipeline (SURVEY §3.1) as a streaming
    aggregation — identical column expressions to the batch ``word_count``
    query, minus the top-k (global sort is a batch-side concern; at stream
    time you keep the full running counts and top-k at read time)."""
    return (
        docs.select(F.explode(TX.tokens(TX.cleaned("text"))).alias("word"))
        .filter(F.length("word") >= 2)
        .filter(~F.col("word").isin(*TX.ENGLISH_STOPWORDS))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def read_embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{sf_dir}/embeddings.parquet"
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )


def streaming_topic_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online topic assignment — the reference's listed future work
    (``BERTopic_guideline.md:175``): as embedding rows stream in, assign
    each to the nearest (batch-trained) topic centroid by cosine.

    Fully stateless: the K centroids (tiny — K×d doubles) are collected at
    plan-build time and inlined as literal arrays, so each stream row is a
    single projection — cosine against every centroid + argmax inside one
    expression. No stream aggregation means no per-key state, append output
    mode, and watermark-free operation; every micro-batch emits exactly its
    own rows. Swapping in a refreshed centroid table = rebuild the query
    (the standard stream-static restart pattern)."""
    import math

    from pyspark.sql import functions as SF

    from ..functions import vectors as V

    e_static = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pos = e_static.select(
        "label", SF.posexplode(V.as_double("embedding")).alias("pos0", "v")
    )
    cent = pos.groupBy("label", "pos0").agg(SF.avg("v").alias("c"))
    centv = (
        cent.groupBy("label")
        .agg(SF.array_sort(SF.collect_list(SF.struct("pos0", "c"))).alias("pc"))
        .select(
            SF.col("label").alias("topic"),
            SF.transform("pc", lambda s: s["c"]).alias("cvec"),
        )
    )
    cent_rows = centv.collect()  # K rows — the broadcast-sized model

    stream = read_embeddings_stream(spark, sf_dir)
    return assign_to_centroids(stream, cent_rows)


def assign_to_centroids(df: DataFrame, cent_rows) -> DataFrame:
    """Nearest-centroid argmax as ONE stateless projection over
    (vec_id, embedding) rows. ``cent_rows`` are collected (topic, cvec)
    rows — the broadcast-sized model, inlined as literal arrays. Shared by
    the inlined streaming plan and the per-batch refreshing variant."""
    import math

    from pyspark.sql import functions as SF

    from ..functions import vectors as V

    emb = V.as_double("embedding")
    withn = df.select("vec_id", emb.alias("e"), V.norm(emb).alias("ne"))
    # math.sqrt over the same left-to-right Python sum gives the identical
    # double as V.norm's sequential fold, keeping stream == batch bitwise
    scored = SF.array(
        *[
            SF.struct(
                (
                    V.dot(
                        SF.col("e"),
                        SF.array(*[SF.lit(float(x)) for x in r["cvec"]]),
                    )
                    / (
                        SF.col("ne")
                        * SF.lit(math.sqrt(sum(x * x for x in r["cvec"])))
                    )
                ).alias("cos"),
                SF.lit(int(r["topic"])).cast("long").alias("topic"),
            )
            for r in cent_rows
        ]
    )
    # array_max on array<struct> compares (cos, topic) lexicographically —
    # the per-row argmax, no aggregation anywhere in the streaming plan
    best = SF.array_max(scored).alias("best")
    return withn.select("vec_id", best).select(
        "vec_id",
        SF.col("best.topic").alias("topic"),
        SF.round(SF.col("best.cos"), 6).alias("cosine"),
    )


def run_streaming_topic_assign_refreshing(
    spark: SparkSession,
    stream: DataFrame,
    centroid_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    on_batch_done=None,
) -> None:
    """Centroid-REFRESHING online topic assignment (VERDICT r2 item 7).

    ``streaming_topic_assign`` inlines the centroids at plan-build time, so
    a refreshed model needs a query rebuild. This variant moves assignment
    into ``foreachBatch``: every micro-batch re-reads the centroid table
    and builds that batch's projection against the CURRENT model — the
    standard periodically-retrained-model serving pattern. Still stateless
    (no streaming aggregation, no watermark).

    Exactly-once: foreachBatch only REPLAYS a failed batch with the same
    ``batch_id`` — idempotency is the sink's job — so each batch
    OVERWRITES its own ``batch=<id>`` partition directory. A replay
    rewrites that partition instead of appending duplicates; readers see
    ``batch`` as an ordinary partition column.

    ``on_batch_done(batch_id)`` is a test seam invoked after each batch's
    write — e.g. to swap the centroid table mid-query and observe the next
    batch following it without a restart.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cent_rows = spark.read.parquet(centroid_dir).collect()
        assigned = assign_to_centroids(batch_df, cent_rows)
        assigned.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        if on_batch_done is not None:
            on_batch_done(batch_id)

    (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ------------------------------------------------- arbitrary stateful op

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
    ]
)

_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("batch_events", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)


def user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    lifetime event count carried in group state across micro-batches.

    This is the engine's template for reference-style stateful extensions
    (e.g. online topic-assignment counters): state is a single tiny row per
    key, input arrives Arrow-batched per group, and the emitted row stream
    is append-only.
    """
    import pandas as pd  # noqa: F401  (imported for the worker closure)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        total = state.get[0] if state.exists else 0
        batch = 0
        last_ts = None
        for pdf in pdf_iter:
            batch += len(pdf)
            m = pdf["ts"].max()
            if last_ts is None or m > last_ts:
                last_ts = m
        total += batch
        state.update((total,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [total],
                "batch_events": [batch],
                "last_ts": [last_ts],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    df: DataFrame, name: str, checkpoint_dir: str, output_mode: str = "complete"
):
    """Execute a streaming DataFrame to completion against the in-memory
    sink with ``availableNow`` (process-everything-then-stop — the batch
    replay trigger) and return the finished query. Results land in the
    temp view ``name``."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_event_dedup(events: DataFrame) -> DataFrame:
    """Ingest-time exact dedup for at-least-once delivery (beyond-reference
    training-pipeline surface): each ``event_id`` is emitted once;
    redeliveries arriving within the watermark horizon are dropped.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``) bounds
    the dedup state: keys older than the watermark are evicted, so state is
    O(events per horizon), not O(all events ever) — the difference between
    a pipeline that runs for a day and one that runs forever at 100 TB."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


ATTRIBUTION_WINDOW_SECONDS = 1800  # purchase credited to a click ≤ 30 min prior


def click_purchase_attribution(events: DataFrame) -> DataFrame:
    """Stream-stream inner join: attribute each purchase to every click by
    the same user in the preceding 30 minutes.

    The canonical two-stream correlation pattern: BOTH sides carry a
    watermark and the join condition bounds purchase_ts relative to
    click_ts, so each side's state store holds only the events inside the
    attribution horizon — late rows past the watermark are dropped and
    matched state is evicted, keeping state O(events per 30 min + slack),
    not O(stream). Output mode is append (inner stream-stream joins emit
    exactly once, when both sides have arrived)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", WATERMARK)
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_SECONDS} SECONDS")
        )
    )
    return clicks.join(purchases, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.round("purchase_value", 2).alias("purchase_value"),
        # same µs-floor formula as the batch click_attribution query
        F.floor(
            (F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts")))
            / 1_000_000
        )
        .cast("long")
        .alias("lag_seconds"),
    )


def streaming_enrich_events(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static enrichment join — the dimension-lookup pattern every
    event pipeline needs: each micro-batch joins against the (slowly
    changing) customer dimension snapshot.

    The static side carries NO forced broadcast hint: stream-static
    joins re-plan per trigger, so Catalyst/AQE broadcasts a
    broadcast-sized dimension and degrades to a per-batch shuffle join
    when the dimension outgrows it — a forced hint would turn that
    graceful degradation into an OOM (r10 verdict task 1). Either way
    the join is stateless (no watermark or state store) and picks up
    dimension updates at each trigger."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return events.join(dim, "user_id", "left").select(
        "event_id", "ts", "user_id", "event_type", "value", "user_name", "segment"
    )


# ------------------------------------- cross-batch ingest dedup (store)


# exact-Jaccard gate store layout: the stored shingle sets live in a
# BUCKETED sibling table (one row per (doc, distinct shingle), partitioned
# by batch AND by shingle-hash bucket = shv % JACCARD_STORE_BUCKETS), so a
# micro-batch probes only the bucket partitions its own shingles hash
# into — partition pruning cuts the store scan from O(store) to
# O(matching buckets) per batch (r7 verdict task 2). Pruning by bucket
# removes only rows whose shingle hash cannot equal any batch shingle
# (the candidate join is an equi-join on shv), so the drop set — and the
# batch-twin parity — is unchanged.
JACCARD_STORE_BUCKETS = 256
# audit threshold for store_hot_shingles: a shingle held by more stored
# docs than this is corpus-wide boilerplate fanning out the candidate
# join (the winnowing_hot_fingerprints convention, retrieval.WINNOW_HOT_CAP)
JACCARD_HOT_SHINGLE_CAP = 64

# Per-batch candidate BUDGETS for the store probes (r9 verdict task 6,
# the semantic_dedup discipline: a budget with loud refusal, dedup.py).
# The within-bucket probe joins are exact and therefore uncapped in
# SHAPE — a degenerate store (corpus-wide boilerplate shingles, an
# anisotropic embedding distribution piling vectors into one sign-LSH
# orthant) makes each micro-batch pay O(batch x occupancy). Before
# running the join, each gate counts its store-candidate rows with one
# aggregation over the already-pruned scan (Σ per-key store-count x
# batch-count — the exact row count the join would produce) and REFUSES
# loudly past the budget instead of running quadratic: the fix at that
# point is upstream (strip the boilerplate, add LSH planes), and the
# `store_hot_shingles` / `store_hot_buckets` audits name the offenders.
# Budgets bound the STORE side (the one that grows with stream
# lifetime); the within-batch side is micro-batch-bounded by
# construction. None disables a budget explicitly.
JACCARD_CANDIDATE_BUDGET = 2_000_000
VECTOR_CANDIDATE_BUDGET = 2_000_000


def _check_store_candidate_budget(
    store_side: DataFrame,
    batch_side: DataFrame,
    key: str,
    budget: int | None,
    batch_id: int,
    gate: str,
    knob: str,
    audit: str,
    remedy: str,
) -> None:
    """The candidate budget with loud refusal, ONE definition for every
    store probe (ingest Jaccard gate, ingest vector gate, incremental
    manifest — the 'one definition; the faces cannot drift' discipline):
    Σ per-``key`` (store-count x batch-count) is EXACTLY the row count
    the probe equi-join would produce — one count-aggregate over the
    already-pruned scan, far cheaper than materializing the pairs."""
    if budget is None:
        return
    n_cand = (
        store_side.groupBy(key)
        .agg(F.count("*").alias("cs"))
        .join(
            F.broadcast(
                batch_side.groupBy(key).agg(F.count("*").alias("cb"))
            ),
            key,
        )
        .agg(F.sum(F.col("cs") * F.col("cb")))
        .first()[0]
        or 0
    )
    if n_cand > budget:
        raise ValueError(
            f"{gate}: batch {batch_id} would form {n_cand} store "
            f"candidate pairs, over the {budget} budget ({knob}) — run "
            f"{audit} to name the offenders; {remedy} (or raise the "
            "budget deliberately) instead of letting the batch run "
            "quadratic"
        )


def shingle_store_dir(store_dir: str) -> str:
    """Sibling directory holding the bucketed shingle store for the
    exact-Jaccard gate: ``<fingerprint store>_shingles``."""
    return store_dir.rstrip("/") + "_shingles"


def store_hot_shingles(
    spark: SparkSession,
    store_dir: str,
    cap: int = JACCARD_HOT_SHINGLE_CAP,
) -> DataFrame:
    """Audit the exact-Jaccard gate's shingle store for hot shingles:
    shingle hashes held by more than ``cap`` stored documents, with their
    document counts, hottest first. A corpus-common 3-shingle (site
    boilerplate, license headers) pairs every new doc carrying it with a
    huge fraction of the store before the Jaccard filter prunes — the
    same blowup ``winnowing_hot_fingerprints`` names for the batch
    winnowing join. The gate itself stays uncapped (parity with the
    batch ``near_dup_discard`` rule, which has none); this audit is how
    operators see the blowup coming and fix it upstream (boilerplate
    strip/gate). One groupBy over the bucketed store; output is bounded
    by the number of hot shingles."""
    sh = (
        spark.read.option("basePath", shingle_store_dir(store_dir))
        .schema(SHINGLE_STORE_SCHEMA)
        .parquet(shingle_store_dir(store_dir))
    )
    # each doc stores its DISTINCT shingles once (replays overwrite their
    # own batch partition), so count(*) == count of holding docs
    return (
        sh.groupBy("shv")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > cap)
        .orderBy(F.desc("n_docs"), F.asc("shv"))
    )


# the bucketed shingle store's fixed schema (data columns + the two
# partition columns). Declared EXPLICITLY on every read: a committed
# batch whose docs all had <3 tokens writes an empty partition (a
# _SUCCESS with no data files), and schema INFERENCE over a store whose
# batches are all empty raises "Unable to infer schema" on every
# replay — wedging the stream permanently (the same failure mode the
# fingerprint store's _temporary handling guards against).
SHINGLE_STORE_SCHEMA = (
    "o_id string, o_n int, shv bigint, bucket bigint, batch bigint"
)


def probe_shingle_store(
    spark: SparkSession, store_dir: str, batch_id: int, buckets: list
) -> DataFrame:
    """Bucket-pruned read of the exact-Jaccard shingle store: rows
    (o_id, o_n, shv) from batches strictly earlier than ``batch_id``
    whose bucket partition is in ``buckets``. Both filters land on
    partition columns, so the scan reads ONLY matching bucket dirs
    (the scan's file index selects a strict subset of partitions when
    the batch misses buckets — pinned in tests). Pruning by bucket
    removes only rows whose shv cannot equal any probing shingle, so a
    downstream equi-join on shv sees exactly the rows an unpruned scan
    would contribute."""
    sh_dir = shingle_store_dir(store_dir)
    return (
        spark.read.option("basePath", sh_dir)
        .schema(SHINGLE_STORE_SCHEMA)
        .parquet(sh_dir)
        .filter(F.col("batch") < F.lit(batch_id))
        .filter(F.col("bucket").isin(buckets))
        .select("o_id", "o_n", "shv")
    )


# --------------------------- embedding near-dup gate store (int8 + LSH)

# the embedding gate's vector store: INT8-quantized vectors PLUS the
# original floats in a bucketed sibling table (one row per stored doc,
# partitioned by batch AND by ``similarity.sign_lsh_bucket`` of the
# original embedding — the SAME axis-aligned 2^LSH_BITS-bucket rule as
# the batch ``embedding_near_dup``, whose candidate pairs only ever form
# inside a bucket; the rule has exactly one copy, so the two faces
# cannot drift). Because the candidate rule IS bucket equality, pruning
# the probe to this batch's buckets loses nothing: a stored vector in a
# bucket the batch doesn't hash into can never be a candidate.
# Quantization: symmetric per-vector int8 (scale = max|x|/127, the
# ``embedding_quantize_int8`` scheme); cosine is scale-invariant, so
# cosine over the raw int8 codes EQUALS cosine over the dequantized
# vectors — no scale column needed. The gate is TWO-TIER (r10 verdict
# task 6): the int8 codes prune candidates down to cosine >= threshold
# - EMB_COS_MARGIN (the margin provably covers the quantization error —
# see EMB_COS_MARGIN), and the float column decides >= threshold, so
# the drop set equals the batch float rule EXACTLY.


def vector_store_dir(store_dir: str) -> str:
    """Sibling directory holding the bucketed int8 vector store for the
    embedding near-dup gate: ``<fingerprint store>_vectors``."""
    return store_dir.rstrip("/") + "_vectors"


# declared EXPLICITLY on every read (the SHINGLE_STORE_SCHEMA rationale:
# schema inference over a store whose committed batches are all empty —
# every doc had a zero embedding — wedges the stream permanently)
VECTOR_STORE_SCHEMA = (
    "o_id string, q array<tinyint>, emb array<double>, "
    "bucket int, batch bigint"
)

# int8 prune margin for the two-tier cosine gate (r10 verdict task 6,
# corrected r11 ADVICE): symmetric max-abs int8 quantization perturbs
# each vector by at most sqrt(d) * mx/254 in L2 while ||x|| >= mx — a
# relative L2 error of sqrt(d)/254 per vector, and BOTH pair vectors are
# perturbed, so the conservative worst case is |cos(int8) - cos(float)|
# <= 4*sqrt(d)/254 (safe only to d <= ~40 for a 0.1 margin; realistic
# 384/768-d embeddings need ~0.31/0.44). The gate therefore DERIVES the
# margin from the observed embedding dimension per batch
# (int8_margin_bound below) unless the caller passes one explicitly, in
# which case an under-bound margin raises loudly instead of silently
# pruning true pairs — the loud-refusal discipline applied to the
# exactness guarantee itself. This constant remains only as the
# fallback for batches carrying no embeddings at all (no pairs form, so
# any value is vacuously safe).
EMB_COS_MARGIN = 0.1


def int8_margin_bound(d: int) -> float:
    """Conservative bound on |cos(int8) - cos(float)| for d-dim vectors
    under symmetric max-abs int8 quantization with BOTH pair sides
    quantized: 4*sqrt(d)/254. A prune margin at or above this provably
    keeps every true pair in the candidate set, so the float confirm
    tier decides the drop set exactly."""
    import math

    return 4.0 * math.sqrt(max(d, 1)) / 254.0


def _with_int8_embedding_cols(df: DataFrame) -> DataFrame:
    """Add the embedding gate's three columns to a batch table carrying
    an ``embedding`` column — ONE definition shared by the ingest
    pipeline and the incremental manifest (the sign_lsh_bucket
    discipline: the quantization scheme and bucket rule must be
    byte-identical across every face or the pruning-exactness argument
    breaks):

    - ``emb_bucket``: sign-LSH bucket from the ORIGINAL floats (the
      shared ``sign_lsh_bucket`` expression — bucket parity with the
      batch ``embedding_near_dup`` is the pruning-exactness
      precondition);
    - ``emb_q``: symmetric max-abs int8 codes (scale = max|x|/127, the
      ``embedding_quantize_int8`` scheme; cosine is scale-invariant so
      the codes need no scale column) — the cheap PRUNE tier;
    - ``emb_f``: the float vector riding along for the CONFIRM tier.

    Zero/absent embeddings get NULL in all three and bypass the gate,
    as NULL simhash does."""
    from ..functions import vectors as V
    from ..operators.similarity import sign_lsh_bucket

    emb = V.as_double(F.coalesce(F.col("embedding"), F.array()))
    mx = F.array_max(F.transform(emb, F.abs))
    bkt = sign_lsh_bucket(emb)
    return (
        df.withColumn(
            "emb_q",
            F.when(
                mx > 0,
                F.transform(
                    emb,
                    lambda x: F.round(x * F.lit(127.0) / mx).cast("tinyint"),
                ),
            ),
        )
        .withColumn("emb_bucket", F.when(mx > 0, bkt).cast("int"))
        .withColumn("emb_f", F.when(mx > 0, emb))
    )


def _resolve_prune_margin(
    vec_df: DataFrame, explicit: float | None, caller: str
) -> float:
    """Derive or validate the int8 prune margin against the OBSERVED
    embedding dimension (r11 ADVICE): with ``explicit`` None the margin
    is the provable bound for this batch's dimension; an explicit
    margin below the bound raises loudly — silently pruning true pairs
    would turn the exact-drop-set guarantee into silent
    under-deduplication. The bound uses the MAX observed dimension
    (one aggregate over the persisted batch table — r12 ADVICE: the
    earlier first() could observe the SMALLER side of a
    mixed-dimension batch nondeterministically, under-bounding the
    margin and silently pruning true pairs; max d is conservative for
    every pair in the batch). A batch with no embeddings forms no
    pairs, so any margin is vacuously safe there."""
    dmax = vec_df.agg(F.max(F.size("emb_f")).alias("d")).collect()[0]["d"]
    if dmax is None:
        return EMB_COS_MARGIN if explicit is None else explicit
    bound = int8_margin_bound(dmax)
    if explicit is None:
        return bound
    if explicit < bound:
        raise ValueError(
            f"{caller}: int8_prune_margin={explicit} is below the "
            f"quantization-error bound {bound:.6f} for the observed "
            f"{dmax}-dim embeddings (4*sqrt(d)/254 with both pair "
            "sides quantized) — the int8 prune tier would silently "
            "drop TRUE near-dup pairs and the drop set would no longer "
            "equal the batch float rule. Pass a margin >= the bound or "
            "omit it to derive per batch."
        )
    return explicit


# audit threshold for store_hot_buckets: a sign-LSH bucket holding more
# stored vectors than this fans the embedding gate's candidate join out
# (every new doc hashing there compares against the whole bucket)
EMB_HOT_BUCKET_CAP = 64


def store_hot_buckets(
    spark: SparkSession,
    store_dir: str,
    cap: int = EMB_HOT_BUCKET_CAP,
) -> DataFrame:
    """Audit the embedding gate's vector store for overloaded sign-LSH
    buckets: buckets holding more than ``cap`` stored vectors, with
    their counts, fullest first — the ``store_hot_shingles`` convention
    for the embedding tier. Axis-aligned sign-LSH degrades when the
    embedding distribution is anisotropic (most mass on one side of the
    early axes): candidates pile into a few buckets and the per-batch
    candidate join grows with bucket occupancy, not corpus size. The
    gate stays uncapped (parity with the batch ``embedding_near_dup``
    rule); this audit is how operators see the skew coming and fix it
    upstream (more planes, a learned rotation, or coarse-cluster
    bucketing). One groupBy over the bucketed store; output bounded by
    the number of hot buckets."""
    v = (
        spark.read.option("basePath", vector_store_dir(store_dir))
        .schema(VECTOR_STORE_SCHEMA)
        .parquet(vector_store_dir(store_dir))
    )
    return (
        v.groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > cap)
        .orderBy(F.desc("n_docs"), F.asc("bucket"))
    )


def probe_vector_store(
    spark: SparkSession, store_dir: str, batch_id: int, buckets: list
) -> DataFrame:
    """Bucket-pruned read of the embedding gate's vector store: rows
    (o_id, q) from batches strictly earlier than ``batch_id`` whose
    sign-LSH bucket partition is in ``buckets``. Both filters are on
    partition columns, so the scan reads only matching bucket dirs; the
    candidate rule is bucket equality, so pruning removes only vectors
    that could never pair with a probing doc."""
    v_dir = vector_store_dir(store_dir)
    return (
        spark.read.option("basePath", v_dir)
        .schema(VECTOR_STORE_SCHEMA)
        .parquet(v_dir)
        .filter(F.col("batch") < F.lit(batch_id))
        .filter(F.col("bucket").isin(buckets))
        .select("o_id", "q", "emb", "bucket")
    )


def run_streaming_ingest_dedup(
    spark: SparkSession,
    docs_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    quality_weights: list | None = None,
    min_quality_score: float = 0.5,
    near_dup_hamming: int | None = None,
    near_dup_jaccard: float | None = None,
    near_dup_cosine: float | None = None,
    max_jaccard_store_candidates: int | None = JACCARD_CANDIDATE_BUDGET,
    max_cosine_store_candidates: int | None = VECTOR_CANDIDATE_BUDGET,
    int8_prune_margin: float | None = None,
    drift_ref_bins: list | None = None,
    drift_out_dir: str | None = None,
    drift_threshold: float | None = None,
    decontam_bench_dir: str | None = None,
    card_out_dir: str | None = None,
) -> None:
    """Cross-batch document ingest dedup against a PERSISTENT fingerprint
    store — the streaming twin of the batch ``incremental_dedup`` query
    (the continuously-crawled-corpus shape a 100 TB training pipeline
    runs forever).

    With ``drift_ref_bins`` + ``drift_out_dir`` set (r7 verdict task 8),
    the same stream also MONITORS: each micro-batch's RAW document
    quality distribution (pre-gate, so the gates cannot mask incoming
    drift) is binned and scored against the reference with the shared
    ``psi_from_bins`` formula — identical to ``source_quality_psi`` and
    ``run_streaming_quality_drift`` (batch-twin pinned in tests) — and a
    one-row audit lands in ``drift_out_dir/batch=<id>`` (idempotent
    overwrite, so a crash replay rewrites rather than re-alarms). One
    stream curates AND monitors; the cost is one PSI_BINS-row aggregate
    per batch.

    Per micro-batch, inside ``foreachBatch``:
    0. (optional quality gate, r4 VERDICT task 7) drop documents whose
       trained-model score — ``quality_model.score_expr(weights)``, a
       broadcast-weights row-local column expression, stateless and
       shuffle-free — falls below ``min_quality_score``. Gated BEFORE
       fingerprinting: rejected docs never enter the store, so a later
       higher-quality duplicate of a rejected doc is still admitted;
    1. fingerprint the batch (16-byte md5 of the cleaned text — the same
       portable key as the batch operator, so the two paths agree);
    2. within-batch survivorship: deterministic min-``doc_id`` keeper;
    3. cross-batch: left-anti join against the store — only fixed-width
       keys probe, never document bodies;
    3b. (optional near-dup gate, r5 VERDICT task 8) with
       ``near_dup_hamming`` set, drop any exact-stage survivor whose
       16-bit SimHash (row-local ``simhash_from_hashes`` expression,
       bit-identical to the batch ``simhash16`` kernel) lies within the
       given Hamming distance of an EARLIER document — a stored simhash
       from a strictly earlier batch, or a lower-``doc_id`` survivor of
       this batch. Candidates come from the same two byte-band equi-joins
       as the batch ``simhash_near_dup`` query (never a similarity scan);
       token-less docs carry NULL simhash and bypass the gate, exactly as
       the batch twin emits no row for them. Near-dup-DROPPED docs still
       store their (fingerprint, simhash): they were seen, and a later
       copy must neither be re-admitted nor re-compared from scratch —
       this is what makes the drop set equal the batch
       ``simhash_near_dup``-pairs discard rule (doc_b of every pair)
       under in-order arrival;
    3c. (optional exact-Jaccard gate, r6 VERDICT task 6) with
       ``near_dup_jaccard`` set, each exact-stage survivor's DISTINCT
       3-token-shingle md5-base32 hash set is persisted to a BUCKETED
       sibling store (``shingle_store_dir(store_dir)``: one row per
       (doc, shingle), partitioned by ``batch`` and by
       ``bucket = shv % JACCARD_STORE_BUCKETS``), and a survivor is
       dropped when its shingle-set Jaccard with ANY earlier document
       (stored, or lower-``doc_id`` in this batch) reaches the
       threshold — the batch ``near_dup_discard`` rule (keep-first over
       verified-Jaccard pairs), enforced streamingly. Candidates come
       from the shared-shingle equi-join, the same shape as the batch
       operator; the only delta from the batch rule is that Jaccard is
       computed over 32-bit md5 shingle hashes rather than raw shingle
       strings, so the two could disagree only on an md5-32 collision
       (batch-twin equality is pinned in tests). The probe reads ONLY
       the bucket partitions this batch's own shingles hash into
       (partition pruning — r7 verdict task 2): bucket pruning removes
       only rows whose hash cannot equal any batch shingle, so the drop
       set is unchanged while the per-batch store scan falls from
       O(store) to O(matching buckets). The store costs O(total
       distinct shingles) — the honest price of exact-Jaccard parity;
       the SimHash gate remains the O(1)-per-doc option. The
       shared-shingle join carries NO hot-shingle routing — since r10
       the BATCH gate routes shingles held by > HOT_SHINGLE_CAP docs
       out of pair formation (recovering their intersections from
       per-doc hot lists, so only pairs connected SOLELY by
       boilerplate differ), while this gate stays fully exact: on a
       corpus with hot shingles the stream may drop boilerplate-only
       near-identical docs the batch gate now leaves to the
       fingerprint/strip family. ``store_hot_shingles`` is the audit
       that names the offenders before they detonate the within-bucket
       join, and the STORE probe refuses loudly past
       ``max_jaccard_store_candidates`` candidate pairs (r10: the
       semantic_dedup budget discipline — a boilerplate-detonated batch
       fails at the budget with the remediation named instead of
       running quadratic; the drop set below the budget is unchanged).
       The batch side of both joins broadcasts, so the store is probed
       in place, never shuffled;
    3c'. (optional embedding near-dup gate, r8 VERDICT task 7) with
       ``near_dup_cosine`` set (the stream must carry an ``embedding``
       column — enforced loudly), drop any survivor whose int8-quantized
       embedding cosine with an EARLIER document (stored, or lower-
       ``doc_id`` in this batch) reaches the threshold — the streaming
       face of the batch ``embedding_near_dup`` pairs under the
       keep-first discard rule (drop ``id_b`` of every pair), the one
       dedup tier the ingest previously lacked (batch owned SemDeDup +
       sign-LSH near-dup, the stream didn't). Candidates come from the
       SAME axis-aligned sign-LSH bucket equi-join as the batch query
       (never a similarity scan); vectors persist int8-quantized in a
       bucketed sibling store (``vector_store_dir(store_dir)``,
       partitioned by batch + sign-LSH bucket), and the per-batch probe
       partition-prunes to exactly the buckets this batch's docs hash
       into — exact pruning, since candidates only form inside a
       bucket. The gate is TWO-TIER (r10 verdict task 6): the int8
       codes PRUNE candidates to cosine >= threshold - margin, then
       the stored FLOAT vectors DECIDE >= threshold. The margin is
       DERIVED from the observed embedding dimension per batch
       (``int8_margin_bound``: 4*sqrt(d)/254, which provably covers
       the max-abs int8 quantization error with both pair sides
       quantized — r11 ADVICE: the old fixed 0.1 was only safe to
       d <= ~40); a caller-supplied ``int8_prune_margin`` below the
       bound raises loudly instead of silently pruning true pairs, so
       the exactness guarantee can never rot silently. Hence the
       drop set equals the batch ``embedding_near_dup`` float rule
       EXACTLY (pinned in tests); zero/absent embeddings bypass the
       gate and store nothing, as NULL simhash does. The store probe refuses loudly past
       ``max_cosine_store_candidates`` candidate pairs (r10 budget
       discipline — overloaded sign-LSH buckets fail at the budget with
       ``store_hot_buckets`` named, instead of running
       O(batch x occupancy); the drop set below the budget is
       unchanged).
       Embedding-DROPPED docs still store their vector (the step 3b
       discipline) so they veto later copies;
    3d. (optional decontamination gate) with ``decontam_bench_dir`` set
       (a parquet of benchmark (doc_id, text) rows), drop any survivor
       sharing a distinct {DECON_NGRAM}-token n-gram with the benchmark
       set — the streaming face of ``training_corpus_manifest_decontam``.
       The gate is STATELESS (broadcast bench-gram probe, the
       ``decontamination_overlap`` shape) and applies at SHIP time, not
       ingest time: contaminated docs still enter the fingerprint/
       simhash/shingle stores and still veto their own later duplicates
       — exactly how the batch manifest composes (dedup verdicts are
       computed over the full corpus, decontam only prunes what ships).
       Dropping them pre-fingerprint would silently re-admit a clean
       near-dup of a contaminated page;
    4. append survivors to the corpus sink and their fingerprints (+
       simhashes — written unconditionally so any store can later serve
       the near-dup gate) to the store, which is what makes batch N+1
       see batch N's documents;
    5. (optional, ``card_out_dir``) a one-row per-batch DELTA CARD —
       gate-ladder attrition (quality / exact / simhash / jaccard /
       cosine / decontam drops) plus the shipped count, the monitoring
       row an ingest dashboard tails (the ``run_incremental_manifest``
       card, for this pipeline's ladder). The ladder identity
       n_in = n_quality_fail + n_exact_dup + Σ gate drops + n_shipped
       is pinned in tests. Cost: one batch-sized persist + count per
       enabled gate (each gate's survivor set is cached before
       counting, so gate N's count reads gate N-1's cache instead of
       re-executing the whole prior ladder, and the final write reads
       the last cache — r11 ADVICE); zero when the card is off.

    State is the store itself — O(distinct fingerprints), 16 bytes each,
    partition-prunable parquet — not executor memory; restarts resume
    from it for free. Replay safety: BOTH sinks overwrite their own
    ``batch=<id>`` partition (exactly-once), and the anti-join probes
    only store partitions with ``batch < batch_id``. That last filter is
    load-bearing: if a batch crashed after its store write committed but
    before the streaming checkpoint committed, the replay would otherwise
    anti-join against its OWN fingerprints and emit an empty corpus
    partition over the previously written one — silent data loss."""

    # partitions whose per-dir required-column check already passed, for
    # the stream's lifetime: the store only grows forward and a committed
    # partition never changes schema, so validating each batch= dir ONCE
    # is sound — re-probing every committed partition on every batch
    # would be O(n_batches) driver-side schema inferences per batch,
    # O(n^2) over a long-lived stream (r6 advice). The required-column
    # set is fixed per stream (the gate flags don't change mid-run), so
    # a plain name set suffices.
    if (drift_ref_bins is None) != (drift_out_dir is None) or (
        drift_threshold is not None and drift_ref_bins is None
    ):
        raise ValueError(
            "drift monitoring needs BOTH drift_ref_bins and drift_out_dir "
            "(and drift_threshold only makes sense with them) — a silent "
            "half-configuration would look like a healthy stream with no "
            "drift audit"
        )
    if near_dup_cosine is not None and "embedding" not in docs_stream.columns:
        raise ValueError(
            "near_dup_cosine requested but the stream has no 'embedding' "
            "column — the gate would silently ship every semantic "
            "duplicate; add the column (array<float|double>) or run "
            "without near_dup_cosine"
        )

    bench_grams = None
    if decontam_bench_dir is not None:
        from ..operators.text_analysis import DECON_NGRAM

        # static benchmark gram set, built once per stream: tiny by
        # construction (a benchmark, not a corpus), broadcast per batch
        bench_grams = (
            spark.read.parquet(decontam_bench_dir)
            .select(
                F.explode(
                    H.shingles(
                        TX.tokens(F.coalesce(F.col("text"), F.lit(""))),
                        DECON_NGRAM,
                    )
                ).alias("gram")
            )
            .distinct()
        )

    _validated: set[str] = set()
    # same once-per-stream discipline for the exact-Jaccard gate's
    # bucketed shingle sibling partitions
    _validated_sh: set[str] = set()
    # and for the embedding gate's bucketed int8 vector sibling
    _validated_vec: set[str] = set()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        if drift_ref_bins is not None:
            # monitor BEFORE any gate: the raw incoming distribution is
            # what drifts; a quality gate downstream would clip exactly
            # the tail the alarm exists to see
            thr = (
                DRIFT_PSI_THRESHOLD
                if drift_threshold is None
                else drift_threshold
            )
            bins = quality_bins(batch_df)
            psi = psi_from_bins(bins, drift_ref_bins)
            _one_row_audit(
                spark,
                "batch_id long, n_docs long, psi double, drifted boolean",
                int(batch_id),
                int(sum(bins)),
                float(round(psi, 6)),
                bool(psi > thr),
            ).write.mode("overwrite").parquet(
                f"{drift_out_dir}/batch={batch_id}"
            )

        # per-batch delta card (opt-in): gate-ladder attrition counts.
        # Each count is a batch-sized job over the (persisted) batch
        # table — the audit's honest price; None when card_out_dir unset.
        card: dict[str, int] = {}
        if card_out_dir is not None:
            card["n_in"] = batch_df.count()
        if quality_weights is not None:
            from ..operators.quality_model import score_expr

            batch_df = batch_df.filter(
                score_expr(quality_weights) >= F.lit(min_quality_score)
            )
            if card_out_dir is not None:
                card["n_quality_fail"] = card["n_in"] - batch_df.count()
        elif card_out_dir is not None:
            card["n_quality_fail"] = 0
        # fingerprint + simhash staged together: one pass over the text,
        # token-hash array in its own select (HOFs are CodegenFallback —
        # inlining would re-pay the md5 per simhash bit)
        toks = TX.word_tokens(F.coalesce(F.col("text"), F.lit("")))
        fp = (
            batch_df.withColumn("fingerprint", H.fingerprint(TX.cleaned("text")))
            .withColumn("_bh", H.token_bit_hashes(toks))
            .withColumn(
                "simhash",
                F.when(
                    F.size("_bh") > 0, H.simhash_from_hashes(F.col("_bh"))
                ),
            )
            .drop("_bh")
        )
        if near_dup_jaccard is not None:
            # same tokenizer + 3-gram distinct shingles as the batch
            # near_dup_discard chain (dedup._shingled), hashed to the
            # repo's portable 32-bit md5 so the store holds 4-byte ints,
            # not shingle text
            sh_toks = TX.tokens(F.coalesce(F.col("text"), F.lit("")))
            fp = fp.withColumn(
                "shingle_hashes",
                F.array_distinct(
                    F.transform(H.shingles(sh_toks, 3), H.md5_base32)
                ),
            ).withColumn("n_shingles", F.size("shingle_hashes"))
        if near_dup_cosine is not None:
            # shared prep (one definition with the incremental
            # manifest): sign-LSH bucket + int8 prune codes + the float
            # confirm vector; zero/absent embeddings bypass the gate
            fp = _with_int8_embedding_cols(fp)
        keeper = Window.partitionBy("fingerprint")
        batch_kept = (
            fp.withColumn("first_id", F.min("doc_id").over(keeper))
            .filter(F.col("doc_id") == F.col("first_id"))
            .drop("first_id")
        )
        # probe the store through the Hadoop FS layer (works for s3/hdfs/
        # local alike): a store directory that doesn't exist yet = first
        # batch. Existence is the ONLY condition that may degrade to
        # store=None — a store that exists but fails to read (e.g. a
        # legacy flat layout missing the batch= partition column) must
        # fail LOUDLY, not silently re-admit duplicates (r4 ADVICE).
        # basePath exposes the batch partition column so we can exclude
        # this batch's own (possibly crash-committed) partition — only
        # strictly earlier batches may veto a document.
        jpath = spark._jvm.org.apache.hadoop.fs.Path(store_dir)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            # existence alone is not enough: a write that died BEFORE its
            # commit leaves only a _temporary dir behind, and reading that
            # fails ("unable to infer schema") on every replay — wedging
            # the stream permanently (r5 advice). A committed batch always
            # materializes a batch=<id> partition dir, so: batch= children
            # → real store; only _temporary/_SUCCESS droppings → empty
            # store (the idempotent overwrite self-heals); anything else
            # → malformed/legacy layout, fail loudly.
            # a crashed write leaves batch=<id>/_temporary/... with no
            # data files, so the batch= dir alone doesn't prove a commit —
            # a batch counts as committed only if it holds at least one
            # data file (committers write part-* then _SUCCESS; _temporary
            # never holds committed parts at this level). The listing is
            # one RPC per batch dir — store partition count, not data size.
            statuses = list(fs.listStatus(jpath))
            children = [s.getPath().getName() for s in statuses]
            committed = [
                s.getPath().getName()
                for s in statuses
                if s.getPath().getName().startswith("batch=")
                and s.isDirectory()
                and any(
                    not f.getPath().getName().startswith(("_", "."))
                    for f in fs.listStatus(s.getPath())
                )
            ]
            stray = [
                c for c in children if not c.startswith(("batch=", "_", "."))
            ]
            if stray:
                raise ValueError(
                    f"fingerprint store at {store_dir} exists but holds "
                    f"non-partition entries {stray[:5]} instead of batch=* "
                    "dirs — legacy or foreign layout; refusing to treat it "
                    "as empty (that would silently re-admit every "
                    "previously seen document)"
                )
            if committed:
                # mergeSchema: without it Spark infers the store schema
                # from ONE sampled data file, so a store holding a mix of
                # legacy (fingerprint-only) and current (with simhash)
                # batches nondeterministically either errors or silently
                # reads legacy rows as simhash=NULL — and NULL never
                # band-matches, re-admitting every pre-upgrade near-dup.
                # The merged schema is stable; the per-batch-dir check
                # below then names the legacy partitions explicitly.
                store = (
                    spark.read.option("basePath", store_dir)
                    .option("mergeSchema", "true")
                    .parquet(store_dir)
                    .filter(F.col("batch") < F.lit(batch_id))
                )
                required = []
                if near_dup_hamming is not None:
                    required.append("simhash")
                if near_dup_jaccard is not None:
                    # the gate probes strictly-earlier batches only, so
                    # only those must have their bucketed shingle
                    # partition — the CURRENT batch's doc partition may
                    # be crash-committed with its shingle write still
                    # pending, and the replay must self-heal, not wedge
                    sh_dir = shingle_store_dir(store_dir)
                    missing_sh = [
                        c
                        for c in committed
                        if c not in _validated_sh
                        and int(c.split("=", 1)[1]) < batch_id
                        and not fs.exists(
                            spark._jvm.org.apache.hadoop.fs.Path(
                                f"{sh_dir}/{c}"
                            )
                        )
                    ]
                    _validated_sh.update(
                        c
                        for c in committed
                        if c not in missing_sh
                        and int(c.split("=", 1)[1]) < batch_id
                    )
                    if missing_sh:
                        raise ValueError(
                            f"exact-Jaccard gate requested but the "
                            f"shingle store at {sh_dir} is missing the "
                            f"bucketed partitions {sorted(missing_sh)[:5]} "
                            "for committed fingerprint batches (legacy or "
                            "pre-bucketed layout) — rebuild the store or "
                            "run without near_dup_jaccard; silently "
                            "skipping the check would re-admit every "
                            "near-duplicate"
                        )
                if near_dup_cosine is not None:
                    # same once-per-stream partition discipline as the
                    # shingle sibling: every committed fingerprint batch
                    # strictly earlier than this one must have its
                    # vector partition, else the gate would silently
                    # skip stored docs
                    v_dir = vector_store_dir(store_dir)

                    def _v_bad(c: str) -> bool:
                        # missing partition, or a legacy one-tier
                        # partition without the float confirm column —
                        # an explicit-schema read would silently yield
                        # emb=NULL and the confirm tier would keep
                        # every semantic duplicate
                        vp = spark._jvm.org.apache.hadoop.fs.Path(
                            f"{v_dir}/{c}"
                        )
                        if not fs.exists(vp):
                            return True
                        try:
                            cols = spark.read.parquet(f"{v_dir}/{c}").columns
                        except Exception:
                            # a committed-but-empty partition (every doc
                            # had a zero embedding) has no data files to
                            # infer from — it stores nothing, so there
                            # is nothing the gate could silently skip
                            return False
                        return "emb" not in cols

                    missing_v = [
                        c
                        for c in committed
                        if c not in _validated_vec
                        and int(c.split("=", 1)[1]) < batch_id
                        and _v_bad(c)
                    ]
                    _validated_vec.update(
                        c
                        for c in committed
                        if c not in missing_v
                        and int(c.split("=", 1)[1]) < batch_id
                    )
                    if missing_v:
                        raise ValueError(
                            f"embedding near-dup gate requested but the "
                            f"vector store at {v_dir} is missing the "
                            f"bucketed partitions (or their float 'emb' "
                            f"confirm column) {sorted(missing_v)[:5]} "
                            "for committed fingerprint batches (legacy "
                            "layout) — rebuild the store or run without "
                            "near_dup_cosine; silently skipping the "
                            "check would re-admit every semantic "
                            "duplicate"
                        )
                if required:
                    req = set(required)
                    legacy = [
                        c
                        for c in committed
                        if c not in _validated
                        and not req
                        <= set(
                            spark.read.parquet(f"{store_dir}/{c}").columns
                        )
                    ]
                    _validated.update(
                        c for c in committed if c not in legacy
                    )
                    if legacy or not req <= set(store.columns):
                        raise ValueError(
                            f"near-dup gate requested but the store at "
                            f"{store_dir} has partitions missing "
                            f"{sorted(req)} {sorted(legacy)[:5]} (legacy "
                            "layout) — rebuild the store or run without "
                            "near_dup_hamming/near_dup_jaccard; silently "
                            "skipping the check would re-admit every "
                            "near-duplicate"
                        )
            else:
                store = None
        else:
            store = None
        if store is not None:
            batch_kept = batch_kept.join(
                store.select("fingerprint"), "fingerprint", "left_anti"
            )
        batch_kept = batch_kept.persist()
        # with the card on, each enabled gate's survivor set is
        # persisted before it is counted (r11 ADVICE: counting an
        # unpersisted `shipped` re-executed the cumulative lineage of
        # all prior gates — store probes and broadcast joins included —
        # so gate N re-paid gates 1..N-1 and the final write paid the
        # chain once more; now each gate and the final write read the
        # last persisted stage). Released in the finally below.
        gate_persists: list[DataFrame] = []
        # r10 ADVICE: unpersist on EVERY exit — a budget-check loud
        # refusal or failed write otherwise leaks the cached batch
        try:
            n_prev = 0
            if card_out_dir is not None:
                n_prev = batch_kept.count()
                card["n_exact_dup"] = (
                    card["n_in"] - card["n_quality_fail"] - n_prev
                )

            def count_gate(df: DataFrame, gate: str, enabled: bool):
                # per-gate attrition, counted only when the card is on
                nonlocal n_prev
                if card_out_dir is None:
                    return
                if not enabled:
                    card[gate] = 0
                    return
                df.persist()
                gate_persists.append(df)
                n = df.count()
                card[gate] = n_prev - n
                n_prev = n

            shipped = batch_kept
            if near_dup_hamming is not None:
                # earlier universe: lower-doc_id survivors of THIS batch
                # (rank = doc_id) plus every stored simhash from strictly
                # earlier batches (rank = -1, earlier than any doc_id). Two
                # byte-band equi-joins — same candidate generation as the
                # batch simhash_near_dup query; NULL simhash (token-less)
                # never matches an equi-key.
                def banded(df: DataFrame, rank_col) -> DataFrame:
                    return df.select(
                        rank_col.alias("o_rank"),
                        F.col("simhash").alias("o_sh"),
                        (F.col("simhash") % 256).alias("o_blo"),
                        (F.col("simhash") / 256).cast("long").alias("o_bhi"),
                    )

                others = banded(batch_kept, F.col("doc_id"))
                if store is not None:
                    others = others.union(
                        banded(store, F.lit(-1).cast("long"))
                    )
                me = batch_kept.select(
                    "doc_id",
                    "simhash",
                    (F.col("simhash") % 256).alias("blo"),
                    (F.col("simhash") / 256).cast("long").alias("bhi"),
                )
                lo = me.join(others, me["blo"] == others["o_blo"])
                hi = me.join(others, me["bhi"] == others["o_bhi"])
                drops = (
                    lo.unionByName(hi)
                    .filter(F.col("o_rank") < F.col("doc_id"))
                    .filter(
                        F.bit_count(
                            F.col("simhash").bitwiseXOR(F.col("o_sh"))
                        )
                        <= near_dup_hamming
                    )
                    .select("doc_id")
                    .distinct()
                )
                shipped = batch_kept.join(drops, "doc_id", "left_anti")
            count_gate(
                shipped, "n_simhash_drop", near_dup_hamming is not None
            )
            if near_dup_jaccard is not None:
                # batch near_dup_discard rule, streamed: drop a survivor iff
                # its hashed-shingle Jaccard with ANY earlier doc reaches
                # the threshold. Candidates via the shared-shingle equi-join
                # (the batch operator's shape); 'earlier' = a stored doc
                # (identity = its unique exact-dedup fingerprint) or a
                # lower-doc_id survivor of this batch. Near-dup-DROPPED
                # docs still store their shingles (step 3b discipline), so
                # they keep vetoing later copies exactly as batch pairs do.
                me = batch_kept.filter(F.col("n_shingles") > 0).select(
                    "doc_id",
                    F.col("n_shingles").alias("n"),
                    F.explode("shingle_hashes").alias("shv"),
                )

                # within-batch: lower doc_id is 'earlier'; the o_rank filter
                # runs BEFORE the per-pair aggregation so no self or
                # later-doc pair is ever counted
                others_batch = batch_kept.filter(F.col("n_shingles") > 0).select(
                    F.col("doc_id").cast("string").alias("o_id"),
                    F.col("doc_id").alias("o_rank"),
                    F.col("n_shingles").alias("o_n"),
                    F.explode("shingle_hashes").alias("shv"),
                )
                jdrops = (
                    others_batch.join(F.broadcast(me), "shv")
                    .filter(F.col("o_rank") < F.col("doc_id"))
                    .groupBy("doc_id", "n", "o_id", "o_n")
                    .agg(F.count("*").alias("i"))
                    .filter(
                        F.col("i")
                        / (F.col("n") + F.col("o_n") - F.col("i"))
                        >= F.lit(near_dup_jaccard)
                    )
                    .select("doc_id")
                )
                if store is not None:
                    # buckets this batch's shingles hash into: at most
                    # JACCARD_STORE_BUCKETS ints, collected driver-side
                    # (model-sized by construction). The store probe then
                    # partition-prunes to exactly those bucket dirs —
                    # pruning removes only rows whose shv cannot equal any
                    # batch shingle (equi-join key), so the drop set is
                    # identical to an unpruned scan.
                    buckets = [
                        r["bucket"]
                        for r in me.select(
                            F.pmod(
                                F.col("shv"), F.lit(JACCARD_STORE_BUCKETS)
                            ).alias("bucket")
                        )
                        .distinct()
                        .collect()
                    ]
                    others_store = probe_shingle_store(
                        spark, store_dir, batch_id, buckets
                    )
                    # candidate budget with loud refusal (r9 task 6)
                    _check_store_candidate_budget(
                        others_store,
                        me,
                        "shv",
                        max_jaccard_store_candidates,
                        batch_id,
                        "exact-Jaccard gate",
                        "max_jaccard_store_candidates",
                        "store_hot_shingles",
                        "strip the boilerplate upstream",
                    )
                    # the BATCH side broadcasts (a micro-batch is small by
                    # definition), so the store is probed in place and never
                    # shuffled — without this the per-batch shuffle grows
                    # linearly with stream lifetime (r7 review). The scan
                    # itself is bucket-pruned (above), closing the r7
                    # O(store)-per-batch finding.
                    vs_store = (
                        others_store.join(F.broadcast(me), "shv")
                        .groupBy("doc_id", "n", "o_id", "o_n")
                        .agg(F.count("*").alias("i"))
                        .filter(
                            F.col("i")
                            / (F.col("n") + F.col("o_n") - F.col("i"))
                            >= F.lit(near_dup_jaccard)
                        )
                        .select("doc_id")
                    )
                    jdrops = jdrops.unionByName(vs_store)
                shipped = shipped.join(
                    jdrops.distinct(), "doc_id", "left_anti"
                )
            count_gate(
                shipped, "n_jaccard_drop", near_dup_jaccard is not None
            )
            if near_dup_cosine is not None:
                from ..functions import vectors as V

                # batch embedding_near_dup rule, streamed: drop a survivor
                # iff its embedding cosine with ANY earlier doc (stored,
                # or lower-doc_id this batch) in the SAME sign-LSH bucket
                # reaches the threshold. TWO-TIER (r10 verdict task 6):
                # the int8 codes PRUNE (cosine >= threshold - margin, the
                # cheap tinyint fold), the FLOATS DECIDE (cosine >=
                # threshold) — so the drop set equals the batch float
                # rule exactly; the old one-tier int8 gate carried a
                # ~1e-2 quantization tolerance near the threshold. The
                # batch side broadcasts; the bucket-pruned store is
                # probed in place.
                # margin vs observed dim (r11 ADVICE): shared
                # derive-or-validate helper
                eff_margin = _resolve_prune_margin(
                    batch_kept, int8_prune_margin, "run_streaming_ingest_dedup"
                )
                vec_me = batch_kept.filter(
                    F.col("emb_bucket").isNotNull()
                ).select(
                    "doc_id",
                    F.col("emb_q").alias("qa"),
                    F.col("emb_f").alias("fa"),
                    F.col("emb_bucket").alias("bucket"),
                )
                vec_others = batch_kept.filter(
                    F.col("emb_bucket").isNotNull()
                ).select(
                    F.col("doc_id").alias("o_rank"),
                    F.col("emb_q").alias("qb"),
                    F.col("emb_f").alias("fb"),
                    F.col("emb_bucket").alias("bucket"),
                )
                prune = V.cosine(
                    V.as_double(F.col("qa")), V.as_double(F.col("qb"))
                ) >= F.lit(near_dup_cosine - eff_margin)
                confirm = V.cosine(F.col("fa"), F.col("fb")) >= F.lit(
                    near_dup_cosine
                )
                vdrops = (
                    vec_others.join(F.broadcast(vec_me), "bucket")
                    .filter(F.col("o_rank") < F.col("doc_id"))
                    .filter(prune)
                    .filter(confirm)
                    .select("doc_id")
                )
                if store is not None:
                    vbuckets = [
                        r["bucket"]
                        for r in vec_me.select("bucket").distinct().collect()
                    ]
                    vstore = probe_vector_store(
                        spark, store_dir, batch_id, vbuckets
                    )
                    # candidate budget with loud refusal (r9 task 6)
                    _check_store_candidate_budget(
                        vstore,
                        vec_me,
                        "bucket",
                        max_cosine_store_candidates,
                        batch_id,
                        "embedding near-dup gate",
                        "max_cosine_store_candidates",
                        "store_hot_buckets",
                        "add planes / a rotation upstream",
                    )
                    vs_store = (
                        vstore.join(F.broadcast(vec_me), "bucket")
                        .filter(
                            V.cosine(
                                V.as_double(F.col("qa")),
                                V.as_double(F.col("q")),
                            )
                            >= F.lit(near_dup_cosine - eff_margin)
                        )
                        .filter(
                            V.cosine(F.col("fa"), F.col("emb"))
                            >= F.lit(near_dup_cosine)
                        )
                        .select("doc_id")
                    )
                    vdrops = vdrops.unionByName(vs_store)
                shipped = shipped.join(
                    vdrops.distinct(), "doc_id", "left_anti"
                )
            count_gate(
                shipped, "n_cosine_drop", near_dup_cosine is not None
            )
            if bench_grams is not None:
                from ..operators.text_analysis import DECON_NGRAM

                # ship-time decontam: stateless broadcast gram probe (step
                # 3d) — runs LAST so contaminated docs still stored/vetoed
                g = shipped.select(
                    "doc_id",
                    F.explode(
                        H.shingles(
                            TX.tokens(F.coalesce(F.col("text"), F.lit(""))),
                            DECON_NGRAM,
                        )
                    ).alias("gram"),
                )
                contaminated = (
                    g.join(F.broadcast(bench_grams), "gram")
                    .select("doc_id")
                    .distinct()
                )
                shipped = shipped.join(contaminated, "doc_id", "left_anti")
            count_gate(
                shipped, "n_decontam_drop", bench_grams is not None
            )
            # both sinks overwrite this batch's own partition — a replayed
            # batch_id rewrites instead of appending duplicates (the same
            # idempotency pattern as the refreshing topic-assign sink).
            # The STORE keeps every exact-stage survivor (near-dup-dropped
            # included — see step 3b); only the corpus sink takes the
            # near-dup-gated set.
            shipped.drop(
                "fingerprint",
                "simhash",
                "n_shingles",
                "shingle_hashes",
                "emb_q",
                "emb_bucket",
                "emb_f",
            ).write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
            if near_dup_cosine is not None:
                # bucketed vector sibling: one row per stored doc —
                # int8 codes for the prune tier PLUS the float vector
                # for the confirm tier (r10 verdict task 6; the float
                # column is only decoded for candidates the int8 prune
                # passes) — partitioned by sign-LSH bucket so later
                # batches probe only matching buckets. Written BEFORE
                # the fingerprint partition (the shingle-store
                # commit-ordering invariant); embedding-dropped docs
                # still store their vector (step 3b discipline)
                (
                    batch_kept.filter(F.col("emb_bucket").isNotNull())
                    .select(
                        F.col("fingerprint").alias("o_id"),
                        F.col("emb_q").alias("q"),
                        F.col("emb_f").alias("emb"),
                        F.col("emb_bucket").alias("bucket"),
                    )
                    # cluster by the partition column before the
                    # partitioned write (guide §6): without this every
                    # upstream task writes a file into every bucket dir
                    # it touches — tasks × buckets tiny files per batch
                    # (measured 2k files/batch at sf0.001), paid again
                    # by every later probe's file listing. One hash
                    # shuffle of slim store rows puts each bucket in
                    # exactly one task → one file per bucket, and AQE
                    # coalesces the tiny-batch case further.
                    .repartition("bucket")
                    .write.mode("overwrite")
                    .partitionBy("bucket")
                    .parquet(f"{vector_store_dir(store_dir)}/batch={batch_id}")
                )
            if near_dup_jaccard is not None:
                # bucketed shingle sibling: one row per (doc, distinct
                # shingle), partitioned by shv % JACCARD_STORE_BUCKETS so
                # later batches probe only matching buckets. Written BEFORE
                # the fingerprint partition: a committed fingerprint batch
                # therefore always has its shingle partition (the validation
                # invariant above); a crash in between replays both
                # idempotently (each overwrites its own batch= dir).
                (
                    batch_kept.filter(F.col("n_shingles") > 0)
                    .select(
                        F.col("fingerprint").alias("o_id"),
                        F.col("n_shingles").alias("o_n"),
                        F.explode("shingle_hashes").alias("shv"),
                    )
                    .withColumn(
                        "bucket",
                        F.pmod(F.col("shv"), F.lit(JACCARD_STORE_BUCKETS)),
                    )
                    # one file per bucket instead of tasks × buckets
                    # (guide §6 — see the vector-store write above)
                    .repartition("bucket")
                    .write.mode("overwrite")
                    .partitionBy("bucket")
                    .parquet(f"{shingle_store_dir(store_dir)}/batch={batch_id}")
                )
            batch_kept.select("fingerprint", "simhash").write.mode(
                "overwrite"
            ).parquet(f"{store_dir}/batch={batch_id}")
            if card_out_dir is not None:
                # one-row delta card LAST (replay rewrites it after the
                # sinks): ladder identity n_in = quality + exact + the
                # four gate drops + shipped is pinned in tests.
                # n_shipped reads the committed partition back — parquet
                # footer metadata, no recompute.
                n_shipped = spark.read.parquet(
                    f"{out_dir}/batch={batch_id}"
                ).count()
                _one_row_audit(
                    spark,
                    "batch_id long, n_in long, n_quality_fail long, "
                    "n_exact_dup long, n_simhash_drop long, "
                    "n_jaccard_drop long, n_cosine_drop long, "
                    "n_decontam_drop long, n_shipped long",
                    int(batch_id),
                    int(card["n_in"]),
                    int(card["n_quality_fail"]),
                    int(card["n_exact_dup"]),
                    int(card["n_simhash_drop"]),
                    int(card["n_jaccard_drop"]),
                    int(card["n_cosine_drop"]),
                    int(card["n_decontam_drop"]),
                    int(n_shipped),
                ).write.mode("overwrite").parquet(
                    f"{card_out_dir}/batch={batch_id}"
                )
        finally:
            batch_kept.unpersist()
            for df in gate_persists:
                df.unpersist()

    (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ------------------------------------------ incremental manifest (delta)

# the pool delta's fixed read schema (the SHINGLE_STORE_SCHEMA rationale:
# a committed batch whose docs all fail the gates writes an empty
# partition, and schema inference over all-empty stores wedges replays)
POOL_SCHEMA = "doc_id long, lang string, quality double, batch bigint"
LANG_COUNTS_SCHEMA = "lang string, n long, batch bigint"
# token-length state for the TOKEN-budget mixture policy (r10 verdict
# task 2): one slim fixed-width row per ingested doc — the registered
# sampler's (doc_id, lang, n, u) table, persisted incrementally. The
# re-rank must see EVERY doc ever ingested (not just the pool): the
# batch ``mixture_sample_tokens`` ranks ALL documents in u order and
# budgets from corpus-wide token mass, so pool membership depends on
# non-pool docs earlier in the order.
TOK_STATE_SCHEMA = "doc_id long, lang string, n long, u long, batch bigint"


def run_incremental_manifest(
    spark: SparkSession,
    docs_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_jaccard_store_candidates: int | None = JACCARD_CANDIDATE_BUDGET,
    decontam_bench_dir: str | None = None,
    mixture: str = "docs",
    corrupt_col: str = "_corrupt_record",
    near_dup_cosine: float | None = None,
    max_cosine_store_candidates: int | None = VECTOR_CANDIDATE_BUDGET,
    int8_prune_margin: float | None = None,
) -> None:
    """Incremental TRAINING-CORPUS MANIFEST (r9 verdict task 5): the
    streaming ingest store composed with the manifest's gate ladder, so
    a production ingest gets a per-batch manifest DELTA instead of a
    full-corpus rebuild. The stream carries (doc_id, lang, text);
    arrival must be in doc_id order across batches (the keep-first
    gates' precondition, as for ``run_streaming_ingest_dedup``).

    Per micro-batch, inside ``foreachBatch``:

    1. RULE gate: ``curation_filter_report_for`` — the registered batch
       query's exact expression tree (one definition), row-local;
    2. EXACT gate: md5 fingerprint, keep-first within the batch, then
       anti-join against the fingerprint store of strictly earlier
       batches (``incremental_dedup``'s shape, made stateful);
    3. NEAR-DUP gate: exact 3-shingle Jaccard >= the batch
       ``JACCARD_THRESHOLD`` against any earlier doc — lower doc_id in
       this batch or the bucketed shingle store (one representative per
       fingerprint: exact copies share shingle sets, so the pair
       universe is unchanged) — bucket-pruned probe, candidate budget
       with loud refusal (``max_jaccard_store_candidates``);
    3b. (optional) DECONTAM gate: with ``decontam_bench_dir`` set (a
       parquet of benchmark (doc_id, text) rows), a pool candidate
       sharing any distinct DECON_NGRAM-gram with the benchmark is
       excluded — stateless broadcast gram probe, prefix-stable (the
       bench is fixed), so it belongs in the pool delta. Benchmark
       members themselves self-flag whenever they pass the rule gate
       (>= 10 tokens -> >= 6 grams, all shared with themselves), so
       with the bench staged from corpus stand-ins the delta equals
       the registered composition's ``doc_id >= split ∧ ¬flagged``
       membership test exactly. NOTE on the near-dup face: this
       face is fully exact; the r10 batch gate routes corpus-wide
       boilerplate (> HOT_SHINGLE_CAP docs per shingle) out of pair
       formation, so on a corpus WITH hot shingles the stream may drop
       boilerplate-only near-identicals the batch gate now leaves to
       the fingerprint/strip family — the parity domain is corpora
       below the cap (any healthy one);
    3c. (optional, r11 verdict task 4) SEMANTIC gate: with
       ``near_dup_cosine`` set (stream must carry an ``embedding``
       column — enforced loudly), a pool candidate is dropped iff its
       float cosine with ANY earlier per-fingerprint representative in
       the SAME sign-LSH bucket — lower doc_id this batch, or the
       bucketed int8 vector store of strictly earlier batches —
       reaches the threshold. The gate is the ingest pipeline's
       TWO-TIER machinery verbatim (shared ``_with_int8_embedding_cols``
       prep, dim-derived prune margin, ``probe_vector_store`` with the
       ``max_cosine_store_candidates`` budget + loud refusal), so the
       drop set equals the keep-first closure of the float
       ``embedding_near_dup`` rule EXACTLY. PARITY DOMAIN, stated
       plainly: this is the streamed sign-LSH/cosine near-dup rule,
       NOT the batch manifest's k-means SemDeDup — the two agree
       whenever semantic duplicates share a sign-LSH bucket (which is
       what the batch ``embedding_near_dup``/``semdedup_recall_eval``
       harnesses measure); the corpus-global k-means verdict remains
       the periodic-rebuild layer, exactly like the trained-BPE
       re-budget;
    4. the PREFIX-STABLE verdicts (rule ∧ exact-keeper ∧ not-near-dup)
       land as the append-only POOL delta at ``out_dir/pool/batch=<id>``
       — rows (doc_id, lang, quality), each batch overwriting its own
       partition (replay-idempotent); per-lang counts of ALL batch docs
       (the mixture plan counts the raw corpus) land beside it at
       ``out_dir/lang_counts/batch=<id>``;
    5. the MIXTURE policy layer is re-applied per batch over the
       corpus-so-far, under the chosen ``mixture`` policy, and the
       manifest SNAPSHOT ``out_dir/manifest`` is overwritten wholly
       (idempotent by construction: a pure function of the state dirs):

       - ``mixture="docs"`` (default): keep rates from
         ``mixture_plan_from_counts`` (the registered plan's exact
         arithmetic) over the summed lang-count state, the md5 rule
         from ``mixture_keep_expr`` (the registered sample's exact
         predicate) over the pool-so-far;
       - ``mixture="tokens"`` (r10 verdict task 2 — tokens are what
         price a training run): the registered
         ``mixture_sample_tokens`` policy, re-applied per batch via the
         SHARED ``token_budget_selection`` rule (one definition) over
         the token-length state ``out_dir/tok_state`` — one slim
         (doc_id, lang, n, u) row per ingested doc, written per batch,
         where n is the word-token count (the same ``word_tokens``
         split the registered sampler budgets) and u the shared
         ``mixtok_u_expr`` shuffle key. The snapshot then carries
         ``n_tokens`` like the batch token manifest. Whenever the
         policies CAN drift (tokens mode), the drift is surfaced,
         never silent: a one-row ``out_dir/policy_drift/batch=<id>``
         audit counts the pool docs each policy keeps and their
         overlap (the ``mixture_policy_overlap`` report, streamed).

    0'. QUARANTINE, before any gate (r10 ADVICE): rows whose
       ``corrupt_col`` is non-null (a malformed JSONL line under the
       ``read_documents_jsonl_stream`` contract) or whose doc_id is
       null land in ``out_dir/quarantine/batch=<id>`` — previously a
       corrupt row vanished at the verdict join on its null doc_id,
       contradicting the reader's 'audit instead of silently dropping'
       contract. The gates then run on the clean split only, and the
       per-batch card counts the quarantined rows.

    Every batch also writes a one-row ``out_dir/card/batch=<id>``
    DELTA CARD (r10 verdict task 7 — the monitoring row an ingest
    dashboard tails): gate-ladder attrition counts for this batch
    (n_in = n_rule_fail + n_exact_dup + n_near_dup_drop +
    n_cosine_drop + n_decontam_drop + n_pool_delta, pinned in tests),
    plus the cumulative pool/manifest sizes after the re-rank.

    Parity contract (pinned in tests): after the last batch, the
    snapshot equals the batch composition rule ∧ exact ∧ ¬near-dup
    (∧ ¬cosine-near-dup when the semantic tier is on) ∧ mixture of the
    REGISTERED queries on the same corpus — i.e. the
    ``training_corpus_manifest`` ladder with the semantic tier realized
    as the streamed sign-LSH/cosine rule (see 3c for the stated parity
    domain vs k-means SemDeDup) and minus the trained-BPE re-budget,
    which depends on full-corpus model state (the merge table) and is
    the periodic-rebuild layer by design: run
    ``training_corpus_manifest`` over the shipped pool on whatever
    cadence the models retrain. The delta layer is what must never
    require a full-corpus pass — and here it never does: per batch the
    corpus-scaled work is one rule-gate scan of the batch, one
    fixed-width fingerprint anti-join, one bucket-pruned shingle probe,
    and a K-row rate table; only the doc-keyed POOL (already gated,
    manifest-sized) is rescanned by the mixture re-rank."""
    from pyspark.sql import Window

    from ..operators.curation import (
        _U32,
        mixture_keep_expr,
        mixture_plan_from_counts,
        mixtok_u_expr,
        token_budget_selection,
    )
    from ..operators.dedup import JACCARD_THRESHOLD
    from ..operators.text_analysis import curation_filter_report_for

    bench_grams = None
    if decontam_bench_dir is not None:
        from ..operators.text_analysis import DECON_NGRAM

        # static benchmark gram set, built once per stream (tiny by
        # construction — a benchmark, not a corpus), broadcast per batch
        bench_grams = (
            spark.read.parquet(decontam_bench_dir)
            .select(
                F.explode(
                    H.shingles(
                        TX.tokens(F.coalesce(F.col("text"), F.lit(""))),
                        DECON_NGRAM,
                    )
                ).alias("gram")
            )
            .distinct()
        )

    if mixture not in ("docs", "tokens"):
        raise ValueError(
            f"mixture must be 'docs' or 'tokens', got {mixture!r} — a "
            "typo here would silently ship the wrong sampling policy"
        )
    if near_dup_cosine is not None and "embedding" not in docs_stream.columns:
        raise ValueError(
            "near_dup_cosine requested but the stream has no 'embedding' "
            "column — the semantic gate would silently ship every "
            "semantic duplicate; add the column (array<float|double>) or "
            "run without near_dup_cosine"
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        jpath = spark._jvm.org.apache.hadoop.fs.Path(store_dir)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        has_store = fs.exists(jpath)

        # quarantine split BEFORE any gate (r10 ADVICE): a corrupt JSONL
        # line arrives with nulls + raw text in corrupt_col and would
        # otherwise vanish at the verdict inner join on its null doc_id
        # — contradicting the reader's 'audit instead of silently
        # dropping' contract. Sunk per batch (idempotent overwrite),
        # counted on the card even when zero.
        bad = F.col("doc_id").isNull()
        if corrupt_col in batch_df.columns:
            bad = bad | F.col(corrupt_col).isNotNull()
        quarantined = batch_df.filter(bad)
        n_quarantined = quarantined.count()
        if n_quarantined:
            quarantined.write.mode("overwrite").parquet(
                f"{out_dir}/quarantine/batch={batch_id}"
            )
        batch_df = batch_df.filter(~bad)
        if corrupt_col in batch_df.columns:
            batch_df = batch_df.drop(corrupt_col)

        verdicts = curation_filter_report_for(
            batch_df.select("doc_id", "text")
        ).select("doc_id", "quality", "keep")
        sh_toks = TX.tokens(F.coalesce(F.col("text"), F.lit("")))
        emb_cols = (
            ["embedding"] if near_dup_cosine is not None else []
        )
        fp = (
            batch_df.select("doc_id", "lang", "text", *emb_cols)
            .withColumn(
                "fingerprint", H.fingerprint(TX.cleaned("text"))
            )
            .withColumn(
                "shingle_hashes",
                F.array_distinct(
                    F.transform(H.shingles(sh_toks, 3), H.md5_base32)
                ),
            )
            .withColumn("n_shingles", F.size("shingle_hashes"))
            .join(verdicts, "doc_id")
        )
        if near_dup_cosine is not None:
            # shared prep with the ingest pipeline (3c): sign-LSH bucket
            # + int8 prune codes + float confirm vector
            fp = _with_int8_embedding_cols(fp)

        # exact gate over ALL docs (a rule-failed doc still vetoes later
        # copies, exactly as the batch fingerprint_dedup's keeper rule)
        first = Window.partitionBy("fingerprint")
        flagged = fp.withColumn("first_id", F.min("doc_id").over(first))
        if has_store:
            # each batch stores only fingerprints NEW to the store (see
            # the store write below), so the store is already one row
            # per fingerprint; the distinct is a cheap belt-and-braces
            # bound on the flag join against a hand-edited store
            seen = (
                spark.read.option("basePath", store_dir)
                .schema("fingerprint string, batch bigint")
                .parquet(store_dir)
                .filter(F.col("batch") < F.lit(batch_id))
                .select("fingerprint")
                .distinct()
                .withColumn("in_store", F.lit(True))
            )
            flagged = flagged.join(seen, "fingerprint", "left")
        else:
            flagged = flagged.withColumn("in_store", F.lit(None).cast("boolean"))
        # persisted AFTER the store join (the ingest pipeline's
        # batch_kept discipline, r10 review): every downstream action
        # (bucket collect, budget count, pool write, store writes)
        # otherwise re-scans + re-distincts the ENTIRE fingerprint
        # store and re-runs the window per action
        flagged = flagged.withColumn(
            "is_keeper",
            (F.col("doc_id") == F.col("first_id"))
            & F.col("in_store").isNull(),
        ).persist()
        try:
            _process_gated(
                batch_df, batch_id, flagged, n_quarantined, has_store
            )
        finally:
            # r10 ADVICE: unpersist on EVERY exit — the budget check's
            # designed loud refusal (and any failed write) otherwise
            # leaks the cached batch in the long-lived session
            flagged.unpersist()

    def _process_gated(
        batch_df: DataFrame,
        batch_id: int,
        flagged: DataFrame,
        n_quarantined: int,
        has_store: bool,
    ) -> None:
        # gate-ladder attrition for the per-batch delta card (one
        # aggregate over the persisted batch table, model-sized result)
        g = flagged.agg(
            F.count("*").alias("n_in"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias(
                "n_rule_fail"
            ),
            F.sum(
                F.when(F.col("keep") & ~F.col("is_keeper"), 1).otherwise(0)
            ).alias("n_exact_dup"),
        ).collect()[0]

        # near-dup gate over per-fingerprint representatives (exact
        # copies share shingle sets, so the pair universe is unchanged)
        reps = flagged.filter(
            (F.col("doc_id") == F.col("first_id"))
            & (F.col("n_shingles") > 0)
        )
        me = reps.select(
            "doc_id",
            F.col("n_shingles").alias("n"),
            F.explode("shingle_hashes").alias("shv"),
        )
        others_batch = reps.select(
            F.col("doc_id").alias("o_rank"),
            F.col("n_shingles").alias("o_n"),
            F.explode("shingle_hashes").alias("shv"),
        )
        jac = F.col("i") / (F.col("n") + F.col("o_n") - F.col("i"))
        drops = (
            others_batch.join(F.broadcast(me), "shv")
            .filter(F.col("o_rank") < F.col("doc_id"))
            .groupBy("doc_id", "n", "o_rank", "o_n")
            .agg(F.count("*").alias("i"))
            .filter(jac >= F.lit(JACCARD_THRESHOLD))
            .select("doc_id")
        )
        if has_store:
            buckets = [
                r["bucket"]
                for r in me.select(
                    F.pmod(F.col("shv"), F.lit(JACCARD_STORE_BUCKETS)).alias(
                        "bucket"
                    )
                )
                .distinct()
                .collect()
            ]
            others_store = probe_shingle_store(
                spark, store_dir, batch_id, buckets
            )
            _check_store_candidate_budget(
                others_store,
                me,
                "shv",
                max_jaccard_store_candidates,
                batch_id,
                "incremental manifest",
                "max_jaccard_store_candidates",
                "store_hot_shingles",
                "strip the boilerplate upstream",
            )
            store_drops = (
                others_store.join(F.broadcast(me), "shv")
                .groupBy("doc_id", "n", "o_id", "o_n")
                .agg(F.count("*").alias("i"))
                .filter(jac >= F.lit(JACCARD_THRESHOLD))
                .select("doc_id")
            )
            drops = drops.unionByName(store_drops)

        pool_nd = (
            flagged.filter(F.col("keep") & F.col("is_keeper"))
            .join(drops.distinct(), "doc_id", "left_anti")
            .select("doc_id", "lang", "quality", "text")
        )
        n_pool_nd = pool_nd.count()
        n_near_dup_drop = (
            int(g["n_in"]) - int(g["n_rule_fail"]) - int(g["n_exact_dup"])
            - n_pool_nd
        )
        pool0 = pool_nd
        n_pool0 = n_pool_nd
        if near_dup_cosine is not None:
            # 3c SEMANTIC gate: the ingest pipeline's two-tier cosine
            # rule over per-fingerprint representatives — int8 codes
            # prune at threshold - (dim-derived) margin, stored floats
            # decide at the threshold, candidates only inside a sign-LSH
            # bucket (batch lower-doc_id reps + the bucket-pruned vector
            # store of earlier batches, budget-guarded)
            from ..functions import vectors as V

            eff_margin = _resolve_prune_margin(
                flagged, int8_prune_margin, "run_incremental_manifest"
            )
            vreps = flagged.filter(
                (F.col("doc_id") == F.col("first_id"))
                & F.col("emb_bucket").isNotNull()
            )
            vec_me = vreps.select(
                "doc_id",
                F.col("emb_q").alias("qa"),
                F.col("emb_f").alias("fa"),
                F.col("emb_bucket").alias("bucket"),
            )
            vec_others = vreps.select(
                F.col("doc_id").alias("o_rank"),
                F.col("emb_q").alias("qb"),
                F.col("emb_f").alias("fb"),
                F.col("emb_bucket").alias("bucket"),
            )
            prune = V.cosine(
                V.as_double(F.col("qa")), V.as_double(F.col("qb"))
            ) >= F.lit(near_dup_cosine - eff_margin)
            confirm = V.cosine(F.col("fa"), F.col("fb")) >= F.lit(
                near_dup_cosine
            )
            vdrops = (
                vec_others.join(F.broadcast(vec_me), "bucket")
                .filter(F.col("o_rank") < F.col("doc_id"))
                .filter(prune)
                .filter(confirm)
                .select("doc_id")
            )
            if has_store:
                vbuckets = [
                    r["bucket"]
                    for r in vec_me.select("bucket").distinct().collect()
                ]
                vstore = probe_vector_store(
                    spark, store_dir, batch_id, vbuckets
                )
                _check_store_candidate_budget(
                    vstore,
                    vec_me,
                    "bucket",
                    max_cosine_store_candidates,
                    batch_id,
                    "incremental manifest semantic gate",
                    "max_cosine_store_candidates",
                    "store_hot_buckets",
                    "add planes / a rotation upstream",
                )
                vs_store = (
                    vstore.join(F.broadcast(vec_me), "bucket")
                    .filter(
                        V.cosine(
                            V.as_double(F.col("qa")), V.as_double(F.col("q"))
                        )
                        >= F.lit(near_dup_cosine - eff_margin)
                    )
                    .filter(
                        V.cosine(F.col("fa"), F.col("emb"))
                        >= F.lit(near_dup_cosine)
                    )
                    .select("doc_id")
                )
                vdrops = vdrops.unionByName(vs_store)
            pool0 = pool_nd.join(vdrops.distinct(), "doc_id", "left_anti")
            n_pool0 = pool0.count()
        n_cosine_drop = n_pool_nd - n_pool0
        pool = pool0
        if bench_grams is not None:
            from ..operators.text_analysis import DECON_NGRAM

            gr = pool.select(
                "doc_id",
                F.explode(
                    H.shingles(
                        TX.tokens(F.coalesce(F.col("text"), F.lit(""))),
                        DECON_NGRAM,
                    )
                ).alias("gram"),
            )
            contaminated = (
                gr.join(F.broadcast(bench_grams), "gram")
                .select("doc_id")
                .distinct()
            )
            pool = pool.join(contaminated, "doc_id", "left_anti")
        pool.drop("text").write.mode("overwrite").parquet(
            f"{out_dir}/pool/batch={batch_id}"
        )
        # written-row count read back from the committed partition —
        # parquet footer metadata, no recompute
        n_pool_delta = spark.read.parquet(
            f"{out_dir}/pool/batch={batch_id}"
        ).count()
        n_decontam_drop = n_pool0 - n_pool_delta
        batch_df.groupBy("lang").agg(
            F.count("*").cast("long").alias("n")
        ).write.mode("overwrite").parquet(
            f"{out_dir}/lang_counts/batch={batch_id}"
        )
        if mixture == "tokens":
            # token-length state: the registered sampler's
            # (doc_id, lang, n, u) row for EVERY batch doc — fixed-width,
            # the same O(corpus) class as the fingerprint store
            # the EXACT registered expression (mixtok_lengths memo) —
            # token count and shuffle key must match the batch sampler
            # bit-for-bit or the parity contract is void
            batch_df.select(
                "doc_id",
                "lang",
                F.size(TX.word_tokens("text")).cast("long").alias("n"),
                mixtok_u_expr(),
            ).select(
                "doc_id", "lang", "n", F.col("u").cast("long").alias("u")
            ).write.mode("overwrite").parquet(
                f"{out_dir}/tok_state/batch={batch_id}"
            )

        # stores write AFTER the pool (a crash replays the whole batch
        # idempotently; each sink overwrites its own partition). Only
        # fingerprints NEW to the store write (r10 review): a rep whose
        # fingerprint is already stored would duplicate that o_id's
        # shingle rows, and a future probe's per-(doc, o_id) count(*)
        # would then DOUBLE the intersection — inflating Jaccard past
        # the gate for pairs the batch rule keeps (and inflating the
        # budget count the same way). One row per fingerprint EVER is
        # the store invariant both joins rely on.
        new_reps = reps.filter(F.col("in_store").isNull())
        new_reps.select(
            F.col("fingerprint").alias("o_id"),
            F.col("n_shingles").alias("o_n"),
            F.explode("shingle_hashes").alias("shv"),
        ).withColumn(
            "bucket", F.pmod(F.col("shv"), F.lit(JACCARD_STORE_BUCKETS))
        ).repartition("bucket").write.mode("overwrite").partitionBy(
            # one file per bucket instead of tasks × buckets tiny files
            # (guide §6: cluster by the partition column before a
            # partitioned write; measured 2k files/batch → 256, and the
            # dominant per-batch wall-clock cost at test scale)
            "bucket"
        ).parquet(
            f"{shingle_store_dir(store_dir)}/batch={batch_id}"
        )
        if near_dup_cosine is not None:
            # bucketed vector sibling (3c): one row per NEW fingerprint
            # keeper carrying an embedding — int8 prune codes + the
            # float confirm vector, partitioned by sign-LSH bucket so
            # later batches probe only matching buckets. Written BEFORE
            # the fingerprint partition (the shingle-store
            # commit-ordering invariant); cosine-DROPPED keepers still
            # store their vector, as the ingest pipeline does, so they
            # veto later copies.
            (
                flagged.filter(
                    (F.col("doc_id") == F.col("first_id"))
                    & F.col("in_store").isNull()
                    & F.col("emb_bucket").isNotNull()
                )
                .select(
                    F.col("fingerprint").alias("o_id"),
                    F.col("emb_q").alias("q"),
                    F.col("emb_f").alias("emb"),
                    F.col("emb_bucket").alias("bucket"),
                )
                # one file per bucket instead of tasks × buckets
                # (guide §6 — see the ingest pipeline's store writes)
                .repartition("bucket")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(f"{vector_store_dir(store_dir)}/batch={batch_id}")
            )
        flagged.filter(F.col("in_store").isNull()).select(
            "fingerprint"
        ).distinct().write.mode("overwrite").parquet(
            f"{store_dir}/batch={batch_id}"
        )

        # mixture policy re-rank over the corpus-so-far -> snapshot
        counts = (
            spark.read.option("basePath", f"{out_dir}/lang_counts")
            .schema(LANG_COUNTS_SCHEMA)
            .parquet(f"{out_dir}/lang_counts")
            .filter(F.col("batch") <= F.lit(batch_id))
            .groupBy("lang")
            .agg(F.sum("n").cast("double").alias("n"))
        )
        plan = mixture_plan_from_counts(spark, counts).select(
            "lang", "keep_rate"
        )
        pool_all = (
            spark.read.option("basePath", f"{out_dir}/pool")
            .schema(POOL_SCHEMA)
            .parquet(f"{out_dir}/pool")
            .filter(F.col("batch") <= F.lit(batch_id))
        )
        n_pool_total = pool_all.count()
        docs_snap = (
            pool_all.join(F.broadcast(plan), "lang")
            .filter(
                mixture_keep_expr() < F.floor(F.col("keep_rate") * _U32)
            )
            .select("doc_id", "lang", "quality")
        )
        if mixture == "tokens":
            # the shared token_budget_selection rule over the
            # token-length state of EVERY ingested doc: budgets from
            # corpus-so-far token mass, u-ordered prefix sums — the
            # registered mixture_sample_tokens, re-applied (one
            # definition, r10 verdict task 2)
            tok = (
                spark.read.option("basePath", f"{out_dir}/tok_state")
                .schema(TOK_STATE_SCHEMA)
                .parquet(f"{out_dir}/tok_state")
                .filter(F.col("batch") <= F.lit(batch_id))
                .select("doc_id", "lang", "n", "u")
            )
            in_mix = token_budget_selection(tok).select(
                "doc_id", "n_tokens"
            )
            snap = pool_all.join(in_mix, "doc_id").select(
                "doc_id", "lang", "quality", "n_tokens"
            )
            snap.write.mode("overwrite").parquet(f"{out_dir}/manifest")
            n_manifest = spark.read.parquet(
                f"{out_dir}/manifest"
            ).count()
            # policy drift, surfaced per batch (never silent): the doc-
            # count policy's keep set over the same pool, diffed against
            # the shipped token-budget set — mixture_policy_overlap,
            # streamed. All three counts are pool-bounded aggregates.
            n_docs_policy = docs_snap.count()
            n_overlap = (
                snap.select("doc_id")
                .join(docs_snap.select("doc_id"), "doc_id")
                .count()
            )
            _one_row_audit(
                spark,
                "batch_id long, n_pool long, n_token_policy long, "
                "n_doc_policy long, n_overlap long, "
                "n_token_only long, n_doc_only long",
                int(batch_id),
                int(n_pool_total),
                int(n_manifest),
                int(n_docs_policy),
                int(n_overlap),
                int(n_manifest - n_overlap),
                int(n_docs_policy - n_overlap),
            ).write.mode("overwrite").parquet(
                f"{out_dir}/policy_drift/batch={batch_id}"
            )
        else:
            docs_snap.write.mode("overwrite").parquet(
                f"{out_dir}/manifest"
            )
            n_manifest = spark.read.parquet(
                f"{out_dir}/manifest"
            ).count()

        # per-batch DELTA CARD (r10 verdict task 7): the gate-ladder
        # attrition row an ingest dashboard tails. Ladder identity
        # n_in = rule + exact + near_dup + cosine + decontam +
        # pool_delta is pinned in tests; cumulative pool/manifest
        # close the row.
        _one_row_audit(
            spark,
            "batch_id long, mixture string, n_quarantined long, "
            "n_in long, n_rule_fail long, n_exact_dup long, "
            "n_near_dup_drop long, n_cosine_drop long, "
            "n_decontam_drop long, "
            "n_pool_delta long, n_pool_total long, n_manifest long",
            int(batch_id),
            str(mixture),
            int(n_quarantined),
            int(g["n_in"]),
            int(g["n_rule_fail"]),
            int(g["n_exact_dup"]),
            int(n_near_dup_drop),
            int(n_cosine_drop),
            int(n_decontam_drop),
            int(n_pool_delta),
            int(n_pool_total),
            int(n_manifest),
        ).write.mode("overwrite").parquet(
            f"{out_dir}/card/batch={batch_id}"
        )

    (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def export_incremental_token_shards(
    spark: SparkSession,
    sf_dir: str,
    incr_out_dir: str,
    export_out_dir: str,
) -> None:
    """The TRAINER-FACING TAIL over the incremental manifest snapshot
    (r11 verdict task 5 — 'a production ingest still needs a full batch
    rebuild to ship what a trainer mounts'): token-id shards + the
    decode context, exported from ``run_incremental_manifest``'s
    ``{incr_out_dir}/manifest`` by REUSING the batch export verbatim.

    The tokenizer is the periodic-rebuild MODEL layer (the same parity
    domain the incremental manifest's docstring states for the BPE
    re-budget): merges/ids/budgets come from the registered BPE fit
    over ``sf_dir``, applied to the snapshot's doc set. Steps:

    1. read the snapshot (doc_id, lang, quality[, n_tokens]);
    2. join the registered ``bpe_token_counts`` budgets (memoized; the
       snapshot's docs must be a subset of the corpus the tokenizer was
       fitted on — ENFORCED by a loud anti-join refusal, r12 verdict
       task 1, naming the periodic tokenizer-rebuild lever; never a
       silent inner-join drop) and write
       ``{export_out_dir}/manifest_tokens`` in the staged-pipeline
       shape;
    3. call ``export_token_shards`` — per-doc token-id table, the
       per-curriculum-phase packing, shard-partitioned token_shards,
       and ``tokenizer/{piece_vocab,merges,meta}`` with the content
       hash stamped per shard row.

    Because every step reuses the batch code paths, the export over an
    incremental snapshot that EQUALS the batch token manifest is
    byte-identical to ``run_curation_pipeline(export_tokens=True)``'s
    artifact (pinned in tests); on snapshots that differ (the stated
    streaming parity domain), the artifact is exactly the batch export
    of that snapshot. Idempotent: a re-run overwrites the same dirs —
    run it per snapshot, or on whatever cadence the trainer pulls."""
    from ..operators.bpe import q_bpe_token_counts
    from ..operators.curation import export_token_shards
    from ..sources.io import write_parquet

    snap = spark.read.parquet(f"{incr_out_dir}/manifest").select(
        "doc_id", "lang", "quality"
    )
    bpec = q_bpe_token_counts(spark, sf_dir).select(
        "doc_id", "n_bpe_tokens"
    )
    # coverage audit (r12 verdict task 1 — the docstring's subset
    # assumption, ENFORCED): the budget join below is inner, so a
    # snapshot doc outside the corpus the tokenizer/budgets were fitted
    # on would silently vanish from manifest_tokens and the shards —
    # the exact "silently absent from the training set" class the
    # manifest family refuses elsewhere. One doc-keyed anti-join; the
    # count is model-sized.
    n_unbudgeted = snap.join(bpec, "doc_id", "left_anti").count()
    if n_unbudgeted:
        raise ValueError(
            f"export_incremental_token_shards: {n_unbudgeted} snapshot "
            f"doc(s) have no bpe_token_counts row in {sf_dir} — the "
            "ingest stream has outpaced the corpus the tokenizer and "
            "token budgets were fitted on, and an inner budget join "
            "would silently drop them from the trainer shards. Run the "
            "periodic tokenizer rebuild over the current corpus (so "
            "every snapshot doc gets a budget row) and re-export; the "
            "parity domain requires snapshot ⊆ fitted corpus."
        )
    write_parquet(
        snap.join(bpec, "doc_id").select(
            "doc_id", "lang", "quality", "n_bpe_tokens"
        ),
        f"{export_out_dir}/manifest_tokens",
    )
    export_token_shards(spark, sf_dir, export_out_dir)


# ----------------------------------------- per-batch quality-drift (PSI)

# the credit-scoring PSI convention source_quality_psi documents:
# < 0.1 stable, 0.1-0.25 drifting, > 0.25 act
DRIFT_PSI_THRESHOLD = 0.25


def quality_bins(df: DataFrame) -> list:
    """Bin counts of the 6-dp heuristic quality over ANY (doc_id, text)
    DataFrame — PSI_BINS fixed-width [0,1] bins, the same binning as the
    batch ``source_quality_psi``. Model-sized collect (one int per bin)."""
    from ..operators.quality_model import PSI_BINS
    from ..operators.text_analysis import quality_stats

    rows = (
        quality_stats(df)
        .groupBy(
            F.least(
                F.floor(F.col("quality") * PSI_BINS).cast("bigint"),
                F.lit(PSI_BINS - 1),
            ).alias("bin")
        )
        .count()
        .collect()
    )
    counts = [0] * PSI_BINS
    for r in rows:
        counts[int(r["bin"])] = int(r["count"])
    return counts


def psi_from_bins(batch_bins: list, ref_bins: list) -> float:
    """Laplace-smoothed PSI between two bin-count vectors — the same
    per-term formula as ``source_quality_psi`` (6-dp round per term,
    exact decimal sum), shared by the batch query's python replay test
    and the streaming monitor."""
    from decimal import Decimal
    import math

    k = len(ref_bins)
    nb, nr = sum(batch_bins), sum(ref_bins)
    total = Decimal(0)
    for b in range(k):
        ps = (batch_bins[b] + 1) / (nb + k)
        pa = (ref_bins[b] + 1) / (nr + k)
        total += Decimal(repr(round((ps - pa) * math.log(ps / pa), 6)))
    return float(total)


def run_streaming_quality_drift(
    spark: SparkSession,
    docs_stream: DataFrame,
    ref_bins: list,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = DRIFT_PSI_THRESHOLD,
) -> None:
    """Per-micro-batch quality-drift monitor: bin each batch's heuristic
    quality scores (the row-local ``quality_exprs`` expression — no
    shuffle beyond one PSI_BINS-row aggregate) and write a one-row audit
    per batch — (batch_id, n_docs, psi vs the reference distribution,
    drifted flag) — to ``out_dir``. The streaming face of
    ``source_quality_psi``: same binning, same Laplace smoothing, same
    per-term rounding (``psi_from_bins`` is the shared formula), so a
    batch replayed through the batch query yields the identical PSI
    (test-pinned). ``ref_bins`` comes from ``quality_bins`` over the
    reference corpus — a PSI_BINS-int list, checkpoint-friendly.

    Replay safety: the audit sink overwrites its own batch=<id>
    partition, so a crash-replayed batch rewrites one row instead of
    appending a duplicate alarm. State is the ref_bins constant — no
    store, no growth with stream lifetime."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        bins = quality_bins(batch_df)
        psi = psi_from_bins(bins, ref_bins)
        _one_row_audit(
            spark,
            "batch_id long, n_docs long, psi double, drifted boolean",
            int(batch_id), int(sum(bins)), float(round(psi, 6)),
            bool(psi > threshold),
        ).write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}"
        )

    (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
