"""Structured Streaming tests: each streaming pipeline replays the static
parquet with ``availableNow`` and must agree with its batch twin (SURVEY
§2.8 — streaming is the engine's scale extension, semantically identical
to the batch operators)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from topic_modeling_ajin_spark import streaming as ST
from topic_modeling_ajin_spark.streaming import pipelines as _p
ST.pipelines = _p
from topic_modeling_ajin_spark.registry import load_all
from topic_modeling_ajin_spark.sources import load_table


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_streaming_hourly_matches_batch(spark, sf_dir, tmp_path, registry):
    events = ST.read_events_stream(spark, sf_dir)
    ST.run_to_memory(
        ST.hourly_event_counts(events), "s_hourly", str(tmp_path / "ck1")
    )
    got = {
        (r["hour"], r["event_type"]): (r["cnt"], r["total_value"])
        for r in spark.table("s_hourly").collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["cnt"], r["total_value"])
        for r in registry["events_hourly"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_sliding_windows_cover_each_event_4x(spark, sf_dir, tmp_path):
    events = ST.read_events_stream(spark, sf_dir)
    ST.run_to_memory(
        ST.sliding_type_counts(events), "s_sliding", str(tmp_path / "ck2")
    )
    total = spark.table("s_sliding").agg(F.sum("cnt")).collect()[0][0]
    n_events = load_table(spark, sf_dir, "events").count()
    assert total == 4 * n_events  # 1h window / 15min slide → 4 windows/event


def test_streaming_sessions_match_batch_sessionizer(spark, sf_dir, tmp_path, registry):
    events = ST.read_events_stream(spark, sf_dir)
    ST.run_to_memory(
        ST.session_event_counts(events), "s_sessions", str(tmp_path / "ck3")
    )
    sess = spark.table("s_sessions")
    got = {
        (r["user_id"],): (r["n_sessions"], r["n_events"])
        for r in sess.groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events"))
        .collect()
    }
    want = {
        (r["user_id"],): (r["n_sessions"], r["n_events"])
        for r in registry["sessionize_events"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_word_count_matches_batch(spark, sf_dir, tmp_path):
    docs = ST.read_documents_stream(spark, sf_dir)
    ST.run_to_memory(ST.streaming_word_count(docs), "s_words", str(tmp_path / "ck4"))
    stream_counts = {
        r["word"]: r["cnt"] for r in spark.table("s_words").collect()
    }
    # batch twin: same expressions, full (un-limited) counts
    from topic_modeling_ajin_spark.functions import text as TX

    d = load_table(spark, sf_dir, "documents")
    batch = (
        d.select(F.explode(TX.tokens(TX.cleaned("text"))).alias("word"))
        .filter(F.length("word") >= 2)
        .filter(~F.col("word").isin(*TX.ENGLISH_STOPWORDS))
        .groupBy("word")
        .count()
    )
    batch_counts = {r["word"]: r["count"] for r in batch.collect()}
    assert stream_counts == batch_counts


def test_stateful_user_totals(spark, sf_dir, tmp_path):
    events = ST.read_events_stream(spark, sf_dir)
    ST.run_to_memory(
        ST.user_running_totals(events),
        "s_state",
        str(tmp_path / "ck5"),
        output_mode="append",
    )
    rows = spark.table("s_state").collect()
    assert rows
    # the final state row per user must equal the batch per-user count
    final = {}
    for r in rows:
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]]:
            final[r["user_id"]] = r["n_events"]
    want = {
        r["user_id"]: r["cnt"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert final == want


def test_streaming_topic_assign_matches_batch_argmax(spark, sf_dir, tmp_path):
    ST.run_to_memory(
        ST.streaming_topic_assign(spark, sf_dir),
        "s_assign",
        str(tmp_path / "ck6"),
        # stateless projection ⇒ append mode (complete mode would require a
        # streaming aggregation — the unbounded-state shape ADVICE flagged)
        output_mode="append",
    )
    got = {r["vec_id"]: r["topic"] for r in spark.table("s_assign").collect()}

    from topic_modeling_ajin_spark.functions import vectors as V

    e = load_table(spark, sf_dir, "embeddings")
    pos = e.select("label", F.posexplode(V.as_double("embedding")).alias("pos0", "v"))
    cent = pos.groupBy("label", "pos0").agg(F.avg("v").alias("c"))
    centv = (
        cent.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos0", "c"))).alias("pc"))
        .select(F.col("label").alias("topic"), F.transform("pc", lambda s: s["c"]).alias("cvec"))
    )
    batch = (
        e.crossJoin(F.broadcast(centv))
        .select("vec_id", "topic", V.cosine(V.as_double("embedding"), F.col("cvec")).alias("cos"))
        .groupBy("vec_id")
        .agg(F.max_by("topic", "cos").alias("topic"))
    )
    want = {r["vec_id"]: r["topic"] for r in batch.collect()}
    assert got == want
    n_vecs = e.count()
    assert len(got) == n_vecs


def test_refreshing_topic_assign_follows_centroid_update_without_restart(
    spark, sf_dir, tmp_path
):
    """VERDICT r2 item 7: the foreachBatch variant re-reads the centroid
    table per micro-batch, so a mid-query model swap changes the NEXT
    batch's assignments with no query rebuild. Two single-file
    micro-batches; the centroid table's topic ids shift by +100 after
    batch 0 — both id ranges must appear in the output."""
    from topic_modeling_ajin_spark.functions import vectors as V

    e = load_table(spark, sf_dir, "embeddings")
    pos = e.select("label", F.posexplode(V.as_double("embedding")).alias("pos0", "v"))
    cent = pos.groupBy("label", "pos0").agg(F.avg("v").alias("c"))
    centv = (
        cent.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos0", "c"))).alias("pc"))
        .select(
            F.col("label").alias("topic"),
            F.transform("pc", lambda s: s["c"]).alias("cvec"),
        )
    )
    cent_dir = str(tmp_path / "centroids")
    centv.write.mode("overwrite").parquet(cent_dir)

    staging = str(tmp_path / "staging")
    e.repartition(2).write.parquet(staging)  # exactly 2 stream files

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out_dir = str(tmp_path / "assigned")

    def swap_model(batch_id: int) -> None:
        if batch_id == 0:
            centv.withColumn("topic", F.col("topic") + 100).write.mode(
                "overwrite"
            ).parquet(cent_dir)

    ST.run_streaming_topic_assign_refreshing(
        spark,
        stream,
        cent_dir,
        out_dir,
        str(tmp_path / "ck_refresh"),
        on_batch_done=swap_model,
    )
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == e.count()  # every vector assigned exactly once
    topics = {r["topic"] for r in rows}
    assert any(t < 100 for t in topics)  # batch 0: original model
    assert any(t >= 100 for t in topics)  # batch 1: refreshed model, no restart
    # the +100 remap does not change geometry: modulo the shift, every
    # assignment must equal the batch argmax twin
    batch = (
        e.crossJoin(F.broadcast(centv))
        .select(
            "vec_id",
            "topic",
            V.cosine(V.as_double("embedding"), F.col("cvec")).alias("cos"),
        )
        .groupBy("vec_id")
        .agg(F.max_by("topic", "cos").alias("topic"))
    )
    want = {r["vec_id"]: r["topic"] for r in batch.collect()}
    assert {r["vec_id"]: r["topic"] % 100 for r in rows} == want


def test_streaming_dedup_drops_redeliveries(spark, sf_dir, tmp_path):
    """Replay the events file TWICE from a spool dir (simulated
    at-least-once redelivery, one file per micro-batch): the deduped stream
    must emit exactly the batch-distinct set of event_ids."""
    import shutil

    src = f"{sf_dir}/events.parquet"
    spool = tmp_path / "spool"
    spool.mkdir()
    shutil.copy(src, spool / "a.parquet")
    shutil.copy(src, spool / "b.parquet")

    from topic_modeling_ajin_spark.sources.tables import normalize_event_ts

    batch = spark.read.parquet(str(spool))
    schema = batch.schema
    raw = normalize_event_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(spool))
    )
    ST.run_to_memory(
        ST.streaming_event_dedup(raw),
        "s_dedup",
        str(tmp_path / "ck_dedup"),
        output_mode="append",
    )
    got = spark.table("s_dedup")
    n_unique = batch.select("event_id").distinct().count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_stream_stream_attribution_matches_batch_join(spark, sf_dir, tmp_path):
    """Stream-stream inner join (click→purchase attribution) must emit
    exactly the batch interval-join result on a full replay."""
    events = ST.read_events_stream(spark, sf_dir)
    ST.run_to_memory(
        ST.click_purchase_attribution(events),
        "s_attr",
        str(tmp_path / "ck7"),
        output_mode="append",  # inner stream-stream joins are append-only
    )
    got = {
        (r["click_id"], r["purchase_id"]): (r["user_id"], r["lag_seconds"])
        for r in spark.table("s_attr").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    batch = c.join(
        p,
        (F.col("cu") == F.col("pu"))
        & (F.col("pts") > F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr(
            f"INTERVAL {ST.pipelines.ATTRIBUTION_WINDOW_SECONDS} SECONDS")),
    )
    want = {
        (r["click_id"], r["purchase_id"]): (
            r["cu"],
            r["lag"],
        )
        for r in batch.select(
            "click_id", "purchase_id", "cu",
            F.floor(
                (F.unix_micros(F.col("pts")) - F.unix_micros(F.col("cts")))
                / 1_000_000
            ).cast("long").alias("lag"),
        ).collect()
    }
    assert got == want
    assert got  # non-trivial: the synthetic data must produce attributions


def test_stream_static_enrichment_matches_batch_join(spark, sf_dir, tmp_path):
    """Stream-static dimension join must emit exactly the batch left-join
    rows (stateless, append mode, no watermark needed)."""
    from topic_modeling_ajin_spark.sources import load_table

    customers = load_table(spark, sf_dir, "customer")
    raw = ST.read_events_stream(spark, sf_dir)
    ST.run_to_memory(
        ST.streaming_enrich_events(raw, customers),
        "s_enrich",
        str(tmp_path / "ck_enrich"),
        output_mode="append",
    )
    got = spark.table("s_enrich")
    events = load_table(spark, sf_dir, "events")
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    want = events.join(dim, "user_id", "left")
    assert got.count() == events.count()
    assert (
        got.select("event_id", "user_name", "segment")
        .exceptAll(want.select("event_id", "user_name", "segment"))
        .count()
        == 0
    )


def test_streaming_parquet_sink_exactly_once_on_restart(spark, sf_dir, tmp_path):
    """File-sink exactly-once: run the hourly aggregation stream to a
    parquet sink with a checkpoint, then start it AGAIN with the same
    checkpoint — the restart must recognize completed work and emit
    nothing new (no duplicate rows), the core replay guarantee a
    production ingest pipeline relies on."""
    out = str(tmp_path / "sink")
    ck = str(tmp_path / "ck_sink")

    def run_once():
        events = ST.read_events_stream(spark, sf_dir)
        q = (
            ST.hourly_event_counts(events)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n_first = spark.read.parquet(out).count()
    assert n_first > 0
    run_once()  # same checkpoint: no new input => no new output
    back = spark.read.parquet(out)
    assert back.count() == n_first
    assert back.select("hour", "event_type").distinct().count() == n_first


def test_streaming_ingest_dedup_across_batches(spark, tmp_path):
    """Cross-batch ingest dedup: batch B's re-crawl of a batch A document
    must be dropped via the persistent fingerprint store, within-batch
    dups keep the min-doc_id survivor, and the store ends with exactly
    one fingerprint per distinct cleaned text."""
    import time

    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    batch_a = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"),
         (3, "alpha beta gamma")],  # within-batch dup of doc 1
        schema,
    )
    batch_b = spark.createDataFrame(
        [(10, "ALPHA beta GAMMA!"),  # cross-batch dup after cleaning
         (11, "entirely new document text")],
        schema,
    )
    batch_a.coalesce(1).write.mode("append").parquet(staging)
    time.sleep(1.1)  # distinct mtimes: maxFilesPerTrigger orders by file age
    batch_b.coalesce(1).write.mode("append").parquet(staging)

    stream = (
        spark.readStream.schema(batch_a.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    store = str(tmp_path / "store")
    out = str(tmp_path / "corpus")
    ST.run_streaming_ingest_dedup(
        spark, stream, store, out, str(tmp_path / "ck_ingest")
    )

    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {1, 2, 11}
    fps = [r["fingerprint"] for r in spark.read.parquet(store).collect()]
    assert len(fps) == len(set(fps)) == 3  # one stored key per distinct text


def test_streaming_ingest_dedup_rerun_is_idempotent(spark, tmp_path):
    """Re-running the ingest query against the same checkpoint (restart
    with no new files) must leave corpus and store unchanged — the
    per-batch overwrite sink plus checkpoint offsets give end-to-end
    exactly-once."""
    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "some document one"), (2, "some document two")], schema
    ).coalesce(1).write.mode("append").parquet(staging)

    store = str(tmp_path / "store")
    out = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")

    def run():
        stream = (
            spark.readStream.schema(
                "doc_id long, text string"
            ).option("maxFilesPerTrigger", 1).parquet(staging)
        )
        ST.run_streaming_ingest_dedup(spark, stream, store, out, ck)

    run()
    first = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    n_store = spark.read.parquet(store).count()
    run()  # restart, no new input
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == first
    assert spark.read.parquet(store).count() == n_store


def test_streaming_ingest_dedup_survives_store_commit_crash(spark, tmp_path):
    """Crash-replay safety: if a batch's STORE write committed but the
    streaming checkpoint did not (crash between the two), the replayed
    batch must NOT anti-join against its own fingerprints — that would
    overwrite the corpus partition with nothing. Simulated by pre-writing
    the store's batch=0 partition with the exact fingerprints the first
    micro-batch will produce, then running with a FRESH checkpoint so
    streaming assigns batch_id=0 again."""
    from pyspark.sql import functions as F

    from topic_modeling_ajin_spark.functions import hashing as H
    from topic_modeling_ajin_spark.functions import text as TX

    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    docs = spark.createDataFrame(
        [(1, "crash replay doc one"), (2, "crash replay doc two")], schema
    )
    docs.coalesce(1).write.mode("append").parquet(staging)

    store = str(tmp_path / "store")
    out = str(tmp_path / "corpus")
    # emulate the half-committed state: batch 0's fingerprints already in
    # the store, checkpoint absent
    docs.select(
        H.fingerprint(TX.cleaned("text")).alias("fingerprint")
    ).write.mode("overwrite").parquet(f"{store}/batch=0")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    ST.run_streaming_ingest_dedup(
        spark, stream, store, out, str(tmp_path / "ck_fresh")
    )
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 2]  # the replay kept the documents, no silent loss
    # store still has exactly one row per distinct text (partition was
    # overwritten in place, not appended to)
    assert spark.read.parquet(store).count() == 2


# weights where only the length feature (dim 16) and bias (dim 19) fire:
# score = sigmoid(10*min(n_tokens/100,1) - 1) — ~0.73 for 20-token docs,
# ~0.34 for 3-token docs, so min_quality_score=0.5 splits them cleanly
_GATE_W = [0.0] * 16 + [10.0, 0.0, 0.0, -1.0]


def test_streaming_ingest_quality_gate_matches_batch_twin(spark, tmp_path):
    """Ingest gate + dedup must equal the batch twin: filter by the SAME
    score expression, then min-doc_id fingerprint survivorship across all
    input. Rejected docs never enter the store, so a later duplicate of a
    rejected doc is admitted (asserted via doc 12)."""
    import time

    from topic_modeling_ajin_spark.functions import hashing as H
    from topic_modeling_ajin_spark.functions import text as TX
    from topic_modeling_ajin_spark.operators.quality_model import score_expr

    long_text = " ".join(f"tok{i}" for i in range(40))
    other_long = " ".join(f"word{i}" for i in range(40))
    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    batch_a = spark.createDataFrame(
        # doc 4: NULL text — must be SCORED like empty text (sigmoid(-1)
        # ≈ 0.27, below the gate) rather than silently NULL-dropped; the
        # batch twin must agree on it (r5 review)
        [(1, long_text), (2, "too short"), (3, long_text), (4, None)], schema
    )
    batch_b = spark.createDataFrame(
        [(10, long_text),        # cross-batch dup of kept doc 1 -> dropped
         (11, "also short"),     # below gate -> dropped
         (12, other_long)],      # new long doc -> kept
        schema,
    )
    batch_a.coalesce(1).write.mode("append").parquet(staging)
    time.sleep(1.1)
    batch_b.coalesce(1).write.mode("append").parquet(staging)

    stream = (
        spark.readStream.schema(batch_a.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out = str(tmp_path / "corpus")
    ST.run_streaming_ingest_dedup(
        spark,
        stream,
        str(tmp_path / "store"),
        out,
        str(tmp_path / "ck"),
        quality_weights=_GATE_W,
        min_quality_score=0.5,
    )
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())

    # batch twin over the union of both micro-batches
    all_docs = batch_a.union(batch_b)
    gated = all_docs.filter(score_expr(_GATE_W) >= 0.5)
    fp = gated.withColumn("fp", H.fingerprint(TX.cleaned("text")))
    twin = sorted(
        r["keeper"]
        for r in fp.groupBy("fp").agg(F.min("doc_id").alias("keeper")).collect()
    )
    assert kept == twin == [1, 12]


def test_streaming_ingest_quality_gate_crash_replay_idempotent(spark, tmp_path):
    """Crash-replay with the gate ON: batch 0's store partition committed
    but the checkpoint lost — the replay re-applies the gate and still
    emits the gated survivors (no silent loss, no gate/dedup interaction
    on replay)."""
    from topic_modeling_ajin_spark.functions import hashing as H
    from topic_modeling_ajin_spark.functions import text as TX
    from topic_modeling_ajin_spark.operators.quality_model import score_expr

    long_text = " ".join(f"tok{i}" for i in range(40))
    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    docs = spark.createDataFrame(
        [(1, long_text), (2, "tiny doc")], schema
    )
    docs.coalesce(1).write.mode("append").parquet(staging)

    store = str(tmp_path / "store")
    out = str(tmp_path / "corpus")
    # half-committed state: the GATED batch's fingerprints already stored
    docs.filter(score_expr(_GATE_W) >= 0.5).select(
        H.fingerprint(TX.cleaned("text")).alias("fingerprint")
    ).write.mode("overwrite").parquet(f"{store}/batch=0")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    ST.run_streaming_ingest_dedup(
        spark,
        stream,
        store,
        out,
        str(tmp_path / "ck_fresh"),
        quality_weights=_GATE_W,
        min_quality_score=0.5,
    )
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1]  # gate dropped doc 2; replay kept doc 1
    assert spark.read.parquet(store).count() == 1


def test_streaming_ingest_store_crashed_first_write_self_heals(spark, tmp_path):
    """A first-batch store write that died BEFORE its commit leaves only
    batch=0/_temporary behind. The store probe must treat that as an
    EMPTY store (no committed batch= data files) so the replay's
    idempotent overwrite self-heals — not read the dir and wedge every
    replay on 'unable to infer schema' (r5 advice)."""
    import os

    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "self heal doc one"), (2, "self heal doc two")], schema
    ).coalesce(1).write.mode("append").parquet(staging)

    store = str(tmp_path / "store")
    # the crash artifact: a batch dir holding only the committer's temp dir
    os.makedirs(f"{store}/batch=0/_temporary/0", exist_ok=True)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out = str(tmp_path / "corpus")
    ST.run_streaming_ingest_dedup(
        spark, stream, store, out, str(tmp_path / "ck")
    )
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 2]
    assert spark.read.parquet(store).count() == 2


def test_streaming_ingest_store_foreign_layout_fails_loudly(spark, tmp_path):
    """A store path that exists but holds non-partition entries (legacy
    flat layout, or simply the wrong directory) must raise — silently
    treating it as empty would re-admit every previously seen document."""
    import pytest as _pytest

    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    docs = spark.createDataFrame([(1, "foreign layout doc")], schema)
    docs.coalesce(1).write.mode("append").parquet(staging)

    store = str(tmp_path / "store")
    # legacy flat store: fingerprints at the root, no batch= partitions
    from topic_modeling_ajin_spark.functions import hashing as H
    from topic_modeling_ajin_spark.functions import text as TX

    docs.select(
        H.fingerprint(TX.cleaned("text")).alias("fingerprint")
    ).write.mode("overwrite").parquet(store)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    with _pytest.raises(Exception, match="batch="):
        ST.run_streaming_ingest_dedup(
            spark, stream, store, str(tmp_path / "corpus"), str(tmp_path / "ck")
        )


def _py_simhash(text: str) -> int | None:
    """Test replay of the 16-bit simhash bit math (md5 first-4-hex votes)."""
    import hashlib
    import re

    toks = [t for t in re.split(r"[^a-z0-9가-힣]+", (text or "").lower()) if t]
    if not toks:
        return None
    votes = [0] * 16
    for w in toks:
        v = int(hashlib.md5(w.encode()).hexdigest()[:4], 16)
        for b in range(16):
            votes[b] += 1 if (v >> b) & 1 else -1
    return sum((1 << b) for b in range(16) if votes[b] > 0)


def test_simhash_expr_matches_batch_kernel(spark, sf_dir, registry):
    """The row-local simhash expression the streaming gate uses must be
    bit-identical to the batch simhash16 aggregate kernel over the real
    corpus (token-less docs excluded on both sides)."""
    from topic_modeling_ajin_spark.functions import hashing as H
    from topic_modeling_ajin_spark.functions import text as TX
    from topic_modeling_ajin_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = TX.word_tokens("text")
    expr = (
        docs.withColumn("_bh", H.token_bit_hashes(toks))
        .filter(F.size("_bh") > 0)
        .select(
            "doc_id", H.simhash_from_hashes(F.col("_bh")).alias("simhash")
        )
    )
    got = {r["doc_id"]: r["simhash"] for r in expr.collect()}
    want = {
        r["doc_id"]: r["simhash"]
        for r in registry["simhash16"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_ingest_near_dup_gate(spark, tmp_path):
    """Near-dup gate: a permuted-word copy (different fingerprint, SAME
    simhash) is dropped cross-batch AND within-batch; its simhash still
    lands in the store, so a third permutation in a later batch is also
    dropped; unrelated docs pass. Verified against a full Python replay
    of the banded Hamming rule."""
    import time

    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    texts = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "totally different content about spark pipelines",
        3: "zeta epsilon delta gamma beta alpha",   # permutation of 1 (same batch)
        10: "epsilon zeta alpha beta delta gamma",  # permutation of 1 (later batch)
        11: "yet another unrelated document body",
        12: "alpha beta gamma delta epsilon zeta",  # exact dup of 1
    }
    batch_a = spark.createDataFrame(
        [(i, texts[i]) for i in (1, 2, 3)], schema
    )
    batch_b = spark.createDataFrame(
        [(i, texts[i]) for i in (10, 11, 12)], schema
    )
    batch_a.coalesce(1).write.mode("append").parquet(staging)
    time.sleep(1.1)
    batch_b.coalesce(1).write.mode("append").parquet(staging)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    store = str(tmp_path / "store")
    out = str(tmp_path / "corpus")
    ST.run_streaming_ingest_dedup(
        spark, stream, store, out, str(tmp_path / "ck"), near_dup_hamming=2
    )
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())

    # python replay: arrival order = doc_id order here; exact stage first
    # (first fingerprint wins), then banded hamming <= 2 vs any EARLIER
    # exact-stage survivor (dropped-or-shipped alike — the store keeps all)
    import hashlib
    import re

    def fingerprint(t):
        cleaned = re.sub(r"\s+", " ", re.sub(r"[^가-힣a-zA-Z0-9 ]", "", t.lower())).strip()
        return hashlib.md5(cleaned.encode()).hexdigest()

    seen_fp, exact_survivors = set(), []
    for d in sorted(texts):
        f = fingerprint(texts[d])
        if f not in seen_fp:
            seen_fp.add(f)
            exact_survivors.append(d)
    expect = []
    for i, d in enumerate(exact_survivors):
        sh = _py_simhash(texts[d])
        dropped = False
        for e in exact_survivors[:i]:
            she = _py_simhash(texts[e])
            band = (sh % 256 == she % 256) or (sh // 256 == she // 256)
            if band and bin(sh ^ she).count("1") <= 2:
                dropped = True
                break
        if not dropped:
            expect.append(d)
    assert kept == expect == [1, 2, 11]

    # the store keeps every exact-stage survivor's simhash — including
    # the near-dup-dropped docs 3 and 10
    st = spark.read.parquet(store)
    assert st.count() == len(exact_survivors) == 5
    assert st.filter(F.col("simhash").isNull()).count() == 0


def test_streaming_jaccard_gate_matches_batch_near_dup_discard(
    spark, tmp_path
):
    """r6 verdict task 6: with near_dup_jaccard set, the streaming drop
    set must equal the batch rule — shipped docs = exact-dedup keepers
    minus `near_dup_discard` (exact shingle-Jaccard >= threshold vs any
    lower-id doc) — under in-order arrival, across batch boundaries.
    Verified against the REGISTERED batch queries on the same corpus."""
    import time

    from topic_modeling_ajin_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        q_fingerprint_dedup,
        q_near_dup_discard,
    )

    # 9-token docs: changing one token keeps 4/9 shared 3-shingles... use
    # longer docs so an edited copy clears 0.8: 30 shared tokens + 1
    # changed token at the END alters only the last 3 shingles ->
    # jaccard = 25/31 ~ 0.81 >= 0.8; a doc with 5 changed tokens falls
    # well below. Unrelated docs share nothing.
    base = [f"tok{i}" for i in range(30)]
    near = base[:-1] + ["changed"]          # >= 0.8 vs base
    far = base[:15] + [f"other{i}" for i in range(15)]  # << 0.8
    texts = {
        1: " ".join(base),
        2: "completely unrelated words one two three four five six seven",
        3: " ".join(near),                   # near-dup of 1, same batch
        10: " ".join(base[1:] + ["tail"]),   # near-dup of 1, later batch
        11: " ".join(far),                   # not a near-dup
        12: " ".join(base),                  # exact dup of 1
    }
    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    spark.createDataFrame(
        [(i, texts[i]) for i in (1, 2, 3)], schema
    ).coalesce(1).write.mode("append").parquet(staging)
    time.sleep(1.1)
    spark.createDataFrame(
        [(i, texts[i]) for i in (10, 11, 12)], schema
    ).coalesce(1).write.mode("append").parquet(staging)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    store = str(tmp_path / "store")
    out = str(tmp_path / "corpus")
    ST.run_streaming_ingest_dedup(
        spark,
        stream,
        store,
        out,
        str(tmp_path / "ck"),
        near_dup_jaccard=JACCARD_THRESHOLD,
    )
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())

    # batch twin on the SAME corpus via the registered queries
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        sorted(texts.items()), schema
    ).write.parquet(f"{d}/documents.parquet")
    keepers = {
        r["keeper"] for r in q_fingerprint_dedup(spark, str(d)).collect()
    }
    discards = {
        r["discard_doc_id"]
        for r in q_near_dup_discard(spark, str(d)).collect()
    }
    expect = sorted(keepers - discards)
    assert kept == expect == [1, 2, 11]

    # near-dup-dropped docs (3, 10) still stored their shingles, so they
    # veto later copies; the shingle sets live in the BUCKETED sibling
    # store (one row per (doc, shingle), partitioned by batch + bucket)
    st = spark.read.parquet(store)
    assert st.count() == 5
    sh = spark.read.option(
        "basePath", ST.shingle_store_dir(store)
    ).parquet(ST.shingle_store_dir(store))
    assert sh.select("o_id").distinct().count() == 5
    assert {"o_id", "o_n", "shv", "bucket", "batch"} <= set(sh.columns)
    # every stored shingle row sits in the bucket its hash maps to
    assert (
        sh.filter(
            F.col("bucket")
            != F.pmod(F.col("shv"), F.lit(ST.JACCARD_STORE_BUCKETS))
        ).count()
        == 0
    )


def test_streaming_jaccard_probe_prunes_to_batch_buckets(spark, tmp_path):
    """r7 verdict task 2: the per-batch store probe must read a STRICT
    subset of the shingle-store files when the batch's shingles miss
    buckets — partition pruning on the bucket= dirs, not a full scan.
    Equally: the pruned probe returns exactly the rows of the full scan
    restricted to those buckets (pruning can only remove non-matching
    candidates)."""
    import time

    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    # two batches of docs with wide shingle spread builds a store
    # covering many buckets
    t0 = " ".join(f"alpha{i}" for i in range(40))
    t1 = " ".join(f"beta{i}" for i in range(40))
    spark.createDataFrame([(1, t0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(staging)
    time.sleep(1.1)
    spark.createDataFrame([(2, t1)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(staging)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    store = str(tmp_path / "store")
    ST.run_streaming_ingest_dedup(
        spark,
        stream,
        store,
        str(tmp_path / "corpus"),
        str(tmp_path / "ck"),
        near_dup_jaccard=0.8,
    )
    sh_dir = ST.shingle_store_dir(store)
    full = spark.read.option("basePath", sh_dir).parquet(sh_dir)
    all_buckets = sorted(
        r["bucket"] for r in full.select("bucket").distinct().collect()
    )
    assert len(all_buckets) > 4  # the spread the pruning test needs
    probe_buckets = all_buckets[:2]
    probe = ST.probe_shingle_store(spark, store, 99, probe_buckets)

    # partition count actually selected by the scan's file index
    # (inputFiles() ignores filters, so it can't see pruning)
    def scanned_partitions(df):
        def walk(node):
            if "Scan" in node.getClass().getSimpleName():
                return node
            for i in range(node.children().size()):
                r = walk(node.children().apply(i))
                if r is not None:
                    return r
            return None

        scan = walk(df._jdf.queryExecution().executedPlan())
        return scan.selectedPartitions().partitionCount()

    n_probe = scanned_partitions(probe)
    n_full = scanned_partitions(full)
    assert n_probe < n_full  # STRICT subset of partition dirs read
    assert n_probe <= len(probe_buckets) * 2  # at most per (batch,bucket)
    # and the pruned rows == full rows restricted to those buckets
    expect = sorted(
        map(
            tuple,
            full.filter(F.col("bucket").isin(probe_buckets))
            .select("o_id", "o_n", "shv")
            .collect(),
        )
    )
    assert sorted(map(tuple, probe.collect())) == expect


def test_store_hot_shingles_audit(spark, tmp_path):
    """store_hot_shingles must name exactly the shingle hashes held by
    more than cap stored docs, hottest first — the pre-detonation audit
    for the uncapped exact-Jaccard candidate join."""
    import time

    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    # 5 docs share the same leading 3-shingle ("common common common"
    # appears in all); each also has unique tail tokens
    texts = [
        (i, "common common common " + " ".join(f"u{i}x{j}" for j in range(9)))
        for i in range(5)
    ]
    spark.createDataFrame(texts, schema).coalesce(1).write.mode(
        "append"
    ).parquet(staging)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    store = str(tmp_path / "store")
    ST.run_streaming_ingest_dedup(
        spark,
        stream,
        store,
        str(tmp_path / "corpus"),
        str(tmp_path / "ck"),
        near_dup_jaccard=0.99,
    )
    hot = ST.store_hot_shingles(spark, store, cap=4).collect()
    # exactly one shingle ("common common common") is held by all 5 docs
    assert len(hot) == 1 and hot[0]["n_docs"] == 5
    # at cap=5 nothing exceeds
    assert ST.store_hot_shingles(spark, store, cap=5).count() == 0


def test_streaming_near_dup_requires_simhash_store(spark, tmp_path):
    """Requesting the near-dup gate against a legacy fingerprint-only
    store must fail loudly, not silently skip the check."""
    import pytest as _pytest

    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    docs = spark.createDataFrame([(1, "legacy store doc")], schema)
    docs.coalesce(1).write.mode("append").parquet(staging)

    store = str(tmp_path / "store")
    from topic_modeling_ajin_spark.functions import hashing as H
    from topic_modeling_ajin_spark.functions import text as TX

    docs.select(
        H.fingerprint(TX.cleaned("text")).alias("fingerprint")
    ).write.mode("overwrite").parquet(f"{store}/batch=0")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    with _pytest.raises(Exception, match="simhash"):
        ST.run_streaming_ingest_dedup(
            spark,
            stream,
            store,
            str(tmp_path / "corpus"),
            str(tmp_path / "ck"),
            near_dup_hamming=2,
        )


def test_streaming_near_dup_detects_mixed_schema_store(spark, tmp_path):
    """A store holding BOTH legacy (fingerprint-only) and current
    (fingerprint+simhash) partitions must fail loudly naming the legacy
    ones — plain schema inference samples ONE file, so without
    mergeSchema the outcome would flip nondeterministically between an
    error and silently reading legacy rows as simhash=NULL (which never
    band-matches, re-admitting every pre-upgrade near-dup)."""
    import pytest as _pytest

    from topic_modeling_ajin_spark.functions import hashing as H
    from topic_modeling_ajin_spark.functions import text as TX

    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    docs = spark.createDataFrame([(1, "mixed store doc")], schema)
    docs.coalesce(1).write.mode("append").parquet(staging)

    store = str(tmp_path / "store")
    fp = H.fingerprint(TX.cleaned("text")).alias("fingerprint")
    # batch=0: legacy layout (no simhash column)
    docs.select(fp).write.mode("overwrite").parquet(f"{store}/batch=0")
    # batch=1: current layout
    from pyspark.sql import functions as F

    docs.select(fp, F.lit(7).cast("long").alias("simhash")).write.mode(
        "overwrite"
    ).parquet(f"{store}/batch=1")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    with _pytest.raises(Exception, match="batch=0"):
        ST.run_streaming_ingest_dedup(
            spark,
            stream,
            store,
            str(tmp_path / "corpus"),
            str(tmp_path / "ck"),
            near_dup_hamming=2,
        )


def test_streaming_quality_drift_monitor(spark, tmp_path):
    """Per-batch PSI audit: a batch resembling the reference corpus is
    not flagged; a degenerate batch (empty/punct-only docs pile into the
    bottom quality bins) is; values equal the shared psi_from_bins
    formula over bins derived from the REGISTERED quality_score query on
    the same rows; a checkpoint replay rewrites rather than duplicates."""
    import time

    from topic_modeling_ajin_spark.operators.quality_model import PSI_BINS
    from topic_modeling_ajin_spark.streaming.pipelines import (
        psi_from_bins,
        quality_bins,
        run_streaming_quality_drift,
    )

    schema = "doc_id long, text string"
    ok_texts = [
        (i, "the quick brown fox jumps over the lazy dog and then "
            "the cat sat on the mat with a hat for a while today")
        for i in range(40)
    ]
    bad_texts = [(100 + i, "!!! ??? ***") for i in range(40)]

    # reference distribution = the healthy batch's own shape
    ref_df = spark.createDataFrame(ok_texts, schema)
    ref_bins = quality_bins(ref_df)
    assert len(ref_bins) == PSI_BINS and sum(ref_bins) == 40

    staging = str(tmp_path / "in")
    spark.createDataFrame(ok_texts, schema).coalesce(1).write.mode(
        "append"
    ).parquet(staging)
    time.sleep(1.1)
    spark.createDataFrame(bad_texts, schema).coalesce(1).write.mode(
        "append"
    ).parquet(staging)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out = str(tmp_path / "audit")
    run_streaming_quality_drift(
        spark, stream, ref_bins, out, str(tmp_path / "ck")
    )
    rows = {
        r["batch_id"]: r
        for r in spark.read.parquet(out).collect()
    }
    assert set(rows) == {0, 1}
    # batch 0 IS the reference sample: PSI ~ 0, not drifted
    assert rows[0]["n_docs"] == 40
    assert rows[0]["psi"] == round(psi_from_bins(ref_bins, ref_bins), 6)
    assert not rows[0]["drifted"]
    # batch 1 is degenerate: high PSI, flagged
    bad_bins = quality_bins(spark.createDataFrame(bad_texts, schema))
    assert rows[1]["psi"] == round(psi_from_bins(bad_bins, ref_bins), 6)
    assert rows[1]["drifted"] and rows[1]["psi"] > rows[0]["psi"]

    # replay with a fresh checkpoint: same two audit rows, no duplicates
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    run_streaming_quality_drift(
        spark, stream2, ref_bins, out, str(tmp_path / "ck2")
    )
    again = spark.read.parquet(out).collect()
    assert len(again) == 2


def test_ingest_pipeline_emits_drift_audit(spark, tmp_path):
    """r7 verdict task 8: one stream curates AND monitors. With drift
    options set, the ingest pipeline emits a per-batch PSI row equal to
    the shared psi_from_bins formula over the RAW batch's quality bins
    (pre-gate), and a checkpoint replay adds nothing."""
    import time

    from topic_modeling_ajin_spark.streaming.pipelines import (
        psi_from_bins,
        quality_bins,
    )

    schema = "doc_id long, text string"
    ok_texts = [
        (i, "the quick brown fox jumps over the lazy dog and then "
            "the cat sat on the mat with a hat for a while today")
        for i in range(30)
    ]
    bad_texts = [(100 + i, "!!! ??? ***") for i in range(30)]
    ref_bins = quality_bins(spark.createDataFrame(ok_texts, schema))

    staging = str(tmp_path / "in")
    spark.createDataFrame(ok_texts, schema).coalesce(1).write.mode(
        "append"
    ).parquet(staging)
    time.sleep(1.1)
    spark.createDataFrame(bad_texts, schema).coalesce(1).write.mode(
        "append"
    ).parquet(staging)

    def mkstream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
        )

    store = str(tmp_path / "store")
    out = str(tmp_path / "corpus")
    drift = str(tmp_path / "drift")
    ck = str(tmp_path / "ck")
    ST.run_streaming_ingest_dedup(
        spark,
        mkstream(),
        store,
        out,
        ck,
        drift_ref_bins=ref_bins,
        drift_out_dir=drift,
    )
    rows = {r["batch_id"]: r for r in spark.read.parquet(drift).collect()}
    assert set(rows) == {0, 1}
    # batch 0 is the reference sample itself; batch 1 is degenerate.
    # psi values equal the shared formula over the raw batches' bins —
    # note the degenerate docs are NOT gated out of the monitor even
    # though dedup collapses them to one survivor in the corpus sink.
    bad_bins = quality_bins(spark.createDataFrame(bad_texts, schema))
    assert rows[0]["n_docs"] == 30 and rows[1]["n_docs"] == 30
    assert rows[0]["psi"] == round(psi_from_bins(ref_bins, ref_bins), 6)
    assert rows[1]["psi"] == round(psi_from_bins(bad_bins, ref_bins), 6)
    assert rows[1]["drifted"] and not rows[0]["drifted"]
    # dedup still ran: the 30 identical bad docs shipped one survivor
    assert spark.read.parquet(out).filter("doc_id >= 100").count() == 1

    # replay with the same checkpoint and no new input: nothing changes
    n_files = len(spark.read.parquet(drift).inputFiles())
    ST.run_streaming_ingest_dedup(
        spark,
        mkstream(),
        store,
        out,
        ck,
        drift_ref_bins=ref_bins,
        drift_out_dir=drift,
    )
    assert len(spark.read.parquet(drift).inputFiles()) == n_files
    assert {
        r["batch_id"]: r for r in spark.read.parquet(drift).collect()
    } == rows


def test_ingest_drift_half_configuration_fails(spark, tmp_path):
    """Setting only one of drift_ref_bins / drift_out_dir must fail
    loudly, not silently skip monitoring."""
    import pytest as _pytest

    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    spark.createDataFrame([(1, "doc")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(staging)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    with _pytest.raises(ValueError, match="drift"):
        ST.run_streaming_ingest_dedup(
            spark,
            stream,
            str(tmp_path / "store"),
            str(tmp_path / "corpus"),
            str(tmp_path / "ck"),
            drift_ref_bins=[1, 2, 3],
        )


def test_jaccard_gate_survives_shingleless_first_batch(spark, tmp_path):
    """r8 review: a committed batch whose docs all have <3 tokens writes
    an EMPTY shingle partition (no data files). Later batches must still
    probe the store (explicit schema, no inference) instead of wedging
    on 'Unable to infer schema' at every replay."""
    import time

    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    # batch 0: token-less / short docs only -> zero shingles stored
    spark.createDataFrame(
        [(1, "two words"), (2, "one")], schema
    ).coalesce(1).write.mode("append").parquet(staging)
    time.sleep(1.1)
    # batch 1: real docs, including a near-dup pair within the batch
    base = " ".join(f"tok{i}" for i in range(30))
    spark.createDataFrame(
        [(10, base), (11, base[:-1] + "X")], schema
    ).coalesce(1).write.mode("append").parquet(staging)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    store = str(tmp_path / "store")
    out = str(tmp_path / "corpus")
    ST.run_streaming_ingest_dedup(
        spark,
        stream,
        store,
        out,
        str(tmp_path / "ck"),
        near_dup_jaccard=0.8,
    )
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    # short docs pass (no shingles -> gate bypass); 11 is a near-dup of 10
    assert kept == [1, 2, 10]


def test_ingest_drift_threshold_alone_fails(spark, tmp_path):
    """drift_threshold without the ref/out pair must also fail loudly."""
    import pytest as _pytest

    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    spark.createDataFrame([(1, "doc")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(staging)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    with _pytest.raises(ValueError, match="drift"):
        ST.run_streaming_ingest_dedup(
            spark,
            stream,
            str(tmp_path / "store"),
            str(tmp_path / "corpus"),
            str(tmp_path / "ck"),
            drift_threshold=0.1,
        )


def test_ingest_decontam_gate_matches_batch_semantics(spark, tmp_path):
    """The ship-time decontam gate must (a) drop docs sharing a 5-gram
    with the benchmark set, (b) still STORE their fingerprints/shingles
    so a clean near-dup of a contaminated page is vetoed (the batch
    manifest composes dedup over the full corpus, decontam prunes only
    what ships), and (c) pass clean docs untouched."""
    import time

    from topic_modeling_ajin_spark.operators.text_analysis import (
        DECON_NGRAM,
    )

    schema = "doc_id long, text string"
    assert DECON_NGRAM == 5
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    bench_dir = str(tmp_path / "bench")
    spark.createDataFrame(
        [(9000, bench_text)], schema
    ).write.parquet(bench_dir)

    # doc 1: quotes a benchmark 5-gram inside unique text -> contaminated
    contaminated = (
        "alpha beta gamma delta epsilon unique1 unique2 unique3 "
        + " ".join(f"u{i}" for i in range(22))
    )
    # doc 10 (later batch): near-dup of doc 1 (one tail token changed),
    # does NOT itself contain a full benchmark 5-gram after the change?
    # it still contains 'alpha beta gamma delta epsilon' -> also
    # contaminated; so make doc 11 a near-dup that BREAKS the quote:
    toks = contaminated.split()
    clean_neardup = " ".join(["alpha", "beta", "gamma", "CHANGED"] + toks[4:])
    # doc 2: clean unrelated
    clean = "totally unrelated words one two three four five six seven"

    staging = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, contaminated), (2, clean)], schema
    ).coalesce(1).write.mode("append").parquet(staging)
    time.sleep(1.1)
    spark.createDataFrame(
        [(11, clean_neardup)], schema
    ).coalesce(1).write.mode("append").parquet(staging)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    store = str(tmp_path / "store")
    out = str(tmp_path / "corpus")
    ST.run_streaming_ingest_dedup(
        spark,
        stream,
        store,
        out,
        str(tmp_path / "ck"),
        near_dup_jaccard=0.8,
        decontam_bench_dir=bench_dir,
    )
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    # 1 contaminated (dropped at ship), 2 clean (ships), 11 is a
    # near-dup of the CONTAMINATED doc 1 -> vetoed by the stored
    # shingles even though 1 never shipped
    assert kept == [2]
    # the contaminated doc still stored its fingerprint (seen)
    assert spark.read.parquet(store).count() == 3


def test_streaming_embedding_gate_matches_batch_near_dup(spark, tmp_path):
    """r8 verdict task 7: with near_dup_cosine set, the streaming drop
    set must equal the batch embedding_near_dup pairs under the
    keep-first rule (drop id_b of every pair) under in-order arrival,
    across batch boundaries — verified against the REGISTERED batch
    query on the same vectors. Vectors are axis-aligned so int8
    quantization is exact and sign-LSH buckets are unambiguous."""
    import time

    from topic_modeling_ajin_spark.operators.similarity import NEAR_DUP_COS

    A = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]
    B = [1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0]
    C = [-1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0]

    def scale(v, k):
        return [x * k for x in v]

    docs = {
        1: ("text one", A),
        2: ("text two", B),
        3: ("text three", scale(A, 2.0)),   # dup of 1 (later batch)
        4: ("text four", C),                 # kept
        5: ("text five", scale(B, 1.5)),     # dup of 2 (later batch)
        6: ("text six", scale(C, 3.0)),      # dup of 4, SAME batch
        8: ("text eight", [0.0] * 8),        # zero vector: bypasses gate
        7: ("text seven", A),                # vetoed by store (1 and 3)
    }
    schema = "doc_id long, text string, embedding array<double>"
    staging = str(tmp_path / "in")
    for batch in ((1, 2), (3, 4, 5, 6, 8), (7,)):
        spark.createDataFrame(
            [(i, docs[i][0], docs[i][1]) for i in batch], schema
        ).coalesce(1).write.mode("append").parquet(staging)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    store = str(tmp_path / "store")
    out = str(tmp_path / "corpus")
    ST.run_streaming_ingest_dedup(
        spark,
        stream,
        store,
        out,
        str(tmp_path / "ck"),
        near_dup_cosine=NEAR_DUP_COS,
    )
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())

    # batch twin on the SAME vectors via the registered query
    d = str(tmp_path / "emb")
    spark.createDataFrame(
        [(i, docs[i][1]) for i in sorted(docs)],
        "vec_id long, embedding array<double>",
    ).write.parquet(f"{d}/embeddings.parquet")
    reg = load_all()
    discards = {
        r["id_b"] for r in reg["embedding_near_dup"].fn(spark, d).collect()
    }
    assert kept == sorted(set(docs) - discards) == [1, 2, 4, 8]

    # every nonzero-embedding doc stored its int8 codes (drops included:
    # 3 and 5 must veto 7); the zero vector stored nothing; each stored
    # row sits in its sign-LSH bucket partition
    v = (
        spark.read.option("basePath", ST.vector_store_dir(store))
        .schema(_p.VECTOR_STORE_SCHEMA)
        .parquet(ST.vector_store_dir(store))
    )
    rows = v.collect()
    assert len(rows) == 7  # 8 docs minus the zero vector
    sign_bucket = lambda vec: sum(1 << i for i in range(8) if vec[i] > 0)
    fp_to_vec = {}
    for i, (_, vec) in docs.items():
        if any(vec):
            fp_to_vec[i] = vec
    got_buckets = sorted(r["bucket"] for r in rows)
    want_buckets = sorted(sign_bucket(v) for v in fp_to_vec.values())
    assert got_buckets == want_buckets
    # int8 codes: axis-aligned vectors quantize to exactly +/-127 or 0
    for r in rows:
        assert set(r["q"]) <= {-127, 0, 127}


def test_streaming_cosine_gate_two_tier_is_float_exact(spark, tmp_path):
    """r10 verdict task 6: pairs whose int8-quantized cosine STRADDLES
    the threshold (int8 >= t, float < t) must be KEPT — the float
    confirm tier decides, so the stream's drop set equals the batch
    float rule exactly where the old one-tier int8 gate mis-dropped.
    Both straddle paths are planted: against the persisted vector STORE
    (cross-batch) and within one batch. A true duplicate still drops.

    The two pairs were searched numerically: same sign pattern (same
    sign-LSH bucket — candidates only form inside one), float cosine
    just under 0.9, max-abs int8 cosine just over."""
    import math
    import time

    # pair 1: float 0.899755 < 0.9 <= int8 0.900191
    A1 = [-0.236, 0.9574, 0.9872, -0.3634, -0.7225, 0.4686, -0.7873, -0.5289]
    B1 = [-0.4116, 0.7103, 0.8998, -0.2002, -0.5455, 0.5883, -0.0827, -0.7458]
    # pair 2: float 0.898532 < 0.9 <= int8 0.900068
    A2 = [-0.9096, -0.7021, 0.901, -0.8513, 0.4006, -0.4726, 0.9883, 0.8798]
    B2 = [-0.9781, -0.2925, 0.5181, -0.1232, 0.0596, -0.5808, 0.9997, 0.9222]
    THR = 0.9

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(sum(x * x for x in a)) / math.sqrt(
            sum(y * y for y in b)
        )

    def icos(a, b):
        mxa, mxb = max(abs(x) for x in a), max(abs(x) for x in b)
        qa = [round(x * 127.0 / mxa) for x in a]
        qb = [round(x * 127.0 / mxb) for x in b]
        return cos(qa, qb)

    # the planted premise, re-derived in pure python so drift in the
    # constants fails here, not in a silent wrong-reason pass
    assert cos(A1, B1) < THR <= icos(A1, B1)
    assert cos(A2, B2) < THR <= icos(A2, B2)

    docs = {
        1: A1,                      # batch 1
        2: B1,                      # batch 2: STORE straddle vs 1 -> kept
        3: A2,                      # batch 2
        4: B2,                      # batch 2: WITHIN-batch straddle vs 3
        5: [x * 2.0 for x in A1],   # batch 2: true dup of 1 -> dropped
    }
    schema = "doc_id long, text string, embedding array<double>"
    staging = str(tmp_path / "in")
    for batch in ((1,), (2, 3, 4, 5)):
        spark.createDataFrame(
            [(i, f"text {i}", docs[i]) for i in batch], schema
        ).coalesce(1).write.mode("append").parquet(staging)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out = str(tmp_path / "corpus")
    ST.run_streaming_ingest_dedup(
        spark,
        stream,
        str(tmp_path / "store"),
        out,
        str(tmp_path / "ck"),
        near_dup_cosine=THR,
    )
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    # pure-python batch-rule replay: drop iff float cosine >= THR with
    # any lower-id doc in the same sign-LSH bucket (dropped docs veto)
    bucket = lambda v: sum(1 << i for i in range(8) if v[i] > 0)  # noqa: E731
    drops = {
        b
        for a in docs
        for b in docs
        if a < b and bucket(docs[a]) == bucket(docs[b])
        and cos(docs[a], docs[b]) >= THR
    }
    assert kept == sorted(set(docs) - drops) == [1, 2, 3, 4]


def test_streaming_vector_probe_prunes_to_batch_buckets(spark, tmp_path):
    """The embedding gate's per-batch store probe must read a STRICT
    subset of the vector-store files when the batch's sign-LSH buckets
    miss partitions — and the pruned rows must equal the full scan
    restricted to those buckets (candidates only form inside a bucket,
    so pruning is exact)."""
    import time

    schema = "doc_id long, text string, embedding array<double>"
    staging = str(tmp_path / "in")
    # four docs spread over four distinct sign-LSH buckets, two batches
    vecs = [
        [1.0] * 8,
        [-1.0] * 8,
        [1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0],
        [-1.0, -1.0, -1.0, -1.0, 1.0, 1.0, 1.0, 1.0],
    ]
    spark.createDataFrame(
        [(i, f"t{i}", vecs[i]) for i in (0, 1)], schema
    ).coalesce(1).write.mode("append").parquet(staging)
    time.sleep(1.1)
    spark.createDataFrame(
        [(i, f"t{i}", vecs[i]) for i in (2, 3)], schema
    ).coalesce(1).write.mode("append").parquet(staging)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    store = str(tmp_path / "store")
    ST.run_streaming_ingest_dedup(
        spark,
        stream,
        store,
        str(tmp_path / "corpus"),
        str(tmp_path / "ck"),
        near_dup_cosine=0.3,
    )
    v_dir = ST.vector_store_dir(store)
    full = (
        spark.read.option("basePath", v_dir)
        .schema(_p.VECTOR_STORE_SCHEMA)
        .parquet(v_dir)
    )
    all_buckets = sorted(
        r["bucket"] for r in full.select("bucket").distinct().collect()
    )
    assert len(all_buckets) == 4
    probe_buckets = all_buckets[:1]
    probe = ST.probe_vector_store(spark, store, 99, probe_buckets)

    def scanned_partitions(df):
        def walk(node):
            if "Scan" in node.getClass().getSimpleName():
                return node
            for i in range(node.children().size()):
                r = walk(node.children().apply(i))
                if r is not None:
                    return r
            return None

        scan = walk(df._jdf.queryExecution().executedPlan())
        return scan.selectedPartitions().partitionCount()

    assert scanned_partitions(probe) < scanned_partitions(full)
    expect = sorted(
        (r["o_id"], tuple(r["q"]))
        for r in full.filter(F.col("bucket").isin(probe_buckets))
        .select("o_id", "q")
        .collect()
    )
    assert sorted((r["o_id"], tuple(r["q"])) for r in probe.collect()) == expect


def test_embedding_gate_requires_embedding_column(spark, tmp_path):
    """Half-configuration must fail loudly: near_dup_cosine without an
    embedding column on the stream would silently ship every semantic
    duplicate."""
    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    spark.createDataFrame([(1, "x")], schema).write.parquet(staging)
    stream = spark.readStream.schema(schema).parquet(staging)
    with pytest.raises(ValueError, match="embedding"):
        ST.run_streaming_ingest_dedup(
            spark,
            stream,
            str(tmp_path / "store"),
            str(tmp_path / "corpus"),
            str(tmp_path / "ck"),
            near_dup_cosine=0.3,
        )


def test_store_hot_buckets_audit(spark, tmp_path):
    """store_hot_buckets must name exactly the sign-LSH buckets holding
    more than cap stored vectors, fullest first — the pre-detonation
    audit for the uncapped embedding candidate join."""
    import time

    schema = "doc_id long, text string, embedding array<double>"
    staging = str(tmp_path / "in")
    # 5 docs share the all-positive bucket (255); 2 sit alone elsewhere.
    # Distinct magnitudes keep the cosines below any plausible drop,
    # but the audit counts ALL stored vectors regardless of drops.
    rows = [
        (i, f"hot doc {i}", [1.0 + i, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0])
        for i in range(5)
    ] + [
        (10, "cold a", [-1.0] * 8),
        (11, "cold b", [1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0]),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(staging)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    store = str(tmp_path / "store")
    ST.run_streaming_ingest_dedup(
        spark,
        stream,
        store,
        str(tmp_path / "corpus"),
        str(tmp_path / "ck"),
        near_dup_cosine=0.999999,
    )
    got = [
        (r["bucket"], r["n_docs"])
        for r in ST.store_hot_buckets(spark, store, cap=3).collect()
    ]
    assert got == [(255, 5)]
    # healthy store under the default cap: nothing named
    assert ST.store_hot_buckets(spark, store).count() == 0


def test_jaccard_store_budget_refuses_degenerate_store(spark, tmp_path):
    """r9 verdict task 6: a store detonated by corpus-wide boilerplate
    must fail LOUDLY at the candidate budget — naming the knob and the
    audit — instead of running the within-bucket join quadratic. The
    same corpus under the default budget completes with the parity drop
    set (none here: the boilerplate pairs sit far below the Jaccard
    gate)."""
    import time

    import pytest
    from pyspark.sql.streaming import StreamingQueryException

    from topic_modeling_ajin_spark.operators.dedup import JACCARD_THRESHOLD

    schema = "doc_id long, text string"
    texts = [
        (i, f"common nav footer unique{i}a unique{i}b unique{i}c")
        for i in range(15)
    ]

    def stage(sub):
        staging = str(tmp_path / sub / "in")
        spark.createDataFrame(texts[:10], schema).coalesce(1).write.mode(
            "append"
        ).parquet(staging)
        time.sleep(1.1)
        spark.createDataFrame(texts[10:], schema).coalesce(1).write.mode(
            "append"
        ).parquet(staging)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
        )
        base = tmp_path / sub
        return stream, str(base / "store"), str(base / "out"), str(base / "ck")

    # batch 2 probes the 10-doc store sharing the boilerplate shingle:
    # 10 x 5 = 50 store candidates > 10 -> loud refusal
    stream, store, out, ck = stage("tight")
    with pytest.raises(StreamingQueryException) as ei:
        ST.run_streaming_ingest_dedup(
            spark, stream, store, out, ck,
            near_dup_jaccard=JACCARD_THRESHOLD,
            max_jaccard_store_candidates=10,
        )
    assert "max_jaccard_store_candidates" in str(ei.value)
    assert "store_hot_shingles" in str(ei.value)

    # default budget: same corpus completes, nothing near-dup-dropped
    stream, store, out, ck = stage("default")
    ST.run_streaming_ingest_dedup(
        spark, stream, store, out, ck, near_dup_jaccard=JACCARD_THRESHOLD
    )
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [t[0] for t in texts]


def test_vector_store_budget_refuses_degenerate_store(spark, tmp_path):
    """The embedding gate's twin: all vectors landing in ONE sign-LSH
    bucket (identical sign pattern) must fail loudly at the candidate
    budget, naming the knob and the occupancy audit."""
    import time

    import pytest
    from pyspark.sql.streaming import StreamingQueryException

    schema = "doc_id long, text string, embedding array<double>"
    # all-positive components -> identical sign pattern -> ONE sign-LSH
    # bucket; each doc dominates its own axis so pairwise cosines stay
    # tiny (~0.02), far below the 0.99 gate — only the budget can stop
    # the run
    dim = 16
    rows = [
        (
            i,
            f"doc number {i} text",
            [1.0 if j == i else 0.01 for j in range(dim)],
        )
        for i in range(15)
    ]

    def stage(sub):
        staging = str(tmp_path / sub / "in")
        spark.createDataFrame(rows[:10], schema).coalesce(1).write.mode(
            "append"
        ).parquet(staging)
        time.sleep(1.1)
        spark.createDataFrame(rows[10:], schema).coalesce(1).write.mode(
            "append"
        ).parquet(staging)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
        )
        base = tmp_path / sub
        return stream, str(base / "store"), str(base / "out"), str(base / "ck")

    stream, store, out, ck = stage("tight")
    with pytest.raises(StreamingQueryException) as ei:
        ST.run_streaming_ingest_dedup(
            spark, stream, store, out, ck,
            near_dup_cosine=0.99,
            max_cosine_store_candidates=10,
        )
    assert "max_cosine_store_candidates" in str(ei.value)
    assert "store_hot_buckets" in str(ei.value)

    stream, store, out, ck = stage("default")
    ST.run_streaming_ingest_dedup(
        spark, stream, store, out, ck, near_dup_cosine=0.99
    )
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [r[0] for r in rows]


def _stage_documents_batches(spark, sf_dir, tmp_path, sub, n_batches=3):
    """Stage the real documents table as n ordered micro-batch files."""
    import time

    from topic_modeling_ajin_spark.sources import load_table

    docs = sorted(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .collect(),
        key=lambda r: r["doc_id"],
    )
    per = (len(docs) + n_batches - 1) // n_batches
    staging = str(tmp_path / sub / "in")
    schema = "doc_id long, lang string, text string"
    for b in range(n_batches):
        chunk = [tuple(r) for r in docs[b * per : (b + 1) * per]]
        # one slice up front: createDataFrame(list) would parallelize
        # into defaultParallelism Python partitions and coalesce(1)
        # then evaluates them serially (~5 s per staging file)
        spark.createDataFrame(
            spark.sparkContext.parallelize(chunk, 1), schema
        ).write.mode("append").parquet(staging)
        time.sleep(1.1)
    return staging, schema


def _batch_ladder_reference(spark, sf_dir):
    """The registered-query composition the incremental snapshot must
    equal: rule ∧ exact-keeper ∧ ¬near-dup ∧ mixture, rows
    (doc_id, lang, quality)."""
    from topic_modeling_ajin_spark.operators.curation import q_mixture_sample
    from topic_modeling_ajin_spark.operators.dedup import (
        q_fingerprint_dedup,
        q_near_dup_discard,
    )
    from topic_modeling_ajin_spark.operators.text_analysis import (
        q_curation_filter_report,
    )

    fr = {
        r["doc_id"]: r["quality"]
        for r in q_curation_filter_report(spark, sf_dir)
        .filter(F.col("keep"))
        .collect()
    }
    keepers = {
        r["keeper"] for r in q_fingerprint_dedup(spark, sf_dir).collect()
    }
    ndd = {
        r["discard_doc_id"]
        for r in q_near_dup_discard(spark, sf_dir).collect()
    }
    mix = {
        r["doc_id"]: r["lang"]
        for r in q_mixture_sample(spark, sf_dir).collect()
    }
    return {
        (d, mix[d], fr[d])
        for d in fr
        if d in keepers and d not in ndd and d in mix
    }, set(fr) & keepers - ndd


def test_incremental_manifest_matches_batch_ladder(spark, sf_dir, tmp_path):
    """r9 verdict task 5: stream the corpus in 3 ordered micro-batches
    through run_incremental_manifest — the final snapshot must equal the
    REGISTERED batch ladder (rule ∧ exact ∧ ¬near-dup ∧ mixture) on the
    same corpus, and the union of append-only pool deltas must equal the
    prefix-stable curated pool."""
    staging, schema = _stage_documents_batches(spark, sf_dir, tmp_path, "im")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    base = tmp_path / "im"
    out = str(base / "out")
    ST.run_incremental_manifest(
        spark, stream, str(base / "store"), out, str(base / "ck")
    )
    want_manifest, want_pool = _batch_ladder_reference(spark, sf_dir)
    got_manifest = {
        (r["doc_id"], r["lang"], r["quality"])
        for r in spark.read.parquet(f"{out}/manifest").collect()
    }
    assert got_manifest == want_manifest and got_manifest
    got_pool = {
        r["doc_id"] for r in spark.read.parquet(f"{out}/pool").collect()
    }
    assert got_pool == want_pool
    # the delta sink really is partitioned per batch (append-only deltas)
    import os

    parts = {
        d for d in os.listdir(f"{out}/pool") if d.startswith("batch=")
    }
    assert len(parts) == 3


def test_incremental_manifest_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Replaying the WHOLE stream (fresh checkpoint, same store/out
    dirs — every batch re-fires against already-committed state) must
    leave the pool, the lang-count state, and the snapshot exactly as
    the first run did: every sink overwrites its own partition, and the
    snapshot is a pure function of the state dirs."""
    staging, schema = _stage_documents_batches(
        spark, sf_dir, tmp_path, "im2"
    )
    base = tmp_path / "im2"
    out = str(base / "out")

    def run(ck):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
        )
        ST.run_incremental_manifest(
            spark, stream, str(base / "store"), out, str(base / ck)
        )

    run("ck1")
    first = {
        "pool": sorted(
            map(tuple, spark.read.parquet(f"{out}/pool").collect())
        ),
        "manifest": sorted(
            map(tuple, spark.read.parquet(f"{out}/manifest").collect())
        ),
        "lang": sorted(
            map(tuple, spark.read.parquet(f"{out}/lang_counts").collect())
        ),
    }
    run("ck2")  # fresh checkpoint: full replay over committed state
    second = {
        "pool": sorted(
            map(tuple, spark.read.parquet(f"{out}/pool").collect())
        ),
        "manifest": sorted(
            map(tuple, spark.read.parquet(f"{out}/manifest").collect())
        ),
        "lang": sorted(
            map(tuple, spark.read.parquet(f"{out}/lang_counts").collect())
        ),
    }
    assert first == second and first["manifest"]


def test_incremental_manifest_decontam_gate_matches_batch(
    spark, sf_dir, tmp_path
):
    """With decontam_bench_dir staged from the corpus's benchmark
    stand-ins (doc_id < DECON_BENCH_MAX_DOC_ID), the final snapshot must
    equal the registered ladder with the decontamination membership
    test: rule ∧ exact ∧ ¬near-dup ∧ mixture ∧ doc_id >= split ∧
    ¬doc_decontam.flagged — bench members self-flag via their own grams,
    so the id-convention membership test and the gram gate agree."""
    from topic_modeling_ajin_spark.operators.text_analysis import (
        DECON_BENCH_MAX_DOC_ID,
        q_doc_decontam,
    )
    from topic_modeling_ajin_spark.sources import load_table

    staging, schema = _stage_documents_batches(
        spark, sf_dir, tmp_path, "imd"
    )
    bench_dir = str(tmp_path / "imd" / "bench")
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < DECON_BENCH_MAX_DOC_ID
    ).select("doc_id", "text").write.parquet(bench_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    base = tmp_path / "imd"
    out = str(base / "out")
    ST.run_incremental_manifest(
        spark,
        stream,
        str(base / "store"),
        out,
        str(base / "ck"),
        decontam_bench_dir=bench_dir,
    )
    want_manifest, _ = _batch_ladder_reference(spark, sf_dir)
    clean = {
        r["doc_id"]
        for r in q_doc_decontam(spark, sf_dir)
        .filter(~F.col("flagged"))
        .collect()
    }
    want = {
        (d, lang, q)
        for (d, lang, q) in want_manifest
        if d >= DECON_BENCH_MAX_DOC_ID and d in clean
    }
    got = {
        (r["doc_id"], r["lang"], r["quality"])
        for r in spark.read.parquet(f"{out}/manifest").collect()
    }
    assert got == want and got


def test_incremental_manifest_stores_one_shingle_copy_per_fingerprint(
    spark, tmp_path
):
    """r10 review regression: an exact copy arriving in a LATER batch
    must not re-store its fingerprint's shingle rows — duplicated o_id
    rows double the per-(doc, o_id) intersection count in future probes
    and push below-threshold pairs over the Jaccard gate. Batch 0 ships
    A, batch 1 an exact copy of A, batch 2 a doc sharing 6 of 14 union
    shingles with A (true J = 0.43 < 0.8; a doubled intersection would
    compute 12/8 = 1.5 and wrongly drop it)."""
    import time

    a_text = "the is a0 a1 a2 a3 a4 a5 a6 a7 a8 a9"
    d_text = "the is a0 a1 a2 a3 a4 a5 x0 x1 x2 x3"
    schema = "doc_id long, lang string, text string"
    staging = str(tmp_path / "in")
    for batch in ([(1, "en", a_text)], [(10, "en", a_text)], [(20, "en", d_text)]):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(staging)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out = str(tmp_path / "out")
    ST.run_incremental_manifest(
        spark, stream, str(tmp_path / "store"), out, str(tmp_path / "ck")
    )
    pool = sorted(r["doc_id"] for r in spark.read.parquet(f"{out}/pool").collect())
    assert pool == [1, 20]  # 10 = exact dup; 20 must NOT be near-dup-dropped
    # the shingle store holds exactly ONE copy of A's shingle set
    sh = spark.read.option(
        "basePath", ST.shingle_store_dir(str(tmp_path / "store"))
    ).parquet(ST.shingle_store_dir(str(tmp_path / "store")))
    per_oid = {
        r["o_id"]: r["n"]
        for r in sh.groupBy("o_id").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 10 for n in per_oid.values()) and len(per_oid) == 2


def test_jsonl_stream_feeds_incremental_manifest(spark, tmp_path):
    """Crawl-shaped ingestion end to end: JSONL batches (including a
    malformed line) stream through read_documents_jsonl_stream into
    run_incremental_manifest — the bad line lands in the QUARANTINE
    sink (r10 ADVICE: it used to vanish at the verdict join on its
    null doc_id), never crashes the stream, and the good docs land in
    the pool. Here the consumer selects only the data columns, so the
    corrupt row arrives as an all-null row and the null-doc_id rule
    catches it; the corrupt-column path has its own test."""
    import time

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    text = "the is w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    staging = tmp_path / "in"
    staging.mkdir()
    batches = [
        ['{"doc_id": 1, "lang": "en", "text": "%s"}' % text,
         "{broken json line"],
        ['{"doc_id": 2, "lang": "en", '
         '"text": "the is z0 z1 z2 z3 z4 z5 z6 z7 z8 z9"}'],
    ]
    for i, lines in enumerate(batches):
        (staging / f"b{i}.jsonl").write_text("\n".join(lines) + "\n")
        time.sleep(1.1)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("text", StringType()),
        ]
    )
    stream = ST.read_documents_jsonl_stream(
        spark, str(staging), schema
    ).select("doc_id", "lang", "text")
    out = str(tmp_path / "out")
    ST.run_incremental_manifest(
        spark, stream, str(tmp_path / "store"), out, str(tmp_path / "ck")
    )
    pool = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out}/pool").collect()
    )
    assert pool == [1, 2]
    # the malformed line is AUDITED, not silently dropped: one
    # quarantine row (batch 0), and the batch-0 card counts it
    q = spark.read.parquet(f"{out}/quarantine").collect()
    assert len(q) == 1 and q[0]["doc_id"] is None
    cards = {
        r["batch_id"]: r
        for r in spark.read.option("basePath", f"{out}/card")
        .parquet(f"{out}/card")
        .collect()
    }
    # no maxFilesPerTrigger: availableNow folds both files into batch 0
    assert set(cards) == {0}
    assert cards[0]["n_quarantined"] == 1
    assert cards[0]["n_in"] == 2


def test_incremental_manifest_quarantine_keeps_corrupt_payload(
    spark, tmp_path
):
    """When the consumer forwards the reader's corrupt column, the
    quarantined row must carry the RAW malformed line so an operator
    can audit it — the read_jsonl contract end to end."""
    import time

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    staging = tmp_path / "in"
    staging.mkdir()
    bad_line = '{"doc_id": 7, "lang": "en", "text": "trunca'
    lines = [
        '{"doc_id": 1, "lang": "en", '
        '"text": "the is a0 a1 a2 a3 a4 a5 a6 a7 a8 a9"}',
        bad_line,
    ]
    (staging / "b0.jsonl").write_text("\n".join(lines) + "\n")
    time.sleep(1.1)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("text", StringType()),
        ]
    )
    stream = ST.read_documents_jsonl_stream(spark, str(staging), schema)
    out = str(tmp_path / "out")
    ST.run_incremental_manifest(
        spark, stream, str(tmp_path / "store"), out, str(tmp_path / "ck")
    )
    q = spark.read.parquet(f"{out}/quarantine").collect()
    assert len(q) == 1 and q[0]["_corrupt_record"] == bad_line
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out}/pool").collect()
    ) == [1]


def test_incremental_manifest_token_mixture_matches_batch(
    spark, sf_dir, tmp_path
):
    """r10 verdict task 2: with mixture='tokens' the final snapshot must
    equal the batch composition rule ∧ exact ∧ ¬near-dup ∧
    mixture_sample_tokens on the same corpus — the REGISTERED token
    sampler's membership AND its n_tokens values (shared
    token_budget_selection rule, one definition). The per-batch
    policy-drift audit must exist for every batch and agree with the
    shipped snapshot on the last one."""
    from topic_modeling_ajin_spark.operators.curation import (
        q_mixture_sample_tokens,
    )

    staging, schema = _stage_documents_batches(
        spark, sf_dir, tmp_path, "imt"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    base = tmp_path / "imt"
    out = str(base / "out")
    ST.run_incremental_manifest(
        spark,
        stream,
        str(base / "store"),
        out,
        str(base / "ck"),
        mixture="tokens",
    )
    _, want_pool = _batch_ladder_reference(spark, sf_dir)
    mixt = {
        r["doc_id"]: (r["lang"], r["n_tokens"])
        for r in q_mixture_sample_tokens(spark, sf_dir).collect()
    }
    want = {
        (i, mixt[i][0], mixt[i][1]) for i in want_pool if i in mixt
    }
    got = {
        (r["doc_id"], r["lang"], r["n_tokens"])
        for r in spark.read.parquet(f"{out}/manifest").collect()
    }
    assert got == want and got

    drift = {
        r["batch_id"]: r
        for r in spark.read.option("basePath", f"{out}/policy_drift")
        .parquet(f"{out}/policy_drift")
        .collect()
    }
    assert set(drift) == {0, 1, 2}
    last = drift[2]
    assert last["n_token_policy"] == len(got)
    assert last["n_pool"] == len(want_pool)
    assert (
        last["n_overlap"]
        == last["n_token_policy"] - last["n_token_only"]
        == last["n_doc_policy"] - last["n_doc_only"]
    )


def test_incremental_manifest_delta_cards_sum_to_batch_funnel(
    spark, sf_dir, tmp_path
):
    """r10 verdict task 7: the per-batch delta cards must (a) satisfy
    the gate-ladder identity within every batch — n_in = rule + exact +
    near-dup + decontam + pool_delta — and (b) SUM to the registered
    batch queries' funnel over the whole corpus: total docs, rule
    failures, exact duplicates, near-dup discards inside the pool
    candidates, pool size; the last card's cumulative pool/manifest
    equal the final state dirs."""
    from topic_modeling_ajin_spark.operators.dedup import (
        q_fingerprint_dedup,
        q_near_dup_discard,
    )
    from topic_modeling_ajin_spark.operators.text_analysis import (
        q_curation_filter_report,
    )
    from topic_modeling_ajin_spark.sources import load_table

    staging, schema = _stage_documents_batches(
        spark, sf_dir, tmp_path, "imc"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    base = tmp_path / "imc"
    out = str(base / "out")
    ST.run_incremental_manifest(
        spark, stream, str(base / "store"), out, str(base / "ck")
    )
    cards = sorted(
        spark.read.option("basePath", f"{out}/card")
        .parquet(f"{out}/card")
        .collect(),
        key=lambda r: r["batch_id"],
    )
    assert [r["batch_id"] for r in cards] == [0, 1, 2]
    for r in cards:
        assert r["n_in"] == (
            r["n_rule_fail"]
            + r["n_exact_dup"]
            + r["n_near_dup_drop"]
            + r["n_cosine_drop"]
            + r["n_decontam_drop"]
            + r["n_pool_delta"]
        ), dict(r.asDict())
        assert r["n_quarantined"] == 0 and r["mixture"] == "docs"
        assert r["n_cosine_drop"] == 0  # semantic tier off in this run

    # batch-funnel reference from the registered queries
    n_docs = load_table(spark, sf_dir, "documents").count()
    fr_keep = {
        r["doc_id"]
        for r in q_curation_filter_report(spark, sf_dir)
        .filter(F.col("keep"))
        .collect()
    }
    keepers = {
        r["keeper"] for r in q_fingerprint_dedup(spark, sf_dir).collect()
    }
    ndd = {
        r["discard_doc_id"]
        for r in q_near_dup_discard(spark, sf_dir).collect()
    }
    assert sum(r["n_in"] for r in cards) == n_docs
    assert sum(r["n_rule_fail"] for r in cards) == n_docs - len(fr_keep)
    assert sum(r["n_exact_dup"] for r in cards) == len(
        fr_keep - keepers
    ), "exact-dup count = rule-passing docs that are not keepers"
    assert sum(r["n_near_dup_drop"] for r in cards) == len(
        fr_keep & keepers & ndd
    )
    assert sum(r["n_decontam_drop"] for r in cards) == 0
    pool_rows = spark.read.parquet(f"{out}/pool").count()
    man_rows = spark.read.parquet(f"{out}/manifest").count()
    assert sum(r["n_pool_delta"] for r in cards) == pool_rows
    assert cards[-1]["n_pool_total"] == pool_rows
    assert cards[-1]["n_manifest"] == man_rows


def test_ingest_delta_card_ladder_identity(spark, tmp_path):
    """r11: with card_out_dir set, every ingest batch writes a one-row
    delta card whose ladder identity holds — n_in = n_quality_fail +
    n_exact_dup + n_simhash_drop + n_jaccard_drop + n_cosine_drop +
    n_decontam_drop + n_shipped — and whose totals match the final
    corpus sink. Exercised with the exact + jaccard gates on a corpus
    planting one exact dup and one near-dup across batches."""
    import time

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    docs = {
        1: text_a,
        2: "completely different words one two three four five six seven",
        3: text_a,                                    # exact dup of 1
        4: text_a + " tail",                          # near-dup of 1
        5: "another unrelated document eight nine ten eleven twelve",
    }
    schema = "doc_id long, text string"
    staging = str(tmp_path / "in")
    for batch in ((1, 2), (3, 4, 5)):
        spark.createDataFrame(
            [(i, docs[i]) for i in batch], schema
        ).coalesce(1).write.mode("append").parquet(staging)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out = str(tmp_path / "corpus")
    card_dir = str(tmp_path / "card")
    ST.run_streaming_ingest_dedup(
        spark,
        stream,
        str(tmp_path / "store"),
        out,
        str(tmp_path / "ck"),
        near_dup_jaccard=0.5,
        card_out_dir=card_dir,
    )
    cards = sorted(
        spark.read.option("basePath", card_dir).parquet(card_dir).collect(),
        key=lambda r: r["batch_id"],
    )
    assert [r["batch_id"] for r in cards] == [0, 1]
    for r in cards:
        assert r["n_in"] == (
            r["n_quality_fail"]
            + r["n_exact_dup"]
            + r["n_simhash_drop"]
            + r["n_jaccard_drop"]
            + r["n_cosine_drop"]
            + r["n_decontam_drop"]
            + r["n_shipped"]
        ), dict(r.asDict())
        # gates not enabled in this run never count drops
        assert r["n_quality_fail"] == 0
        assert r["n_simhash_drop"] == 0 and r["n_cosine_drop"] == 0
        assert r["n_decontam_drop"] == 0
    assert cards[0]["n_in"] == 2 and cards[0]["n_shipped"] == 2
    # batch 1: doc 3 exact-dups the store, doc 4 near-dups it
    assert cards[1]["n_exact_dup"] == 1
    assert cards[1]["n_jaccard_drop"] == 1
    assert cards[1]["n_shipped"] == 1
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 5]
    assert sum(r["n_shipped"] for r in cards) == len(kept)


def test_incremental_manifest_tokens_and_decontam_compose(
    spark, sf_dir, tmp_path
):
    """r11 interaction guard: mixture='tokens' AND the decontamination
    gate together — the final snapshot must equal rule ∧ exact ∧
    ¬near-dup ∧ decontam-membership ∧ mixture_sample_tokens. Decontam
    prunes the POOL (so the pool delta shrinks) while the token sampler
    ranks ALL ingested docs (tok_state is written pre-gate), exactly as
    the batch composition joins the full-corpus sampler to the gated
    pool — the interaction the two single-feature tests cannot see."""
    from topic_modeling_ajin_spark.operators.curation import (
        q_mixture_sample_tokens,
    )
    from topic_modeling_ajin_spark.operators.text_analysis import (
        DECON_BENCH_MAX_DOC_ID,
        q_doc_decontam,
    )
    from topic_modeling_ajin_spark.sources import load_table

    staging, schema = _stage_documents_batches(
        spark, sf_dir, tmp_path, "imtd"
    )
    bench_dir = str(tmp_path / "imtd" / "bench")
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < DECON_BENCH_MAX_DOC_ID
    ).select("doc_id", "text").write.parquet(bench_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    base = tmp_path / "imtd"
    out = str(base / "out")
    ST.run_incremental_manifest(
        spark,
        stream,
        str(base / "store"),
        out,
        str(base / "ck"),
        decontam_bench_dir=bench_dir,
        mixture="tokens",
    )
    _, want_pool = _batch_ladder_reference(spark, sf_dir)
    clean = {
        r["doc_id"]
        for r in q_doc_decontam(spark, sf_dir)
        .filter(~F.col("flagged"))
        .collect()
    }
    mixt = {
        r["doc_id"]: (r["lang"], r["n_tokens"])
        for r in q_mixture_sample_tokens(spark, sf_dir).collect()
    }
    want = {
        (d, mixt[d][0], mixt[d][1])
        for d in want_pool
        if d >= DECON_BENCH_MAX_DOC_ID and d in clean and d in mixt
    }
    got = {
        (r["doc_id"], r["lang"], r["n_tokens"])
        for r in spark.read.parquet(f"{out}/manifest").collect()
    }
    assert got == want and got
    # the card's decontam column is live in this configuration
    cards = spark.read.option("basePath", f"{out}/card").parquet(
        f"{out}/card"
    ).collect()
    assert sum(r["n_decontam_drop"] for r in cards) > 0


def test_cosine_gate_margin_is_dim_aware(spark, tmp_path):
    """r11 ADVICE (medium): the int8 prune margin must cover the
    quantization error for the OBSERVED embedding dimension. An
    explicit margin below the 4*sqrt(d)/254 bound must raise loudly
    (silently pruning true pairs would break the exact-drop-set
    guarantee); omitting the margin derives it per batch, and a
    384-dim true near-dup pair — where the old fixed 0.1 default was
    UNDER the ~0.155 bound — must still be dropped."""
    import pytest

    from topic_modeling_ajin_spark.streaming import pipelines as ST

    d = 384
    base = [1.0] * d
    near = [1.0] * d
    near[-1] = 0.9  # cosine ~0.99997 with base, same sign-LSH bucket
    docs = {1: base, 2: near, 3: [(-1.0) ** i for i in range(d)]}
    schema = "doc_id long, text string, embedding array<double>"
    staging = str(tmp_path / "in")
    spark.createDataFrame(
        [(i, f"text {i}", v) for i, v in docs.items()], schema
    ).coalesce(1).write.mode("append").parquet(staging)

    def run(sub: str, **kw) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
        )
        ST.run_streaming_ingest_dedup(
            spark,
            stream,
            str(tmp_path / f"store{sub}"),
            str(tmp_path / f"corpus{sub}"),
            str(tmp_path / f"ck{sub}"),
            near_dup_cosine=0.99,
            **kw,
        )

    # explicit margin below the 384-dim bound: loud refusal
    # (foreachBatch wraps the ValueError in a StreamingQueryException)
    with pytest.raises(Exception, match="quantization-error bound"):
        run("a", int8_prune_margin=0.1)

    # derived margin: the true pair is caught exactly
    run("b")
    kept = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "corpusb")).collect()
    )
    assert kept == [1, 3]
    assert ST.int8_margin_bound(384) > 0.1  # the old default was unsafe


def test_incremental_manifest_semantic_tier_matches_float_rule(
    spark, tmp_path
):
    """r11 verdict task 4: the incremental ladder's SEMANTIC tier — the
    ingest pipeline's two-tier cosine gate wired into
    run_incremental_manifest — must drop exactly the keep-first closure
    of the float sign-LSH/cosine near-dup rule over per-fingerprint
    representatives, across batches via the bucketed int8 vector store
    (a planted cross-batch near-dup embedding pair) and within a batch
    (a planted same-batch pair), with the delta card counting the
    drops and the ladder identity still closing."""
    import math
    import time

    THR = 0.9
    d16 = 16

    def words(prefix):
        return "the is " + " ".join(f"{prefix}{i}" for i in range(10))

    embs = {
        1: [1.0] * d16,                                   # bucket 255
        2: [(-1.0) ** i for i in range(d16)],             # other bucket
        10: [2.0] * d16,          # cos=1 with doc 1 (CROSS-batch, store)
        11: [1.0, 1.0, -1.0, -1.0] * 4,                   # its own bucket
        12: [1.5, 1.5, -1.5, -1.5] * 4,  # cos=1 with 11 (WITHIN batch)
        13: [1.0] * 8 + [-1.0] * 8,  # doc 1's bucket, cos=0: candidate
                                     # pruned by the float confirm
    }
    texts = {i: words(chr(ord("a") + k)) for k, i in enumerate(sorted(embs))}
    schema = "doc_id long, lang string, text string, embedding array<double>"
    staging = str(tmp_path / "in")
    for batch in ((1, 2), (10, 11, 12, 13)):
        spark.createDataFrame(
            [(i, "en", texts[i], embs[i]) for i in batch], schema
        ).coalesce(1).write.mode("append").parquet(staging)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    out = str(tmp_path / "out")
    ST.run_incremental_manifest(
        spark,
        stream,
        str(tmp_path / "store"),
        out,
        str(tmp_path / "ck"),
        near_dup_cosine=THR,
    )

    # pure-python replay of the float rule: drop iff ANY earlier doc
    # (lower doc_id; batches arrive in doc_id order) in the same
    # sign-LSH bucket has cosine >= THR — dropped docs still veto
    bucket = lambda v: sum(1 << i for i in range(8) if v[i] > 0)  # noqa: E731

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(sum(x * x for x in a)) / math.sqrt(
            sum(y * y for y in b)
        )

    drops = {
        b
        for a in embs
        for b in embs
        if a < b and bucket(embs[a]) == bucket(embs[b])
        and cos(embs[a], embs[b]) >= THR
    }
    assert drops == {10, 12}, "planted pairs must be the drop set"
    pool = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out}/pool").collect()
    )
    assert pool == sorted(set(embs) - drops)

    cards = sorted(
        spark.read.option("basePath", f"{out}/card")
        .parquet(f"{out}/card")
        .collect(),
        key=lambda r: r["batch_id"],
    )
    assert [r["n_cosine_drop"] for r in cards] == [0, 2]
    for r in cards:
        assert r["n_in"] == (
            r["n_rule_fail"]
            + r["n_exact_dup"]
            + r["n_near_dup_drop"]
            + r["n_cosine_drop"]
            + r["n_decontam_drop"]
            + r["n_pool_delta"]
        ), dict(r.asDict())
    # the vector store holds one row per representative WITH an
    # embedding — cosine-dropped docs included (they veto later copies)
    vs = spark.read.option(
        "basePath", ST.vector_store_dir(str(tmp_path / "store"))
    ).parquet(ST.vector_store_dir(str(tmp_path / "store")))
    assert vs.count() == len(embs)


def test_incremental_export_equals_batch_export(spark, tmp_path):
    """r11 verdict task 5: the incremental manifest's trainer tail —
    export_incremental_token_shards over the streaming snapshot — must
    produce the SAME mountable artifact as the batch
    run_curation_pipeline(export_tokens=True) when the snapshot equals
    the batch token manifest (a planted corpus inside the stated parity
    domain: distinct texts, orthogonal embeddings, so no gate in either
    face drops anything the other keeps). Token shards compare
    row-for-row (phase, pack, seq_pos, ids, hash, shard) and the
    shipped tokenizer meta hashes agree."""
    import time

    from topic_modeling_ajin_spark.operators.curation import (
        run_curation_pipeline,
    )

    n_docs = 20
    docs = [
        (
            i,
            "en",
            "src",
            "the is " + " ".join(f"w{i}x{j}" for j in range(10)),
        )
        for i in range(1, n_docs + 1)
    ]
    embs = [
        (i, [1.0 if k == (i % 24) else 0.0 for k in range(32)])
        for i, *_ in docs
    ]
    d = str(tmp_path / "data")
    spark.createDataFrame(
        docs, "doc_id long, lang string, source string, text string"
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        embs, "vec_id long, embedding array<double>"
    ).write.parquet(f"{d}/embeddings.parquet")

    # batch face
    out_b = str(tmp_path / "batch")
    run_curation_pipeline(spark, d, out_b, export_tokens=True)

    # streaming face: two batches in doc_id order, token mixture
    staging = str(tmp_path / "in")
    schema = "doc_id long, lang string, text string"
    for lo, hi in ((1, 10), (11, 20)):
        spark.createDataFrame(
            [(i, lg, t) for i, lg, _s, t in docs if lo <= i <= hi],
            schema,
        ).coalesce(1).write.mode("append").parquet(staging)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    incr = str(tmp_path / "incr")
    ST.run_incremental_manifest(
        spark,
        stream,
        str(tmp_path / "store"),
        incr,
        str(tmp_path / "ck"),
        mixture="tokens",
    )

    # precondition: the snapshot IS the batch token manifest here
    snap = {
        r["doc_id"]
        for r in spark.read.parquet(f"{incr}/manifest").collect()
    }
    want = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out_b}/manifest_tokens").collect()
    }
    assert snap == want and snap

    out_i = str(tmp_path / "iexp")
    ST.export_incremental_token_shards(spark, d, incr, out_i)

    cols = (
        "phase",
        "pack_id",
        "seq_pos",
        "doc_id",
        "lang",
        "n_bpe_tokens",
        "tokenizer_hash",
        "shard",
    )

    def shard_rows(out):
        return sorted(
            tuple(r[c] for c in cols) + (tuple(r["token_ids"]),)
            for r in spark.read.parquet(f"{out}/token_shards").collect()
        )

    got, want_rows = shard_rows(out_i), shard_rows(out_b)
    assert got == want_rows and got
    meta_i = spark.read.parquet(f"{out_i}/tokenizer/meta").collect()[0]
    meta_b = spark.read.parquet(f"{out_b}/tokenizer/meta").collect()[0]
    assert meta_i == meta_b


def test_incremental_export_refuses_unbudgeted_snapshot_docs(
    spark, tmp_path
):
    """r12 verdict task 1: a snapshot doc OUTSIDE the corpus the
    tokenizer/budgets were fitted on (a JSONL-ingested doc that
    outpaced the periodic tokenizer rebuild) has no bpe_token_counts
    row — the budget join must refuse loudly naming the rebuild lever,
    never silently drop it from the trainer shards."""
    import pytest

    d = str(tmp_path / "data")
    spark.createDataFrame(
        [
            (
                i,
                "en",
                "src",
                "the is " + " ".join(f"w{i}x{j}" for j in range(6)),
            )
            for i in range(1, 5)
        ],
        "doc_id long, lang string, source string, text string",
    ).write.parquet(f"{d}/documents.parquet")
    incr = str(tmp_path / "incr")
    # doc 99 streamed in after the last tokenizer rebuild: no budget row
    spark.createDataFrame(
        [(1, "en", 0.5), (99, "en", 0.5)],
        "doc_id long, lang string, quality double",
    ).write.parquet(f"{incr}/manifest")
    with pytest.raises(ValueError, match="no bpe_token_counts"):
        ST.export_incremental_token_shards(
            spark, d, incr, str(tmp_path / "exp")
        )
