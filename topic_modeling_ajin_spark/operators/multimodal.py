"""Multimodal (binary-column) plumbing for a training-data pipeline.

Beyond-reference surface (BASELINE.json north star): image/audio/video
payloads ride through Spark as opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so the bytes never round-trip through
Python row objects.

The container ships no image/audio codecs (PIL, ffmpeg, torchaudio …), so
the decode step is STUBBED two ways, per the driver contract:
- ``decode_image_real`` raises ``NotImplementedError`` — the seam where a
  real codec drops in;
- the registered query uses a **deterministic fake decode** (pure
  arithmetic over the byte payload) so the Spark-side plumbing — binary
  schema, Arrow batch shape, mapInPandas signature, partition behavior —
  is fully real AND exactly reproducible by the DuckDB oracle
  (``octet_length`` over the same utf-8 payload).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..registry import register
from ..sources import load_table, parallelized

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def decode_image_real(payload: bytes) -> tuple[int, int, int]:
    """The real-codec seam: (width, height, channels) from encoded bytes.

    Plug in PIL/libvips here in an environment that ships them. Kept
    separate so the fake path below never silently masquerades as real
    decoding."""
    raise NotImplementedError(
        "image codecs are not available in this container; "
        "use the deterministic fake-decode path for plumbing tests"
    )


def fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a decoder: dimensions derived from the
    payload length only — reproducible in ANSI SQL for the oracle."""
    n = len(payload)
    return (32 + n % 97, 32 + (7 * n) % 89, 1 + n % 3)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque ``binary`` payload column. In production this is
    the stored image/audio blob (parquet BYTE_ARRAY); the testdata has no
    blob column, so the utf-8 bytes of ``text`` stand in — same Spark type,
    same Arrow transfer path."""
    return docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))


def extract_image_meta(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` receives whole Arrow record batches — the bytes arrive
    as numpy object arrays of ``bytes``, are processed vectorized-per-batch
    in one Python call, and only the slim typed metadata goes back. At
    scale this is the decode/resize/thumbnail stage: CPU-parallel across
    partitions, no shuffle, output a tiny fraction of input bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [fake_decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    return binary_df.mapInPandas(batches, schema=META_SCHEMA)


@register(
    "mm_image_meta",
    sql="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(32 + octet_length(encode(text)) % 97 AS INT) AS width,
       CAST(32 + (7 * octet_length(encode(text))) % 89 AS INT) AS height,
       CAST(1 + octet_length(encode(text)) % 3 AS INT) AS channels
FROM documents
""",
    tags=("multimodal", "udf"),
)
def q_mm_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode → typed metadata, end to end: text→bytes payload
    (stand-in blob), Arrow batch into ``mapInPandas``, fake-decode, slim
    struct out. The oracle recomputes the same arithmetic from
    ``octet_length`` — proving the bytes that crossed the Arrow boundary
    are exactly the stored payload."""
    docs = parallelized(load_table(spark, sf_dir, "documents"))
    return extract_image_meta(with_binary_payload(docs))


@register(
    "mm_size_histogram",
    sql="""
SELECT octet_length(encode(text)) // 100 AS size_bucket,
       count(*) AS n,
       CAST(min(octet_length(encode(text))) AS BIGINT) AS min_bytes,
       CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
GROUP BY 1
""",
    tags=("multimodal",),
)
def q_mm_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload-size histogram straight off the binary column — the storage
    profile query a multimodal corpus needs before partition sizing (blob
    skew drives ``maxPartitionBytes`` choices at 100 TB). Pure codegen:
    ``length()`` on binary is byte length."""
    docs = load_table(spark, sf_dir, "documents")
    payload = with_binary_payload(docs)
    return (
        payload.select(
            (F.length("payload").cast("long")).alias("nb")
        )
        .groupBy((F.col("nb") / 100).cast("long").alias("size_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("nb").alias("min_bytes"),
            F.max("nb").alias("max_bytes"),
        )
    )


# ------------------------------------------- frame sampling / resize / audio

FRAME_BYTES = 64  # fake "video": fixed-size byte chunks stand in for frames
SAMPLE_EVERY = 4  # keep every 4th frame
RESIZE_TARGET = 64  # fit-into box for the resize plan

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("offset", LongType()),
        StructField("n_bytes", IntegerType()),
    ]
)


@register(
    "mm_frame_sample",
    sql=f"""
WITH f AS (
    SELECT doc_id, text, octet_length(encode(text)) AS n,
           unnest(range(0, CAST(ceil(octet_length(encode(text)) * 1.0
                                     / {FRAME_BYTES}) AS BIGINT))) AS frame_idx
    FROM documents
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(frame_idx * {FRAME_BYTES} AS BIGINT) AS "offset",
       CAST(least(n - frame_idx * {FRAME_BYTES}, {FRAME_BYTES}) AS INT) AS n_bytes,
       md5(substr(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS BIGINT), {FRAME_BYTES}))
           AS frame_md5
FROM f
WHERE frame_idx % {SAMPLE_EVERY} = 0
""",
    tags=("multimodal", "udf", "scale"),
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a binary "video" column: chunk the payload into
    fixed {FRAME_BYTES}-byte frames, keep every {SAMPLE_EVERY}th, emit one
    typed row per sampled frame with its content digest. The mapInPandas
    kernel slices raw bytes per Arrow batch — exactly the shape of a real
    ffmpeg keyframe extractor (bytes in, a few slim rows out, no shuffle);
    the md5 digest proves the sliced bytes match the stored payload
    byte-for-byte (the oracle recomputes it with substr on the same
    all-ASCII text). At 100 TB the output is ~1/{SAMPLE_EVERY} of frame
    count and a tiny fraction of input bytes."""
    import hashlib

    docs = parallelized(load_table(spark, sf_dir, "documents"))
    payload = with_binary_payload(docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "offset": [], "n_bytes": [], "frame_md5": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n = len(p)
                n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, SAMPLE_EVERY):
                    chunk = p[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["offset"].append(i * FRAME_BYTES)
                    out["n_bytes"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    schema = "doc_id long, frame_idx int, offset long, n_bytes int, frame_md5 string"
    return payload.mapInPandas(batches, schema=schema)


@register(
    "mm_resize_plan",
    sql=f"""
WITH dims AS (
    SELECT doc_id,
           CAST(32 + octet_length(encode(text)) % 97 AS INT) AS width,
           CAST(32 + (7 * octet_length(encode(text))) % 89 AS INT) AS height
    FROM documents
)
SELECT doc_id, width, height,
       CAST(CASE WHEN greatest(width, height) > {RESIZE_TARGET}
                 THEN width * {RESIZE_TARGET} // greatest(width, height)
                 ELSE width END AS INT) AS out_w,
       CAST(CASE WHEN greatest(width, height) > {RESIZE_TARGET}
                 THEN height * {RESIZE_TARGET} // greatest(width, height)
                 ELSE height END AS INT) AS out_h,
       greatest(width, height) > {RESIZE_TARGET} AS resized
FROM dims
""",
    tags=("multimodal",),
)
def q_mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage (plan form): fit each decoded image into a
    {RESIZE_TARGET}×{RESIZE_TARGET} box preserving aspect ratio. The output
    dims use INTEGER arithmetic (scale then floor-divide) so both engines
    agree exactly; the pixel transform itself belongs in the
    ``decode_image_real`` seam — this query is the metadata contract a
    resize UDF must satisfy."""
    docs = load_table(spark, sf_dir, "documents")
    meta = extract_image_meta(with_binary_payload(docs))
    maxd = F.greatest("width", "height")
    out_w = F.when(
        maxd > RESIZE_TARGET,
        F.floor(F.col("width") * RESIZE_TARGET / maxd),
    ).otherwise(F.col("width"))
    out_h = F.when(
        maxd > RESIZE_TARGET,
        F.floor(F.col("height") * RESIZE_TARGET / maxd),
    ).otherwise(F.col("height"))
    return meta.select(
        "doc_id",
        "width",
        "height",
        out_w.cast("int").alias("out_w"),
        out_h.cast("int").alias("out_h"),
        (maxd > RESIZE_TARGET).alias("resized"),
    )


AUDIO_SAMPLE_RATE = 16_000  # fake 16-bit PCM mono


@register(
    "mm_audio_meta",
    sql=f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) // 2 AS BIGINT) AS n_samples,
       {AUDIO_SAMPLE_RATE} AS sample_rate,
       round((octet_length(encode(text)) // 2) * 1.0 / {AUDIO_SAMPLE_RATE}, 6)
           AS duration_s
FROM documents
""",
    tags=("multimodal", "udf"),
)
def q_mm_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-typed metadata over the same binary seam: interpret the
    payload as 16-bit PCM mono at {AUDIO_SAMPLE_RATE} Hz and emit
    (n_samples, duration). A real torchaudio/soundfile probe drops into the
    kernel exactly where the arithmetic sits; the Spark-side contract
    (binary in, typed struct out, Arrow-batched, shuffle-free) is what is
    being pinned here."""
    docs = parallelized(load_table(spark, sf_dir, "documents"))
    payload = with_binary_payload(docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ns = [len(p) // 2 for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": ns,
                    "sample_rate": [AUDIO_SAMPLE_RATE] * len(ns),
                }
            )

    schema = "doc_id long, n_samples long, sample_rate int"
    # round in SQL, not the kernel: Python's round() is banker's rounding,
    # Spark/DuckDB round HALF_UP — 123/16000 = .0076875 rounds differently
    return payload.mapInPandas(batches, schema=schema).withColumn(
        "duration_s", F.round(F.col("n_samples") / AUDIO_SAMPLE_RATE, 6)
    )


@register(
    "mm_binary_dedup",
    sql="""
WITH p AS (
    -- DuckDB's md5 takes VARCHAR; hashing the string hashes its utf-8
    -- bytes, which IS the stand-in payload Spark hashes as binary
    SELECT doc_id, md5(text) AS payload_md5
    FROM documents
)
SELECT payload_md5, min(doc_id) AS keeper, count(*) AS n_copies
FROM p
GROUP BY payload_md5
""",
    tags=("multimodal", "dedup", "scale"),
)
def q_mm_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact dedup of binary payloads — the first dedup pass of any
    image/audio corpus (identical files re-crawled under different ids):
    group by the 16-byte md5 of the BLOB, deterministic min-id keeper.
    Same fixed-width-key shuffle discipline as the text fingerprint
    dedup, applied to the binary column; content bytes never move."""
    docs = parallelized(load_table(spark, sf_dir, "documents"))
    payload = with_binary_payload(docs)
    return (
        payload.select("doc_id", F.md5(F.col("payload")).alias("payload_md5"))
        .groupBy("payload_md5")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
    )
