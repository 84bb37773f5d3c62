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
