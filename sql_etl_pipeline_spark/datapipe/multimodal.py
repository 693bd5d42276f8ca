"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Image/audio/video decode libraries are not in this container, so the decode
step is STUBBED (``decode_image`` raises ``NotImplementedError`` unless a
deterministic fake is requested) — but everything Spark-side is real and
tested: the schema (binary payload + metadata struct), the partitioning
(payloads never shuffle — all ops are per-partition), the UDF signature
(iterator of pandas batches in, batches out), and the batch shape
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory, the
knob that matters when payloads are megabytes each at 100 TB).

The "media" table is derived deterministically from ``documents``: payload
= UTF-8 bytes of the text (stand-in for image bytes), metadata carries
width/height/format derived from doc fields. ``media_features`` extracts a
byte-range histogram per payload in numpy — the same shape of work as a
thumbnail/mel-spectrogram pass — and is oracle-checked: DuckDB reproduces
the histogram from the text chars, proving the pandas path end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .registry import register

N_BINS = 8  # byte-value histogram bins (32 values each covers ASCII)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("n_bytes", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("hist", ArrayType(LongType()), True),
        StructField("mean_byte", LongType(), True),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table: binary payload + typed metadata."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/rgb8").alias("format"),
            (F.col("n_chars") % 64 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 48 + 12).cast("int").alias("height"),
            F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False):
    """Decode an image payload. The real path needs PIL/libjpeg (absent in
    this container) — STUB: raises unless ``fake`` requests the
    deterministic stand-in (byte values as a flat "pixel" buffer)."""
    try:
        from PIL import Image  # noqa: F401 — gated optional dependency
    except ImportError:
        if not fake:
            raise NotImplementedError(
                "image decode requires PIL/libjpeg, not present in this "
                "environment; pass fake=True for the deterministic stand-in"
            )
        return bytes(payload)
    raise NotImplementedError("real decode path reserved for PIL environments")


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: byte-range histogram + mean byte per payload.

    Vectorized numpy inside each Arrow batch — no per-row Python beyond the
    payload loop (each payload is one opaque blob; real decoders are also
    per-blob). Yields one output frame per input batch, preserving batch
    shape."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf = np.frombuffer(decode_image(payload, fake=True), dtype=np.uint8)
            hist = np.bincount(buf // 32, minlength=N_BINS)[:N_BINS]
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_bytes": len(buf),
                    "hist": hist.astype("int64").tolist(),
                    "mean_byte": int(buf.sum() // max(len(buf), 1)),
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])


def frame_sample(
    df: DataFrame, n_frames: int = 4, frame_bytes: int = 16
) -> DataFrame:
    """"Video" frame sampling: slice ``n_frames`` evenly-spaced fixed-size
    windows out of each payload — pure column ops (substring on binary),
    no shuffle, no Python."""
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    exploded = df.select("doc_id", "payload", F.col("meta.n_bytes").alias("n"), idx)
    offset = (
        (F.col("frame_idx") * F.greatest(F.col("n") - frame_bytes, F.lit(0)))
        / F.lit(max(n_frames - 1, 1))
        + 1
    ).cast("int")
    return exploded.withColumn("offset", offset).select(
        "doc_id",
        "frame_idx",
        F.expr(f"substring(payload, offset, {frame_bytes})").alias("frame"),
    )


@register(
    "multimodal_features",
    f"""
    -- corpus is pure ASCII (asserted in tests), so UTF-8 byte == char code
    WITH docs AS (SELECT doc_id, text FROM documents),
    chars AS (
        SELECT doc_id,
               [CAST(ascii(substr(text, i, 1)) AS BIGINT)
                FOR i IN generate_series(1, length(text))] AS bytes
        FROM docs
    )
    SELECT doc_id, CAST(len(bytes) AS BIGINT) AS n_bytes,
           array_to_string([CAST(len(list_filter(bytes, b -> b // 32 = bin))
                                 AS BIGINT)
                            FOR bin IN generate_series(0, {N_BINS - 1})], ',')
               AS hist_str,
           CAST(list_sum(bytes) // GREATEST(len(bytes), 1) AS BIGINT) AS mean_byte
    FROM chars ORDER BY doc_id
    """,
    "binary payload byte-histogram features via Arrow mapInPandas",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    feats = media.mapInPandas(extract_features, FEATURES_SCHEMA)
    # hist serialized to a string: driver/oracle compare hashes flat values,
    # not nested arrays.
    return feats.select(
        "doc_id",
        "n_bytes",
        F.array_join(F.transform("hist", lambda x: x.cast("string")), ",").alias(
            "hist_str"
        ),
        "mean_byte",
    ).orderBy("doc_id")
