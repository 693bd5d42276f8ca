"""Streaming aggregation surface: watermarked event-time windows and a
custom stateful operator (``applyInPandasWithState``).

The reference is batch-only; these are the Structured Streaming faces of
its aggregation queries (SURVEY.md §2.10): late data handled by watermark
instead of re-extract, per-key state instead of full-table re-aggregation.

Scale notes: windowed aggs keep state per (window, key) — the watermark
bounds it; ``applyInPandasWithState`` state lives in the state store
(RocksDB on a real cluster), partitioned by key, so hot conversations only
cost their own partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def hourly_event_counts(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling 1-hour event-time window with a watermark: the streaming
    form of the batch ``events_hourly`` query. Late events beyond the
    watermark are dropped instead of corrupting closed windows."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_stream_to_memory(
    df: DataFrame, name: str, checkpoint: str, output_mode: str = "append"
) -> None:
    """Drain a bounded stream into an in-memory table (tests/demo)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# Custom stateful operator: per-conversation running progress. For each
# conversation the state carries (n_events, max_turn, last_lsn) across
# micro-batches; each batch emits the updated row — a running materialized
# per-key summary no built-in streaming agg expresses (max-by-lsn +
# monotone counters together).
# ---------------------------------------------------------------------------

CONV_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("max_turn", IntegerType()),
        StructField("last_lsn", LongType()),
    ]
)

CONV_PROGRESS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_events", LongType()),
        StructField("max_turn", IntegerType()),
        StructField("last_lsn", LongType()),
    ]
)


def _conv_progress(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n_events, max_turn, last_lsn = state.get
    else:
        n_events, max_turn, last_lsn = 0, -1, -1
    for pdf in batches:
        n_events += len(pdf)
        max_turn = max(max_turn, int(pdf["turn_idx"].max()))
        last_lsn = max(last_lsn, int(pdf["lsn"].max()))
    state.update((n_events, max_turn, last_lsn))
    yield pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "n_events": n_events,
                "max_turn": max_turn,
                "last_lsn": last_lsn,
            }
        ]
    )


def conversation_progress(
    spark: SparkSession, source_dir: str, schema: StructType
) -> DataFrame:
    """Streaming per-conversation progress via applyInPandasWithState."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.groupBy("conv_id")
        .applyInPandasWithState(
            _conv_progress,
            outputStructType=CONV_PROGRESS_SCHEMA,
            stateStructType=CONV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_conversation_progress(events: DataFrame) -> DataFrame:
    """Batch oracle for ``conversation_progress``'s final state."""
    return events.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("turn_idx").cast("int").alias("max_turn"),
        F.max("lsn").alias("last_lsn"),
    )


def latest_progress(spark: SparkSession, mem_table: str) -> DataFrame:
    """Collapse the update-mode emissions to the latest row per key."""
    df = spark.table(mem_table)
    return (
        df.groupBy("conv_id")
        .agg(
            F.max_by(
                F.struct("n_events", "max_turn", "last_lsn"), F.col("n_events")
            ).alias("_w")
        )
        .select("conv_id", "_w.*")
    )
