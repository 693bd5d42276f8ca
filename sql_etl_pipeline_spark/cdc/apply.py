"""CDC batch apply: normalize -> salted LWW pre-reduce -> LSN-guarded merge.

This is the engine's replacement for the reference's
extract -> pandas-transform -> staging bulk_insert -> SQL upsert chain
(``/root/reference/src/etl_pipeline.py:90-225``,
``/root/reference/sql/etl_transformations.sql:9-193``): one lazy DataFrame
plan per micro-batch ending in an atomic bucket swap on the LakeTable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.normalize import normalize_text_expr
from ..lakehouse.table import DELETED_COL, LSN_COL, LakeTable

EVENT_META_COLS = ("pos", "op", "lsn")


def salted_lww_reduce(
    events: DataFrame,
    key_cols: list[str],
    lsn_col: str = "lsn",
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase last-writer-wins reduction with explicit salting.

    Hot conversations (Zipf head) concentrate events on few keys; a single
    groupBy would funnel each hot key into one reducer. Phase 1 groups by
    (key, salt) — salt derived from the LSN, so a hot key's events spread
    over ``n_salts`` reducers and collapse to ``n_salts`` candidate rows;
    phase 2 resolves the candidates. Spark's hash aggregate already does
    map-side partial combine; the salt additionally bounds the *reduce-side*
    width of any single key, which is what survives a 100x scale-up
    (north_star: "salted repartition by conv_id hash").
    """
    cols = [F.col(c) for c in events.columns]
    pack = F.struct(*cols)
    salted = events.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(n_salts))
    )
    phase1 = (
        salted.groupBy(*key_cols, "_salt")
        .agg(F.max_by(pack, F.col(lsn_col)).alias("_w"))
        .select("_w.*")
    )
    return (
        phase1.groupBy(*key_cols)
        .agg(F.max_by(F.struct(*[F.col(c) for c in phase1.columns]), F.col(lsn_col)).alias("_w"))
        .select("_w.*")
    )


def prepare_events(events: DataFrame, normalize: bool = True) -> DataFrame:
    """Drop delivery-order bookkeeping and normalize the text payload."""
    out = events.drop("pos") if "pos" in events.columns else events
    if normalize and "text" in out.columns:
        out = out.withColumn(
            "text",
            F.when(F.col("op") == "D", F.col("text")).otherwise(
                normalize_text_expr("text")
            ),
        )
    return out


def apply_batch(
    table: LakeTable,
    spark: SparkSession,
    events: DataFrame,
    fence: tuple[str, int] | None = None,
    normalize: bool = True,
    n_salts: int = 8,
) -> dict:
    """Apply one micro-batch of change events to ``table`` exactly-once."""
    prepared = prepare_events(events, normalize=normalize)
    reduced = salted_lww_reduce(prepared, table.key_cols, n_salts=n_salts)
    return table.merge_cdc(spark, reduced, fence=fence)


def expected_final_state(events: DataFrame, normalize: bool = True) -> DataFrame:
    """Independent oracle: global last-writer-wins over the WHOLE log.

    The engine applies the log incrementally (batches, dedup, guards,
    fencing); replay convergence means its final table equals this one-shot
    reduction — per-turn text equality under stable (conv_id, turn_idx)
    ordering (BASELINE.json input_hint). Tests compare against this AND
    against a sequential pandas replay for double independence.
    """
    prepared = prepare_events(events, normalize=normalize)
    cols = [F.col(c) for c in prepared.columns]
    winners = (
        prepared.groupBy("conv_id", "turn_idx")
        .agg(F.max_by(F.struct(*cols), F.col("lsn")).alias("_w"))
        .select("_w.*")
    )
    out_cols = [
        c for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts") if c in prepared.columns
    ]
    return (
        winners.filter(F.col("op") != "D")
        .select(*out_cols)
        .orderBy("conv_id", "turn_idx")
    )
