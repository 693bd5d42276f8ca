"""Validation rule engine tests — port of the reference's validator
behavior (/root/reference/tests/test_data_validator.py) plus the streaming
strict-mode integration the reference never had."""

import pyspark.sql.functions as F
import pytest

from sql_etl_pipeline_spark.functions.validate import transcript_rules, validate


def _clean_df(spark):
    return spark.createDataFrame(
        [
            ("c1", 0, "user", "hello", "2024-01-01 00:00:00"),
            ("c1", 1, "assistant", "hi", "2024-01-01 00:00:01"),
            ("c2", 0, "system", "sys", "2024-01-01 00:00:02"),
        ],
        "conv_id string, turn_idx int, role string, text string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_clean_data_passes(spark):
    out = validate(_clean_df(spark), transcript_rules())
    assert out["is_valid"], out["issues"]
    assert out["metrics"]["n_rows"] == 3
    assert out["metrics"]["null_fraction_conv_id"] == 0.0


def test_violations_detected(spark):
    df = spark.createDataFrame(
        [
            (None, 0, "user", "a", None),          # null conv_id
            ("c1", -1, "robot", "", None),          # negative idx, bad role, empty text
            ("c1", 1, "user", "ok", None),
        ],
        "conv_id string, turn_idx int, role string, text string, ts timestamp",
    )
    out = validate(df, transcript_rules())
    assert not out["is_valid"]
    joined = " | ".join(out["issues"])
    assert "conv_id" in joined
    assert "non-negative" in joined or "negative" in joined.lower()
    assert out["metrics"]["violations_role_domain"] == 1
    assert out["metrics"]["violations_empty_text"] == 1


def test_missing_required_column(spark):
    df = spark.createDataFrame([("c1",)], "conv_id string")
    out = validate(df, {"required_columns": ["conv_id", "turn_idx"]})
    assert not out["is_valid"]
    assert any("turn_idx" in i for i in out["issues"])


def test_unique_rule_counts_duplicates(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",)], "k string"
    )
    out = validate(df, {"unique": ["k"]})
    assert out["is_valid"]  # uniques are warnings, like the reference
    assert out["metrics"]["duplicates_k"] == 2
    assert out["warnings"]


def test_streaming_strict_validation_blocks_batch(spark, tmp_path):
    from pyspark.sql.types import StructType

    from sql_etl_pipeline_spark.cdc.generate import (
        TRANSCRIPT_SCHEMA,
        change_event_schema,
        generate_change_events,
    )
    from sql_etl_pipeline_spark.lakehouse import LakeTable
    from sql_etl_pipeline_spark.streaming.ingest import CdcStreamIngestor

    log_dir, ckpt = str(tmp_path / "log"), str(tmp_path / "ckpt")
    ev = generate_change_events(spark, 200, n_convs=20)
    # poison: null conv_id rows
    bad = ev.limit(5).withColumn("conv_id", F.lit(None).cast("string"))
    ev.unionByName(bad).write.parquet(log_dir)

    table = LakeTable.create(
        str(tmp_path / "t"),
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=4,
    )
    ing = CdcStreamIngestor(
        table,
        log_dir,
        ckpt,
        change_event_schema(),
        rules={"null_thresholds": {"conv_id": 0.0}},
        strict_validation=True,
    )
    with pytest.raises(Exception):
        ing.run_available_now(spark)
    # merge never committed, checkpoint never advanced
    assert table.refresh().version == 1

    # non-strict: batch applies, validation report carried in stats
    ing2 = CdcStreamIngestor(
        table,
        log_dir,
        str(tmp_path / "ckpt2"),
        change_event_schema(),
        rules={"null_thresholds": {"conv_id": 0.0}},
        strict_validation=False,
    )
    batches = ing2.run_available_now(spark)
    assert batches and not batches[0]["validation"]["is_valid"]
    assert table.refresh().version > 1
