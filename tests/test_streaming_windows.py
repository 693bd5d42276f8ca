"""Streaming window + stateful operator tests: the streaming results must
equal their batch oracles after the bounded stream drains."""

import pyspark.sql.functions as F

from sql_etl_pipeline_spark.cdc.generate import (
    change_event_schema,
    generate_change_events,
)
from sql_etl_pipeline_spark.streaming.windows import (
    batch_conversation_progress,
    conversation_progress,
    hourly_event_counts,
    latest_progress,
    run_stream_to_memory,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def test_hourly_window_matches_batch(spark, tmp_path):
    from pyspark.sql.types import _parse_datatype_string

    src = str(tmp_path / "events")
    ev = spark.range(500).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 37).alias("ts"),
        (F.col("id") % 7).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        (F.col("id") % 100).cast("double").alias("value"),
    )
    ev.write.parquet(src)

    schema = _parse_datatype_string(EVENT_SCHEMA)
    out = hourly_event_counts(spark, src, schema)
    # complete mode emits every window incl. not-yet-finalized tail ones
    # (append-mode late-drop semantics are covered by the next test)
    run_stream_to_memory(out, "hourly", str(tmp_path / "ck"), output_mode="complete")

    got = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("hourly").collect()
    }
    exp = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .collect()
    }
    assert got == exp


def test_watermark_finalizes_windows_exactly_once_in_append_mode(spark, tmp_path):
    from pyspark.sql.types import _parse_datatype_string

    src = str(tmp_path / "late")

    def mk(rows):
        return spark.createDataFrame(
            [(i, ts, 1, "t", 1.0) for i, ts in enumerate(rows)],
            EVENT_SCHEMA.replace(" timestamp", " string"),
        ).withColumn("ts", F.to_timestamp("ts"))

    # file 1: hours 0..5 -> after it, watermark = 05:30 - 1h = 04:30
    mk([f"2024-01-01 0{h}:30:00" for h in range(6)]).coalesce(1).write.parquet(src)
    import time as _time

    _time.sleep(2)  # distinct mtimes: file source orders batches by mtime
    # file 2: one LATE event (hour 0, far below watermark) + one on-time
    mk(["2024-01-01 00:45:00", "2024-01-01 05:45:00"]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    schema = _parse_datatype_string(EVENT_SCHEMA)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("hour"), "n_events")
    )
    run_stream_to_memory(out, "late_t", str(tmp_path / "ckl"), output_mode="append")
    rows = spark.table("late_t").collect()
    hours = [r.hour.hour for r in rows]
    # append mode emits each FINALIZED window exactly once (end < final
    # watermark 04:45): hours 0-3 present, tail hours 4-5 withheld. (Late
    # rows below the watermark are dropped best-effort per Spark's contract
    # — not asserted.)
    assert sorted(hours) == [0, 1, 2, 3]
    assert len(hours) == len(set(hours))


def test_stateful_progress_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "log")
    ev = generate_change_events(spark, 400, n_convs=12, max_turns=10)
    # two files -> with maxFilesPerTrigger=1 the state must carry across
    # micro-batches
    ev.filter(F.col("lsn") < 200).coalesce(1).write.parquet(src)
    ev.filter(F.col("lsn") >= 200).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(change_event_schema())
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    prog = (
        stream.groupBy("conv_id")
        .applyInPandasWithState(
            __import__(
                "sql_etl_pipeline_spark.streaming.windows", fromlist=["_conv_progress"]
            )._conv_progress,
            outputStructType=__import__(
                "sql_etl_pipeline_spark.streaming.windows",
                fromlist=["CONV_PROGRESS_SCHEMA"],
            ).CONV_PROGRESS_SCHEMA,
            stateStructType=__import__(
                "sql_etl_pipeline_spark.streaming.windows",
                fromlist=["CONV_STATE_SCHEMA"],
            ).CONV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
    run_stream_to_memory(prog, "prog", str(tmp_path / "ck"), output_mode="update")

    got = {
        r.conv_id: (r.n_events, r.max_turn, r.last_lsn)
        for r in latest_progress(spark, "prog").collect()
    }
    exp = {
        r.conv_id: (r.n_events, r.max_turn, r.last_lsn)
        for r in batch_conversation_progress(ev).collect()
    }
    assert got == exp


def test_conversation_progress_helper_runs(spark, tmp_path):
    src = str(tmp_path / "log2")
    generate_change_events(spark, 100, n_convs=5).write.parquet(src)
    out = conversation_progress(spark, src, change_event_schema())
    run_stream_to_memory(out, "prog2", str(tmp_path / "ck2"), output_mode="update")
    rows = latest_progress(spark, "prog2").collect()
    assert 0 < len(rows) <= 5
    assert sum(r.n_events for r in rows) == 100


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Built-in session_window aggregation, streaming vs batch equality."""
    from pyspark.sql.types import _parse_datatype_string

    src = str(tmp_path / "sess")
    ev = spark.range(300).select(
        F.col("id").alias("event_id"),
        # bursts with >30min gaps between groups of 10
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + (F.col("id") / 10).cast("long") * 3600
            + (F.col("id") % 10) * 60
        ).alias("ts"),
        (F.col("id") % 4).alias("user_id"),
        F.lit("t").alias("event_type"),
        F.lit(1.0).alias("value"),
    )
    ev.write.parquet(src)
    schema = _parse_datatype_string(EVENT_SCHEMA)
    stream = spark.readStream.schema(schema).parquet(src)
    out = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("start"), "user_id", "n")
    )
    run_stream_to_memory(out, "sess_t", str(tmp_path / "cks"), output_mode="complete")
    got = {
        (r.start, r.user_id): r.n for r in spark.table("sess_t").collect()
    }
    exp = {
        (r.start, r.user_id): r.n
        for r in ev.groupBy(
            F.session_window("ts", "30 minutes").alias("win"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("start"), "user_id", "n")
        .collect()
    }
    assert got == exp and len(got) > 4
