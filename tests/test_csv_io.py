"""CSV edge-format roundtrip + CSV-sourced streaming ingest."""

import pyspark.sql.functions as F

from sql_etl_pipeline_spark.cdc.apply import expected_final_state
from sql_etl_pipeline_spark.cdc.generate import (
    TRANSCRIPT_SCHEMA,
    change_event_schema,
    generate_change_events,
)
from sql_etl_pipeline_spark.functions.io import _OPTS, read_csv, write_csv
from sql_etl_pipeline_spark.lakehouse import LakeTable
from sql_etl_pipeline_spark.streaming.ingest import CdcStreamIngestor


def test_csv_roundtrip_preserves_values(spark, tmp_path):
    ev = generate_change_events(spark, 300, n_convs=10).drop("pos")
    p = str(tmp_path / "log.csv")
    write_csv(ev, p)
    back = read_csv(spark, p, ev.schema)
    a = sorted(map(tuple, ev.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b  # incl. NULL vs empty-string text distinction


def test_csv_streaming_ingest_matches_oracle(spark, tmp_path):
    ev = generate_change_events(spark, 500, n_convs=15).drop("pos")
    write_csv(ev, str(tmp_path / "log"))
    table = LakeTable.create(
        str(tmp_path / "t"),
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=4,
    )
    schema = change_event_schema()
    schema = type(schema)([f for f in schema.fields])  # copy
    ing = CdcStreamIngestor(
        table,
        str(tmp_path / "log"),
        str(tmp_path / "ckpt"),
        ev.schema,
        source_format="csv",
        source_options=_OPTS,
    )
    ing.run_available_now(spark)
    got = table.read(spark).orderBy("conv_id", "turn_idx")
    exp = expected_final_state(ev)
    ga = [tuple(r) for r in got.collect()]
    ex = [tuple(r) for r in exp.collect()]
    assert ga == ex
