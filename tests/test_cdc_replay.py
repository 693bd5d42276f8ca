"""End-to-end replay convergence: engine vs two independent oracles.

The reference's core semantic contract is replay convergence — re-processing
the same rows lands in the same final state (SURVEY.md §3.2). Here: a
deterministic change log applied through the full engine (batches, salted
LWW, LSN guards, fencing) must equal (a) a one-shot global LWW reduction in
Spark and (b) a sequential row-at-a-time pandas replay, under stable
(conv_id, turn_idx) ordering with per-turn text equality.
"""

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sql_etl_pipeline_spark.cdc import (
    TRANSCRIPT_SCHEMA,
    change_event_schema,
    generate_change_events,
)
from sql_etl_pipeline_spark.cdc.apply import apply_batch, expected_final_state
from sql_etl_pipeline_spark.lakehouse import LakeTable
from sql_etl_pipeline_spark.streaming import CdcStreamIngestor

N_EVENTS = 3000


def _norm_text(s):
    if s is None or (isinstance(s, float) and pd.isna(s)):
        return None
    out = re.sub(r"\s+", " ", str(s).strip())
    return out if out != "" else None


def pandas_oracle(events_pdf: pd.DataFrame) -> list[tuple]:
    """Sequential replay in delivery order with an LSN guard per key —
    completely independent of the engine's set-based implementation."""
    state: dict[tuple, dict] = {}
    for _, e in events_pdf.sort_values("pos", kind="stable").iterrows():
        k = (e["conv_id"], int(e["turn_idx"]))
        cur = state.get(k)
        if cur is not None and int(e["lsn"]) <= cur["lsn"]:
            continue  # stale or duplicate
        if e["op"] == "D":
            state[k] = {"lsn": int(e["lsn"]), "deleted": True}
        else:
            state[k] = {
                "lsn": int(e["lsn"]),
                "deleted": False,
                "role": e["role"],
                "text": _norm_text(e["text"]),
                "tool": e.get("tool"),
            }
    out = []
    for (conv, turn), v in state.items():
        if not v["deleted"]:
            tool = v["tool"]
            if isinstance(tool, float) and pd.isna(tool):
                tool = None
            out.append((conv, turn, v["role"], v["text"], tool))
    return sorted(out)


def engine_state(table: LakeTable, spark) -> list[tuple]:
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool)
        for r in table.read(spark).select("conv_id", "turn_idx", "role", "text", "tool").collect()
    )


def spark_oracle_state(events) -> list[tuple]:
    df = expected_final_state(events)
    cols = ["conv_id", "turn_idx", "role", "text"] + (["tool"] if "tool" in df.columns else [])
    rows = df.select(*cols).collect()
    if "tool" in df.columns:
        return sorted((r.conv_id, r.turn_idx, r.role, r.text, r.tool) for r in rows)
    return sorted((r.conv_id, r.turn_idx, r.role, r.text, None) for r in rows)


@pytest.fixture()
def log(spark):
    return generate_change_events(
        spark,
        N_EVENTS,
        n_convs=120,
        max_turns=12,
        delete_frac=0.01,
        dup_frac=0.02,
        ooo_frac=0.05,
    ).cache()


def _new_table(tmp_path, name="t"):
    return LakeTable.create(
        str(tmp_path / name), TRANSCRIPT_SCHEMA, key_cols=["conv_id", "turn_idx"], num_buckets=8
    )


def test_batched_apply_matches_both_oracles(spark, tmp_path, log):
    table = _new_table(tmp_path)
    n_batches = 5
    bounds = [i * (N_EVENTS * 1.1) / n_batches for i in range(n_batches + 1)]
    bounds[-1] = float("inf")
    bounds[0] = float("-inf")
    for i in range(n_batches):
        batch = log.filter((F.col("pos") >= bounds[i]) & (F.col("pos") < bounds[i + 1]))
        apply_batch(table, spark, batch, fence=("replay", i))
    got = engine_state(table, spark)
    assert got == spark_oracle_state(log)
    assert got == pandas_oracle(log.toPandas())


def test_lineage_per_bucket_lsn_ranges(spark, tmp_path, log):
    """Each merge commit records per-bucket applied LSN ranges and counts
    (the per-partition offsets/lineage bookkeeping); they must tile the
    batch's global range exactly."""
    table = _new_table(tmp_path)
    apply_batch(table, spark, log, fence=("replay", 0))
    rec = table.lineage_records()[-1]
    br = rec["bucket_lsn_ranges"]
    assert set(int(b) for b in br) == set(rec["buckets"]) != set()
    assert min(v["lsn_min"] for v in br.values()) == rec["lsn_min"]
    assert max(v["lsn_max"] for v in br.values()) == rec["lsn_max"]
    assert sum(v["n_events"] for v in br.values()) == rec["n_events"]
    assert all(v["rows"] > 0 for v in br.values())


def test_pipelined_apply_matches_serial_and_oracles(spark, tmp_path, log):
    """The one-batch-lookahead pipelined applier (prefetch thread reduces
    batch i+1 while batch i merges) must land byte-identical state to the
    serial loop and both oracles, respect fences, and be replay-safe."""
    from sql_etl_pipeline_spark.cdc.apply import apply_batches_pipelined

    table = _new_table(tmp_path)
    n_batches = 5
    bounds = [i * (N_EVENTS * 1.1) / n_batches for i in range(n_batches + 1)]
    bounds[-1] = float("inf")
    bounds[0] = float("-inf")
    batches = [
        log.filter((F.col("pos") >= bounds[i]) & (F.col("pos") < bounds[i + 1]))
        for i in range(n_batches)
    ]
    res = apply_batches_pipelined(table, spark, batches, stream_id="pipe")
    assert [r["applied"] for r in res] == [True] * n_batches
    got = engine_state(table, spark)
    assert got == spark_oracle_state(log)
    assert got == pandas_oracle(log.toPandas())
    # replaying the same fenced batches is a no-op (exactly-once preserved)
    res2 = apply_batches_pipelined(table, spark, batches, stream_id="pipe")
    assert all(r.get("reason") == "fenced" for r in res2)
    assert engine_state(table, spark) == got


def test_double_replay_converges(spark, tmp_path, log):
    """Re-applying the whole log WITHOUT fencing still converges (pure
    idempotency, no exactly-once machinery needed for correctness)."""
    table = _new_table(tmp_path)
    apply_batch(table, spark, log)
    s1 = engine_state(table, spark)
    apply_batch(table, spark, log)
    assert engine_state(table, spark) == s1


def test_streaming_available_now_and_restart(spark, tmp_path, log):
    src = str(tmp_path / "log")
    # write in delivery order, several files -> several micro-batches
    log.orderBy("pos").repartitionByRange(6, "pos").write.parquet(src)
    table = _new_table(tmp_path)
    ing = CdcStreamIngestor(
        table,
        src,
        str(tmp_path / "ckpt"),
        change_event_schema(),
        stream_id="s",
        max_files_per_trigger=2,
    )
    batches = ing.run_available_now(spark)
    assert len(batches) >= 2  # really micro-batched
    assert engine_state(table, spark) == spark_oracle_state(log)
    # no new data -> idempotent re-run, no state change
    v = table.refresh().version
    CdcStreamIngestor(
        table, src, str(tmp_path / "ckpt"), change_event_schema(), stream_id="s"
    ).run_available_now(spark)
    assert table.refresh().version == v


def test_crash_between_merge_and_checkpoint_resumes_exactly_once(spark, tmp_path, log):
    src = str(tmp_path / "log")
    log.orderBy("pos").repartitionByRange(6, "pos").write.parquet(src)
    table = _new_table(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    crash = CdcStreamIngestor(
        table, src, ckpt, change_event_schema(), stream_id="s",
        max_files_per_trigger=2, fail_after_merge=True,
    )
    with pytest.raises(Exception):
        crash.run_available_now(spark)
    assert len(crash.batches) == 1  # merged once, checkpoint did NOT advance
    resume = CdcStreamIngestor(
        table, src, ckpt, change_event_schema(), stream_id="s", max_files_per_trigger=2
    )
    resume.run_available_now(spark)
    # the replayed batch 0 must have been fenced out
    replayed = [b for b in resume.batches if b.get("batch_id") == 0]
    assert replayed and not replayed[0]["applied"] and replayed[0]["reason"] == "fenced"
    assert engine_state(table, spark) == spark_oracle_state(log)
    assert engine_state(table, spark) == pandas_oracle(log.toPandas())


def test_schema_evolution_mid_log(spark, tmp_path):
    full = generate_change_events(
        spark, 1200, n_convs=40, max_turns=8, delete_frac=0.01, tool_from_lsn=600
    ).cache()
    pre = full.filter(F.col("lsn") < 600).drop("tool")  # column absent pre-evolution
    post = full.filter(F.col("lsn") >= 600)
    from pyspark.sql.types import StructType

    pre_schema = StructType([f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"])
    table = LakeTable.create(
        str(tmp_path / "t"), pre_schema, key_cols=["conv_id", "turn_idx"], num_buckets=8
    )
    apply_batch(table, spark, pre, fence=("s", 0))
    assert "tool" not in [f.name for f in table.schema.fields]
    apply_batch(table, spark, post, fence=("s", 1))
    assert "tool" in [f.name for f in table.schema.fields]
    got = engine_state(table, spark)
    assert got == spark_oracle_state(full)
    # at least one post-evolution row actually carries a tool value
    assert any(t is not None for (_, _, _, _, t) in got)


def test_dimension_key_resolution_in_foreachbatch(spark, tmp_path):
    """J6: business->surrogate key swap via a broadcast dimension join
    INSIDE foreachBatch, before the fact merge (the reference stages this
    in SQL, sql/etl_transformations.sql:150-152). The ingestor's transform
    hook carries the join; exactly-once and LWW semantics are unchanged."""
    ev = generate_change_events(spark, 1200, n_convs=20, delete_frac=0.02)
    # dimension: business conv_id -> surrogate id (tiny -> broadcast)
    dim = (
        ev.select("conv_id")
        .distinct()
        .withColumn(
            "surrogate_id",
            F.concat(F.lit("sk-"), F.substring("conv_id", -3, 3)),
        )
    )
    dim_pd = dim.toPandas()  # freeze so both paths resolve identically
    dim_frozen = spark.createDataFrame(dim_pd)

    def resolve(batch):
        return (
            batch.join(F.broadcast(dim_frozen), "conv_id", "left")
            .withColumn("conv_id", F.coalesce("surrogate_id", "conv_id"))
            .drop("surrogate_id")
        )

    log_dir = str(tmp_path / "log")
    for i in range(3):
        ev.filter(F.pmod("lsn", F.lit(3)) == i).coalesce(1).write.mode(
            "append"
        ).parquet(log_dir)
    table = LakeTable.create(
        str(tmp_path / "t"),
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=4,
    )
    ing = CdcStreamIngestor(
        table,
        log_dir,
        str(tmp_path / "ckpt"),
        change_event_schema(),
        max_files_per_trigger=1,
        transform=resolve,
    )
    ing.run_available_now(spark)

    got = table.read(spark).orderBy("conv_id", "turn_idx").collect()
    exp = expected_final_state(resolve(ev)).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]
    assert all(r.conv_id.startswith("sk-") for r in got)


def test_continuous_trigger_soak_with_midflight_appends(spark, tmp_path, log):
    """Processing-time-trigger soak (VERDICT r2 next-round #8): tail a live
    directory that gets appended MID-FLIGHT, drain >=3 trigger cycles with
    cadence compaction engaged, stop mid-stream, restart from the same
    checkpoint, and converge to the one-shot oracle with strictly
    increasing, gap-free batch fences."""
    src = str(tmp_path / "log")
    chunks = [log.filter(F.pmod(F.col("pos"), F.lit(3)) == i) for i in range(3)]
    chunks[0].orderBy("pos").repartitionByRange(2, "pos").write.parquet(src)
    table = _new_table(tmp_path)
    ing = CdcStreamIngestor(
        table,
        src,
        str(tmp_path / "ckpt"),
        change_event_schema(),
        stream_id="soak",
        max_files_per_trigger=1,
        compact_every=2,
    )
    q = ing.start_continuous(spark, processing_time="1 seconds")
    try:
        q.processAllAvailable()  # cycle(s) over the initial chunk
        n0 = len(ing.batches)
        assert n0 >= 2  # maxFilesPerTrigger=1 over 2 files
        # live append while the query keeps triggering
        chunks[1].orderBy("pos").repartitionByRange(2, "pos").write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        assert len(ing.batches) > n0  # picked up mid-flight files
    finally:
        q.stop()
    # mid-stream restart: new ingestor, same checkpoint, more new data
    chunks[2].orderBy("pos").repartitionByRange(2, "pos").write.mode(
        "append"
    ).parquet(src)
    ing2 = CdcStreamIngestor(
        table,
        src,
        str(tmp_path / "ckpt"),
        change_event_schema(),
        stream_id="soak",
        max_files_per_trigger=1,
        compact_every=2,
    )
    q2 = ing2.start_continuous(spark, processing_time="1 seconds")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    all_batches = ing.batches + ing2.batches
    applied = [b for b in all_batches if b.get("applied")]
    assert len(applied) >= 3  # >=3 trigger cycles did real work
    # fences strictly increase and resume across the restart without a gap
    ids = [b["batch_id"] for b in all_batches]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    assert ing2.batches and ing2.batches[0]["batch_id"] == ing.batches[-1]["batch_id"] + 1
    # cadence compaction fired during the soak
    assert any("compacted" in b for b in all_batches)
    ops = [r["op"] for r in table.refresh().lineage_records()]
    assert "compact" in ops
    # convergence: engine state == one-shot oracle over the full log
    assert engine_state(table, spark) == spark_oracle_state(log)
