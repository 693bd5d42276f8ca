"""Incremental MV refresh (lakehouse.maintain.refresh_summary_incremental).

The summary must equal a from-scratch ``build(base.read())`` after every
refresh, while the refresh itself only reads the files CHANGED since the
watermark. Covers: COW pre-images from removed files, MOR pre-images via
watermark-snapshot semi-join, group-moving updates on a NON-key group
column, vanished groups (tombstoned in the summary), compaction commits
skipped by the diff, idempotent/no-op refreshes, and the full-rebuild
fallback when snapshots are expired.

Reference analogue: the staged date-range DELETE+INSERT summary refresh
(/root/reference/sql/etl_transformations.sql:281-306) — rebuilt here as
snapshot-diff + file-scoped merge, O(changed bytes) per refresh.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sql_etl_pipeline_spark.cdc import TRANSCRIPT_SCHEMA
from sql_etl_pipeline_spark.cdc.apply import apply_batch
from sql_etl_pipeline_spark.lakehouse import LakeTable
from sql_etl_pipeline_spark.lakehouse.maintain import refresh_summary_incremental

EV_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "op string, lsn long, ts timestamp"
)


def _events(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def _base(tmp_path, mode="cow"):
    return LakeTable.create(
        str(tmp_path / f"base-{mode}"),
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=4,
        merge_mode=mode,
    )


def _conv_summary(tmp_path, name="mv"):
    return LakeTable.create(
        str(tmp_path / name),
        StructType(
            [
                StructField("conv_id", StringType(), False),
                StructField("n_turns", LongType(), True),
                StructField("total_chars", LongType(), True),
            ]
        ),
        key_cols=["conv_id"],
        num_buckets=4,
    )


def _build_conv(df):
    return df.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )


def _assert_matches_full(spark, summary, base, build, group_cols):
    got = {
        tuple(r)
        for r in summary.read(spark)
        .select(*group_cols, "n_turns", "total_chars")
        .collect()
    }
    want = {
        tuple(r)
        for r in build(base.read(spark))
        .select(*group_cols, "n_turns", "total_chars")
        .collect()
    }
    assert got == want, f"summary drifted: extra={got - want} missing={want - got}"


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_incremental_matches_full_rebuild_through_updates_and_deletes(
    spark, tmp_path, mode
):
    base = _base(tmp_path, mode)
    summary = _conv_summary(tmp_path, f"mv-{mode}")

    b1 = _events(
        spark,
        [
            ("a", 0, "user", "hello", "I", 1, None),
            ("a", 1, "assistant", "world!", "I", 2, None),
            ("b", 0, "user", "xx", "I", 3, None),
            ("c", 0, "user", "yyy", "I", 4, None),
        ],
    )
    apply_batch(base, spark, b1, fence=("s", 0), normalize=False)
    r1 = refresh_summary_incremental(
        summary, spark, base.refresh(), _build_conv, ["conv_id"]
    )
    assert r1["mode"] == "full"  # bootstrap
    _assert_matches_full(spark, summary, base, _build_conv, ["conv_id"])

    # update one turn of 'a', delete ALL of 'b' (group must vanish), new 'd'
    b2 = _events(
        spark,
        [
            ("a", 1, "assistant", "longer reply", "U", 10, None),
            ("b", 0, "user", "", "D", 11, None),
            ("d", 0, "user", "fresh", "I", 12, None),
        ],
    )
    apply_batch(base, spark, b2, fence=("s", 1), normalize=False)
    r2 = refresh_summary_incremental(
        summary, spark, base.refresh(), _build_conv, ["conv_id"]
    )
    assert r2["mode"] == "incremental"
    _assert_matches_full(spark, summary, base, _build_conv, ["conv_id"])
    assert (
        summary.read(spark).filter(F.col("conv_id") == "b").count() == 0
    ), "vanished group must be tombstoned out of the summary"

    # idempotent: nothing new -> noop, watermark already current
    r3 = refresh_summary_incremental(
        summary, spark, base.refresh(), _build_conv, ["conv_id"]
    )
    assert r3["mode"] == "noop" and r3["reason"] == "up_to_date"


def test_group_moving_update_on_non_key_group_column(spark, tmp_path):
    """Group column = role (NOT a base key): an update that MOVES a row
    between groups must recompute BOTH the old and the new group. The old
    group comes from COW pre-image (removed-file) rows."""
    base = _base(tmp_path)
    summary = LakeTable.create(
        str(tmp_path / "mv-role"),
        StructType(
            [
                StructField("role", StringType(), False),
                StructField("n_turns", LongType(), True),
                StructField("total_chars", LongType(), True),
            ]
        ),
        key_cols=["role"],
        num_buckets=2,
    )

    def build(df):
        return df.groupBy("role").agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )

    apply_batch(
        base,
        spark,
        _events(
            spark,
            [
                ("a", 0, "user", "q1", "I", 1, None),
                ("a", 1, "tool", "t1", "I", 2, None),
                ("b", 0, "user", "q2", "I", 3, None),
            ],
        ),
        fence=("s", 0),
        normalize=False,
    )
    refresh_summary_incremental(summary, spark, base.refresh(), build, ["role"])

    # move the ONLY 'tool' row to 'assistant': 'tool' group must vanish
    apply_batch(
        base,
        spark,
        _events(spark, [("a", 1, "assistant", "t1", "U", 9, None)]),
        fence=("s", 1),
        normalize=False,
    )
    r = refresh_summary_incremental(summary, spark, base.refresh(), build, ["role"])
    assert r["mode"] == "incremental"
    _assert_matches_full(spark, summary, base, build, ["role"])
    assert summary.read(spark).filter(F.col("role") == "tool").count() == 0


def test_mor_delete_invalidates_group_via_preimage(spark, tmp_path):
    """MOR tombstones blank the payload, so the deleted row's group (role)
    is only recoverable from the watermark snapshot — the pre-image
    semi-join path."""
    base = _base(tmp_path, "mor")
    summary = LakeTable.create(
        str(tmp_path / "mv-mor-role"),
        StructType(
            [
                StructField("role", StringType(), False),
                StructField("n_turns", LongType(), True),
                StructField("total_chars", LongType(), True),
            ]
        ),
        key_cols=["role"],
        num_buckets=2,
    )

    def build(df):
        return df.groupBy("role").agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )

    apply_batch(
        base,
        spark,
        _events(
            spark,
            [
                ("a", 0, "user", "q", "I", 1, None),
                ("a", 1, "tool", "t", "I", 2, None),
            ],
        ),
        fence=("s", 0),
        normalize=False,
    )
    refresh_summary_incremental(summary, spark, base.refresh(), build, ["role"])
    apply_batch(
        base,
        spark,
        _events(spark, [("a", 1, "tool", "", "D", 9, None)]),
        fence=("s", 1),
        normalize=False,
    )
    r = refresh_summary_incremental(summary, spark, base.refresh(), build, ["role"])
    assert r["mode"] == "incremental"
    _assert_matches_full(spark, summary, base, build, ["role"])
    assert summary.read(spark).filter(F.col("role") == "tool").count() == 0


def test_compaction_commits_do_not_invalidate_groups(spark, tmp_path):
    """A compaction between refreshes rewrites ~every file; the diff must
    skip it, so a subsequent 1-conv batch invalidates 1 group and reads only
    that batch's files — not the whole recompacted table."""
    base = _base(tmp_path)
    summary = _conv_summary(tmp_path, "mv-compact")
    rows = [
        (f"c{i:03d}", t, "user", f"text {i} {t}", "I", i * 10 + t, None)
        for i in range(40)
        for t in range(3)
    ]
    apply_batch(base, spark, _events(spark, rows), fence=("s", 0), normalize=False)
    refresh_summary_incremental(summary, spark, base.refresh(), _build_conv, ["conv_id"])

    base.refresh().compact(spark, sort_within_buckets=True, target_file_rows=10)
    n_files = len(base.refresh().files)
    assert n_files > 8, "need a multi-file table for the assertion to bite"

    apply_batch(
        base,
        spark,
        _events(spark, [("c007", 1, "user", "edited", "U", 999, None)]),
        fence=("s", 1),
        normalize=False,
    )
    r = refresh_summary_incremental(
        summary, spark, base.refresh(), _build_conv, ["conv_id"]
    )
    assert r["mode"] == "incremental"
    # EXACT invalidation: only c007 changed — cohabitants of the rewritten
    # file cancel out of the per-key added-vs-removed LSN diff
    assert r["affected_groups"] == 1, r
    assert r["changed_files_read"] < n_files / 2, (
        f"diff read {r['changed_files_read']} of {n_files} files — "
        "compaction commit not skipped?"
    )
    _assert_matches_full(spark, summary, base, _build_conv, ["conv_id"])


def test_expired_snapshots_fall_back_to_full_rebuild(spark, tmp_path):
    base = _base(tmp_path)
    summary = _conv_summary(tmp_path, "mv-expire")
    for i in range(4):
        apply_batch(
            base,
            spark,
            _events(spark, [(f"e{i}", 0, "user", f"t{i}", "I", i + 1, None)]),
            fence=("s", i),
            normalize=False,
        )
        if i == 0:
            refresh_summary_incremental(
                summary, spark, base.refresh(), _build_conv, ["conv_id"]
            )
    base.refresh().expire_snapshots(keep_last=1)
    r = refresh_summary_incremental(
        summary, spark, base.refresh(), _build_conv, ["conv_id"]
    )
    assert r["mode"] == "full"  # watermark snapshot gone -> honest fallback
    _assert_matches_full(spark, summary, base, _build_conv, ["conv_id"])


def test_derive_adds_computed_group_column(spark, tmp_path):
    """Derived group key (turn_parity) exercises the ``derive`` hook on all
    three collection paths (added rows, removed pre-images, recompute)."""
    base = _base(tmp_path)
    summary = LakeTable.create(
        str(tmp_path / "mv-derived"),
        StructType(
            [
                StructField("turn_parity", IntegerType(), False),
                StructField("n_turns", LongType(), True),
                StructField("total_chars", LongType(), True),
            ]
        ),
        key_cols=["turn_parity"],
        num_buckets=2,
    )

    def derive(df):
        return df.withColumn("turn_parity", (F.col("turn_idx") % 2).cast("int"))

    def build(df):
        return df.groupBy("turn_parity").agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )

    apply_batch(
        base,
        spark,
        _events(
            spark,
            [
                ("a", 0, "user", "even", "I", 1, None),
                ("a", 1, "assistant", "odd", "I", 2, None),
                ("b", 2, "user", "even2", "I", 3, None),
            ],
        ),
        fence=("s", 0),
        normalize=False,
    )
    refresh_summary_incremental(
        summary, spark, base.refresh(), build, ["turn_parity"], derive=derive
    )
    apply_batch(
        base,
        spark,
        _events(spark, [("b", 2, "user", "even2 longer", "U", 9, None)]),
        fence=("s", 1),
        normalize=False,
    )
    r = refresh_summary_incremental(
        summary, spark, base.refresh(), build, ["turn_parity"], derive=derive
    )
    assert r["mode"] == "incremental"
    got = {
        (r_.turn_parity, r_.n_turns, r_.total_chars)
        for r_ in summary.read(spark).collect()
    }
    want = {
        (r_.turn_parity, r_.n_turns, r_.total_chars)
        for r_ in build(derive(base.read(spark))).collect()
    }
    assert got == want


def test_streaming_ingest_keeps_summary_fresh(spark, tmp_path):
    """CdcStreamIngestor with a summaries spec: the MV tracks the table
    across micro-batches, a stream RESTART (new files, same checkpoint),
    and paced refresh (every=2 — skipped batches are covered by the next
    refresh's snapshot diff, so the final state is still exact)."""
    from sql_etl_pipeline_spark.streaming.ingest import CdcStreamIngestor

    base = _base(tmp_path, "cow")
    summary = _conv_summary(tmp_path, "mv-stream")
    log = tmp_path / "log"
    ckpt = str(tmp_path / "ckpt")

    ev1 = _events(
        spark,
        [
            ("s1", 0, "user", "hello", "I", 1, None),
            ("s1", 1, "assistant", "hi there", "I", 2, None),
            ("s2", 0, "user", "aaa", "I", 3, None),
        ],
    )
    ev2 = _events(
        spark,
        [
            ("s1", 1, "assistant", "revised answer", "U", 10, None),
            ("s2", 0, "user", "", "D", 11, None),
            ("s3", 0, "user", "new conv", "I", 12, None),
        ],
    )
    ev1.coalesce(1).write.mode("append").parquet(str(log / "f1"))
    ev2.coalesce(1).write.mode("append").parquet(str(log / "f2"))

    ingestor = CdcStreamIngestor(
        base,
        f"{log}/*",
        ckpt,
        ev1.schema,
        stream_id="smv",
        max_files_per_trigger=1,
        summaries=[
            {"summary": summary, "build": _build_conv, "group_cols": ["conv_id"]}
        ],
    )
    ingestor.run_available_now(spark)
    assert any("summary_refreshes" in b for b in ingestor.batches)
    _assert_matches_full(spark, summary, base.refresh(), _build_conv, ["conv_id"])
    assert summary.read(spark).filter(F.col("conv_id") == "s2").count() == 0

    # restart: more files land, same checkpoint — only the new batch applies
    ev3 = _events(spark, [("s3", 1, "assistant", "reply", "I", 20, None)])
    ev3.coalesce(1).write.mode("append").parquet(str(log / "f3"))
    ingestor2 = CdcStreamIngestor(
        base.refresh(),
        f"{log}/*",
        ckpt,
        ev1.schema,
        stream_id="smv",
        max_files_per_trigger=1,
        summaries=[
            {"summary": summary, "build": _build_conv, "group_cols": ["conv_id"]}
        ],
    )
    ingestor2.run_available_now(spark)
    applied = [b for b in ingestor2.batches if b.get("applied")]
    assert len(applied) == 1, "restart must fence out replayed batches"
    _assert_matches_full(spark, summary, base.refresh(), _build_conv, ["conv_id"])


def test_streaming_summary_paced_refresh_catches_up(spark, tmp_path):
    """every=2: batch 0's refresh is skipped, batch 1's single refresh must
    cover BOTH batches' versions via the watermark diff."""
    from sql_etl_pipeline_spark.streaming.ingest import CdcStreamIngestor

    base = _base(tmp_path, "mor")
    summary = _conv_summary(tmp_path, "mv-paced")
    log = tmp_path / "log2"
    ckpt = str(tmp_path / "ckpt2")
    _events(spark, [("p1", 0, "user", "one", "I", 1, None)]).coalesce(1).write.parquet(
        str(log / "f1")
    )
    _events(spark, [("p2", 0, "user", "two", "I", 2, None)]).coalesce(1).write.parquet(
        str(log / "f2")
    )
    ingestor = CdcStreamIngestor(
        base,
        f"{log}/*",
        ckpt,
        EV_SCHEMA
        if not isinstance(EV_SCHEMA, str)
        else _events(spark, []).schema,
        stream_id="pmv",
        max_files_per_trigger=1,
        summaries=[
            {
                "summary": summary,
                "build": _build_conv,
                "group_cols": ["conv_id"],
                "every": 2,
            }
        ],
    )
    ingestor.run_available_now(spark)
    n_refreshes = sum(len(b.get("summary_refreshes", [])) for b in ingestor.batches)
    assert n_refreshes == 1, ingestor.batches
    _assert_matches_full(spark, summary, base.refresh(), _build_conv, ["conv_id"])


def test_chained_mv_on_full_swap_base_rebuilds_not_stales(spark, tmp_path):
    """An incremental MV whose BASE is maintained by full refresh_summary
    swaps must fall back to a full rebuild when the diff window contains a
    swap commit — never classify it non-data and silently go stale
    (round-3 ADVICE, maintain.py _NON_DATA_OPS)."""
    from sql_etl_pipeline_spark.lakehouse.maintain import refresh_summary

    base = _base(tmp_path)
    mid = _conv_summary(tmp_path, "mid")
    mv2 = _conv_summary(tmp_path, "mv2")

    def build2(df):
        return df.groupBy("conv_id").agg(
            F.max("n_turns").alias("n_turns"),
            F.max("total_chars").alias("total_chars"),
        )

    b1 = _events(
        spark,
        [
            ("a", 0, "user", "hello", "I", 1, None),
            ("b", 0, "user", "xx", "I", 2, None),
        ],
    )
    apply_batch(base, spark, b1, fence=("s", 0), normalize=False)
    refresh_summary(mid, spark, _build_conv(base.read(spark)))
    r0 = refresh_summary_incremental(mv2, spark, mid.refresh(), build2, ["conv_id"])
    assert r0["mode"] == "full"  # bootstrap

    b2 = _events(
        spark,
        [
            ("a", 1, "assistant", "world!", "I", 3, None),
            ("c", 0, "user", "yyy", "I", 4, None),
        ],
    )
    apply_batch(base, spark, b2, fence=("s", 1), normalize=False)
    refresh_summary(mid.refresh(), spark, _build_conv(base.read(spark)))

    r1 = refresh_summary_incremental(mv2, spark, mid.refresh(), build2, ["conv_id"])
    assert r1["mode"] == "full", (
        f"swap commit in the diff window must force a rebuild, got {r1}"
    )
    _assert_matches_full(spark, mv2.refresh(), mid, build2, ["conv_id"])


def test_streaming_summary_refresh_error_defers_not_kills(spark, tmp_path):
    """A summary build that throws mid-stream must NOT kill the streaming
    query (round-3 ADVICE, ingest.py): the refresh is recorded as deferred
    with the reason, the batch still applies and commits, and — because
    the watermark never moved — a later healthy refresh covers the
    skipped versions exactly."""
    from sql_etl_pipeline_spark.streaming.ingest import CdcStreamIngestor

    base = _base(tmp_path, "cow")
    summary = _conv_summary(tmp_path, "mv-err")
    log = tmp_path / "log"

    ev1 = _events(spark, [("e1", 0, "user", "hello", "I", 1, None),
                          ("e2", 0, "user", "world", "I", 2, None)])
    ev1.coalesce(1).write.mode("append").parquet(str(log / "f1"))

    boom = {"on": True}

    def flaky_build(df):
        if boom["on"]:
            raise RuntimeError("transient read failure (injected)")
        return _build_conv(df)

    ingestor = CdcStreamIngestor(
        base,
        f"{log}/*",
        str(tmp_path / "ckpt"),
        ev1.schema,
        stream_id="emv",
        summaries=[
            {"summary": summary, "build": flaky_build, "group_cols": ["conv_id"]}
        ],
    )
    batches = ingestor.run_available_now(spark)  # must not raise
    refreshes = [r for b in batches for r in b.get("summary_refreshes", [])]
    assert refreshes and refreshes[0]["mode"] == "deferred"
    assert "transient read failure" in refreshes[0]["reason"]
    assert base.refresh().read(spark).count() == 2, "batch must still apply"
    assert summary.refresh().read(spark).count() == 0, "no partial refresh"

    # next batch, build healed: ONE refresh covers both versions
    boom["on"] = False
    ev2 = _events(spark, [("e3", 0, "user", "late", "I", 3, None)])
    ev2.coalesce(1).write.mode("append").parquet(str(log / "f2"))
    ingestor.run_available_now(spark)
    _assert_matches_full(spark, summary.refresh(), base.refresh(),
                         _build_conv, ["conv_id"])


def test_streaming_permanent_refresh_error_escalates(spark, tmp_path):
    """Deferral self-heals TRANSIENT errors only: a build that fails
    deterministically on every batch must escalate (kill the stream with
    the accumulated reasons) after max_refresh_deferrals consecutive
    deferrals instead of going silently stale forever."""
    import pytest

    from sql_etl_pipeline_spark.streaming.ingest import CdcStreamIngestor

    base = _base(tmp_path, "cow")
    summary = _conv_summary(tmp_path, "mv-perm")
    log = tmp_path / "log-perm"

    def broken_build(df):
        raise ValueError("group_cols mismatch (injected, deterministic)")

    ingestor = CdcStreamIngestor(
        base,
        f"{log}/*",
        str(tmp_path / "ckpt-perm"),
        _events(spark, []).schema,
        stream_id="eperm",
        summaries=[
            {"summary": summary, "build": broken_build,
             "group_cols": ["conv_id"]}
        ],
    )
    ingestor.max_refresh_deferrals = 3
    for i in range(2):
        ev = _events(spark, [(f"p{i}", 0, "user", f"t{i}", "I", i + 1, None)])
        ev.coalesce(1).write.mode("append").parquet(str(log / f"f{i}"))
        ingestor.run_available_now(spark)  # defers, stream survives
    ev = _events(spark, [("p9", 0, "user", "t9", "I", 99, None)])
    ev.coalesce(1).write.mode("append").parquet(str(log / "f9"))
    with pytest.raises(Exception) as ei:
        ingestor.run_available_now(spark)
    assert "3 consecutive batches" in str(ei.value)
    assert "group_cols mismatch" in str(ei.value)
