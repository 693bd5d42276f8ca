"""LakeTable format: atomic commits, pruning, evolution, fencing, compaction."""

import os

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from sql_etl_pipeline_spark.lakehouse import CommitConflict, LakeTable

SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("text", StringType(), True),
    ]
)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(op=o, lsn=l, conv_id=c, turn_idx=t, text=x) for (o, l, c, t, x) in rows],
        "op string, lsn long, conv_id string, turn_idx int, text string",
    )


def _state(tbl, spark):
    return {
        (r.conv_id, r.turn_idx): r.text
        for r in tbl.read(spark).select("conv_id", "turn_idx", "text").collect()
    }


@pytest.fixture()
def table(tmp_path):
    return LakeTable.create(str(tmp_path / "t"), SCHEMA, key_cols=["conv_id", "turn_idx"], num_buckets=4)


def test_create_and_empty_read(table, spark):
    assert table.version == 1
    assert table.read(spark).count() == 0
    # bookkeeping columns exist internally
    assert {"last_lsn", "deleted"} <= {f.name for f in table.schema.fields}


def test_insert_update_delete_roundtrip(table, spark):
    table.merge_cdc(spark, _events(spark, [("I", 1, "a", 0, "hello"), ("I", 2, "a", 1, "world")]))
    assert _state(table, spark) == {("a", 0): "hello", ("a", 1): "world"}
    table.merge_cdc(spark, _events(spark, [("U", 3, "a", 0, "hello2"), ("D", 4, "a", 1, None)]))
    assert _state(table, spark) == {("a", 0): "hello2"}


def test_within_batch_lww(table, spark):
    table.merge_cdc(
        spark,
        _events(
            spark,
            [("I", 1, "a", 0, "v1"), ("U", 3, "a", 0, "v3"), ("U", 2, "a", 0, "v2")],
        ),
    )
    assert _state(table, spark) == {("a", 0): "v3"}


def test_stale_update_is_noop(table, spark):
    table.merge_cdc(spark, _events(spark, [("I", 10, "a", 0, "new")]))
    table.merge_cdc(spark, _events(spark, [("U", 5, "a", 0, "old")]))
    assert _state(table, spark) == {("a", 0): "new"}


def test_delete_then_late_lower_lsn_update_does_not_resurrect(table, spark):
    table.merge_cdc(spark, _events(spark, [("I", 1, "a", 0, "v1")]))
    table.merge_cdc(spark, _events(spark, [("D", 9, "a", 0, None)]))
    table.merge_cdc(spark, _events(spark, [("U", 5, "a", 0, "ghost")]))
    assert _state(table, spark) == {}
    # tombstone still present internally with the delete's LSN
    t = table.read(spark, include_deleted=True, include_meta=True).collect()
    assert len(t) == 1 and t[0].deleted and t[0].last_lsn == 9


def test_duplicate_replay_is_idempotent(table, spark):
    ev = [("I", 1, "a", 0, "x"), ("U", 2, "b", 1, "y")]
    table.merge_cdc(spark, _events(spark, ev))
    s1 = _state(table, spark)
    table.merge_cdc(spark, _events(spark, ev))  # exact replay
    assert _state(table, spark) == s1


def test_batch_fencing(table, spark):
    r1 = table.merge_cdc(spark, _events(spark, [("I", 1, "a", 0, "x")]), fence=("s1", 0))
    assert r1["applied"]
    r2 = table.merge_cdc(spark, _events(spark, [("U", 2, "a", 0, "bad")]), fence=("s1", 0))
    assert not r2["applied"] and r2["reason"] == "fenced"
    assert _state(table, spark) == {("a", 0): "x"}
    r3 = table.merge_cdc(spark, _events(spark, [("U", 2, "a", 0, "good")]), fence=("s1", 1))
    assert r3["applied"]
    assert _state(table, spark) == {("a", 0): "good"}


def test_partition_pruning_rewrites_only_touched_buckets(table, spark):
    many = [("I", i, f"c{i}", 0, f"t{i}") for i in range(40)]
    table.merge_cdc(spark, _events(spark, many))
    before = {f["path"]: f["bucket"] for f in table.files}
    res = table.merge_cdc(spark, _events(spark, [("U", 100, "c1", 0, "upd")]))
    assert res["buckets_touched"] == 1
    after = {f["path"]: f["bucket"] for f in table.files}
    touched_bucket = next(b for p, b in after.items() if p not in before)
    untouched_before = {p for p, b in before.items() if b != touched_bucket}
    assert untouched_before <= set(after)  # untouched buckets kept their files


def test_schema_evolution_additive(table, spark):
    table.merge_cdc(spark, _events(spark, [("I", 1, "a", 0, "x")]))
    ev2 = spark.createDataFrame(
        [Row(op="I", lsn=2, conv_id="b", turn_idx=0, text="y", tool="search")],
        "op string, lsn long, conv_id string, turn_idx int, text string, tool string",
    )
    table.merge_cdc(spark, ev2)
    rows = {(r.conv_id, r.turn_idx): r.tool for r in table.read(spark).collect()}
    assert rows == {("a", 0): None, ("b", 0): "search"}
    assert "tool" in [f.name for f in table.schema.fields]


def test_compaction_purges_tombstones_and_preserves_state(table, spark):
    table.merge_cdc(spark, _events(spark, [("I", 1, "a", 0, "x"), ("I", 2, "b", 0, "y")]))
    table.merge_cdc(spark, _events(spark, [("D", 3, "a", 0, None)]))
    s = _state(table, spark)
    table.compact(spark, purge_tombstones_below_lsn=100)
    assert _state(table, spark) == s
    assert table.read(spark, include_deleted=True).count() == 1  # tombstone gone
    # vacuum is time-travel-safe: with all snapshots retained nothing is
    # removable; after expiry the pre-compaction files reclaim
    assert table.vacuum(grace_seconds=0) == 0
    table.expire_snapshots(keep_last=1)
    # default grace period protects freshly written files (in-flight writer
    # guard): even unreferenced, these young files survive a no-arg vacuum
    assert table.vacuum() == 0
    removed = table.vacuum(grace_seconds=0)
    assert removed > 0
    assert _state(table, spark) == s  # vacuum never changes state


def test_commit_conflict_detected(table, spark, tmp_path):
    other = LakeTable(table.path)  # second writer handle at same version
    table.merge_cdc(spark, _events(spark, [("I", 1, "a", 0, "x")]))
    with pytest.raises(CommitConflict):
        other.merge_cdc(spark, _events(spark, [("I", 1, "z", 0, "y")]))


def test_lineage_records(table, spark):
    table.merge_cdc(spark, _events(spark, [("I", 5, "a", 0, "x")]), fence=("s", 3))
    recs = table.lineage_records()
    assert recs[0]["op"] == "create"
    last = recs[-1]
    assert last["op"] == "merge_cdc"
    assert last["lsn_min"] == 5 and last["lsn_max"] == 5
    assert last["batch_fence"] == "s:3"
    assert table.lineage_df(spark).count() == len(recs)


def test_commit_conflict_retry_in_apply_batch(table, spark):
    """apply_batch retries a lost optimistic-concurrency race against the
    refreshed snapshot and converges (the conflicting writer's data and the
    batch's data both land)."""
    from sql_etl_pipeline_spark.cdc.apply import apply_batch

    stale = LakeTable(table.path)  # second handle, same version
    table.merge_cdc(spark, _events(spark, [("I", 1, "a", 0, "x")]))
    # 'stale' now loses the race once, then retries on the new base
    r = apply_batch(
        stale, spark, _events(spark, [("I", 2, "b", 0, "y")]), normalize=False
    )
    assert r["applied"]
    assert _state(table.refresh(), spark) == {("a", 0): "x", ("b", 0): "y"}


def test_concurrent_writers_converge_under_retries(spark, tmp_path):
    """Two writer threads (different fenced streams, interleaved LSNs)
    hammer the same table concurrently; optimistic-concurrency retries must
    absorb every CommitConflict and the final state must equal the one-shot
    LWW of the union — the multi-writer guarantee the commit protocol
    claims."""
    from concurrent.futures import ThreadPoolExecutor

    from sql_etl_pipeline_spark.cdc import TRANSCRIPT_SCHEMA, generate_change_events
    from sql_etl_pipeline_spark.cdc.apply import apply_batch, expected_final_state

    path = str(tmp_path / "t")
    LakeTable.create(path, TRANSCRIPT_SCHEMA, key_cols=["conv_id", "turn_idx"], num_buckets=4)
    log = generate_change_events(
        spark, 2000, n_convs=60, delete_frac=0.01, dup_frac=0.02
    ).cache()
    log.count()

    def run(stream_id: str, parity: int) -> list:
        handle = LakeTable(path)  # each writer has its own snapshot handle
        out = []
        for i in range(3):
            batch = log.filter(
                (F.pmod(F.col("lsn"), F.lit(2)) == parity)
                & (F.pmod(F.col("lsn"), F.lit(3)) == i)
            )
            out.append(
                apply_batch(
                    handle, spark, batch, fence=(stream_id, i), commit_retries=20
                )
            )
        return out

    with ThreadPoolExecutor(max_workers=2) as pool:
        fa = pool.submit(run, "even", 0)
        fb = pool.submit(run, "odd", 1)
        ra, rb = fa.result(), fb.result()
    assert all(r["applied"] for r in ra + rb)

    got = sorted(
        tuple(r) for r in LakeTable(path).read(spark).collect()
    )
    want = sorted(tuple(r) for r in expected_final_state(log).collect())
    assert got == want
    log.unpersist()


def test_create_rejects_mutable_bucket_cols(tmp_path):
    """bucket_cols must be a subset of key_cols: a mutable bucket column
    scatters a key's versions across buckets and every pruning path
    (touched-bucket merges, bucket reads, compact_buckets) silently
    duplicates — reject at create()."""
    schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("status", StringType(), True),
        ]
    )
    with pytest.raises(ValueError, match="subset of key_cols"):
        LakeTable.create(
            str(tmp_path / "t"), schema, key_cols=["id"], bucket_cols=["status"]
        )


def test_torn_newest_commit_falls_back_and_quarantines(table, spark, tmp_path):
    """A crash can publish a commit's NAME whose contents never reached
    stable storage. Opening the table must quarantine the torn file and
    fall back to the previous intact commit (that commit never durably
    happened), not brick every open with JSONDecodeError."""
    r = table.merge_cdc(spark, _events(spark, [("I", 1, "a", 0, "x")]))
    assert r["applied"] if "applied" in r else True
    good_version = table.version
    # simulate the torn publish: next version name exists, zero bytes
    torn = os.path.join(table.path, "_meta", f"v{good_version + 1:08d}.json")
    open(torn, "w").close()
    t2 = LakeTable(table.path)  # must not raise
    assert t2.version == good_version
    assert not os.path.exists(torn), "torn file must be quarantined"
    assert _state(t2, spark) == {("a", 0): "x"}
    # the version slot is reusable: the next commit publishes cleanly
    t2.merge_cdc(spark, _events(spark, [("I", 2, "b", 0, "y")]))
    assert LakeTable(table.path).version == good_version + 1


def test_null_lsn_events_are_excluded_not_phantom_rows(table, spark):
    """A key whose only event has lsn=NULL must NOT merge as an all-NULL
    phantom row (max_by over a null ordering key yields a NULL struct);
    null-LSN events are unorderable and excluded, real events unaffected."""
    ev = _events(
        spark,
        [("I", None, "ghost", 0, "boo"), ("I", 5, "real", 0, "ok")],
    )
    table.merge_cdc(spark, ev)
    assert _state(table, spark) == {("real", 0): "ok"}


def test_null_key_events_are_excluded(table, spark):
    """A NULL key has no merge identity, and NULL-blind key-range file
    pruning would silently DUPLICATE a merged null-key row on later
    batches — merge paths exclude such events (the validation layer's
    null_thresholds / strict mode is where they are surfaced or abort
    the batch; see test_validate)."""
    table.merge_cdc(
        spark, _events(spark, [("I", 1, None, 0, "x"), ("I", 2, "ok", 0, "y")])
    )
    assert _state(table, spark) == {("ok", 0): "y"}


def test_null_key_events_are_excluded_in_apply_path(table, spark):
    from sql_etl_pipeline_spark.cdc.apply import apply_batch

    r = apply_batch(
        table,
        spark,
        _events(spark, [("I", 1, None, 0, "x"), ("I", 2, "ok", 0, "y")]),
        normalize=False,
    )
    assert r["applied"]
    # lineage stats count only appliable events
    assert r["events"] == 1
    assert _state(table.refresh(), spark) == {("ok", 0): "y"}


def test_null_lsn_tombstone_survives_purge(table, spark):
    """A tombstone whose last_lsn is NULL (bulk-appended) has an unknown
    position; purge-below-floor must keep it (3-valued logic used to drop
    it unconditionally: true & NULL -> NULL -> filtered)."""
    table.merge_cdc(spark, _events(spark, [("I", 10, "a", 0, "x")]))
    tomb = spark.createDataFrame(
        [("z", 0, None, None, True)],
        "conv_id string, turn_idx int, text string, last_lsn long, deleted boolean",
    )
    table.append(spark, tomb)
    table.compact(spark, purge_tombstones_below_lsn=100)
    rows = {
        (r.conv_id, r.turn_idx): (r.deleted, r.last_lsn)
        for r in table.refresh()
        .read(spark, include_deleted=True, include_meta=True)
        .collect()
    }
    assert ("z", 0) in rows, "NULL-lsn tombstone must survive the purge"
    assert rows[("z", 0)][0] is True


def test_mor_resolution_scoped_to_delta_buckets(tmp_path, spark):
    """MOR read must route only delta-HAVING buckets through the LWW
    resolution shuffle; delta-free buckets plain-scan and union in (under
    skew, deltas stack in few hot buckets — resolving every bucket would
    make read cost O(table))."""
    t = LakeTable.create(
        str(tmp_path / "m"), SCHEMA, key_cols=["conv_id", "turn_idx"],
        num_buckets=8, merge_mode="mor",
    )
    rows = [("I", i, f"c{i}", 0, f"v{i}") for i in range(40)]
    t.merge_cdc(spark, _events(spark, rows))
    t.compact(spark)  # all buckets now base-only
    # one narrow delta batch: updates a single key -> a single hot bucket
    t.merge_cdc(spark, _events(spark, [("U", 100, "c3", 0, "NEW")]))
    deltas = [f for f in t.files if f.get("kind") == "delta"]
    assert deltas and len({f["bucket"] for f in deltas}) == 1
    hot = deltas[0]["bucket"]
    df = t.read(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan, "delta-free buckets must bypass resolution"
    # correctness: every key LWW-correct, update visible, no dupes/losses
    state = {(r.conv_id, r.turn_idx): r.text for r in df.collect()}
    want = {(f"c{i}", 0): ("NEW" if i == 3 else f"v{i}") for i in range(40)}
    assert state == want
    # and a bucket-pruned read of a delta-free bucket still works
    other = next(b for b in range(8) if b != hot)
    sub = t.read(spark, buckets=[other]).collect()
    assert all(r.text != "NEW" for r in sub)


def test_per_table_stats_cols(tmp_path, spark):
    """stats_cols chosen at create() appear in the file manifest and prune
    range reads on that column (a generic table is not stuck with another
    application's hardcoded stat column)."""
    schema = StructType(
        [
            StructField("day", StringType(), False),
            StructField("region", StringType(), True),
            StructField("n", IntegerType(), True),
        ]
    )
    t = LakeTable.create(
        str(tmp_path / "s"), schema, key_cols=["day"], num_buckets=2,
        stats_cols=["region"],
    )
    df = spark.createDataFrame(
        [(f"d{i}", f"r{i % 4}", i) for i in range(20)],
        "day string, region string, n int",
    )
    t.append(spark, df)
    stats = [f.get("stats") or {} for f in t.files]
    # last_lsn is all-NULL on a plain append, so no stat is recorded for it
    assert all("region" in s and "day" in s for s in stats)
    got = {r.day for r in t.read(spark, ranges={"region": ("r1", "r1")}).collect()}
    assert got == {f"d{i}" for i in range(20) if i % 4 == 1}
