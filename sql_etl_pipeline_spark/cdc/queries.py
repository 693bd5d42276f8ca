"""CDC apply as driver-checkable queries.

Derives a deterministic change-event log FROM the shared test tables (so the
DuckDB oracle can derive the identical log from its views — no files, no
randomness), then computes the final transcript state two ways:

* ``cdc_apply_lww`` — pure DataFrame last-writer-wins reduction, and
* ``cdc_apply_engine`` — the full engine path: micro-batched, fenced,
  LSN-guarded merges into a throwaway LakeTable, then a snapshot read.

Both must hash-match the same SQL oracle — which makes the driver's
correctness gate an end-to-end proof of the merge engine, not just of a
query expression.

Log derivation (from ``lineitem``): key = (conv 'c'+orderkey, linenumber%3),
op from quantity/linestatus with a small delete share. ``(orderkey,
linenumber)`` is NOT unique in this data, so the LSN arithmetically encodes
every content-determining field (partkey, quantity, shipdate, returnflag,
linestatus): two events in the same key with equal LSNs are therefore
byte-identical, which makes last-writer-wins well-defined in any engine.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..lakehouse import LakeTable
from .apply import apply_batch
from .generate import TRANSCRIPT_SCHEMA

# Shared derivation, kept textually parallel in Spark and SQL.
_EVENTS_SQL = """
    SELECT CASE WHEN l_quantity < 2 THEN 'D'
                WHEN l_linestatus = 'O' THEN 'U'
                ELSE 'I' END AS op,
           CAST(l_partkey AS BIGINT) * 1000000000
             + CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) * 10000
             + CAST(FLOOR(l_quantity) AS BIGINT) * 100
             + (CASE l_returnflag WHEN 'R' THEN 2 WHEN 'A' THEN 1 ELSE 0 END) * 10
             + (CASE l_linestatus WHEN 'O' THEN 1 ELSE 0 END) AS lsn,
           'c' || CAST(l_orderkey AS VARCHAR) AS conv_id,
           CAST(l_linenumber % 3 AS INTEGER) AS turn_idx,
           l_returnflag AS role,
           'item ' || CAST(l_partkey AS VARCHAR) || ' x' ||
               CAST(CAST(FLOOR(l_quantity) AS BIGINT) AS VARCHAR) AS text,
           l_shipdate AS ts
    FROM lineitem
"""

CDC_ORACLE_SQL = f"""
    WITH ev AS ({_EVENTS_SQL}),
    w AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                                     ORDER BY lsn DESC) AS rn
        FROM ev
    )
    SELECT conv_id, turn_idx, role, text, ts
    FROM w WHERE rn = 1 AND op <> 'D'
    ORDER BY conv_id, turn_idx
"""


def derive_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.when(F.col("l_quantity") < 2, "D")
        .when(F.col("l_linestatus") == "O", "U")
        .otherwise("I")
        .alias("op"),
        (
            F.col("l_partkey").cast("long") * 1_000_000_000
            + F.datediff(
                F.col("l_shipdate").cast("date"), F.to_date(F.lit("1970-01-01"))
            ).cast("long")
            * 10_000
            + F.floor("l_quantity").cast("long") * 100
            + F.when(F.col("l_returnflag") == "R", 2)
            .when(F.col("l_returnflag") == "A", 1)
            .otherwise(0)
            * 10
            + F.when(F.col("l_linestatus") == "O", 1).otherwise(0)
        ).alias("lsn"),
        F.concat(F.lit("c"), F.col("l_orderkey").cast("string")).alias("conv_id"),
        (F.col("l_linenumber") % 3).cast("int").alias("turn_idx"),
        F.col("l_returnflag").alias("role"),
        F.concat(
            F.lit("item "),
            F.col("l_partkey").cast("string"),
            F.lit(" x"),
            F.floor("l_quantity").cast("long").cast("string"),
        ).alias("text"),
        F.col("l_shipdate").alias("ts"),
    )


def cdc_apply_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-shot LWW reduction (the declarative core of CDC apply)."""
    ev = derive_change_events(spark, sf_dir)
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.desc("lsn"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("conv_id", "turn_idx", "role", "text", "ts")
        .orderBy("conv_id", "turn_idx")
    )


def _materialize_final(spark: SparkSession, table: LakeTable, tmp: str) -> DataFrame:
    """Persist the final snapshot as plain parquet and drop the engine's
    working state (table/log/checkpoint dirs). Returning a read of the
    copied-out result instead of ``collect()``-ing rows keeps the gate
    wrapper distributed — at sf >= 1 a driver collect of the full final
    state would OOM the gate even though the engine itself is fine."""
    final = f"{tmp}/final"
    (
        table.read(spark)
        .select("conv_id", "turn_idx", "role", "text", "ts")
        .write.mode("overwrite")
        .parquet(final)
    )
    for sub in ("table", "log", "ckpt"):
        shutil.rmtree(f"{tmp}/{sub}", ignore_errors=True)
    return spark.read.parquet(final).orderBy("conv_id", "turn_idx")


def cdc_apply_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full STRUCTURED STREAMING path, oracle-gated: the derived change log
    is written to a directory, tailed by CdcStreamIngestor (checkpointed
    micro-batches via maxFilesPerTrigger, batch-id fencing, LSN-guarded
    merges), and the final LakeTable snapshot is returned. Hash-matching
    the same SQL oracle proves the streaming engine end-to-end."""
    from pyspark.sql.types import StructType

    from ..streaming.ingest import CdcStreamIngestor

    ev = derive_change_events(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="cdc-stream-q-")
    shutil.rmtree(tmp, ignore_errors=True)
    log_dir = f"{tmp}/log"
    # 4 files -> 2 micro-batches (maxFilesPerTrigger=2); modulo split makes
    # every file span the key space, so batches genuinely collide on keys
    ev.withColumn("_part", F.pmod(F.col("lsn"), F.lit(4)).cast("int")).repartition(
        4, "_part"
    ).drop("_part").write.parquet(log_dir)
    schema = StructType([f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"])
    table = LakeTable.create(
        f"{tmp}/table", schema, key_cols=["conv_id", "turn_idx"], num_buckets=8
    )
    try:
        ingestor = CdcStreamIngestor(
            table,
            log_dir,
            f"{tmp}/ckpt",
            ev.schema,
            stream_id="q-stream",
            max_files_per_trigger=2,
        )
        ingestor.run_available_now(spark)
        return _materialize_final(spark, table, tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def cdc_apply_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same fenced out-of-order batches as ``cdc_apply_engine`` but into a
    MERGE-ON-READ table: each merge appends delta files (write cost
    O(batch)), a mid-run ``compact()`` folds the first batches' deltas into
    base files, and the final snapshot read resolves base + remaining
    deltas per key. Hash-matching the same oracle proves the MOR write
    path, the read-time LWW resolution, AND the delta-fold compaction in
    one gate."""
    ev = derive_change_events(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="cdc-mor-q-")
    shutil.rmtree(tmp, ignore_errors=True)
    from pyspark.sql.types import StructType

    schema = StructType([f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"])
    table = LakeTable.create(
        f"{tmp}/table",
        schema,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=8,
        merge_mode="mor",
    )
    try:
        for i, part in enumerate([2, 0, 3, 1]):  # deliberately out of order
            batch = ev.filter(F.pmod(F.col("lsn"), F.lit(4)) == part)
            apply_batch(table, spark, batch, fence=("q", i), normalize=False)
            if i == 1:
                table.compact(spark)  # fold the first two batches' deltas
        return _materialize_final(spark, table, tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def cdc_apply_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine path: 4 fenced micro-batches -> LakeTable -> snapshot.

    Batches split by LSN ranges delivered out of order (3,1,2,4-groups by
    lsn%4... simply: partition on lsn % 4 applied in a fixed shuffled order)
    to also exercise cross-batch out-of-order application under the
    driver's oracle comparison.
    """
    ev = derive_change_events(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="cdc-engine-q-")
    shutil.rmtree(tmp, ignore_errors=True)
    schema = TRANSCRIPT_SCHEMA
    # transcripts schema minus 'tool' (this log has none)
    from pyspark.sql.types import StructType

    schema = StructType([f for f in schema.fields if f.name != "tool"])
    table = LakeTable.create(
        f"{tmp}/table", schema, key_cols=["conv_id", "turn_idx"], num_buckets=8
    )
    try:
        for i, part in enumerate([2, 0, 3, 1]):  # deliberately out of order
            batch = ev.filter(F.pmod(F.col("lsn"), F.lit(4)) == part)
            apply_batch(table, spark, batch, fence=("q", i), normalize=False)
        return _materialize_final(spark, table, tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


MV_INCREMENTAL_ORACLE_SQL = f"""
    WITH ev AS ({_EVENTS_SQL}),
    w AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                                     ORDER BY lsn DESC) AS rn
        FROM ev
    ),
    st AS (
        SELECT conv_id, turn_idx, role, text
        FROM w WHERE rn = 1 AND op <> 'D'
    )
    SELECT conv_id,
           CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
           CAST(MAX(turn_idx) AS INTEGER) AS max_turn
    FROM st GROUP BY conv_id
    ORDER BY conv_id
"""


def conv_summary_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained MV over the CDC-built transcript table,
    oracle-gated end-to-end (SURVEY.md §2 S13, the 100 TB variant).

    Engine path: the same 4 out-of-order fenced batches as
    ``cdc_apply_engine`` land in a COW LakeTable, and AFTER EVERY BATCH the
    per-conversation summary is refreshed via
    ``maintain.refresh_summary_incremental`` — bootstrap full build on batch
    0's version, then snapshot-diff refreshes that recompute only the
    conversations whose files changed (incl. tombstoned groups, which must
    vanish from the summary). Hash-matching the one-shot SQL aggregate
    proves watermarking, affected-group discovery from added+removed files,
    and the delete-on-vanish merge in a single gate. Reference analogue:
    the staged date-range DELETE+INSERT summary refresh
    (``/root/reference/sql/etl_transformations.sql:281-306``) — here the
    refresh cost is O(changed files), not O(date range rescan).
    """
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..lakehouse.maintain import refresh_summary_incremental

    ev = derive_change_events(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="cdc-mvinc-q-")
    shutil.rmtree(tmp, ignore_errors=True)
    base_schema = StructType([f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"])
    base = LakeTable.create(
        f"{tmp}/table", base_schema, key_cols=["conv_id", "turn_idx"], num_buckets=8
    )
    summary = LakeTable.create(
        f"{tmp}/mv",
        StructType(
            [
                StructField("conv_id", StringType(), False),
                StructField("n_turns", LongType(), True),
                StructField("total_chars", LongType(), True),
                StructField("max_turn", IntegerType(), True),
            ]
        ),
        key_cols=["conv_id"],
        num_buckets=8,
    )

    def build(df: DataFrame) -> DataFrame:
        return df.groupBy("conv_id").agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
            F.max("turn_idx").cast("int").alias("max_turn"),
        )

    try:
        for i, part in enumerate([2, 0, 3, 1]):  # deliberately out of order
            batch = ev.filter(F.pmod(F.col("lsn"), F.lit(4)) == part)
            apply_batch(base, spark, batch, fence=("q", i), normalize=False)
            refresh_summary_incremental(
                summary, spark, base, build, group_cols=["conv_id"]
            )
        final = f"{tmp}/final"
        (
            summary.read(spark)
            .select("conv_id", "n_turns", "total_chars", "max_turn")
            .write.mode("overwrite")
            .parquet(final)
        )
        for sub in ("table", "mv"):
            shutil.rmtree(f"{tmp}/{sub}", ignore_errors=True)
        return spark.read.parquet(final).orderBy("conv_id")
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
