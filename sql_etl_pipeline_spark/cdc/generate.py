"""Deterministic transcript change-event generator.

The engine's input (BASELINE.json ``input_hint``) is an ordered CDC log of
insert/update/delete events on conversation turns keyed by
``(conv_id, turn_idx)`` with monotone ``lsn``. This generator synthesizes
that log as a *pure function of the row id* — no ``rand()`` (whose value
depends on partitioning), no wall clock — so any two runs, at any
parallelism, produce identical logs. Mirrors the reference's seeded-fixture
discipline (``/root/reference/src/sample_data_generator.py:21-26``) but
scales: it is a lazy ``spark.range`` plan, so a 10^10-event log never
materializes on the driver.

Skew: conversation ids follow an approximate Zipf via inverse-CDF on a
hash-uniform, so a few conversations are hot (FIXTURES.md §2 `skew`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)


def change_event_schema(with_tool: bool = True) -> StructType:
    fields = [
        StructField("op", StringType(), False),
        StructField("lsn", LongType(), False),
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
    ]
    if with_tool:
        fields.append(StructField("tool", StringType(), True))
    fields.append(StructField("ts", TimestampType(), True))
    return StructType(fields)


def _u(col, seed: int, mod: int = 1_000_000):
    """Deterministic uniform in [0,1) derived from a column + seed (stable
    under any partitioning, unlike F.rand)."""
    return (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(mod)) / F.lit(float(mod)))


def generate_change_events(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 1000,
    max_turns: int = 50,
    seed: int = 42,
    delete_frac: float = 0.001,
    dup_frac: float = 0.0,
    ooo_frac: float = 0.0,
    skew: float = 2.0,
    tool_from_lsn: int | None = None,
) -> DataFrame:
    """Build an ``n_events``-row change log.

    * ``delete_frac`` — fraction of D events (default 0.1%, per BASELINE).
    * ``dup_frac`` — fraction of events re-emitted with the SAME lsn
      (duplicate delivery).
    * ``ooo_frac`` — fraction of events whose position in the log is
      swapped far from LSN order (out-of-order delivery across batches).
    * ``skew`` — Zipf-ish exponent; higher = hotter head conversations.
    * ``tool_from_lsn`` — if set, the ``tool`` column only carries values at
      lsn >= threshold (schema-evolution fixtures drop the column entirely
      for the prefix; see tests).

    The log is ordered by ``pos`` (delivery order); ``lsn`` is the logical
    order. With ``ooo_frac=0`` and ``dup_frac=0`` they coincide.
    """
    df = spark.range(n_events).withColumnRenamed("id", "lsn")
    u_conv = _u(F.col("lsn"), seed + 1)
    # Inverse-CDF power law: floor(n_convs * u^skew) concentrates mass at 0.
    conv_num = F.floor(F.lit(n_convs) * F.pow(u_conv, F.lit(skew))).cast("long")
    df = df.withColumn("conv_id", F.concat(F.lit("conv-"), F.lpad(conv_num.cast("string"), 8, "0")))
    df = df.withColumn(
        "turn_idx",
        F.pmod(F.xxhash64("lsn", F.lit(seed + 2)), F.lit(max_turns)).cast("int"),
    )
    u_op = _u(F.col("lsn"), seed + 3)
    # First sighting of a key is logically an insert; generator approximates
    # with I/U mix (merge treats I and U identically: full-row upsert).
    df = df.withColumn(
        "op",
        F.when(u_op < F.lit(delete_frac), F.lit("D"))
        .when(u_op < F.lit(delete_frac + 0.5), F.lit("U"))
        .otherwise(F.lit("I")),
    )
    role_idx = F.pmod(F.xxhash64("lsn", F.lit(seed + 4)), F.lit(4))
    df = df.withColumn(
        "role",
        F.when(F.col("op") == "D", F.lit(None).cast("string")).otherwise(
            F.element_at(
                F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
                (role_idx + 1).cast("int"),
            )
        ),
    )
    # Deterministic text with whitespace/empty edge cases baked in
    # (normalization fixtures, FIXTURES.md §2).
    u_txt = _u(F.col("lsn"), seed + 5)
    body = F.concat(
        F.lit("turn "),
        F.col("turn_idx").cast("string"),
        F.lit(" of "),
        F.col("conv_id"),
        F.lit(" rev "),
        F.col("lsn").cast("string"),
    )
    df = df.withColumn(
        "text",
        F.when(F.col("op") == "D", F.lit(None).cast("string"))
        .when(u_txt < 0.02, F.lit(""))  # empty -> engine normalizes to NULL
        .when(u_txt < 0.04, F.concat(F.lit("  "), body, F.lit("   ")))  # pad
        .otherwise(body),
    )
    tool_val = F.when(
        F.pmod(F.xxhash64("lsn", F.lit(seed + 6)), F.lit(10)) < 3,
        F.concat(F.lit("tool_"), F.pmod(F.xxhash64("lsn", F.lit(seed + 7)), F.lit(5)).cast("string")),
    ).otherwise(F.lit(None).cast("string"))
    if tool_from_lsn is not None:
        tool_val = F.when(F.col("lsn") >= F.lit(tool_from_lsn), tool_val).otherwise(
            F.lit(None).cast("string")
        )
    df = df.withColumn(
        "tool",
        F.when(F.col("op") == "D", F.lit(None).cast("string")).otherwise(tool_val),
    )
    df = df.withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("lsn"))
    )

    # Delivery position: mostly lsn, with an out-of-order tail swap.
    pos = F.col("lsn").cast("double")
    if ooo_frac > 0:
        u_ooo = _u(F.col("lsn"), seed + 8)
        jitter = (F.pmod(F.xxhash64("lsn", F.lit(seed + 9)), F.lit(2000)) - 1000).cast("double")
        pos = F.when(u_ooo < F.lit(ooo_frac), pos + jitter).otherwise(pos)
    df = df.withColumn("pos", pos)

    if dup_frac > 0:
        dups = df.filter(_u(F.col("lsn"), seed + 10) < F.lit(dup_frac)).withColumn(
            "pos", F.col("pos") + F.lit(0.5)
        )
        df = df.unionByName(dups)

    return df.select("pos", "op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts")
