"""Scale-safe exact global ranking and NTILE.

A global ``Window.orderBy(...)`` (no partitionBy) moves EVERY row to one
partition — Spark warns ``WindowExec: No Partition Defined`` and the stage
serializes on a single task: the canonical scale-killer this engine bans
from hot paths (the same discipline as ``analytics.extra``'s
percent-of-total note). The reference freely writes ``NTILE(10) OVER
(ORDER BY ...)`` (``/root/reference/src/sql_query_executor.py:104,471-479``)
because PostgreSQL executes on one node anyway; at 10^8+ rows Spark must
not. This module computes exact global row numbers — and from them exact
SQL NTILE(k) — with only PARTITIONED window stages:

1. every row gets an ORDER-PRESERVING coarse bucket derived from the
   leading sort value itself (``floor(asinh(v) * 16)`` — monotone over all
   reals, deterministic under any partitioning, no sampling step whose
   result could drift between the two jobs);
2. one small aggregation job counts rows per bucket (O(hundreds) groups —
   asinh spacing gives ~6% relative-width buckets over any value range);
3. the cumulative bucket offsets broadcast-join back and a ``row_number``
   window PARTITIONED BY bucket finishes: ``rn = offset + local_rn``;
4. NTILE(k) is then pure arithmetic on ``(rn, n)``: the first ``n % k``
   tiles take ``ceil(n/k)`` rows, the rest ``floor(n/k)`` — byte-identical
   to SQL NTILE over the same total order (the order must carry a unique
   tiebreak, per this package's determinism conventions).

Degenerate case: if every row shares one sort value, its bucket holds all
rows and the window is as wide as the global one — but the per-bucket
window only sorts ties, which any exact NTILE must order anyway. For
continuous-ish scores (money, recency, frequency) buckets stay balanced,
and the widest window partition is a tiny fraction of the table.
"""

from __future__ import annotations

from functools import reduce as _reduce

from pyspark.sql import DataFrame, Window, functions as F

#: asinh scale factor: 16 sub-buckets per e-fold of magnitude.
_BUCKET_SCALE = 16.0


def _order_bucket(first_col: str, ascending: bool) -> F.Column:
    """Monotone, deterministic coarsening of the leading (numeric) sort
    key; descending order negates so the bucket id always ascends with
    the sort order. NaN maps to NULL so the caller's NULL guard rejects it
    loudly — Spark sorts NaN after every value but ``floor(NaN)`` would
    silently cast to bucket 0, corrupting every offset."""
    v = F.col(first_col).cast("double")
    if not ascending:
        v = -v
    v = F.when(F.isnan(v), F.lit(None).cast("double")).otherwise(v)
    return F.floor(F.asinh(v) * F.lit(_BUCKET_SCALE)).cast("long")


def with_global_row_number(
    df: DataFrame, order: list[tuple[str, bool]], rn_col: str = "_rn"
) -> tuple[DataFrame, int]:
    """Add an exact global 1-based row number over ``order`` (a list of
    ``(column, ascending)``; the composite must be a total order and the
    leading column numeric) without a single-partition window.

    Returns ``(df_with_rn, n_rows)`` — the row count comes free from the
    bucket-count job. Triggers one small Spark job eagerly; callers with an
    expensive upstream plan should persist it first.
    """
    first, asc0 = order[0]
    df2 = df.withColumn("_ob", _order_bucket(first, asc0))
    counts = [(r["_ob"], r["count"]) for r in df2.groupBy("_ob").count().collect()]
    if any(ob is None for ob, _ in counts):
        raise ValueError(
            f"NULL or NaN values in leading sort column {first!r}: sort keys "
            "must be NULL/NaN-free (package determinism convention)"
        )
    counts.sort()
    spark = df.sparkSession
    offsets, acc = [], 0
    for ob, cnt in counts:
        offsets.append((ob, acc))
        acc += cnt
    if not offsets:  # empty input: degenerate rn column
        return df2.withColumn(rn_col, F.lit(None).cast("long")).drop("_ob"), 0
    off_df = spark.createDataFrame(offsets, "_ob long, _off long")
    sort_cols = [F.asc(c) if a else F.desc(c) for c, a in order]
    w = Window.partitionBy("_ob").orderBy(*sort_cols)
    out = (
        df2.join(F.broadcast(off_df), "_ob")
        .withColumn(rn_col, (F.col("_off") + F.row_number().over(w)).cast("long"))
        .drop("_ob", "_off")
    )
    return out, acc


def with_exact_ntile(
    df: DataFrame, k: int, order: list[tuple[str, bool]], out_col: str
) -> DataFrame:
    """Add exact ``NTILE(k) OVER (ORDER BY <order>)`` as ``out_col``,
    scale-safe (see module docstring). NULL leading values sort... nowhere:
    callers must not have NULLs in sort keys (package convention)."""
    ranked, n = with_global_row_number(df, order, "_ntile_rn")
    if n == 0:
        return ranked.withColumn(out_col, F.lit(None).cast("int")).drop("_ntile_rn")
    big = n % k
    small_sz = n // k
    big_sz = small_sz + 1
    cut = big * big_sz
    rn = F.col("_ntile_rn")
    if small_sz == 0:  # fewer rows than tiles: tile == rn
        tile = rn
    else:
        tile = F.when(rn <= cut, F.floor((rn - 1) / big_sz) + 1).otherwise(
            F.lit(big) + F.floor((rn - 1 - cut) / small_sz) + 1
        )
    return ranked.withColumn(out_col, tile.cast("int")).drop("_ntile_rn")


def with_exact_ntiles(
    df: DataFrame,
    k: int,
    specs: list[tuple[str, str, bool]],
    key_cols: list[str],
) -> DataFrame:
    """Add SEVERAL exact ``NTILE(k)`` scores over the same DataFrame with
    ONE counting action, ONE partitioned window pass and ONE join back —
    the fused form of calling :func:`with_exact_ntile` per score (which
    costs an eager bucket-count job + window + join EACH; measured ~2x
    wall on rfm_segmentation's three scores at sf0.1).

    ``specs`` is ``[(out_col, value_col, ascending)]``; each score's total
    order is ``(value_col asc|desc, *key_cols asc)`` — i.e. the tiebreak is
    the unique key, ascending, for every score (the shape all NTILE call
    sites in this package use). Mechanics: unpivot the persisted base into
    a long frame tagged ``_spec`` with the sign-adjusted leading value,
    coarse-bucket it (same asinh bucketing as the single-score path), count
    ``(spec, bucket)`` groups in one job, broadcast cumulative offsets +
    per-spec totals back, finish with one ``row_number`` window PARTITIONED
    BY (spec, bucket), turn row numbers into tiles arithmetically, and
    pivot the scores back to one row per key. Callers should persist
    ``df`` first — the long frame selects from it once per spec.
    """
    spark = df.sparkSession
    longs = []
    for i, (_, value_col, asc) in enumerate(specs):
        v = F.col(value_col).cast("double")
        if not asc:
            v = -v
        v = F.when(F.isnan(v), F.lit(None).cast("double")).otherwise(v)
        longs.append(
            df.select(
                F.lit(i).alias("_spec"),
                *[F.col(c) for c in key_cols],
                v.alias("_v"),
            )
        )
    long_df = _reduce(DataFrame.unionByName, longs).withColumn(
        "_ob", F.floor(F.asinh(F.col("_v")) * F.lit(_BUCKET_SCALE)).cast("long")
    )
    counts = long_df.groupBy("_spec", "_ob").count().collect()
    if any(r["_ob"] is None for r in counts):
        bad = sorted({specs[r["_spec"]][1] for r in counts if r["_ob"] is None})
        raise ValueError(
            f"NULL or NaN values in NTILE value column(s) {bad}: sort keys "
            "must be NULL/NaN-free (package determinism convention)"
        )
    if not counts:
        out = df
        for out_col, _, _ in specs:
            out = out.withColumn(out_col, F.lit(None).cast("int"))
        return out
    per_spec: dict[int, list] = {}
    for r in counts:
        per_spec.setdefault(int(r["_spec"]), []).append((int(r["_ob"]), int(r["count"])))
    off_rows = []
    for spec_id, pairs in per_spec.items():
        pairs.sort()
        n = sum(c for _, c in pairs)
        acc = 0
        for ob, cnt in pairs:
            off_rows.append((spec_id, ob, acc, n))
            acc += cnt
    off_df = spark.createDataFrame(off_rows, "_spec int, _ob long, _off long, _n long")
    w = Window.partitionBy("_spec", "_ob").orderBy(
        F.asc("_v"), *[F.asc(c) for c in key_cols]
    )
    rn = F.col("_off") + F.row_number().over(w)
    n = F.col("_n")
    small_sz = F.floor(n / k)
    big = n % k
    big_sz = small_sz + F.lit(1)
    cut = big * big_sz
    tile = (
        F.when(small_sz == 0, rn)
        .when(rn <= cut, F.floor((rn - 1) / big_sz) + 1)
        .otherwise(big + F.floor((rn - 1 - cut) / small_sz) + 1)
    )
    scored_long = (
        long_df.join(F.broadcast(off_df), ["_spec", "_ob"])
        .withColumn("_tile", tile.cast("int"))
        .select(*key_cols, "_spec", "_tile")
    )
    scores = (
        scored_long.groupBy(*key_cols)
        .pivot("_spec", list(range(len(specs))))
        .agg(F.first("_tile").alias("t"), F.count(F.lit(1)).alias("c"))
    )
    # cardinality guard: one long-frame row per (key, spec) iff key_cols
    # are unique in df. A duplicate key would otherwise be SILENTLY
    # collapsed by first() here and re-expanded by the join below. The
    # check is folded into the tile value itself (not a detached
    # assert_true column the optimizer could prune) and costs no extra
    # action — the count rides the pivot aggregation.
    for i, (out_col, _, _) in enumerate(specs):
        scores = scores.withColumn(
            out_col,
            F.when(F.col(f"{i}_c") == 1, F.col(f"{i}_t")).otherwise(
                F.raise_error(
                    F.lit(
                        "with_exact_ntiles: key_cols are not unique in df "
                        f"(duplicate key seen while scoring {out_col!r})"
                    )
                )
            ),
        ).drop(f"{i}_t", f"{i}_c")
    return df.join(scores, key_cols)
