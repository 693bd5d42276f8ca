"""Materialized-view / summary-table maintenance (SURVEY.md §2 S13).

The reference refreshes summary tables with staged DELETE+INSERT SQL inside
a transaction (``/root/reference/sql/etl_transformations.sql:281-306``:
``daily_sales_summary`` rebuilt per date range). The lake-scale equivalent
is a FULL, ATOMIC overwrite commit: the query result becomes the table's
complete new contents in one snapshot swap, so readers see the old summary
or the new one, never a partial refresh — and time travel keeps the old
snapshots queryable (``at_version``), which the reference's DELETE cannot.

Partial/incremental refresh at 100 TB is the same call with the query
restricted to changed partitions plus ``merge_cdc`` on the summary key —
both building blocks already exist; this helper is the rebuild pattern.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from .table import BUCKET_COL, LakeTable, _bucket_expr


def refresh_summary(
    summary: LakeTable, spark: SparkSession, result: DataFrame
) -> dict[str, Any]:
    """Atomically replace ``summary``'s contents with ``result``.

    ``result`` is any DataFrame whose columns are (a superset-compatible
    subset of) the summary schema; new columns evolve the schema
    additively, missing ones fill NULL — same rules as ``append``. The
    commit records ``op="refresh_summary"`` lineage, and the previous
    contents stay reachable via time travel until snapshots expire.
    """
    import time

    t0 = time.time()
    schema = summary._evolved_schema(result.schema)
    out = result
    for f in schema.fields:
        if f.name not in result.columns:
            out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
    out = out.select([f.name for f in schema.fields]).withColumn(
        BUCKET_COL, _bucket_expr(summary.bucket_cols, summary.num_buckets)
    )
    new_files = summary._write_buckets(out, summary.num_buckets)
    summary._commit(
        new_files,  # full replacement: ONLY the new files
        schema,
        summary.summary,
        {
            "op": "refresh_summary",
            "rows_written": sum(f.get("rows", 0) for f in new_files),
            "buckets": sorted({f["bucket"] for f in new_files}),
            "wall_s": round(time.time() - t0, 3),
        },
    )
    return {"files": len(new_files), "version": summary.version}
