"""Phase-level profiler for the CDC apply hot path.

Answers ONE question: where does the per-batch serial floor live?  Runs the
same generated-log apply as ``bench.py --cdc-only`` but times each phase of
each batch separately:

* ``reduce``   — job 1: scan/generate log slice + normalize + LWW reduce +
  persist + fused stats collect (parallel compute, ends in a driver action)
* ``merge_plan`` — driver-only: file pruning decisions, plan construction
* ``write``    — job 2: union target + resolve + shuffle + parquet write
* ``manifest`` — driver: output listing + footer stat reads (threaded)
* ``commit``   — driver: JSON snapshot publish

Usage::

    SPARK_GRAFT_CPUS=8 python tools/profile_cdc.py [n_events] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sql_etl_pipeline_spark.cdc.apply import STATS_COLS, prepare_events, salted_lww_reduce
from sql_etl_pipeline_spark.cdc.generate import TRANSCRIPT_SCHEMA, generate_change_events
from sql_etl_pipeline_spark.lakehouse import LakeTable
from sql_etl_pipeline_spark.lakehouse.table import BUCKET_COL, _bucket_expr
from sql_etl_pipeline_spark.session import build_session

FAST_DIR = "/dev/shm" if os.path.isdir("/dev/shm") else None


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    extra = {}
    if FAST_DIR:
        extra["spark.local.dir"] = os.path.join(FAST_DIR, "spark-prof-local")
    spark = build_session(
        "profile-cdc", master=f"local[{cpus}]", shuffle_partitions=cpus, extra_conf=extra
    )
    ev = generate_change_events(
        spark, n_events, n_convs=max(n_events // 400, 100), skew=2.0,
        delete_frac=0.001, dup_frac=0.01, ooo_frac=0.01,
    )
    step = n_events // n_batches + 1
    batches = [
        ev.filter((F.col("lsn") >= i * step) & (F.col("lsn") < (i + 1) * step))
        for i in range(n_batches)
    ]
    tmp = tempfile.mkdtemp(prefix="prof-cdc-", dir=FAST_DIR)
    shutil.rmtree(tmp, ignore_errors=True)
    table = LakeTable.create(
        tmp, TRANSCRIPT_SCHEMA, key_cols=["conv_id", "turn_idx"], num_buckets=32
    )
    phases: list[dict] = []
    t_all = time.time()
    try:
        for i, batch in enumerate(batches):
            rec: dict = {"batch": i}
            t0 = time.time()
            prepared = prepare_events(batch, normalize=True)
            reduced = (
                salted_lww_reduce(prepared, table.key_cols, carry_stats=True)
                .withColumn(BUCKET_COL, table._bucket_id())
                .persist()
            )
            st = reduced.agg(
                F.sum("_cnt").alias("n"),
                F.min("_lmin").alias("lo"),
                F.max("_lmax").alias("hi"),
                F.collect_set(BUCKET_COL).alias("buckets"),
                F.min("conv_id").alias("klo"),
                F.max("conv_id").alias("khi"),
            ).collect()[0]
            rec["reduce"] = round(time.time() - t0, 3)

            # --- merge, phase-timed (mirrors LakeTable.merge_cdc) ---
            t0 = time.time()
            src = reduced.drop(*STATS_COLS)
            touched = sorted(int(b) for b in (st["buckets"] or []))
            keys = table.key_cols
            from sql_etl_pipeline_spark.lakehouse.table import DELETED_COL, LSN_COL

            payload_cols = [c for c in src.columns if c not in ("op", "lsn", BUCKET_COL)]
            value_cols = [c for c in payload_cols if c not in keys]
            from pyspark.sql.types import StructType

            schema = table._evolved_schema(
                StructType([f for f in src.schema.fields if f.name in payload_cols])
            )
            out_cols = [f.name for f in schema.fields]
            s2 = src.withColumn(DELETED_COL, F.col("op") == F.lit("D")).withColumn(
                LSN_COL, F.col("lsn").cast("long")
            )
            s2 = s2.select(
                *[F.col(k) for k in keys],
                *[
                    F.when(F.col(DELETED_COL), F.lit(None)).otherwise(F.col(c)).alias(c)
                    for c in value_cols
                ],
                F.col(LSN_COL),
                F.col(DELETED_COL),
                F.col(BUCKET_COL),
            )
            in_touched = [f for f in table.files if f["bucket"] in set(touched)]
            klo, khi = st["klo"], st["khi"]
            prune_key = keys[0]

            def _hit(f):
                stt = (f.get("stats") or {}).get(prune_key)
                if stt is None:
                    return True
                return not (stt["min"] > khi or stt["max"] < klo)

            rewrite = [f for f in in_touched if _hit(f)] if klo is not None else in_touched
            target = table._read_file_entries(spark, rewrite).withColumn(
                BUCKET_COL, table._bucket_id()
            )

            def _shape(df, pri):
                cols = []
                for name in out_cols:
                    if name in df.columns:
                        cols.append(F.col(name))
                    else:
                        typ = next(f.dataType for f in schema.fields if f.name == name)
                        cols.append(F.lit(None).cast(typ).alias(name))
                return df.select(*cols, F.col(BUCKET_COL), F.lit(pri).alias("_pri"))

            combined = _shape(target, 1).unionByName(_shape(s2, 0))
            # round 4: mirror the aligned single-exchange plan — ONE
            # repartition serves the resolution agg's distribution AND the
            # bucketed write (merge_cdc step 3); no write-side repartition.
            if table.bucket_fn == "murmur3":
                combined = combined.repartition(
                    table.num_buckets, *[F.col(c) for c in table.bucket_cols]
                )
            pack2 = F.struct(*[F.col(c) for c in combined.columns if c != "_pri"])
            merged = (
                combined.groupBy(*keys)
                .agg(F.max_by(pack2, F.struct(F.col(LSN_COL), F.col("_pri"))).alias("_w"))
                .select("_w.*")
            )
            rec["merge_plan"] = round(time.time() - t0, 3)

            t0 = time.time()
            import uuid

            write_id = f"w-{uuid.uuid4().hex[:12]}"
            out_dir = os.path.join(table.path, "data", write_id)
            out = merged
            if table.bucket_fn != "murmur3":
                out = merged.repartition(max(len(touched), 1), F.col(BUCKET_COL))
            (
                out.write.partitionBy(BUCKET_COL)
                .mode("overwrite")
                .parquet(out_dir)
            )
            rec["write"] = round(time.time() - t0, 3)

            t0 = time.time()
            stat_cols = tuple(c for c in table._stat_cols() if c in merged.columns)
            rels = []
            for bdir in sorted(os.listdir(out_dir)):
                if not bdir.startswith(f"{BUCKET_COL}="):
                    continue
                b = int(bdir.split("=", 1)[1])
                for fn in sorted(os.listdir(os.path.join(out_dir, bdir))):
                    if fn.endswith(".parquet"):
                        rels.append((os.path.join("data", write_id, bdir, fn), b))
            from concurrent.futures import ThreadPoolExecutor

            def entry(rel_b):
                rel, b = rel_b
                stats, n_rows = table._file_stats(os.path.join(table.path, rel), stat_cols)
                return {"path": rel, "bucket": b, "stats": stats, "rows": n_rows}

            with ThreadPoolExecutor(max_workers=min(16, max(len(rels), 1))) as pool:
                new_files = list(pool.map(entry, rels))
            rec["manifest"] = round(time.time() - t0, 3)

            t0 = time.time()
            doomed = {f["path"] for f in rewrite}
            keep = [f for f in table.files if f["path"] not in doomed]
            summary = table.summary
            summary["fence:prof"] = i
            table._commit(
                keep + new_files,
                schema,
                summary,
                {"op": "merge_cdc", "rows_written": sum(f.get("rows", 0) for f in new_files),
                 "n_events": int(st["n"]), "buckets": touched},
            )
            rec["commit"] = round(time.time() - t0, 3)
            reduced.unpersist()
            rec["files_rewritten"] = len(rewrite)
            rec["files_written"] = len(new_files)
            phases.append(rec)
        wall = time.time() - t_all
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({
        "cpus": cpus, "events": n_events, "batches": n_batches,
        "wall_s": round(wall, 3),
        "events_per_sec": round(n_events / wall, 1),
        "phases": phases,
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
