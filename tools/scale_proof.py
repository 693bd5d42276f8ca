"""Scale-tier proof: does throughput survive table growth? (VERDICT r2 #1)

The BASELINE workload is a 10^10-event change stream; this sandbox can hold
~10^8. The question a 100 TB deployment actually asks is not "how fast is
one batch" but two invariants:

* **MOR: apply throughput is independent of table size.** Merge cost is
  O(batch rows) — no target read, no rewrite — so events/sec for batch 30
  (table at ~90M applied events) must match batch 2 (near-empty table),
  with the full maintenance loop engaged mid-run: cadence compaction,
  tombstone purge below the applied-LSN floor, and bucket-count evolution
  (32 -> 64, the Iceberg partition-spec-evolution growth path).
* **COW: write amplification is bounded by overlapping-file bytes, not
  table bytes.** After a sorted, file-split compaction gives files disjoint
  key ranges, a batch touching a narrow key window must rewrite only the
  files whose [min,max] overlap that window — ``files_rewritten`` per batch
  stays ~flat while the table's total file count is many times larger.

Phase A replays N events (default 10^8) through the MOR engine in G groups
of pipelined micro-batches, timing each group separately; a throughput
profile that is flat in the group index (while cumulative applied events
grow 30x) is the evidence. Phase B loads a COW table, compacts it sorted +
file-split, then applies sliding narrow-window update batches and reads
``files_rewritten`` from each merge result.

Phase A ends with an at-scale correctness gate: the resolved MOR read must
match the one-shot global LWW reduction of the entire log (row count and a
sum-of-xxhash64 checksum over every payload column) — the same per-turn
equality the sf-scale oracle enforces, at 10^8 events.

Usage::

    SPARK_GRAFT_CPUS=8 python tools/scale_proof.py [--events N] [--out F]

Writes one JSON document to BENCH/scale_proof.json (default) and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sql_etl_pipeline_spark.cdc.apply import (
    apply_batches_pipelined,
    expected_final_state,
)
from sql_etl_pipeline_spark.cdc.generate import (
    TRANSCRIPT_SCHEMA,
    generate_change_events,
)
from sql_etl_pipeline_spark.lakehouse import LakeTable
from sql_etl_pipeline_spark.session import build_session

FAST_DIR = "/dev/shm" if os.path.isdir("/dev/shm") else None


def _machine_probe(spark, cores: int) -> float:
    """Fixed pure-ALU md5 job at the run's own parallelism (same probe as
    bench.py's ceiling probe). The sandbox VM is burst-credit throttled:
    over a ~30 min sustained run the credits drain, so a raw per-group
    slowdown can be the MACHINE, not table growth. Running this identical
    job between groups measures machine speed at that moment; per-group
    throughput normalized by (probe_s / median probe_s) isolates the
    engine's table-size dependence from the VM's throttle state."""
    t0 = time.time()
    spark.range(24_000_000, numPartitions=4 * cores).selectExpr(
        "sum(length(md5(cast(id as string)))) s"
    ).collect()
    return round(time.time() - t0, 3)


def _checksum(df, cols):
    """Order-independent content hash: sum of per-row xxhash64 over the
    given columns (NULL-tagged so NULL != '')."""
    tagged = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols
    ]
    return df.select(
        F.sum(F.xxhash64(*tagged)).alias("h"), F.count("*").alias("n")
    ).collect()[0]


def _mk_events(spark, n_events: int, n_convs: int):
    return generate_change_events(
        spark,
        n_events,
        n_convs=n_convs,
        skew=2.0,
        delete_frac=0.001,
        dup_frac=0.01,
        ooo_frac=0.01,
    )


def phase_a_mor(spark, n_events: int, n_batches: int, group: int, cores: int) -> dict:
    n_convs = max(n_events // 400, 100)
    step = n_events // n_batches + 1
    # Materialize the change log ONCE, partitioned by batch slice — a real
    # log tail reads its slice from storage; it does not re-derive the
    # whole stream per batch. (The lazy generator plan would otherwise be
    # re-evaluated by every batch filter: 32 full-log scans, all billed to
    # "apply" wall.) Partition pruning makes each batch read exactly its
    # own files.
    log_dir = tempfile.mkdtemp(prefix="scale-log-", dir=FAST_DIR)
    t_gen = time.time()
    _mk_events(spark, n_events, n_convs).withColumn(
        "batch_id", F.floor(F.col("lsn") / F.lit(step)).cast("int")
    ).write.mode("overwrite").partitionBy("batch_id").parquet(log_dir)
    log = spark.read.parquet(log_dir)
    gen_wall = round(time.time() - t_gen, 3)
    batches = [
        log.filter(F.col("batch_id") == i).drop("batch_id")
        for i in range(n_batches)
    ]
    tmp = tempfile.mkdtemp(prefix="scale-mor-", dir=FAST_DIR)
    shutil.rmtree(tmp, ignore_errors=True)
    table = LakeTable.create(
        tmp,
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=32,
        merge_mode="mor",
    )
    groups = [batches[i : i + group] for i in range(0, n_batches, group)]
    evolve_at = len(groups) // 2  # bucket-count evolution at mid-run
    records: list[dict] = []
    maint_wall = 0.0
    _machine_probe(spark, cores)  # warm codegen so group-0 probe is honest
    t_all = time.time()
    try:
        for gi, gbatches in enumerate(groups):
            t0 = time.time()
            results = apply_batches_pipelined(
                table,
                spark,
                gbatches,
                stream_id="proof",
                first_batch_id=gi * group,
            )
            wall = time.time() - t0
            applied = sum(r.get("events", 0) for r in results if r.get("applied"))
            rec = {
                "group": gi,
                "batches": len(gbatches),
                "events": applied,
                "wall_s": round(wall, 3),
                "events_per_sec": round(applied / wall, 1),
                "cum_events": sum(r["events"] for r in records) + applied,
                "files_live": len(table.files),
                "delta_depth_max": int(table.summary.get("delta_depth_max", 0)),
                "num_buckets": table.num_buckets,
                "files_written_per_batch": [
                    r.get("files_written") for r in results
                ],
                "machine_probe_s": _machine_probe(spark, cores),
            }
            # Maintenance BETWEEN groups (never inside a pipelined run:
            # bucket-count evolution changes the bucket expr that the
            # prefetched reduce bakes in). Cadence: full compact + tombstone
            # purge every other group; partition-spec evolution once at
            # mid-run. Timed separately — on a real cluster this runs in a
            # background maintenance job, not on the ingest critical path.
            t0 = time.time()
            max_depth = 6  # depth trigger threshold (CdcStreamIngestor knob)
            if gi == evolve_at:
                hi = table.summary.get("applied_lsn_max")
                floor = int(hi) - n_events // 10 if hi is not None else None
                rec["maintenance"] = table.compact(
                    spark,
                    purge_tombstones_below_lsn=floor,
                    num_buckets=64,
                    sort_within_buckets=True,
                )
            elif gi % 2 == 1 and gi != len(groups) - 1:
                hi = table.summary.get("applied_lsn_max")
                floor = int(hi) - n_events // 10 if hi is not None else None
                rec["maintenance"] = table.compact(
                    spark, purge_tombstones_below_lsn=floor
                )
            elif int(table.summary.get("delta_depth_max", 0)) > max_depth:
                # depth-TRIGGERED partial maintenance on non-cadence groups
                # (same signal + action as CdcStreamIngestor's
                # max_delta_depth path): fold only the deep buckets, so the
                # claim "depth-triggered MOR compaction engaged" is
                # exercised by the run itself, not just by the cadence
                # compacts (round-3 ADVICE item).
                deep = sorted(
                    b
                    for b, d in table.delta_depths().items()
                    if d > max_depth
                )
                rec["maintenance"] = {
                    "depth_triggered_buckets": deep,
                    **(table.compact_buckets(spark, deep) or {}),
                }
            rec["maintenance_wall_s"] = round(time.time() - t0, 3)
            maint_wall += time.time() - t0
            records.append(rec)
        apply_wall = sum(r["wall_s"] for r in records)
        total_wall = time.time() - t_all

        # ---- at-scale correctness gate: resolved read == one-shot LWW ----
        t0 = time.time()
        cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        got = _checksum(table.read(spark), cols)
        want = _checksum(expected_final_state(log.drop("batch_id")), cols)
        verify_wall = time.time() - t0
        ok = got["n"] == want["n"] and got["h"] == want["h"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(log_dir, ignore_errors=True)
    halves = [records[: len(records) // 2], records[len(records) // 2 :]]
    eps = [
        round(sum(r["events"] for r in h) / sum(r["wall_s"] for r in h), 1)
        for h in halves
    ]
    # Machine-normalized halves: scale each group's wall by
    # (median probe / that group's probe) so VM burst-credit drain over the
    # run does not read as table-growth degradation (or mask one).
    probes = sorted(r["machine_probe_s"] for r in records)
    med_probe = probes[len(probes) // 2]
    norm_eps = [
        round(
            sum(r["events"] for r in h)
            / sum(r["wall_s"] * (med_probe / r["machine_probe_s"]) for r in h),
            1,
        )
        for h in halves
    ]
    return {
        "mode": "mor",
        "events": n_events,
        "n_batches": n_batches,
        "group_size": group,
        "log_materialize_wall_s": gen_wall,
        "apply_wall_s": round(apply_wall, 3),
        "maintenance_wall_s": round(maint_wall, 3),
        "total_wall_s": round(total_wall, 3),
        "events_per_sec_apply": round(n_events / apply_wall, 1),
        "events_per_sec_first_half": eps[0],
        "events_per_sec_second_half": eps[1],
        "throughput_ratio_second_vs_first_half": round(eps[1] / eps[0], 3),
        "machine_probe_median_s": med_probe,
        "events_per_sec_first_half_machine_norm": norm_eps[0],
        "events_per_sec_second_half_machine_norm": norm_eps[1],
        "throughput_ratio_machine_norm": round(norm_eps[1] / norm_eps[0], 3),
        "correctness": {
            "rows": int(got["n"]),
            "oracle_rows": int(want["n"]),
            "checksum_match": bool(ok),
            "verify_wall_s": round(verify_wall, 3),
        },
        "groups": records,
    }


def phase_b_cow(
    spark,
    load_events: int,
    n_updates: int,
    upd_events: int,
    files_per_bucket: int = 32,
) -> dict:
    n_convs = max(load_events // 400, 100)
    tmp = tempfile.mkdtemp(prefix="scale-cow-", dir=FAST_DIR)
    shutil.rmtree(tmp, ignore_errors=True)
    table = LakeTable.create(
        tmp,
        TRANSCRIPT_SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=32,
    )
    try:
        # bulk load, then the layout that makes COW file-scoped: sorted
        # buckets split into fixed-row files -> disjoint conv_id ranges per
        # file inside each bucket, so manifest min/max pruning can skip
        # files a narrow batch cannot touch.
        load = _mk_events(spark, load_events, n_convs)
        apply_batches_pipelined(
            table, spark, [load], stream_id="load", normalize=True
        )
        # Size files from the table's RESOLVED row count, not the event
        # count — LWW collapses ~8 events per key, and a file target scaled
        # to events leaves ~1 file per bucket, which makes every bucket's
        # whole content "overlapping" and hides file-scoping entirely.
        # With F sorted files per bucket, a batch touching window_frac of
        # the keyspace overlaps ~ceil(window_frac*F)+1 files per bucket, so
        # the rewrite FRACTION tends to window_frac + 1/F: F=8 floored the
        # round-3 run at a worst 0.34; F=32 (the default now, documented at
        # LakeTable.compact) pushes the bound to ~0.08-0.12 while keeping
        # per-file row counts in the tens of thousands at this load.
        table_rows = table.read(spark).count()
        table.compact(
            spark,
            sort_within_buckets=True,
            target_file_rows=max(table_rows // (32 * files_per_bucket), 2_000),
        )
        total_files = len(table.files)

        # sliding narrow-window updates: each batch rewrites only the files
        # overlapping ~window_frac of the conv keyspace ("recent
        # conversations hot" — the realistic CDC update locality).
        window_frac = 0.05
        win = max(int(n_convs * window_frac), 1)
        recs: list[dict] = []
        for i in range(n_updates):
            lo = (i * win) % max(n_convs - win, 1)
            base = _mk_events(spark, upd_events, win).filter(F.col("op") != "D")
            # shift the generated conv-number window to [lo, lo+win)
            shifted = base.withColumn(
                "conv_id",
                F.concat(
                    F.lit("conv-"),
                    F.lpad(
                        (
                            F.substring("conv_id", 6, 8).cast("long") + F.lit(lo)
                        ).cast("string"),
                        8,
                        "0",
                    ),
                ),
            ).withColumn("lsn", F.col("lsn") + F.lit(load_events * (i + 2)))
            t0 = time.time()
            res = apply_batches_pipelined(
                table, spark, [shifted], stream_id=f"upd{i}", normalize=True
            )[0]
            recs.append(
                {
                    "batch": i,
                    "conv_window": [lo, lo + win],
                    "wall_s": round(time.time() - t0, 3),
                    "files_rewritten": res["files_rewritten"],
                    "files_kept_in_touched_buckets": res[
                        "files_kept_in_touched_buckets"
                    ],
                    "files_total_before": total_files,
                }
            )
            total_files = len(table.files)
        final_rows = table.read(spark).count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    worst = max(r["files_rewritten"] for r in recs)
    return {
        "mode": "cow",
        "load_events": load_events,
        "update_batches": n_updates,
        "update_events_per_batch": upd_events,
        "window_frac_of_keyspace": window_frac,
        "final_rows": final_rows,
        "files_in_table": total_files,
        "worst_files_rewritten_per_batch": worst,
        "worst_rewrite_fraction": round(worst / total_files, 3),
        "batches": recs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=100_000_000)
    ap.add_argument("--batches", type=int, default=32)
    ap.add_argument("--group", type=int, default=4)
    ap.add_argument("--cow-load", type=int, default=8_000_000)
    ap.add_argument("--cow-updates", type=int, default=8)
    ap.add_argument("--cow-update-events", type=int, default=250_000)
    ap.add_argument("--cow-files-per-bucket", type=int, default=32)
    ap.add_argument("--skip-cow", action="store_true")
    ap.add_argument("--skip-mor", action="store_true")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH",
            "scale_proof.json",
        ),
    )
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    extra = {}
    if FAST_DIR:
        extra["spark.local.dir"] = os.path.join(FAST_DIR, "spark-proof-local")
    spark = build_session(
        "scale-proof",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf=extra,
    )
    out: dict = {"cpus": cpus, "host_fast_dir": FAST_DIR}
    t0 = time.time()
    if not args.skip_mor:
        out["phase_a_mor"] = phase_a_mor(
            spark, args.events, args.batches, args.group, cpus
        )
    if not args.skip_cow:
        out["phase_b_cow"] = phase_b_cow(
            spark,
            args.cow_load,
            args.cow_updates,
            args.cow_update_events,
            files_per_bucket=args.cow_files_per_bucket,
        )
    out["wall_s"] = round(time.time() - t0, 3)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
