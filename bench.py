"""Benchmark harness — the engine's feedback loop (SURVEY.md §7.1 M7).

Runs the headline workloads at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1, ...}

The flagship measurement is the BASELINE.json metric: CDC change-events/sec
applied end-to-end (log -> salted LWW dedup -> LSN-guarded merge -> atomic
bucket swap). The reference's only published number is 217.78 records/s on
its sample pipeline (``/root/reference/docs/SETUP_GUIDE.md:210-219``).

Scaling-efficiency mode (the north_rule's two-cluster-size criterion,
evidenced per the sandbox rule by two local parallelism levels)::

    python bench.py --scaling        # runs the CDC apply at local[8] and
                                     # local[32] in fresh subprocesses,
                                     # reports throughput + efficiency
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Benchmark on tmpfs when available: the sandbox's /tmp sits on a throttled
# virtual disk whose burst credits add 2-3x run-to-run variance; a real
# cluster puts shuffle + table data on local NVMe. tmpfs is the honest
# local stand-in for that.
FAST_DIR = "/dev/shm" if os.path.isdir("/dev/shm") else None


def _bench_session(name: str):
    from sql_etl_pipeline_spark.session import build_session

    extra = {}
    if FAST_DIR:
        extra["spark.local.dir"] = os.path.join(FAST_DIR, "spark-bench-local")
    # Ad-hoc conf overrides for bench experiments:
    #   SPARK_GRAFT_EXTRA_CONF="spark.io.compression.codec=zstd,spark.x=y"
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    return build_session(
        name, master=f"local[{CPUS}]", shuffle_partitions=CPUS, extra_conf=extra
    )

# Headline analytics queries (each also oracle-gated for correctness).
HEADLINE = [
    "customer_ltv",
    "product_performance",
    "sales_trends",
    "rfm_segmentation",
    "market_basket_pairs",
    "events_sessionized",
]
# Training-data pipeline headliners, included when the module exists.
DATAPIPE_HEADLINE = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "ann_cosine_topk",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _force(df) -> int:
    """Fully execute a DataFrame without collecting rows to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_cdc_apply(
    spark,
    sf_dir: str,
    n_batches: int = 4,
    generate_events: int | None = None,
    merge_mode: str | None = None,
) -> dict:
    """End-to-end CDC apply in fenced micro-batches to a fresh LakeTable.

    Default source: the change log derived from lineitem (the oracle-gated
    path). ``generate_events=N`` instead uses the deterministic Zipf-skewed
    generator — a lazy ``spark.range`` plan whose generation cost stands in
    for the log tail read — with text normalization ON (the real hot path:
    regex normalize + LWW reduce + LSN-guarded merge per event).
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from sql_etl_pipeline_spark.cdc.apply import apply_batch
    from sql_etl_pipeline_spark.cdc.generate import (
        TRANSCRIPT_SCHEMA,
        generate_change_events,
    )
    from sql_etl_pipeline_spark.cdc.queries import derive_change_events
    from sql_etl_pipeline_spark.lakehouse import LakeTable

    if generate_events is None:
        ev = derive_change_events(spark, sf_dir).cache()
        n_events = ev.count()  # cache warm; excluded from apply timing
        normalize = False
        schema = StructType([f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"])
        batches = [
            ev.filter(F.pmod(F.col("lsn"), F.lit(n_batches)) == i)
            for i in range(n_batches)
        ]
    else:
        n_events = generate_events
        ev = generate_change_events(
            spark,
            n_events,
            n_convs=max(n_events // 400, 100),
            skew=2.0,
            delete_frac=0.001,
            dup_frac=0.01,
            ooo_frac=0.01,
        )
        normalize = True
        schema = TRANSCRIPT_SCHEMA
        step = n_events // n_batches + 1
        batches = [
            ev.filter(
                (F.col("lsn") >= i * step) & (F.col("lsn") < (i + 1) * step)
            )
            for i in range(n_batches)
        ]
    tmp = tempfile.mkdtemp(prefix="bench-cdc-", dir=FAST_DIR)
    shutil.rmtree(tmp, ignore_errors=True)
    # SPARK_GRAFT_MERGE_MODE=mor benches the write-optimized merge-on-read
    # path (append deltas per batch, resolve at read, compact folds); the
    # final count below then exercises the read-time resolution too.
    if merge_mode is None:
        merge_mode = os.environ.get("SPARK_GRAFT_MERGE_MODE", "cow")
    table = LakeTable.create(
        tmp, schema, key_cols=["conv_id", "turn_idx"], num_buckets=32,
        merge_mode=merge_mode,
    )
    # Pipelined (one-batch-lookahead) replay is the engine's backfill path:
    # batch i+1's reduce overlaps batch i's merge/commit, hiding the
    # driver-serial floor. SPARK_GRAFT_PIPELINE=0 forces the serial loop
    # (A/B comparison).
    pipelined = os.environ.get("SPARK_GRAFT_PIPELINE", "1") != "0"
    t0 = time.time()
    try:
        if pipelined and len(batches) > 1:
            from sql_etl_pipeline_spark.cdc.apply import apply_batches_pipelined

            apply_batches_pipelined(
                table, spark, batches, stream_id="bench", normalize=normalize
            )
        else:
            for i, batch in enumerate(batches):
                apply_batch(table, spark, batch, fence=("bench", i), normalize=normalize)
        wall = time.time() - t0
        final_rows = table.read(spark).count()
    finally:
        if generate_events is None:
            ev.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)
    return {
        "wall_s": round(wall, 3),
        "events": n_events,
        "events_per_sec": round(n_events / wall, 1),
        "final_rows": final_rows,
    }


def run_suite() -> dict:
    import __spark_entry__ as entrymod

    spark = _bench_session("bench")
    qs = entrymod.queries()
    names = list(HEADLINE)
    for n in DATAPIPE_HEADLINE:
        if n in qs:
            names.append(n)

    t_all = time.time()
    cdc = run_cdc_apply(spark, SF_DIR)
    timings: dict[str, float] = {"cdc_apply": cdc["wall_s"]}
    cdc_mor = run_cdc_apply(spark, SF_DIR, merge_mode="mor")
    timings["cdc_apply_mor"] = cdc_mor["wall_s"]
    for name in names:
        t0 = time.time()
        _force(qs[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_all, 3)
    spark.stop()
    return {
        "metric": "cdc_apply_and_headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "cpus": CPUS,
        "cdc_events": cdc["events"],
        "cdc_events_per_sec": cdc["events_per_sec"],
        "cdc_final_rows": cdc["final_rows"],
        "cdc_mor_events_per_sec": cdc_mor["events_per_sec"],
        "cdc_mor_final_rows": cdc_mor["final_rows"],
    }


def _calibration_probe(spark) -> float:
    """Single-task CPU probe. The sandbox VM's effective CPU swings
    several-fold over minutes (the same fixed job measured 9.5s to 90s
    across runs); this probe runs an identical ONE-task md5 job in every
    trial, measuring single-core speed AT THAT MOMENT independent of the
    parallelism level under test (one task never oversubscribes any
    local[N]), so trial throughputs can be normalized to a common machine
    state."""
    t0 = time.time()
    spark.range(4_000_000, numPartitions=1).selectExpr(
        "sum(length(md5(cast(id as string)))) s"
    ).collect()
    return round(time.time() - t0, 3)


def _parallel_ceiling_probe(spark, cores: int) -> float:
    """Fixed pure-ALU job at the trial's OWN parallelism (md5 over 24M ids,
    ``4*cores`` partitions). Two trials' probes at different N give the
    machine's same-moment multi-core scaling ceiling: on this VM, sustained
    multi-thread use is credit-throttled, so even a perfectly parallel job
    scales below 1.0 (measured 0.75-0.88 for pure ALU depending on the
    window). The workload's efficiency divided by this ceiling isolates what
    the PLAN costs from what the MACHINE costs."""
    t0 = time.time()
    spark.range(24_000_000, numPartitions=4 * cores).selectExpr(
        "sum(length(md5(cast(id as string)))) s"
    ).collect()
    return round(time.time() - t0, 3)


def run_cdc_only() -> dict:
    """Subprocess entry for --scaling: one CDC apply at $SPARK_GRAFT_CPUS.

    ``SPARK_GRAFT_SCALE_EVENTS`` (default 6M) sizes the generated log so the
    job is compute-bound, not scheduling-bound — the regime that represents
    the 10^10-event cluster deployment.

    Before the timed run, a small warmup apply (100k events to a throwaway
    table) exercises the exact plan shapes once, so one-time codegen
    compilation + JIT warmup are excluded from the measured window — they
    are per-JVM constants, not per-batch costs, and a real cluster pays
    them once per executor lifetime, not per 10^10-event job."""
    n = int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", "6000000"))
    nb = int(os.environ.get("SPARK_GRAFT_SCALE_BATCHES", "2"))
    spark = _bench_session("bench-cdc")
    _calibration_probe(spark)  # warm codegen for the probe
    run_cdc_apply(spark, SF_DIR, n_batches=2, generate_events=100_000)  # warmup
    out = run_cdc_apply(spark, SF_DIR, n_batches=nb, generate_events=n)
    out["calib_s"] = _calibration_probe(spark)
    out["ceiling_probe_s"] = _parallel_ceiling_probe(spark, CPUS)
    spark.stop()
    return out


def run_scaling(levels=(8, 32)) -> dict:
    """Run the identical CDC apply at two parallelism levels in fresh JVMs
    and report throughput at both plus scaling efficiency (north_rule).

    The sandbox VM's effective CPU fluctuates heavily (the same fixed job
    measured 9-90s across trials), so trials are interleaved A/B/A/B and the
    BEST throughput per level is compared — best-of-N approximates the
    unthrottled machine; every trial is reported for transparency.
    """
    lv = os.environ.get("SPARK_GRAFT_SCALE_LEVELS")
    if lv:
        levels = tuple(int(x) for x in lv.split(","))
    trials = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "3"))
    cooldown = int(os.environ.get("SPARK_GRAFT_SCALE_COOLDOWN", "45"))
    runs: dict[int, list[dict]] = {n: [] for n in levels}
    first = True
    for _ in range(trials):
        for n in levels:
            if not first:
                time.sleep(cooldown)  # let the VM's CPU burst credits refill
            first = False
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(n))
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cdc-only"],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            runs[n].append(json.loads(proc.stdout.strip().splitlines()[-1]))
    best = {n: max(r["events_per_sec"] for r in runs[n]) for n in levels}
    # Calibration-normalized, outlier-robust: scale each trial's throughput
    # by (its probe wall / global MEDIAN probe), then take the MEDIAN
    # normalized trial per level. (A single wild probe reading — observed:
    # 18.3s against a 1.6-1.9s norm — would dominate a min/max scheme.)
    import statistics

    ref = statistics.median(r["calib_s"] for rs in runs.values() for r in rs)
    norm = {
        n: statistics.median(
            r["events_per_sec"] * (r["calib_s"] / ref) for r in runs[n]
        )
        for n in levels
    }
    lo, hi = levels
    eff = (best[hi] / best[lo]) / (hi / lo)
    eff_norm = (norm[hi] / norm[lo]) / (hi / lo)
    out = {
        "metric": "cdc_scaling_efficiency",
        "value": round(eff, 3),
        "value_calibrated": round(eff_norm, 3),
        "unit": "ratio",
        "sf": _sf_from_dir(SF_DIR),
        "levels": {
            str(n): {
                "best_events_per_sec": best[n],
                "best_normalized_events_per_sec": round(norm[n], 1),
                "trials_events_per_sec": [r["events_per_sec"] for r in runs[n]],
                "trials_wall_s": [r["wall_s"] for r in runs[n]],
                "trials_calib_s": [r["calib_s"] for r in runs[n]],
                "trials_ceiling_probe_s": [
                    r.get("ceiling_probe_s") for r in runs[n]
                ],
            }
            for n in levels
        },
    }
    # Machine ceiling: the same fixed pure-ALU md5 job run at each level's
    # own parallelism inside each trial. Its N->4N efficiency is the best any
    # embarrassingly-parallel job can do on this credit-throttled VM at that
    # moment; the workload's efficiency divided by it isolates plan cost
    # from machine cost. Each level's probe reading is taken from the SAME
    # trial that produced that level's best throughput (not best-of-all
    # probes) so the ceiling reflects the machine state of the compared
    # runs, and the ratio is reported UNCLAMPED — a value > 1.0 means the
    # workload out-scaled a pure-ALU job, which is measurement noise (a
    # throttled probe), not a plan property, and should be read as such.
    best_trial = {
        n: max(runs[n], key=lambda r: r["events_per_sec"]) for n in levels
    }
    if all(best_trial[n].get("ceiling_probe_s") for n in levels):
        ceiling = (lo * best_trial[lo]["ceiling_probe_s"]) / (
            hi * best_trial[hi]["ceiling_probe_s"]
        )
        out["machine_ceiling_eff"] = round(ceiling, 3)
        out["plan_eff_vs_ceiling"] = round(eff / ceiling, 3)
    return out


def run_mv_refresh() -> dict:
    """Incremental vs full MV refresh after a NARROW update batch.

    Builds the CDC transcript table from the sf_dir change log, sorted-split
    compacts it (multi-file buckets — the 100 TB layout), bootstraps a
    per-conversation summary, lands one narrow high-LSN update batch
    (~0.7% of conversations), then times (a) the snapshot-diff incremental
    refresh vs (b) a from-scratch full rebuild into a fresh summary. The
    speedup is the point of ``refresh_summary_incremental``: refresh cost
    tracks CHANGED bytes, not table size.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from sql_etl_pipeline_spark.cdc.apply import apply_batch
    from sql_etl_pipeline_spark.cdc.generate import TRANSCRIPT_SCHEMA
    from sql_etl_pipeline_spark.cdc.queries import derive_change_events
    from sql_etl_pipeline_spark.lakehouse import LakeTable
    from sql_etl_pipeline_spark.lakehouse.maintain import (
        refresh_summary_incremental,
    )

    spark = _bench_session("bench-mv")
    tmp = tempfile.mkdtemp(prefix="bench-mv-", dir=FAST_DIR)
    shutil.rmtree(tmp, ignore_errors=True)
    # SPARK_GRAFT_MV_EVENTS=N swaps the sf-dir change log for the Zipf
    # generator at N events — the "larger base" mode (round-3 VERDICT item
    # #4): at sf0.1 the incremental-vs-full gap is driver-floor-bound
    # (~1.4x); the asymptote only shows once the full rebuild has real
    # bytes to chew through.
    gen_events = int(os.environ.get("SPARK_GRAFT_MV_EVENTS", "0"))
    if gen_events:
        schema = TRANSCRIPT_SCHEMA
    else:
        schema = StructType(
            [f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"]
        )
    mv_schema = StructType(
        [
            StructField("conv_id", StringType(), False),
            StructField("n_turns", LongType(), True),
            StructField("total_chars", LongType(), True),
        ]
    )

    def build(df):
        return df.groupBy("conv_id").agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )

    try:
        if gen_events:
            from sql_etl_pipeline_spark.cdc.generate import (
                generate_change_events,
            )

            n_convs = max(gen_events // 400, 100)
            # materialize the log once (a lazy generator plan would be
            # re-derived by every consumer — same lesson as scale_proof)
            generate_change_events(
                spark, gen_events, n_convs=n_convs
            ).write.mode("overwrite").parquet(f"{tmp}/log")
            ev = spark.read.parquet(f"{tmp}/log")
        else:
            ev = derive_change_events(spark, SF_DIR)
        base = LakeTable.create(
            f"{tmp}/base", schema, key_cols=["conv_id", "turn_idx"], num_buckets=32
        )
        apply_batch(base, spark, ev, fence=("b", 0), normalize=False)
        rows = base.read(spark).count()
        # cap rows-per-file (the local stand-in for a fixed ~128 MB file
        # size target), never just file count: with N//(32*4) the 100M-event
        # base got 97k-row files and every O(changed-FILE-bytes) term in the
        # incremental refresh (snapshot-diff read of rewritten COW files,
        # range-pruned recompute scan, summary merge) inflated with table
        # size — measured incremental 9.1 s vs full 7.2 s before this cap.
        base.compact(
            spark,
            sort_within_buckets=True,
            target_file_rows=max(min(rows // (32 * 8), 25_000), 1000),
        )
        summary = LakeTable.create(
            f"{tmp}/mv", mv_schema, key_cols=["conv_id"], num_buckets=32
        )
        refresh_summary_incremental(summary, spark, base, build, ["conv_id"])
        n_groups = summary.read(spark).count()
        # multi-file summary buckets with disjoint sorted ranges: the
        # refresh's merge then rewrites ~1 file per touched bucket instead
        # of the whole summary (same layout lever as the base table)
        summary.compact(
            spark,
            sort_within_buckets=True,
            target_file_rows=max(min(n_groups // (32 * 8), 25_000), 500),
        )

        # lexicographic gotcha: between("c10000","c10999") would also catch
        # every orderkey with prefix 10[0-9]... (~25% of the keyspace).
        # Regex-anchor to exactly 6-digit orderkeys 100000-100999 (~0.7%).
        if gen_events:
            # generator ids are conv-XXXXXXXX: take a ~0.7% mid-range
            # window (away from the Zipf head so "narrow" stays narrow in
            # bytes as well as keys)
            cn = F.substring("conv_id", 6, 8).cast("long")
            lo = n_convs // 2
            win = max(n_convs // 150, 1)
            narrow_filter = (cn >= lo) & (cn < lo + win)
        else:
            narrow_filter = F.col("conv_id").rlike("^c100[0-9]{3}$")
        narrow = (
            ev.filter(narrow_filter)
            .withColumn("lsn", F.col("lsn") + F.lit(10**15))
            .withColumn("op", F.lit("U"))
            .withColumn("text", F.concat(F.col("text"), F.lit(" upd")))
        )
        apply_batch(base, spark, narrow, fence=("b", 1), normalize=False)

        t0 = time.time()
        r = refresh_summary_incremental(summary, spark, base, build, ["conv_id"])
        t_incr = time.time() - t0
        assert r["mode"] == "incremental", r

        summary_full = LakeTable.create(
            f"{tmp}/mv-full", mv_schema, key_cols=["conv_id"], num_buckets=32
        )
        t0 = time.time()
        rf = refresh_summary_incremental(
            summary_full, spark, base, build, ["conv_id"]
        )
        t_full = time.time() - t0
        assert rf["mode"] == "full", rf
        return {
            "metric": "mv_refresh_incremental_vs_full",
            "unit": "sec",
            "sf": _sf_from_dir(SF_DIR),
            "generated_events": gen_events or None,
            "base_rows": rows,
            "summary_groups": n_groups,
            "affected_groups": r["affected_groups"],
            "changed_files_read": r["changed_files_read"],
            "incremental_s": round(t_incr, 3),
            "full_rebuild_s": round(t_full, 3),
            "speedup": round(t_full / t_incr, 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    if "--cdc-only" in sys.argv:
        print(json.dumps(run_cdc_only()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--mv" in sys.argv:
        print(json.dumps(run_mv_refresh()))
    else:
        print(json.dumps(run_suite()))
