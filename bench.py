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


def run_cdc_apply(spark, sf_dir: str, n_batches: int = 4) -> dict:
    """End-to-end CDC apply: derive the change log from lineitem, apply it
    in fenced micro-batches to a fresh LakeTable, return events/sec."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from sql_etl_pipeline_spark.cdc.apply import apply_batch
    from sql_etl_pipeline_spark.cdc.generate import TRANSCRIPT_SCHEMA
    from sql_etl_pipeline_spark.cdc.queries import derive_change_events
    from sql_etl_pipeline_spark.lakehouse import LakeTable

    ev = derive_change_events(spark, sf_dir).cache()
    n_events = ev.count()  # cache warm; excluded from apply timing
    tmp = tempfile.mkdtemp(prefix="bench-cdc-")
    shutil.rmtree(tmp, ignore_errors=True)
    schema = StructType([f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"])
    table = LakeTable.create(tmp, schema, key_cols=["conv_id", "turn_idx"], num_buckets=32)
    t0 = time.time()
    try:
        for i in range(n_batches):
            batch = ev.filter(F.pmod(F.col("lsn"), F.lit(n_batches)) == i)
            apply_batch(table, spark, batch, fence=("bench", i), normalize=False)
        wall = time.time() - t0
        final_rows = table.read(spark).count()
    finally:
        ev.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)
    return {
        "wall_s": round(wall, 3),
        "events": n_events,
        "events_per_sec": round(n_events / wall, 1),
        "final_rows": final_rows,
    }


def run_suite() -> dict:
    from sql_etl_pipeline_spark.session import build_session

    import __spark_entry__ as entrymod

    spark = build_session(
        "bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    qs = entrymod.queries()
    names = list(HEADLINE)
    for n in DATAPIPE_HEADLINE:
        if n in qs:
            names.append(n)

    t_all = time.time()
    cdc = run_cdc_apply(spark, SF_DIR)
    timings: dict[str, float] = {"cdc_apply": cdc["wall_s"]}
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
    }


def run_cdc_only() -> dict:
    """Subprocess entry for --scaling: one CDC apply at $SPARK_GRAFT_CPUS."""
    from sql_etl_pipeline_spark.session import build_session

    spark = build_session(
        "bench-cdc", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    out = run_cdc_apply(spark, SF_DIR)
    spark.stop()
    return out


def run_scaling(levels=(8, 32)) -> dict:
    """Run the identical CDC apply at two parallelism levels in fresh JVMs
    and report throughput at both plus scaling efficiency (north_rule)."""
    results = {}
    for n in levels:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cdc-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        results[n] = json.loads(proc.stdout.strip().splitlines()[-1])
    lo, hi = levels
    eff = (results[hi]["events_per_sec"] / results[lo]["events_per_sec"]) / (hi / lo)
    return {
        "metric": "cdc_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": _sf_from_dir(SF_DIR),
        "levels": {
            str(n): {
                "events_per_sec": results[n]["events_per_sec"],
                "wall_s": results[n]["wall_s"],
            }
            for n in levels
        },
    }


if __name__ == "__main__":
    if "--cdc-only" in sys.argv:
        print(json.dumps(run_cdc_only()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_suite()))
