"""Rule-literal deployability + scaling proof via real ``spark-submit``.

north_rule asks for the engine to be "run via spark-submit --py-files on a
multi-executor cluster at two cluster sizes (N and 4N executors)".  The
sandbox has no multi-HOST cluster, so cluster-size is evidenced (per the
standing protocol in BENCH/BASELINE.md) by two parallelism levels on the
same input — but until round 4 every measurement ran the package
in-process from the repo tree.  This tool closes the invocation-form gap:

* the package is zipped (``sql_etl_pipeline_spark.zip``) and shipped with
  ``--py-files``; the job script lives OUTSIDE the repo tree and asserts
  ``sql_etl_pipeline_spark.__file__`` resolves inside the zip — i.e. what
  ran is the deployable artifact, not the checkout;
* the job is launched with ``spark-submit --master local[N]`` at the two
  standing-protocol levels (2, 8) against the SAME materialized change
  log (written once, read by both runs);
* each run replays the log through the CLI verbs (``init`` + ``replay``,
  the pipelined backfill path) and prints throughput plus a final-state
  checksum — the two levels must be byte-identical (cross-parallelism
  determinism, the same invariant the replay/crash tests assert);
* attempts are probe-gated exactly like tools/gated_scaling.py: a paired
  trial only burns when the same-moment 2-vs-8-process ALU ceiling is
  >= --gate (this VM is burst-credit throttled; see BENCH/BASELINE.md
  "Environment instability").

``--standalone`` goes one step further than ``--master local[N]``: it
boots a REAL Spark standalone cluster on this host (separate master,
worker, and executor JVMs; loopback RPC shuffle; Arrow python workers per
executor) and compares the same job at **1 executor vs 4 executors**
(2 cores each, ``--executor-cores 2 --total-executor-cores {2,8}``) —
the rule's "N and 4N executors" literally, minus only the multi-host
network. The lake's file-based commit protocol assumes shared storage
(as any lakehouse does); on one host /dev/shm plays that role.

Run:  python tools/submit_proof.py                 # gated, 12M events
      python tools/submit_proof.py --smoke         # plumbing check, 500k
      python tools/submit_proof.py --standalone --events 24000000 --batches 1
Writes BENCH/submit_proof[_standalone]_b{batches}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from gated_scaling import membw_ceiling, quick_ceiling  # noqa: E402

FAST = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
WORK = os.path.join(FAST, "submit_proof")
OUT = os.path.join(REPO, "BENCH", "submit_proof.json")

# The job script is written OUTSIDE the repo tree so that
# ``import sql_etl_pipeline_spark`` can only resolve via the --py-files
# zip (python puts the script's own directory on sys.path, not the repo).
_JOB = '''\
import json, shutil, sys, tempfile, time

import sql_etl_pipeline_spark as pkg
from pyspark.sql import functions as F

from sql_etl_pipeline_spark.cdc.apply import apply_batch
from sql_etl_pipeline_spark.cdc.generate import (
    TRANSCRIPT_SCHEMA,
    generate_change_events,
)
from sql_etl_pipeline_spark.cli import main as cli_main
from sql_etl_pipeline_spark.lakehouse.table import LakeTable
from sql_etl_pipeline_spark.session import build_session

table_path, events_path, batches, work = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4],
)
# master=None: build_session must honor spark-submit's --master (the
# deployability contract this proof exists to exercise).
spark = build_session("submit-proof")
master = spark.sparkContext.master

# Warmup outside the timed window: codegen/JIT are per-JVM constants a
# real cluster pays once per executor lifetime, not per batch (same
# convention as bench.run_cdc_only).
wtmp = tempfile.mkdtemp(prefix="warm-", dir=work)
warm = LakeTable.create(
    wtmp, TRANSCRIPT_SCHEMA, key_cols=["conv_id", "turn_idx"],
    num_buckets=32,
)
apply_batch(warm, spark, generate_change_events(spark, 100_000), fence=("w", 0))
shutil.rmtree(wtmp, ignore_errors=True)

cli_main(["init", "--path", table_path, "--buckets", "32",
          "--merge-mode", "cow"])
n_events = spark.read.parquet(events_path).count()
t0 = time.time()
cli_main(["replay", "--path", table_path, "--events", events_path,
          "--batches", str(batches), "--stream-id", "submit"])
wall = time.time() - t0

final = LakeTable(table_path).read(spark)
cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
chk = final.agg(
    F.count("*").alias("n"), F.sum(F.xxhash64(*cols)).alias("h")
).collect()[0]
infos = spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
print("SUBMIT_RESULT " + json.dumps({
    "master": master,
    "pkg_file": pkg.__file__,
    "imported_from_zip": ".zip" in pkg.__file__,
    "executors_incl_driver": len(infos),
    "events": n_events,
    "wall_s": round(wall, 3),
    "events_per_sec": round(n_events / wall, 1),
    "rows": int(chk["n"]),
    "checksum": int(chk["h"]),
}), flush=True)
spark.stop()
'''


# ALU-bound, zero-input, zero-shuffle CONTROL job for the same cluster
# shapes: spark.range -> chained xxhash64 (whole-stage codegen, register-
# resident) -> single-row sum. If THIS scales ~1.0 at 1-vs-4 executor JVMs
# while the byte-heavy replay caps at ~0.4 in the same windows, the gap is
# the box's shared DRAM bus (and the replay's byte path), not the cluster
# form, the deployment, or the plan's parallelism structure.
_CONTROL_JOB = '''\
import json, sys, time

import sql_etl_pipeline_spark as pkg
from pyspark.sql import functions as F

from sql_etl_pipeline_spark.session import build_session

rows, chain = int(sys.argv[1]), int(sys.argv[2])
spark = build_session("submit-control")
master = spark.sparkContext.master
# fixed TOTAL work; 4 tasks per core so stragglers amortize
parts = 4 * spark.sparkContext.defaultParallelism

def run(n):
    col = F.col("id")
    for _ in range(chain):
        col = F.xxhash64(col)
    return spark.range(0, n, 1, parts).agg(
        F.sum(col).alias("s"), F.count("*").alias("n")
    ).collect()[0]

run(rows // 20)  # warmup: codegen + JIT outside the timed window
t0 = time.time()
r = run(rows)
wall = time.time() - t0
infos = spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
print("SUBMIT_RESULT " + json.dumps({
    "master": master,
    "pkg_file": pkg.__file__,
    "imported_from_zip": ".zip" in pkg.__file__,
    "executors_incl_driver": len(infos),
    "events": int(r["n"]),
    "wall_s": round(wall, 3),
    "events_per_sec": round(int(r["n"]) / wall, 1),
    "rows": int(r["n"]),
    "checksum": int(r["s"]),
}), flush=True)
spark.stop()
'''


def build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "sql_etl_pipeline_spark.zip")
    src = os.path.join(REPO, "sql_etl_pipeline_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(src):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return zpath


def materialize_events(events_path: str, n: int) -> None:
    """Write the change log ONCE; both levels read the same bytes."""
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from sql_etl_pipeline_spark.session import build_session\n"
        "from sql_etl_pipeline_spark.cdc.generate import generate_change_events\n"
        "spark = build_session('gen', master='local[8]')\n"
        # A real log tail is many segment files. repartitionByRange on lsn
        # keeps files lsn-contiguous (so each replay batch's lsn-range
        # filter still file-prunes) while giving every batch enough file
        # splits to feed all cores — with the writer's native ~16 files a
        # half-range batch saw only ~8 scan tasks and local[8] idled half
        # its cores through the scan (measured: it cost ~0.3 efficiency).
        "generate_change_events(spark, %d, n_convs=max(%d // 400, 100),\n"
        "    skew=2.0, delete_frac=0.001, dup_frac=0.01, ooo_frac=0.01\n"
        ").repartitionByRange(48, 'lsn')"
        ".write.mode('overwrite').parquet(%r)\n"
        "spark.stop()\n" % (REPO, n, n, events_path)
    )
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   capture_output=True, text=True)


STANDALONE_MASTER = "spark://127.0.0.1:7077"

# --pin-cpus: the driver gets the same fixed 2-CPU allotment at BOTH
# levels (a real cluster's driver node doesn't grow with executor count);
# executors get exactly `level` CPUs. Without pinning, the 1-executor leg
# on an otherwise-idle 32-CPU box enjoys a free-roaming driver JVM plus
# free cores for GC/netty/python overhead threads — a ~50% resource
# subsidy at N=1 executors that no real cluster gives, structurally
# capping measured N->4N efficiency at ~0.75 even for a perfect plan
# (3 effective cores vs 9).
_NCPU = os.cpu_count() or 32
DRIVER_CPUS = f"{_NCPU - 2},{_NCPU - 1}"


def _pgrep_one(pattern: str) -> int | None:
    out = subprocess.run(["pgrep", "-f", pattern], capture_output=True,
                         text=True)
    pids = [int(p) for p in out.stdout.split()]
    return pids[0] if pids else None


def pin_cluster(level: int) -> None:
    """Pin the worker JVM (and therefore every executor/python worker it
    forks from now on — affinity is inherited) to CPUs [0, level), and the
    master JVM to the fixed driver CPUs. Called per leg BEFORE
    spark-submit, while the per-submission executors don't exist yet."""
    worker = _pgrep_one("org.apache.spark.deploy.worker.Worker")
    master = _pgrep_one("org.apache.spark.deploy.master.Master")
    if worker is None:
        raise RuntimeError("worker JVM not found for --pin-cpus")
    subprocess.run(["taskset", "-a", "-pc", f"0-{level - 1}", str(worker)],
                   check=True, capture_output=True)
    if master is not None:
        subprocess.run(["taskset", "-a", "-pc", DRIVER_CPUS, str(master)],
                       check=True, capture_output=True)


def start_cluster() -> None:
    """Boot a single-host standalone cluster: one master JVM + one 8-core
    worker JVM. Executors (separate JVMs again) are carved out of the
    worker per submission via --executor-cores/--total-executor-cores."""
    import urllib.request

    sbin = "/opt/spark/sbin"
    env = dict(
        os.environ,
        SPARK_MASTER_HOST="127.0.0.1",
        SPARK_MASTER_PORT="7077",
        SPARK_MASTER_WEBUI_PORT="8080",
        SPARK_WORKER_CORES="8",
        SPARK_WORKER_MEMORY="48g",
        SPARK_WORKER_PORT="7178",
        SPARK_WORKER_WEBUI_PORT="8081",
    )
    subprocess.run([f"{sbin}/start-master.sh"], env=env, check=True,
                   capture_output=True, text=True)
    subprocess.run([f"{sbin}/start-worker.sh", STANDALONE_MASTER], env=env,
                   check=True, capture_output=True, text=True)
    for _ in range(30):
        try:
            with urllib.request.urlopen(
                "http://127.0.0.1:8080/json", timeout=2
            ) as r:
                st = json.load(r)
            if any(w.get("state") == "ALIVE" for w in st.get("workers", [])):
                return
        except Exception:
            pass
        time.sleep(1)
    raise RuntimeError("standalone worker did not register with the master")


def stop_cluster() -> None:
    sbin = "/opt/spark/sbin"
    subprocess.run([f"{sbin}/stop-worker.sh"], capture_output=True)
    subprocess.run([f"{sbin}/stop-master.sh"], capture_output=True)


def run_level(level: int, zpath: str, job: str, events_path: str,
              batches: int, standalone: bool = False,
              exec_cores: int = 2, exec_mem: str = "6g",
              pin: bool = False,
              job_args: list | None = None) -> dict:
    table = os.path.join(WORK, f"table-l{level}")
    shutil.rmtree(table, ignore_errors=True)
    if job_args is None:
        job_args = [table, events_path, str(batches), WORK]
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(level))
    if standalone:
        # N vs 4N EXECUTORS: level is total cores, so with the default
        # --executor-cores 2 that is 1 vs 4 executor JVMs; with
        # --executor-cores 1 it is 2 vs 8 — the latter makes BOTH legs
        # pay cross-JVM shuffle (1 executor keeps every shuffle block
        # process-local, a single-box subsidy the lo leg doesn't get on
        # a real cluster).
        master_args = [
            "--master", STANDALONE_MASTER,
            "--executor-cores", str(exec_cores),
            "--executor-memory", exec_mem,
            "--total-executor-cores", str(level),
        ]
    else:
        master_args = ["--master", f"local[{level}]"]
    cmd = [
        "spark-submit",
        *master_args,
        "--driver-memory", "8g",
        "--py-files", zpath,
        job, *[str(a) for a in job_args],
    ]
    if pin and standalone:
        pin_cluster(level)
        # the driver (spark-submit JVM + its python) lives on the same
        # fixed 2 CPUs at both levels — a constant-size driver node
        cmd = ["taskset", "-c", DRIVER_CPUS] + cmd
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          cwd=WORK)
    line = next(
        (ln for ln in proc.stdout.splitlines()
         if ln.startswith("SUBMIT_RESULT ")),
        None,
    )
    if proc.returncode != 0 or line is None:
        sys.stderr.write(proc.stdout[-3000:] + "\n" + proc.stderr[-3000:])
        raise RuntimeError(f"spark-submit at level {level} failed")
    shutil.rmtree(table, ignore_errors=True)
    rec = json.loads(line[len("SUBMIT_RESULT "):])
    if standalone:
        want = level // exec_cores
        got = rec["executors_incl_driver"] - 1
        if got != want:
            raise RuntimeError(
                f"expected {want} executors at level {level}, saw {got}"
            )
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=12_000_000)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--gate", type=float, default=0.9)
    ap.add_argument("--deadline-min", type=float, default=120)
    ap.add_argument("--poll-s", type=int, default=240)
    ap.add_argument("--cooldown-s", type=int, default=45)
    ap.add_argument("--trials", type=int, default=1,
                    help="interleaved trials per level (lo,hi,lo,hi,...), "
                    "best-of per level — the same credit-throttle defense "
                    "the local-mode scaling protocol uses: a sequential "
                    "lo-then-hi single pass burns ~2.5 min of max-CPU at "
                    "lo and hands hi a drained burst budget (measured: an "
                    "0.932-gated window collapsed to membw ceiling 0.581 "
                    "by the time hi ran, raw 0.317)")
    ap.add_argument("--smoke", action="store_true",
                    help="500k events (10M rows in --control mode), "
                    "no gate, no cooldown")
    ap.add_argument("--standalone", action="store_true",
                    help="boot a real standalone cluster and compare "
                    "N vs 4N executors instead of local[N]")
    ap.add_argument("--executor-cores", type=int, default=2,
                    help="standalone cores per executor JVM: 2 -> 1 vs 4 "
                    "executors at levels (2,8); 1 -> 2 vs 8 executors "
                    "(both legs pay cross-JVM shuffle)")
    ap.add_argument("--gate-each-leg", action="store_true",
                    help="re-certify the burst budget (probe >= --gate) "
                    "before EVERY leg, sleeping --poll-s between probes, "
                    "instead of only once per attempt")
    ap.add_argument("--pin-cpus", action="store_true",
                    help="standalone only: taskset executors to exactly "
                    "`level` CPUs per leg and the driver/master to a "
                    "fixed 2-CPU set at BOTH levels — the real-cluster "
                    "shape (constant driver node, N vs 4N executor "
                    "CPUs). Removes the ~50%% free-core subsidy the "
                    "1-executor leg otherwise gets from a free-roaming "
                    "driver JVM on an idle 32-CPU box")
    ap.add_argument("--executor-memory", default=None,
                    help="standalone per-executor heap (default: sized so "
                    "the max executor count fits the 48g worker)")
    ap.add_argument("--control", action="store_true",
                    help="run the ALU-bound zero-shuffle CONTROL job "
                    "(spark.range -> chained xxhash64 -> sum) instead of "
                    "the CDC replay, on the same cluster shapes: "
                    "isolates whether the infrastructure scales when the "
                    "job moves no bytes")
    # 960M rows ~= 47 s at local[2] (measured 20.3M rows/s on 2 cores):
    # long enough that per-job scheduling overhead (<1 s) is noise at
    # BOTH levels, short enough not to drain the burst budget mid-leg
    ap.add_argument("--control-rows", type=int, default=960_000_000)
    ap.add_argument("--control-chain", type=int, default=16)
    ap.add_argument("--out-suffix", default="",
                    help="extra suffix for the BENCH record filename, so "
                    "a re-run doesn't overwrite a prior record of the "
                    "same config (e.g. --out-suffix _r5)")
    ap.add_argument("--membw-floor", type=float, default=None,
                    help="with --gate-each-leg: additionally require the "
                    "same-moment single-box bus probe to read at least "
                    "this many GB/s at 2 procs before every leg (the ALU "
                    "probe is blind to the byte budget; byte-bound legs "
                    "need the bus certified too). Also records a post-leg "
                    "bus probe on every leg")
    args = ap.parse_args()
    if args.membw_floor is not None and not args.gate_each_leg:
        ap.error("--membw-floor only takes effect with --gate-each-leg "
                 "(the bus check lives in the per-leg gate loop)")
    # sorted: efficiency below divides hi-throughput by lo-throughput —
    # "--levels 8,2" must not silently record (eps2/eps8)/(2/8) ~ 5.0
    levels = tuple(sorted(int(x) for x in args.levels.split(",")))
    n = 500_000 if args.smoke else args.events
    exec_cores = args.executor_cores
    exec_mem = args.executor_memory or (
        "%dg" % max(2, min(6, 40 // max(max(levels) // exec_cores, 1)))
    )

    os.makedirs(WORK, exist_ok=True)
    zpath = build_zip(WORK)
    if args.control:
        n = args.control_rows if not args.smoke else 10_000_000
        job = os.path.join(WORK, "control_job.py")
        with open(job, "w") as f:
            f.write(_CONTROL_JOB)
        job_args = [n, args.control_chain]
        events_path = None
    else:
        events_path = os.path.join(WORK, f"events-{n}")
        job = os.path.join(WORK, "submit_job.py")
        with open(job, "w") as f:
            f.write(_JOB)
        job_args = None
        # _SUCCESS guards against reusing a log from a run killed mid-write
        # (Spark creates the directory first, so isdir alone would replay
        # both levels against a silently truncated log).
        if not os.path.exists(os.path.join(events_path, "_SUCCESS")):
            shutil.rmtree(events_path, ignore_errors=True)
            materialize_events(events_path, n)

    gate_probe = None
    if not args.smoke:
        t_end = time.time() + args.deadline_min * 60
        while True:
            gate_probe = quick_ceiling()
            print(json.dumps({"ev": "probe", **gate_probe}), flush=True)
            if gate_probe["ceiling"] >= args.gate:
                break
            if time.time() > t_end:
                print(json.dumps({"ev": "giveup"}), flush=True)
                return
            time.sleep(args.poll_s)

    trials: dict[int, list] = {lv: [] for lv in levels}
    if args.standalone:
        start_cluster()
    try:
        first = True
        for t in range(max(args.trials, 1)):
            # Alternate which level goes first: with burst-credit
            # throttling, whichever leg runs second inherits a partly
            # drained budget — alternating gives BOTH levels fresh-budget
            # shots, and best-of per level then compares like with like.
            order = levels if t % 2 == 0 else tuple(reversed(levels))
            for lv in order:
                if not first and not args.smoke:
                    time.sleep(args.cooldown_s)
                first = False
                leg_probe = None
                leg_membw = None
                if args.gate_each_leg and not args.smoke:
                    # A max-CPU leg drains the VM's burst budget faster
                    # than a fixed cooldown refills it (measured: a
                    # 0.923-gated attempt's SECOND leg ran 4.6x slow).
                    # So certify the budget before EVERY leg: sleep until
                    # the same quick probe that gates the attempt reads
                    # clean again. Best-of per level then pairs
                    # fresh-budget legs on both sides — the question the
                    # standing protocol asks ("does the plan scale when
                    # the machine can"), with every leg still recorded.
                    t_leg = time.time() + args.deadline_min * 60
                    while True:
                        # reset per probe iteration: on a giveup_leg break
                        # a reading from an EARLIER iteration must not be
                        # recorded as the same-moment pre-leg bus state
                        leg_membw = None
                        leg_probe = quick_ceiling()
                        print(json.dumps({"ev": "leg_probe", "trial": t,
                                          "level": lv, **leg_probe}),
                              flush=True)
                        if leg_probe["ceiling"] >= args.gate:
                            if args.membw_floor is None:
                                break
                            # the ALU probe is blind to the byte budget;
                            # a small stream (12 GiB) checks bus health
                            # without itself draining much of it
                            leg_membw = membw_ceiling(12 * (1 << 30))
                            print(json.dumps({"ev": "leg_membw",
                                              "trial": t, "level": lv,
                                              **leg_membw}), flush=True)
                            if leg_membw["GBps_at_2"] >= args.membw_floor:
                                break
                        if time.time() > t_leg:
                            print(json.dumps({"ev": "giveup_leg"}),
                                  flush=True)
                            break
                        time.sleep(args.poll_s)
                r = run_level(
                    lv, zpath, job, events_path, args.batches,
                    standalone=args.standalone,
                    exec_cores=exec_cores, exec_mem=exec_mem,
                    pin=args.pin_cpus, job_args=job_args,
                )
                if leg_probe is not None:
                    r["leg_probe_ceiling"] = leg_probe["ceiling"]
                if leg_membw is not None:
                    r["leg_membw_pre"] = leg_membw
                    post_mb = membw_ceiling(12 * (1 << 30))
                    r["leg_membw_post"] = post_mb
                    print(json.dumps({"ev": "leg_membw_post", "trial": t,
                                      "level": lv, **post_mb}), flush=True)
                trials[lv].append(r)
                print(json.dumps({"ev": "level", "trial": t, "level": lv,
                                  **r}), flush=True)
    finally:
        if args.standalone:
            stop_cluster()
    # best-of per level; every trial stays in the record
    results = {
        lv: max(rs, key=lambda r: r["events_per_sec"])
        for lv, rs in trials.items()
    }
    for lv in levels:
        results[lv] = dict(
            results[lv],
            trials_events_per_sec=[r["events_per_sec"] for r in trials[lv]],
            trials_wall_s=[r["wall_s"] for r in trials[lv]],
        )
    post_probe = None if args.smoke else quick_ceiling()
    # The replay over a PRE-MATERIALIZED log is byte-streaming-heavy
    # (scan -> shuffle -> parquet write, little compute per byte), so the
    # relevant single-box ceiling is DRAM bandwidth, not ALU — probe it
    # at the same moment so raw efficiency can be read against it.
    membw = None if args.smoke else membw_ceiling()

    rec = {
        "metric": (
            "spark-submit --py-files ALU-bound zero-shuffle CONTROL "
            f"(range -> xxhash64^{args.control_chain} -> sum) at two "
            "parallelism levels"
            if args.control else
            "spark-submit --py-files CDC replay at two parallelism "
            "levels (same materialized log)"
        ),
        "form": (
            "standalone cluster: %d vs %d executor JVMs, %d core(s) each"
            % (levels[0] // exec_cores, levels[-1] // exec_cores,
               exec_cores)
            if args.standalone else "local[N] threads"
        ),
        "pinned_cpus": (
            {"executors": "0..level-1 (exactly N CPUs per leg)",
             "driver_and_master": DRIVER_CPUS}
            if args.pin_cpus and args.standalone else None
        ),
        "events": n,
        # the control job is a single range->hash->sum action; a batch
        # count would be misleading provenance in its record
        "batches": None if args.control else args.batches,
        "levels": {str(k): v for k, v in results.items()},
        "state_identical": len(
            {(r["rows"], r["checksum"]) for r in results.values()}
        ) == 1,
        "imported_from_zip": all(
            r["imported_from_zip"] for r in results.values()
        ),
        "gate_probe": gate_probe,
        "post_probe": post_probe,
        "membw_probe": membw,
    }
    if len(levels) == 2:
        lo, hi = levels
        rec["scaling_efficiency_raw"] = round(
            (results[hi]["events_per_sec"] / results[lo]["events_per_sec"])
            / (hi / lo), 3,
        )
        if membw:
            rec["eff_vs_membw_ceiling"] = round(
                rec["scaling_efficiency_raw"] / membw["membw_ceiling"], 3
            )
    if not args.smoke:
        suffix = "_standalone" if args.standalone else ""
        if args.standalone and exec_cores != 2:
            suffix += f"_ec{exec_cores}"
        if args.pin_cpus and args.standalone:
            suffix += "_pinned"
        if args.control:
            suffix += "_control"
        out = OUT.replace(
            ".json", f"{suffix}_b{args.batches}{args.out_suffix}.json"
        )
        with open(out, "w") as f:
            json.dump(rec, f, indent=2)
            f.write("\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
