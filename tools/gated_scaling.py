"""Probe-gated scaling attempts (round-3 VERDICT item #1).

The sandbox VM is burst-credit throttled: its multi-core ALU ceiling swings
0.56-0.92 across hours, and round 3's six attempts all landed in throttled
windows (all-attempts median 0.78 despite plan_eff_vs_ceiling >= 0.97 in
13/19).  The fix agreed in VERDICT.md: only BURN a paired (local[2],
local[8]) trial when a cheap same-moment probe says the machine can scale
at all — never average throttled windows into the record.

Gate probe: pure-Python multiprocessing md5 over a fixed TOTAL amount of
work, timed at 2 processes and at 8.  A clean machine gives t2/t8 ~= 4
(ceiling ~= 1.0); a throttled one gives ~2.3 (ceiling ~0.58).  The probe
costs ~2 s and no JVM, so it can poll for hours without itself depleting
the credit budget.

Run (inside tmux; one attempt per clean window, stop after --target):

    python tools/gated_scaling.py --target 3 --deadline-min 300

Every gated attempt COUNTS toward --target and is recorded — the gate
(same-moment pre-probe >= --gate) IS the clean-window criterion, and
filtering recorded attempts on their outcome would be cherry-picking.
The post-attempt probe plus the in-JVM ceiling probes are written into
each record so reporting (BENCH/BASELINE.md) can additionally label the
subset whose window is certified on BOTH sides (pre- AND post-probe >=
gate); that labeling happens at reporting time, never in the counting
here.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import os
import sys
import time
from datetime import datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ATTEMPTS = os.path.join(REPO, "BENCH", "scaling_attempts.jsonl")
MARKER = "/tmp/MEASURING"


def _md5_work(n: int) -> str:
    h = hashlib.md5()
    b = b"x" * 8192
    for _ in range(n):
        h.update(b)
    return h.hexdigest()


def _timed(procs: int, per: int) -> float:
    with mp.Pool(procs) as p:
        # warm the pool OUTSIDE the timed window: process spawn (~0.1 s)
        # would otherwise inflate the short 8-proc wall ~15% and read a
        # clean machine as ~0.89 (observed) — a false gate-miss.
        p.map(_md5_work, [1] * procs)
        t0 = time.time()
        p.map(_md5_work, [per] * procs)
        return time.time() - t0


def quick_ceiling(total: int = 320_000) -> dict:
    """2-vs-8-process ALU scaling of the machine RIGHT NOW (fixed total
    work, so perfect scaling gives t8 = t2/4 and ceiling = t2/(4*t8))."""
    t2 = _timed(2, total // 2)
    t8 = _timed(8, total // 8)
    return {"t2": round(t2, 2), "t8": round(t8, 2),
            "ceiling": round(t2 / (4 * t8), 3)}


def next_attempt_no() -> int:
    n = 0
    if os.path.exists(ATTEMPTS):
        with open(ATTEMPTS) as f:
            for line in f:
                try:
                    n = max(n, json.loads(line).get("attempt", 0))
                except json.JSONDecodeError:
                    pass
    return n + 1


def run_one_attempt(gate_probe: dict, trials: int, events: int) -> dict:
    os.environ["SPARK_GRAFT_SCALE_LEVELS"] = "2,8"
    os.environ["SPARK_GRAFT_SCALE_EVENTS"] = str(events)
    os.environ["SPARK_GRAFT_SCALE_TRIALS"] = str(trials)
    os.environ["SPARK_GRAFT_SCALE_COOLDOWN"] = "30"
    import bench

    open(MARKER, "w").write("gated_scaling attempt in flight\n")
    try:
        result = bench.run_scaling()
    finally:
        os.unlink(MARKER)
    post_probe = quick_ceiling()
    rec = {
        "attempt": next_attempt_no(),
        "ts": datetime.now().strftime("%H:%M:%S"),
        "round": 5,
        "note": (
            f"{events // 10**6}M events, levels (2,8), {trials} trials, "
            f"PROBE-GATED (pre-probe ceiling {gate_probe['ceiling']}, "
            f"post-probe {post_probe['ceiling']})"
        ),
        "gate_probe": gate_probe,
        "post_probe": post_probe,
        "result": result,
    }
    with open(ATTEMPTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", type=float, default=0.9)
    ap.add_argument("--target", type=int, default=3,
                    help="clean-window attempts to land before stopping")
    ap.add_argument("--deadline-min", type=float, default=300)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--events", type=int, default=12_000_000)
    ap.add_argument("--poll-s", type=int, default=240)
    ap.add_argument("--post-attempt-rest-s", type=int, default=900,
                    help="credit-refill idle after any attempt (memory: "
                    "clean windows ~hourly, >=15 min gaps)")
    args = ap.parse_args()

    t_end = time.time() + args.deadline_min * 60
    clean = 0
    while clean < args.target and time.time() < t_end:
        if os.path.exists("/tmp/DEVBUSY"):
            print(json.dumps({"ev": "skip", "why": "DEVBUSY marker"}), flush=True)
            time.sleep(60)
            continue
        probe = quick_ceiling()
        print(json.dumps({"ev": "probe", **probe}), flush=True)
        if probe["ceiling"] < args.gate:
            time.sleep(args.poll_s)
            continue
        rec = run_one_attempt(probe, args.trials, args.events)
        res = rec["result"]
        # every gated attempt counts toward --target: the gate (same-moment
        # pre-probe >= gate ceiling) IS the clean-window criterion — do NOT
        # filter on the measured efficiency (that would be cherry-picking)
        # or on the in-JVM ceiling probes (they run right after the timed
        # apply, on the credits it just depleted, so they structurally
        # under-read single-trial windows).
        clean += 1
        print(json.dumps({
            "ev": "attempt", "attempt": rec["attempt"],
            "raw_eff": res.get("value"),
            "cal_eff": res.get("value_calibrated"),
            "in_jvm_ceiling": res.get("machine_ceiling_eff"),
            "plan_vs_ceiling": res.get("plan_eff_vs_ceiling"),
            "post_probe": rec["post_probe"]["ceiling"],
            "gated_attempts": clean,
        }), flush=True)
        time.sleep(args.post_attempt_rest_s)
    print(json.dumps({"ev": "done", "clean_attempts": clean}), flush=True)

_BW_BUF = 256 * (1 << 20)


def _bw_work(passes: int) -> float:
    """Stream-copy a fixed 256 MB pair; pages faulted before timing."""
    import numpy as np

    a = np.ones(_BW_BUF // 8, dtype=np.float64)
    b = np.empty_like(a)
    np.copyto(b, a)
    np.copyto(a, b)  # fault pages before timing
    t0 = time.time()
    for _ in range(passes):
        np.copyto(b, a)
        np.copyto(a, b)
    return time.time() - t0


def membw_ceiling(total_stream_bytes: int = 48 * (1 << 30)) -> dict:
    """2-vs-8-process MEMORY-BANDWIDTH scaling of the machine right now.

    The ALU probe (quick_ceiling) runs md5 over an 8 KB cache-resident
    buffer — it measures core/credit throttling and is blind to the memory
    bus. Byte-streaming workloads (parquet scan -> shuffle -> parquet
    write with little compute per byte) are bounded instead by DRAM
    bandwidth, which on this single box is SHARED across cores: measured
    ~26 GB/s at 2 procs vs ~47 GB/s at 8, i.e. a ~0.45 N->4N efficiency
    ceiling for any memory-bound job regardless of plan quality. On a real
    cluster each executor brings its own memory bus, so this ceiling is a
    single-box artifact — which is exactly why it must be probed and
    reported next to raw efficiency (tools/submit_proof.py) instead of
    letting a byte-bound 0.48 read as a plan defect.

    Equal TOTAL bytes streamed at both levels; fixed per-proc buffers
    faulted OUTSIDE the timed window (first-touch page faults otherwise
    dominate and the reading goes superlinear-nonsense).
    """

    def timed_bw(procs: int) -> float:
        per_pass = _BW_BUF * 2 * 2  # two copies, each read+write
        passes = max(int(total_stream_bytes / (procs * per_pass)), 1)
        with mp.Pool(procs) as p:
            p.map(_bw_work, [1] * procs)  # warm pool + allocator
            t0 = time.time()
            p.map(_bw_work, [passes] * procs)
            return time.time() - t0

    t2 = timed_bw(2)
    t8 = timed_bw(8)
    return {
        "t2": round(t2, 2),
        "t8": round(t8, 2),
        "GBps_at_2": round(total_stream_bytes / t2 / 1e9, 1),
        "GBps_at_8": round(total_stream_bytes / t8 / 1e9, 1),
        "membw_ceiling": round(t2 / (4 * t8), 3),
    }


if __name__ == "__main__":
    main()
