"""Command-line entry point — the engine's ``main.py`` parity surface.

Mirrors the reference CLI (``/root/reference/main.py:23-66``:
``run|test|incremental|status|setup``) with the streaming-native verbs:

    init       create a transcripts LakeTable            (~ setup)
    apply      apply one batch of change-event files     (~ run)
    stream     tail a log directory with checkpointing   (~ incremental)
    status     print per-commit lineage as JSON lines    (~ status)
    compact    rewrite buckets, optionally purge tombstones
    vacuum     delete unreferenced data files

Designed for ``spark-submit --py-files sql_etl_pipeline_spark.zip -m ...``
or plain ``python -m sql_etl_pipeline_spark.cli ...`` locally; the session
comes from ``session.build_session`` so every scale-relevant conf has one
home.
"""

from __future__ import annotations

import argparse
import json
import sys

from .cdc.apply import apply_batch
from .cdc.generate import TRANSCRIPT_SCHEMA, change_event_schema
from .functions.io import _OPTS as _CSV_OPTS
from .lakehouse.table import LakeTable
from .session import build_session
from .streaming.ingest import CdcStreamIngestor


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sql_etl_pipeline_spark")
    p.add_argument("--master", default=None, help="override spark master")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("init", help="create an empty transcripts table")
    sp.add_argument("--path", required=True)
    sp.add_argument("--buckets", type=int, default=16)
    sp.add_argument(
        "--merge-mode",
        choices=["cow", "mor"],
        default="cow",
        help="cow: rewrite-on-merge (read-optimized); mor: append-delta "
        "merges resolved at read, folded by compact (write-optimized)",
    )

    sp = sub.add_parser("apply", help="apply one batch of change events")
    sp.add_argument("--path", required=True)
    sp.add_argument("--events", required=True, help="parquet path of events")
    sp.add_argument("--fence", default=None, help="stream_id:batch_id")
    sp.add_argument("--no-normalize", action="store_true")

    sp = sub.add_parser("stream", help="tail a change-log directory")
    sp.add_argument("--path", required=True)
    sp.add_argument("--source", required=True)
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--stream-id", default="cdc")
    sp.add_argument("--max-files", type=int, default=None)
    sp.add_argument("--format", default="parquet")
    sp.add_argument(
        "--source-option",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="reader option (repeatable); for --format csv the write_csv "
        "options (header, nullValue, quoting) are applied by default",
    )
    sp.add_argument("--compact-every", type=int, default=None)
    sp.add_argument("--tombstone-lsn-lag", type=int, default=None)

    sp = sub.add_parser(
        "replay",
        help="bounded backfill: split an event directory into LSN-range "
        "micro-batches and apply them with one-batch-lookahead pipelining "
        "(batch i+1's reduce overlaps batch i's merge/commit)",
    )
    sp.add_argument("--path", required=True)
    sp.add_argument("--events", required=True, help="parquet path of events")
    sp.add_argument("--batches", type=int, default=4)
    sp.add_argument("--stream-id", default="replay")
    sp.add_argument("--no-normalize", action="store_true")
    sp.add_argument(
        "--first-batch-id",
        type=int,
        default=None,
        help="explicit fence start; default continues after the stream's "
        "last recorded fence, so a re-run with new events in the directory "
        "re-applies everything idempotently (LWW makes old events no-ops) "
        "instead of silently fencing the whole run out",
    )

    sp = sub.add_parser("status", help="print lineage records")
    sp.add_argument("--path", required=True)

    sp = sub.add_parser("compact")
    sp.add_argument("--path", required=True)
    sp.add_argument("--purge-below-lsn", type=int, default=None)
    sp.add_argument(
        "--buckets", type=int, default=None,
        help="re-bucket to this count (partition-spec evolution)",
    )
    sp.add_argument(
        "--sort", action="store_true",
        help="sort rows by key within each bucket (tighter file stats)",
    )
    sp.add_argument(
        "--target-file-rows", type=int, default=None,
        help="split output files at N rows (with --sort: disjoint key ranges)",
    )

    sp = sub.add_parser("vacuum")
    sp.add_argument("--path", required=True)
    sp.add_argument("--expire-keep-last", type=int, default=None)
    sp.add_argument(
        "--grace-seconds",
        type=float,
        default=600.0,
        help="never delete files younger than this (in-flight writer guard); "
        "0 only when all writers are quiesced",
    )

    sp = sub.add_parser(
        "analytics",
        help="run the analytics suite and export CSVs "
        "(parity with the reference's sql_query_executor runner)",
    )
    sp.add_argument("--sf-dir", required=True, help="directory of input parquet")
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--queries", nargs="*", default=None, help="subset by name")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)

    if args.cmd == "status":  # no Spark needed
        for rec in LakeTable(args.path).lineage_records():
            print(json.dumps(rec))
        return 0
    if args.cmd == "vacuum":
        t = LakeTable(args.path)
        expired = (
            t.expire_snapshots(args.expire_keep_last)
            if args.expire_keep_last
            else 0
        )
        removed = t.vacuum(grace_seconds=args.grace_seconds)
        print(json.dumps({"snapshots_expired": expired, "files_removed": removed}))
        return 0

    from pyspark.sql import SparkSession

    # only stop the session if this invocation created it (embedded callers
    # — tests, notebooks — keep theirs)
    owned = SparkSession.getActiveSession() is None
    spark = build_session("cdc-cli", master=args.master)
    try:
        if args.cmd == "init":
            LakeTable.create(
                args.path,
                TRANSCRIPT_SCHEMA,
                key_cols=["conv_id", "turn_idx"],
                num_buckets=args.buckets,
                merge_mode=args.merge_mode,
            )
            print(
                json.dumps(
                    {
                        "created": args.path,
                        "buckets": args.buckets,
                        "merge_mode": args.merge_mode,
                    }
                )
            )
        elif args.cmd == "apply":
            table = LakeTable(args.path)
            events = spark.read.schema(change_event_schema()).parquet(args.events)
            fence = None
            if args.fence:
                sid, bid = args.fence.rsplit(":", 1)
                fence = (sid, int(bid))
            stats = apply_batch(
                table, spark, events, fence=fence, normalize=not args.no_normalize
            )
            print(json.dumps(stats))
        elif args.cmd == "replay":
            from pyspark.sql import functions as F

            from .cdc.apply import apply_batches_pipelined

            table = LakeTable(args.path)
            events = spark.read.schema(change_event_schema()).parquet(args.events)
            row = events.agg(
                F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
            ).collect()[0]
            lo, hi = row["lo"], row["hi"]
            n = max(args.batches, 1)
            if lo is None or n == 1 or lo == hi:
                batches = [events]
            else:
                step = (int(hi) - int(lo)) // n + 1
                batches = [
                    events.filter(
                        (F.col("lsn") >= lo + i * step)
                        & (F.col("lsn") < lo + (i + 1) * step)
                    )
                    for i in range(n)
                ]
            first = args.first_batch_id
            if first is None:
                last = table.summary.get(f"fence:{args.stream_id}")
                first = int(last) + 1 if last is not None else 0
            results = apply_batches_pipelined(
                table,
                spark,
                batches,
                stream_id=args.stream_id,
                first_batch_id=first,
                normalize=not args.no_normalize,
            )
            for r in results:
                print(json.dumps(r))
        elif args.cmd == "stream":
            table = LakeTable(args.path)
            # A CSV log written by functions.io.write_csv must be read with
            # the matching reader options (header row, \\N as NULL, no
            # whitespace trimming) — otherwise headers parse as null-key
            # data rows and \\N arrives as a literal string.
            source_options = dict(_CSV_OPTS) if args.format == "csv" else {}
            for kv in args.source_option:
                k, _, v = kv.partition("=")
                source_options[k] = v
            ing = CdcStreamIngestor(
                table,
                args.source,
                args.checkpoint,
                change_event_schema(),
                stream_id=args.stream_id,
                max_files_per_trigger=args.max_files,
                source_format=args.format,
                source_options=source_options,
                compact_every=args.compact_every,
                tombstone_lsn_lag=args.tombstone_lsn_lag,
            )
            for b in ing.run_available_now(spark):
                print(json.dumps({k: v for k, v in b.items() if k != "validation"}))
        elif args.cmd == "compact":
            table = LakeTable(args.path)
            print(
                json.dumps(
                    table.compact(
                        spark,
                        args.purge_below_lsn,
                        num_buckets=args.buckets,
                        sort_within_buckets=args.sort,
                        target_file_rows=args.target_file_rows,
                    )
                )
            )
        elif args.cmd == "analytics":
            import time as _time

            from .analytics.queries import QUERIES
            from .functions.io import write_csv

            names = args.queries or sorted(QUERIES)
            for name in names:
                t0 = _time.time()
                df = QUERIES[name].fn(spark, args.sf_dir)
                out = f"{args.out_dir.rstrip('/')}/{name}"
                write_csv(df, out)
                print(
                    json.dumps(
                        {"query": name, "out": out, "sec": round(_time.time() - t0, 2)}
                    )
                )
    finally:
        if owned:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
