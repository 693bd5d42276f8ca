"""CLI smoke tests (init -> apply -> stream resume -> status -> compact ->
vacuum), driving the same code paths spark-submit would."""

import json
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_etl_pipeline_spark.cdc.generate import generate_change_events
from sql_etl_pipeline_spark.cli import main
from sql_etl_pipeline_spark.lakehouse import LakeTable


def test_cli_end_to_end(spark, tmp_path, capsys):
    t = str(tmp_path / "table")
    log = str(tmp_path / "log")
    ev = generate_change_events(spark, 400, n_convs=10, delete_frac=0.01).drop("pos")
    ev.filter(F.col("lsn") < 200).coalesce(1).write.parquet(log)
    ev.filter(F.col("lsn") >= 200).coalesce(1).write.mode("append").parquet(log)

    assert main(["init", "--path", t, "--buckets", "4", "--merge-mode", "mor"]) == 0
    created = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert created["merge_mode"] == "mor"
    assert main(
        ["apply", "--path", t, "--events", log, "--fence", "manual:0"]
    ) == 0
    out = capsys.readouterr().out.strip().splitlines()
    stats = json.loads(out[-1])
    assert stats["applied"] and stats["events"] == 400

    # replaying the same fence is a no-op
    assert main(["apply", "--path", t, "--events", log, "--fence", "manual:0"]) == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2 == {"applied": False, "reason": "fenced", "batch_id": 0}

    # streaming over the same log into a fresh table matches
    t2 = str(tmp_path / "table2")
    ck = str(tmp_path / "ck")
    assert main(["init", "--path", t2, "--buckets", "4"]) == 0
    assert main(
        [
            "stream", "--path", t2, "--source", log, "--checkpoint", ck,
            "--max-files", "1", "--compact-every", "2",
        ]
    ) == 0
    capsys.readouterr()

    a = LakeTable(t).read(spark).orderBy("conv_id", "turn_idx").collect()
    b = LakeTable(t2).read(spark).orderBy("conv_id", "turn_idx").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]

    # pipelined replay of the same log into a third table matches too
    t3 = str(tmp_path / "table3")
    assert main(["init", "--path", t3, "--buckets", "4"]) == 0
    assert main(
        ["replay", "--path", t3, "--events", log, "--batches", "3",
         "--stream-id", "bf"]
    ) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()
             if x.startswith("{")]
    applied = [r for r in lines if r.get("applied")]
    assert applied and sum(r["events"] for r in applied) == 400
    c = LakeTable(t3).read(spark).orderBy("conv_id", "turn_idx").collect()
    assert [tuple(r) for r in c] == [tuple(r) for r in a]
    # re-running with the same stream-id auto-continues past the recorded
    # fence: batches re-apply as LWW no-ops, state unchanged (the
    # incremental-backfill rerun semantics)
    assert main(
        ["replay", "--path", t3, "--events", log, "--batches", "3",
         "--stream-id", "bf"]
    ) == 0
    lines2 = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()
              if x.startswith("{")]
    assert all(r.get("applied") for r in lines2)
    c2 = LakeTable(t3).read(spark).orderBy("conv_id", "turn_idx").collect()
    assert [tuple(r) for r in c2] == [tuple(r) for r in a]
    # explicit --first-batch-id pins the fence window: a true replay of
    # already-recorded batch ids is a no-op end-to-end
    assert main(
        ["replay", "--path", t3, "--events", log, "--batches", "3",
         "--stream-id", "bf", "--first-batch-id", "0"]
    ) == 0
    lines3 = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()
              if x.startswith("{")]
    assert all(r.get("reason") == "fenced" for r in lines3)

    assert main(["status", "--path", t2]) == 0
    recs = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert any(r["op"] == "merge_cdc" for r in recs)
    assert any(r["op"] == "compact" for r in recs)

    assert main(
        ["compact", "--path", t, "--buckets", "8", "--sort",
         "--target-file-rows", "50"]
    ) == 0
    cstats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cstats["num_buckets"] == 8
    assert LakeTable(t).num_buckets == 8
    assert main(
        ["vacuum", "--path", t, "--expire-keep-last", "1", "--grace-seconds", "0"]
    ) == 0
    v = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v["files_removed"] >= 0
    # table still reads after expire+vacuum
    assert LakeTable(t).read(spark).count() == len(a)


def test_cli_analytics_export(spark, tmp_path, capsys):
    out = str(tmp_path / "results")
    assert main(
        [
            "analytics", "--sf-dir", "/root/testdata/sf0.001",
            "--out-dir", out, "--queries", "segment_share", "date_dim",
        ]
    ) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert {r["query"] for r in lines} == {"segment_share", "date_dim"}
    back = spark.read.option("header", "true").csv(f"{out}/date_dim")
    assert back.count() == 366


def test_cli_stream_csv_reads_its_own_format(spark, tmp_path, capsys):
    """`stream --format csv` must apply the write_csv reader options by
    default: header rows are not data, \\N round-trips to NULL. (Previously
    the CLI read headers as null-key rows — silent corruption.)"""
    from sql_etl_pipeline_spark.cdc.apply import expected_final_state
    from sql_etl_pipeline_spark.functions.io import write_csv

    ev = generate_change_events(spark, 300, n_convs=8, delete_frac=0.02).drop("pos")
    log = str(tmp_path / "csvlog")
    write_csv(ev, log)
    t = str(tmp_path / "tcsv")
    assert main(["init", "--path", t, "--buckets", "4"]) == 0
    assert main(
        [
            "stream", "--path", t, "--source", log,
            "--checkpoint", str(tmp_path / "ckcsv"), "--format", "csv",
        ]
    ) == 0
    capsys.readouterr()
    got = LakeTable(t).read(spark).orderBy("conv_id", "turn_idx").collect()
    exp = expected_final_state(ev).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]
    # NULL fidelity: delete tombstones aside, generated rows with empty text
    # normalize to NULL, and no row carries the literal string "\\N"
    assert not any(r.text == "\\N" for r in got)


def test_spark_submit_master_is_honored(tmp_path):
    """Deployability contract: under ``spark-submit --master X`` a
    ``build_session(master=None)`` must run on X — not silently collapse
    the deploy into local[*] (or local[$SPARK_GRAFT_CPUS]). Launches one
    real spark-submit driver in a fresh JVM; the in-process fixtures can't
    exercise this because the launcher's env is what's under test."""
    import os
    import shutil
    import subprocess
    import sys

    if shutil.which("spark-submit") is None:
        import pytest

        pytest.skip("spark-submit not on PATH")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    job = tmp_path / "job.py"
    job.write_text(
        f"import sys; sys.path.insert(0, {repo!r})\n"
        "from sql_etl_pipeline_spark.session import build_session\n"
        "s = build_session('submit-master-test')\n"
        "print('MASTER', s.sparkContext.master)\n"
        "s.stop()\n"
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="5")  # must NOT win
    proc = subprocess.run(
        ["spark-submit", "--master", "local[3]", str(job)],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "MASTER local[3]" in proc.stdout, proc.stdout[-2000:]
