"""Property-based replay convergence: for ANY partition of ANY event log
into ordered micro-batches — duplicates, out-of-order LSNs, deletes,
interleavings included — the engine's final state equals the one-shot
global last-writer-wins reduction, and replaying any suffix is a no-op.

This is the north_rule's core contract ("matching the reference's final
table state after replay") stated as a property instead of fixtures.
Payloads are a pure function of (key, lsn), so equal-LSN duplicates are
byte-identical and the expected state is well-defined.
"""

import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from sql_etl_pipeline_spark.cdc.apply import apply_batch
from sql_etl_pipeline_spark.lakehouse import LakeTable

KEYS = [("c0", 0), ("c0", 1), ("c1", 0), ("c1", 7), ("c2", 3)]


def _op(k: int, lsn: int) -> str:
    # op is a pure function of (key, lsn): a real log cannot carry two
    # different operations at one LSN (the LSN IS the log position), so
    # duplicate deliveries are byte-identical
    return "D" if (k * 31 + lsn) % 5 == 0 else ("U" if lsn % 2 else "I")


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    events = []
    for _ in range(n):
        k = draw(st.integers(min_value=0, max_value=len(KEYS) - 1))
        lsn = draw(st.integers(min_value=1, max_value=15))
        batch = draw(st.integers(min_value=0, max_value=2))
        events.append((k, lsn, _op(k, lsn), batch))
    return events


def expected_state(events):
    best = {}
    for k, lsn, op, _ in events:
        cur = best.get(k)
        if cur is None or lsn > cur[0]:
            best[k] = (lsn, op)
    out = {}
    for k, (lsn, op) in best.items():
        if op != "D":
            conv, turn = KEYS[k]
            out[(conv, turn)] = f"text-{conv}-{turn}-{lsn}"
    return out


def run_engine(spark, events, tmp, merge_mode="cow"):
    table = LakeTable.create(
        tmp,
        spark.createDataFrame(
            [], "conv_id string, turn_idx int, text string"
        ).schema,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=4,
        merge_mode=merge_mode,
    )
    rows = [
        (op, lsn, KEYS[k][0], KEYS[k][1], f"text-{KEYS[k][0]}-{KEYS[k][1]}-{lsn}", b)
        for (k, lsn, op, b) in events
    ]
    df = spark.createDataFrame(
        rows, "op string, lsn long, conv_id string, turn_idx int, text string, b int"
    )
    for b in range(3):
        batch = df.filter(F.col("b") == b).drop("b")
        if batch.isEmpty():
            continue
        apply_batch(table, spark, batch, normalize=False)
    return table, df


def read_state(table, spark):
    return {
        (r.conv_id, r.turn_idx): r.text for r in table.read(spark).collect()
    }


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=event_logs())
def test_any_batching_converges_to_global_lww(spark, events):
    tmp = tempfile.mkdtemp(prefix="prop-")
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        table, df = run_engine(spark, events, tmp)
        assert read_state(table, spark) == expected_state(events)
        # replaying the ENTIRE log again (stale + duplicate events) is a
        # no-op thanks to the per-row LSN guard
        apply_batch(table, spark, df.drop("b"), normalize=False)
        assert read_state(table, spark) == expected_state(events)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=event_logs())
def test_any_batching_converges_mor(spark, events):
    """Same convergence property on a merge-on-read table: any batching of
    any adversarial log resolves at read to the global LWW, a mid-run
    compact never changes the state, and full-log replay is a no-op."""
    tmp = tempfile.mkdtemp(prefix="prop-mor-")
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        table, df = run_engine(spark, events, tmp, merge_mode="mor")
        assert read_state(table, spark) == expected_state(events)
        table.compact(spark)
        assert read_state(table, spark) == expected_state(events)
        apply_batch(table, spark, df.drop("b"), normalize=False)
        assert read_state(table, spark) == expected_state(events)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
