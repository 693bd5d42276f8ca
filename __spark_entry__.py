"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship CDC-apply query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus the
training-data pipeline operators); ``oracle_sql()`` gives the DuckDB
equivalent for the driver's side-by-side correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_etl_pipeline_spark.analytics.queries import QUERIES as _ANALYTICS  # noqa: E402
from sql_etl_pipeline_spark.cdc.queries import (  # noqa: E402
    CDC_ORACLE_SQL,
    MV_INCREMENTAL_ORACLE_SQL,
    cdc_apply_engine,
    cdc_apply_lww,
    cdc_apply_mor,
    cdc_apply_stream,
    conv_summary_mv_incremental,
)

SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the CDC apply itself — change log derived from lineitem,
    applied through the full merge engine, final transcript state out."""
    return cdc_apply_engine(spark, SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "cdc_apply_lww": cdc_apply_lww,
        "cdc_apply_engine": cdc_apply_engine,
        "cdc_apply_mor": cdc_apply_mor,
        "cdc_apply_stream": cdc_apply_stream,
        "conv_summary_mv_incremental": conv_summary_mv_incremental,
    }
    for name, spec in _ANALYTICS.items():
        out[name] = spec.fn
    try:
        from sql_etl_pipeline_spark.datapipe.queries import QUERIES as _DATAPIPE

        for name, spec in _DATAPIPE.items():
            out[name] = spec.fn
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {
        "cdc_apply_lww": CDC_ORACLE_SQL,
        "cdc_apply_engine": CDC_ORACLE_SQL,
        "cdc_apply_mor": CDC_ORACLE_SQL,
        "cdc_apply_stream": CDC_ORACLE_SQL,
        "conv_summary_mv_incremental": MV_INCREMENTAL_ORACLE_SQL,
    }
    for name, spec in _ANALYTICS.items():
        if spec.oracle is not None:
            out[name] = spec.oracle
    try:
        from sql_etl_pipeline_spark.datapipe.queries import QUERIES as _DATAPIPE

        for name, spec in _DATAPIPE.items():
            if spec.oracle is not None:
                out[name] = spec.oracle
    except ImportError:
        pass
    return out
