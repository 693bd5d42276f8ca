"""SparkSession factory with scale-aware defaults.

The reference manages a SQLAlchemy connection pool
(``/root/reference/src/database_manager.py:26-53``); the Spark analog is the
session + executor fleet. Defaults here are chosen for the 100 TB design
point but parameterized so tests run on ``local[N]``:

* AQE on (runtime coalescing, skew-join splitting) — replaces the
  reference's hand-tuned ``BATCH_SIZE`` chunking
  (``/root/reference/config/config.py:43``).
* Arrow enabled for every pandas_udf / applyInPandas boundary.
* ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster this is overridden (2-3x total cores) and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def build_session(
    app_name: str = "sql-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``. On a real cluster pass ``master=None`` with a
    pre-configured spark-submit environment; every setting here is safe to
    override from the command line.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    # Under spark-submit the driver python is spawned by the JVM with
    # PYSPARK_GATEWAY_PORT set and ``spark.master`` already a system
    # property — in that case we must NOT call .master() at all (and must
    # ignore a stray SPARK_MASTER env, common in docker/standalone
    # images), or ``--master yarn/k8s/...`` would be silently overridden
    # and a cluster deploy would collapse into a single-JVM run
    # (exercised end-to-end by tools/submit_proof.py). Only an explicit
    # ``master=`` argument outranks the launcher.
    submitted_launch = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and not submitted_launch:
        master = os.environ.get("SPARK_MASTER")
        if master is None:
            # Plain-python launch: nothing chose a master; default local.
            master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet scan tuning: 128 MiB splits keep partitions executor-sized
        # at 100 TB; vectorized reader stays on (default).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Deterministic decimal/round behavior for oracle parity.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if master is not None:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
