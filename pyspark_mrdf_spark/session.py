"""SparkSession construction tuned for this engine.

Defaults target local[32] testing but every knob is chosen for cluster
scale: AQE (runtime re-planning, partition coalescing, skew-join
splitting), Arrow for pandas-UDF transfer, and a shuffle-partition count
that callers override per deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pyspark-mrdf-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    AQE is on so runtime statistics drive partition coalescing and
    skew-join splitting — at 100 TB the static shuffle-partition number
    is only an upper bound, AQE right-sizes each stage.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Scheduler mode stays FIFO (the default). FAIR was tried for
        # the background-index-build overlap (q56's exact-side thread)
        # but bare spark.scheduler.mode=FAIR is a no-op — without an
        # allocation file the auto-created default pool schedules FIFO
        # internally — and an A/B WITH a FAIR-pool allocation file
        # measured inside run-to-run noise at harness scale (12.3-14.6s
        # FIFO vs 12.5-12.9s FAIR on cold q56). A serving deployment
        # with many concurrent sessions should revisit FAIR with real
        # pools; at this scale it buys nothing measurable.
    )
    if master is not None:
        builder = builder.master(master)
    elif SparkSession.getActiveSession() is None:
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-mutable engine settings to an externally created
    session (the verify driver hands us its own SparkSession).

    Only touches configs that are legal to set at runtime.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass  # static conf on some builds; harmless
    try:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass
    return spark
