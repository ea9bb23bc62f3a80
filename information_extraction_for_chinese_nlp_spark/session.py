"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the 100 TB design point and work unchanged on
local[N]: AQE on (runtime coalesce + skew-join splitting), Arrow enabled
for every pandas UDF boundary, shuffle partitions sized by the
environment, and broadcast threshold left to Spark (we additionally hint
explicitly where a side is known-small).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "ie-kg-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    On a real cluster, pass ``master=None`` and let spark-submit own the
    master / executor topology; everything here is cluster-size agnostic.
    """
    cpus = default_parallelism()
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing + skew-join splitting. At 100 TB
        # the static shuffle-partition count is always wrong somewhere; AQE
        # re-plans from actual map output sizes.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas UDF / mapInPandas boundaries (the scorer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # Deterministic session timezone so ts math is stable everywhere.
        .config("spark.sql.session.timeZone", "UTC")
        # normalized: the conf is strictly boolean — a raw SPARK_UI=1
        # would crash getOrCreate with IllegalArgumentException
        .config(
            "spark.ui.enabled",
            str(
                os.environ.get("SPARK_UI", "false").strip().lower()
                in ("1", "true", "yes", "on")
            ).lower(),
        )
        # local mode puts every reducer's collect_list buffer in one heap;
        # an undersized heap turns the assembly stage into GC thrash
        # (measured: 3-5x wall-time outliers at local[32] with 8g).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
