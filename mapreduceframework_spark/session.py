"""SparkSession construction for the engine.

Single place where execution-relevant config lives. Tuned for local[N]
testing but every knob is chosen for cluster-scale behavior:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast):
  at 100 TB the static plan is always wrong somewhere; AQE re-plans at
  shuffle boundaries from observed statistics.
- shuffle partitions sized to cores locally; on a real cluster this is
  overridden (or left to AQE's coalescing with a high initial value).
- Arrow enabled: every pandas-UDF operator in this engine moves batches
  over Arrow, never rows.
- UTC session timezone: parquet timestamps must compare bit-identical
  against the DuckDB oracle (UTC-naive).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

# saveAsTable (bucketed tables etc.) writes under the warehouse dir;
# keep it out of the repo working tree.
_WAREHOUSE = os.path.join(tempfile.gettempdir(), f"mrf-warehouse-{os.getpid()}")


def get_session(
    app_name: str = "mapreduceframework_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cpus`` controls both local parallelism and the shuffle-partition
    count; on a real cluster pass ``master`` via ``extra_conf``/env and
    leave shuffle partitioning to AQE.
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{n}]"))
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.warehouse.dir", _WAREHOUSE)
        # The driver compares against DuckDB; ANSI mode (Spark 4 default)
        # stays ON — engine code uses try_* / explicit casts where needed.
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
