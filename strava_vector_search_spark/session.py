"""SparkSession factory with scale-appropriate defaults.

The reference delegates all execution tuning to Snowflake warehouses
(``01_method1_cortex_search.sql:12-63``). Our equivalent knob surface is the
SparkSession config. Defaults chosen for the 100 TB north star:

* AQE on (runtime coalescing, skew-join splitting, dynamic join strategy
  switches) — replaces hand-tuned shuffle-partition counts at scale.
* ``spark.sql.shuffle.partitions`` sized from the local CPU budget for tests;
  on a real cluster AQE coalesces from a deliberately-high initial value.
* Arrow enabled so any Pandas-UDF path (embedder, multimodal decode) moves
  columnar batches, never pickled rows.
* Session timezone pinned to UTC for oracle (DuckDB) parity.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "strava-vector-search-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's default config."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local mode: the driver JVM is the whole engine — size it for the
        # container (Spark's 1g default OOMs on million-row shuffles)
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # timestamp — read as long and convert via timestamp_micros (tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # 768-float embedding rows are wide; keep scan splits modest so a
        # partition of embeddings stays comfortably in executor memory.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        # keep catalog artifacts (bucketed tables, derby metastore) out of
        # the repo working directory
        .config("spark.sql.warehouse.dir", "/tmp/svs_spark_warehouse")
        # dedicated scratch dir: /tmp cleaners have been observed deleting
        # live blockmgr shuffle files mid-job
        .config("spark.local.dir", "/root/.spark_scratch")
        .config(
            "spark.driver.extraJavaOptions", "-Dderby.system.home=/tmp/svs_derby"
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
