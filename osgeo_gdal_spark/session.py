"""SparkSession helper with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app="osgeo-gdal-spark", cores=None, shuffle_partitions=None,
              pin_cpus=False) -> SparkSession:
    """Local session tuned like the cluster profile.

    - AQE on (runtime coalesce + skew-join splitting — the cluster-side
      complement of our explicit hot-cell salting).
    - Arrow enabled for all pandas UDF / toPandas paths.
    - UTC session timezone (oracle comparisons are TZ-sensitive).
    - shuffle partitions ~ cores for local runs (200 is wrong at both ends).
    """
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if pin_cpus:
        # honest N-core simulation for scaling-efficiency runs: without
        # this, a local[8] JVM still runs GC/JIT/IO threads on all machine
        # cores and the 8-core timing looks better than 8 cores deliver
        b = b.config(
            "spark.driver.extraJavaOptions", f"-XX:ActiveProcessorCount={cores}"
        )
    return b.getOrCreate()


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-testdata table. In production these are Iceberg
    tables (spark.read.table); parquet here — same columnar scan path,
    same Catalyst pushdown behavior."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
