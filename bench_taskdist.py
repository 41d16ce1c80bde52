#!/usr/bin/env python
"""Task-time distribution for the heaviest stage of one query run."""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession, functions as F, types as T

    b = SparkSession.builder.master(f"local[{cores}]").appName(f"td-{name}")
    for k, v in [
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"),
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"),
        ("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.shuffle.partitions", str(cores)),
        ("spark.driver.memory", "8g"),
        ("spark.ui.enabled", "true"),
        ("spark.ui.port", "4050"),
    ]:
        b = b.config(k, v)
    spark = b.getOrCreate()

    @F.pandas_udf(T.DoubleType())
    def _warm(v):
        import numpy as np  # noqa: F401
        from osgeo_gdal_spark.operators import contour, focal  # noqa: F401
        from osgeo_gdal_spark.sources import raster  # noqa: F401
        return v * 1.0

    n = int(str(cores))
    spark.range(0, n * 2, 1, n * 2).select(
        _warm(F.col("id").cast("double")).alias("w")
    ).write.format("noop").mode("overwrite").save()

    from osgeo_gdal_spark import entry_queries as EQ

    for r in range(2):
        t0 = time.perf_counter()
        EQ.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        print(f"run {r}: {time.perf_counter() - t0:.3f}s", flush=True)

    app_id = spark.sparkContext.applicationId
    base = "http://127.0.0.1:4050/api/v1/applications/" + app_id
    with urllib.request.urlopen(base + "/stages?status=complete") as rr:
        stages = json.load(rr)
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    for s in stages[:3]:
        sid, att = s["stageId"], s["attemptId"]
        url = f"{base}/stages/{sid}/{att}/taskList?length=200"
        with urllib.request.urlopen(url) as rr:
            tasks = json.load(rr)
        durs = sorted(
            (t.get("taskMetrics") or {}).get("executorRunTime", 0)
            for t in tasks
        )
        print(f"stage {sid} runTime={s['executorRunTime']} "
              f"tasks={len(tasks)} name={s['name'][:50]}")
        print("  task runTimes ms:", durs)
        # breakdown of slowest task
        slow = max(tasks, key=lambda t: (t.get("taskMetrics") or {})
                   .get("executorRunTime", 0))
        m = slow.get("taskMetrics") or {}
        print("  slowest:", json.dumps({
            k: m.get(k) for k in [
                "executorDeserializeTime", "executorRunTime",
                "jvmGcTime", "resultSerializationTime",
            ]}),
            "python:", json.dumps(m.get("pythonMetrics") or {}))
    spark.stop()


if __name__ == "__main__":
    main()
