#!/usr/bin/env python
"""Per-stage profiler for one query (optimization round tooling).

Runs a query N times in a warmed session with the Spark UI enabled and
dumps per-stage metrics (duration, task count, shuffle bytes) from the
local status REST API — the sandbox stand-in for the Spark UI stage page
(guide §7.1). Localhost only; no external traffic.

  python bench_deep.py contour_polylines [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from osgeo_gdal_spark.session import get_spark

    # same defaults as get_spark but with the UI/status API on
    from pyspark.sql import SparkSession

    SparkSession.builder.config("spark.ui.enabled", "true")
    spark = (
        get_spark(app=f"deep-{name}", cores=cores)
    )
    # get_spark pins ui off; rebuild with ui on if needed
    if spark.conf.get("spark.ui.enabled", "false") == "false":
        spark.stop()
        os.environ["_DEEP_UI"] = "1"
        b = SparkSession.builder.master(f"local[{cores}]").appName(
            f"deep-{name}")
        for k, v in [
            ("spark.sql.adaptive.enabled", "true"),
            ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
            ("spark.sql.adaptive.coalescePartitions.parallelismFirst",
             "false"),
            ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"),
            ("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m"),
            ("spark.sql.adaptive.skewJoin.enabled", "true"),
            ("spark.sql.execution.arrow.pyspark.enabled", "true"),
            ("spark.sql.execution.arrow.maxRecordsPerBatch", "65536"),
            ("spark.sql.execution.arrow.maxBytesPerBatch",
             str(64 * 1024 * 1024)),
            ("spark.sql.session.timeZone", "UTC"),
            ("spark.sql.shuffle.partitions", str(cores)),
            ("spark.driver.memory", "8g"),
            ("spark.ui.enabled", "true"),
            ("spark.ui.port", "4050"),
        ]:
            b = b.config(k, v)
        spark = b.getOrCreate()

    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.DoubleType())
    def _warm(v):
        import numpy as np  # noqa: F401
        from osgeo_gdal_spark.kernels import pip, resample, checksum  # noqa: F401
        from osgeo_gdal_spark.operators import (  # noqa: F401
            contour, focal, raster_ops, tiling, dedup, similarity,
        )
        from osgeo_gdal_spark.sources import raster  # noqa: F401
        return v * 1.0

    n_cores = int(str(cores))
    _force(spark.range(0, n_cores * 2, 1, n_cores * 2)
           .select(_warm(F.col("id").cast("double")).alias("w")))

    from osgeo_gdal_spark import entry_queries as EQ

    app_id = spark.sparkContext.applicationId
    base = "http://127.0.0.1:4050/api/v1/applications/" + app_id

    def stages_after(mark_ms):
        with urllib.request.urlopen(base + "/stages?status=complete") as r:
            data = json.load(r)
        out = []
        for s in data:
            t = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
            if t is None:
                continue
            # ISO8601 'YYYY-MM-DDTHH:MM:SS.mmmGMT'
            ts = time.mktime(time.strptime(t[:19], "%Y-%m-%dT%H:%M:%S"))
            if ts * 1000 >= mark_ms - 500:
                out.append(s)
        return out

    tmin = None
    best_mark = None
    for r in range(repeats):
        mark = time.time() * 1000
        t0 = time.perf_counter()
        _force(EQ.QUERIES[name](spark, sf_dir))
        dt = time.perf_counter() - t0
        print(f"run {r}: {dt:.3f}s", flush=True)
        if tmin is None or dt < tmin:
            tmin, best_mark = dt, mark
    stages = stages_after(best_mark)
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"\n=== {name}: best {tmin:.3f}s, {len(stages)} stages "
          f"(best run) ===")
    print(f"{'stage':>6} {'wall_ms':>8} {'runTime':>8} {'tasks':>5} "
          f"{'shRead':>9} {'shWrite':>9} {'pyTime':>7}  name")
    tot_run = 0
    for s in stages:
        sid = s["stageId"]
        dur = s.get("executorRunTime", 0)
        tot_run += dur
        subm = s.get("firstTaskLaunchedTime", "")
        comp = s.get("completionTime", "")
        wall = ""
        try:
            t0 = time.mktime(time.strptime(subm[:19], "%Y-%m-%dT%H:%M:%S"))
            t1 = time.mktime(time.strptime(comp[:19], "%Y-%m-%dT%H:%M:%S"))
            wall = int((t1 - t0) * 1000)
        except Exception:
            pass
        nm = (s.get("name") or "")[:60]
        print(f"{sid:>6} {wall!s:>8} {dur:>8} {s.get('numCompleteTasks'):>5} "
              f"{s.get('shuffleReadBytes', 0):>9} "
              f"{s.get('shuffleWriteBytes', 0):>9} "
              f"{s.get('executorRunTime', 0) and ''!s:>7}  {nm}")
    print(f"total executorRunTime: {tot_run} ms across {len(stages)} stages")
    spark.stop()


if __name__ == "__main__":
    main()
