#!/usr/bin/env python
"""Extra benchmarks for the optimization round (bench.py is FROZEN).

Per-query isolation with the noop sink (guide §1.4), same session config
and warmup as bench.py, plus:
  - per-query Spark JOB COUNT (statusTracker over a job group) — the
    orchestration-overhead signal the suite numbers hide,
  - optional .explain("formatted") capture to plans/r08/.

Usage:
  python bench_extra.py --query contour_polylines k_shortest   # time some
  python bench_extra.py --all                                  # whole suite
  python bench_extra.py --explain contour_polylines --tag before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def get_session():
    from osgeo_gdal_spark.session import get_spark

    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app="osgeo-gdal-spark-bench-extra", cores=cores)
    # same worker-pool warmup as bench.py
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
    _force(
        spark.range(0, n_cores * 2, 1, n_cores * 2)
        .select(_warm(F.col("id").cast("double")).alias("w"))
    )
    return spark


def time_queries(spark, names, sf_dir, repeats=3):
    from osgeo_gdal_spark import entry_queries as EQ

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out = {}
    for name in names:
        rs = []
        jobs = None
        for r in range(repeats):
            group = f"bx-{name}-{r}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            _force(EQ.QUERIES[name](spark, sf_dir))
            rs.append(round(time.perf_counter() - t0, 3))
            jobs = len(tracker.getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
        out[name] = {"min": min(rs), "runs": rs, "jobs": jobs}
        print(f"{name:28s} min={min(rs):7.3f}  jobs={jobs:3d}  runs={rs}",
              flush=True)
    return out


def capture_plan(spark, name, sf_dir, tag):
    from osgeo_gdal_spark import entry_queries as EQ

    df = EQ.QUERIES[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    os.makedirs("plans/r08", exist_ok=True)
    path = f"plans/r08/{name}_{tag}.txt"
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan)} bytes)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", nargs="*", default=[])
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--explain", nargs="*", default=[])
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session()
    try:
        names = args.query
        if args.all:
            import bench

            names = list(bench.HEADLINE)
        res = {}
        if names:
            res = time_queries(spark, names, sf_dir, repeats=args.repeats)
            total = sum(v["min"] for v in res.values())
            print(f"TOTAL(min) = {total:.3f}s over {len(res)} queries")
            if args.json:
                with open(args.json, "w") as f:
                    json.dump(res, f, indent=1, sort_keys=True)
        for name in args.explain:
            capture_plan(spark, name, sf_dir, args.tag)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
