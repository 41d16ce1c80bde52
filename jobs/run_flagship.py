#!/usr/bin/env python
"""Cluster job entrypoint: the flagship spatial-join + tiling pipeline.

Launch (the north-rule path; on a cluster swap the master URL):

    python scripts/package.py   # builds dist/osgeo_gdal_spark.zip
    spark-submit --py-files dist/osgeo_gdal_spark.zip \
        jobs/run_flagship.py --sf-dir /root/testdata/sf0.1 \
        --out /tmp/flagship_out --checkpoint-root /tmp/flagship_ckpt

Every stage checkpoints through StageWriter (per-unit lineage + metrics),
so re-running the same command after a crash resumes from the last
completed unit. Tile pyramid levels are the resumability units.
"""

from __future__ import annotations

import argparse
import uuid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint-root", required=True)
    ap.add_argument("--zoom", type=int, default=6)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from osgeo_gdal_spark.operators import spatial_join as SJ, tiling as TL
    from osgeo_gdal_spark.plans.lineage import StageWriter
    from osgeo_gdal_spark.sources import pages as PG, polygons as PL

    spark = SparkSession.builder.appName("flagship-spatial-join-tiling").getOrCreate()
    run_id = args.run_id or uuid.uuid4().hex[:12]
    writer = StageWriter(spark, args.checkpoint_root, run_id)

    pages = PG.pages_df(spark, args.sf_dir)

    # stage 1: spatial join -> per-polygon counts (one unit)
    def build_join(_unit):
        return (
            SJ.spatial_join(spark, pages, PL.POLYGONS)
            .groupBy("eas_id").agg(F.count("*").alias("n_pages"))
        )

    writer.run_stage("join_counts", ["all"], build_join)

    # stage 2: tile pyramid, one unit per zoom level (resumable mid-pyramid)
    def build_level(unit):
        z = int(unit)
        return TL.tile_counts(pages, z)

    levels = [str(args.zoom - i) for i in range(args.levels + 1)]
    writer.run_stage("tile_pyramid", levels, build_level)

    # publish results + metrics
    writer.read_stage("join_counts").write.mode("overwrite").parquet(
        f"{args.out}/join_counts"
    )
    writer.read_stage("tile_pyramid").write.mode("overwrite").parquet(
        f"{args.out}/tile_pyramid"
    )
    for stage in ("join_counts", "tile_pyramid"):
        writer.metrics(stage).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
