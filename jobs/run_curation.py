#!/usr/bin/env python
"""Cluster job entrypoint: the web-text curation pipeline (the payload
twin of jobs/run_flagship.py — same launch contract, the LLM-data half
of the engine).

Launch (swap the master URL on a cluster):

    python scripts/package.py   # builds dist/osgeo_gdal_spark.zip
    spark-submit --py-files dist/osgeo_gdal_spark.zip \
        jobs/run_curation.py --sf-dir /root/testdata/sf0.1 \
        --out /tmp/curation_out --checkpoint-root /tmp/curation_ckpt

Stages (each checkpointed through StageWriter — per-unit lineage +
throughput metrics, so a crashed run resumes from the last completed
unit):

  1. url_screen    — canonical-URL exact dedup survivors
  2. quality       — C4 line filters + Gopher repetition metrics,
                     sharded by doc_id (resumable mid-corpus)
  3. near_dup      — portable-MinHash LSH candidate pairs
  4. pack          — greedy sequence packing of the kept docs
"""

from __future__ import annotations

import argparse
import uuid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint-root", required=True)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--budget", type=int, default=512)
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from osgeo_gdal_spark.functions import text as TX
    from osgeo_gdal_spark.operators import corpus as CP
    from osgeo_gdal_spark.plans.lineage import StageWriter

    spark = SparkSession.builder.appName("webtext-curation").getOrCreate()
    run_id = args.run_id or uuid.uuid4().hex[:12]
    writer = StageWriter(spark, args.checkpoint_root, run_id)

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")

    def build_urls(_unit):
        # canonical-URL dedup keepers (functions/text.canonical_url_spark)
        urls = docs.select(
            "doc_id",
            F.concat(F.lit("https://site"),
                     (F.col("doc_id") % 400).cast("string"),
                     F.lit(".example/p/"),
                     (F.col("doc_id") % 1200).cast("string")).alias("url"))
        canon = urls.select(
            "doc_id", TX.canonical_url_spark("url").alias("curl"))
        return canon.groupBy("curl").agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_dups"))

    writer.run_stage("url_screen", ["all"], build_urls)

    def build_quality(unit):
        shard = docs.filter(F.col("doc_id") % args.shards == int(unit))
        c4 = CP.c4_line_stats(CP.doc_lines(shard, width=8))
        rep = CP.repetition_stats(shard).select(
            "doc_id", "n_words", "rep_frac")
        return c4.join(rep, "doc_id")

    writer.run_stage("quality", [str(i) for i in range(args.shards)],
                     build_quality)

    def build_neardup(_unit):
        return CP.fingerprint_candidates(docs)

    writer.run_stage("near_dup", ["all"], build_neardup)

    def build_pack(_unit):
        kept = writer.read_stage("quality").filter(
            F.col("doc_keep") == 1).select("doc_id")
        return CP.pack_sequences(docs.join(kept, "doc_id"), args.budget)

    writer.run_stage("pack", ["all"], build_pack)

    for stage in ("url_screen", "quality", "near_dup", "pack"):
        writer.read_stage(stage).write.mode("overwrite").parquet(
            f"{args.out}/{stage}")
        writer.metrics(stage).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
