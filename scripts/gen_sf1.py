"""Generate sf1 (10x sf0.1) test data by deterministic replication.

The driver's generator is not reproducible locally (TESTDATA.md:
read-only, seed-42), so sf1 is synthesized from sf0.1 by a 10-way
union with per-copy key OFFSETS that preserve referential integrity
(orders -> customer, lineitem -> orders/part/supplier) plus
deterministic per-copy perturbations that avoid degenerate 10x
exact-duplicate blowups where they would distort fixtures:

- dimension tables region/nation stay fixed (real stars share dims);
- fact/entity keys offset by k * KMAX per copy k in 0..9 (copy 0 is
  byte-identical to sf0.1);
- document text gets a per-copy suffix (" c<k>") for k > 0 so the
  dedup tiers see the sf0.1 planted duplicate structure replicated,
  not every doc turned into a 10-group; n_chars updated to match;
- embeddings get a tiny deterministic per-copy epsilon on coordinate
  0 (k * 2^-10) so ANN top-k fixtures stay tie-free;
- event timestamps shift k days so the windowed aggregations see 10
  distinct (but overlapping-shape) weeks.

Both the engine and its DuckDB oracles read the SAME parquet, so
every oracle comparison stays exact on this input.

Usage: python scripts/gen_sf1.py [out_dir]   (default /root/repo/testdata_sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10

# key column -> offset base (max key in sf0.1, rounded up to a clean
# power of ten so offsets never collide)
OFF = {
    "c_custkey": 100_000,
    "s_suppkey": 10_000,
    "p_partkey": 100_000,
    "o_orderkey": 10_000_000,
    "o_custkey": 100_000,
    "l_orderkey": 10_000_000,
    "l_partkey": 100_000,
    "l_suppkey": 10_000,
    "event_id": 1_000_000,
    "user_id": 1_000_000,
    "doc_id": 100_000,
    "vec_id": 100_000,
}


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    from osgeo_gdal_spark.session import get_spark

    spark = get_spark(app="gen-sf1",
                      cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.makedirs(out_dir, exist_ok=True)

    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").coalesce(1) \
            .write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")

    for t in ("customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"):
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for k in range(COPIES):
            c = base
            for col in c.columns:
                if col in OFF:
                    c = c.withColumn(col, F.col(col) + F.lit(k * OFF[col]))
            if t == "documents" and k > 0:
                c = (c.withColumn("text", F.concat(F.col("text"),
                                                   F.lit(f" c{k}")))
                     .withColumn("n_chars",
                                 F.col("n_chars") + F.lit(3 + (k >= 10))))
            if t == "embeddings" and k > 0:
                eps = float(k) / 1024.0
                c = c.withColumn(
                    "embedding",
                    F.concat(
                        F.array((F.element_at("embedding", 1)
                                 + F.lit(eps)).cast("float")),
                        F.slice("embedding", 2, 10_000)))
            if t == "events" and k > 0:
                c = c.withColumn(
                    "ts", F.col("ts") + F.make_dt_interval(F.lit(k)))
            if t == "orders" and k > 0:
                c = c.withColumn(
                    "o_orderdate",
                    F.col("o_orderdate") + F.make_dt_interval(F.lit(k)))
            if t == "lineitem" and k > 0:
                c = c.withColumn(
                    "l_shipdate",
                    F.col("l_shipdate") + F.make_dt_interval(F.lit(k)))
            parts.append(c)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        union.repartition(32).write.mode("overwrite") \
            .parquet(f"{out_dir}/{t}.parquet")
        print(f"{t}: {spark.read.parquet(f'{out_dir}/{t}.parquet').count()}")

    spark.stop()


if __name__ == "__main__":
    main()
