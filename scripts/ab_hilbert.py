"""A/B probe: time one query under current session confs vs round-7 confs.

Usage: taskset -c 0-31 python scripts/ab_hilbert.py <query> [r7|r8]
Round-7 confs are restored by overriding the builder AFTER get_spark's
defaults via a fresh builder (separate process per arm).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

qname = sys.argv[1]
arm = sys.argv[2] if len(sys.argv) > 2 else "r8"

from pyspark.sql import SparkSession

cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
b = (
    SparkSession.builder.master(f"local[{cores}]")
    .appName(f"ab-{arm}")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", cores)
    .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    .config("spark.ui.enabled", "false")
)
if arm == "r8":
    b = (
        b.config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                 "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.execution.arrow.maxBytesPerBatch",
                str(64 * 1024 * 1024))
    )
spark = b.getOrCreate()

from osgeo_gdal_spark import entry_queries as EQ

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df):
    df.write.format("noop").mode("overwrite").save()


rs = []
for i in range(5):
    t0 = time.perf_counter()
    force(EQ.QUERIES[qname](spark, sf))
    rs.append(round(time.perf_counter() - t0, 3))
print(arm, qname, "min=", min(rs), rs)
spark.stop()
