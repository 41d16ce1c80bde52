"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (spatial-join page counts per polygon) on
                 /root/testdata/sf0.001.
queries()      — one callable per implemented operator from SURVEY.md §2.
oracle_sql()   — equivalent DuckDB SQL per query (same column names; the
                 deterministic fragments are shared with the Spark side via
                 osgeo_gdal_spark/functions/sqlgen.py so parity holds by
                 construction).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osgeo_gdal_spark import entry_queries as EQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: cell-cover broadcast spatial join + exact PIP refine ->
    pages per polygon, on sf0.001."""
    return EQ.q_spatial_join_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLES)
