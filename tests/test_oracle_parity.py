"""Driver-style correctness gate run locally: every registry query executed
on Spark at sf0.01 must match its DuckDB oracle as an order-insensitive
multiset of rows (columns compared by name, exact values)."""

import math

import pytest

from osgeo_gdal_spark import entry_queries as EQ
from tests.conftest import SF_DIR_ORACLE


def _normalize(rows, colnames):
    """Rows -> sorted list of tuples with columns ordered by name and
    floats canonicalized (nan flattened, -0.0 -> 0.0)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            if v == 0.0:
                return 0.0
            return v
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        return v

    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


@pytest.mark.parametrize("name", sorted(EQ.QUERIES))
def test_query_matches_oracle(spark, duck, name):
    if name not in EQ.ORACLES:
        # rows-only queries (Spark-specific hashing / approximate): smoke
        sdf = EQ.QUERIES[name](spark, SF_DIR_ORACLE)
        assert sdf.count() >= 0 and len(sdf.columns) > 0
        return
    sdf = EQ.QUERIES[name](spark, SF_DIR_ORACLE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(EQ.ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: {a[mism[0]]} vs {b[mism[0]]}"
    )
