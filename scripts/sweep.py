"""Driver-style correctness sweep: every queries() entry vs its DuckDB oracle.

Mirrors what the round driver records in CORRECTNESS_r{N}.json (see
.claude/skills/verify/SKILL.md §3): collect the Spark result at sf0.01,
run the matching oracle_sql() in DuckDB over views on the same parquet,
and compare order-insensitive multisets with columns sorted by name.
Names without an oracle are rows-only (count >= 0).

Usage:  python scripts/sweep.py [sf_dir] [only_prefix...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    from osgeo_gdal_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written dataset directory
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    qs, osql = E.queries(), E.oracle_sql()
    names = [n for n in qs if not only or any(n.startswith(p) for p in only)]
    bad = []
    timings = {}
    for name in names:
        try:
            import time as _time

            _t0 = _time.perf_counter()
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
            timings[name] = round(_time.perf_counter() - _t0, 3)
            if name not in osql:
                print(f"{name:28s} rows-only  spark={len(srows)}")
                continue
            cur = con.execute(osql[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            rows_ok = len(srows) == len(orows)
            schema_ok = sorted(c.lower() for c in scols) == sorted(
                c.lower() for c in ocols
            )
            hash_ok = schema_ok and multiset(
                [c.lower() for c in scols], srows
            ) == multiset([c.lower() for c in ocols], orows)
            tag = "OK " if (rows_ok and schema_ok and hash_ok) else "FAIL"
            print(
                f"{name:28s} {tag} rows={len(srows)}/{len(orows)}"
                f" schema={schema_ok} hash={hash_ok}"
            )
            if tag == "FAIL":
                bad.append(name)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}")
            bad.append(name)
    print(f"\n{len(names) - len(bad)}/{len(names)} green; failures: {bad}")
    rec = os.environ.get("SWEEP_TIMINGS_OUT")
    if rec:
        import json as _json

        with open(rec, "w") as f:
            _json.dump({"sf_dir": sf_dir, "spark_sec": timings}, f,
                       indent=1, sort_keys=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
