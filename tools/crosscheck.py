"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at a given sf dir,
compare row count + column names + order-insensitive values.

Usage: python tools/crosscheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from frontier_engine.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.6g}"
    except ImportError:
        pass
    if isinstance(v, list):
        return tuple(norm_val(x) for x in v)
    return v


def compare(name, sdf, con, sql):
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(norm_val(r[c]) for c in scols) for r in (row.asDict() for row in sdf.collect())
    )
    res = con.sql(sql)
    dcols_raw = res.columns
    drows_raw = res.fetchall()
    order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
    dcols = [dcols_raw[i] for i in order]
    drows = sorted(tuple(norm_val(r[i]) for i in order) for r in drows_raw)
    if scols != dcols:
        return f"SCHEMA spark={scols} duck={dcols}"
    if len(srows) != len(drows):
        return f"ROWCOUNT spark={len(srows)} duck={len(drows)}"
    if srows != drows:
        for a, b in zip(srows, drows):
            if a != b:
                return f"VALUES first diff:\n  spark={a}\n  duck ={b}"
        return "VALUES (diff beyond zip)"
    return None


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("local[8]", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf)
            if name not in osql:
                n = sdf.count()
                print(f"  {name:26s} rows-only: {n} rows")
                continue
            err = compare(name, sdf, con, osql[name])
            if err:
                failures += 1
                print(f"✗ {name:26s} {err}")
            else:
                print(f"✓ {name:26s} ok ({sdf.count()} rows)")
        except Exception as e:
            failures += 1
            print(f"✗ {name:26s} EXC {str(e)[:300]}")
    print("FAILURES:", failures)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
