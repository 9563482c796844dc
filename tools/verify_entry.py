"""Driver-style verification of __spark_entry__: run each queries() entry
on Spark at the given sf dir, run the matching oracle_sql() in DuckDB over
the same parquet tables, and compare row count + column names + value
multiset (columns sorted by name, rows sorted, doubles compared to 1e-9).

Usage: python tools/verify_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import datetime

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, type(None)):
        return None
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return v


def as_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        (tuple(norm(r[i]) for i in order) for r in rows),
        # null-safe, mixed-type-safe ordering (nulls last); equality of
        # the sorted multisets is still on the normalized values
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {str(e)[:300]}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows in {dt:.1f}s")
            if len(srows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"[FAIL-oracle] {name}: {str(e)[:300]}")
            continue
        sc, sm = as_multiset(scols, srows)
        oc, om = as_multiset(ocols, orows)
        if sc != oc:
            failures.append((name, f"columns differ: spark={sc} duck={oc}"))
            print(f"[FAIL-cols] {name}: spark={sc} duck={oc}")
            continue
        if len(sm) != len(om):
            failures.append((name, f"row count: spark={len(sm)} duck={len(om)}"))
            print(f"[FAIL-count] {name}: spark={len(sm)} duck={len(om)}")
            continue
        bad = None
        for a, b in zip(sm, om):
            if a != b:
                bad = (a, b)
                break
        if bad:
            failures.append((name, f"value mismatch: {bad[0]} vs {bad[1]}"))
            print(f"[FAIL-vals] {name}: spark={bad[0]} duck={bad[1]} (cols={sc})")
        else:
            print(f"[OK] {name}: {len(sm)} rows in {dt:.1f}s")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg[:200]}")
        sys.exit(1)
    print("all queries verified")


if __name__ == "__main__":
    main()
