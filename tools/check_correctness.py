"""Local mirror of the driver's correctness gate: run every queries() entry
at sf0.01 and compare to its oracle_sql() via duckdb — row count, sorted
column names, and order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from sketchlib.spark import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.10g}"
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in df.collect()]
            spark_cols = df.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={len(spark_rows)}")
            continue
        try:
            res = con.execute(oracles[name])
            ora_cols = [d[0] for d in res.description]
            ora_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        problems = []
        if len(spark_rows) != len(ora_rows):
            problems.append(f"rows {len(spark_rows)} != {len(ora_rows)}")
        if sorted(spark_cols) != sorted(ora_cols):
            problems.append(f"cols {sorted(spark_cols)} != {sorted(ora_cols)}")
        hs = value_hash(spark_rows, spark_cols)
        ho = value_hash(ora_rows, ora_cols)
        if hs != ho:
            problems.append(f"hash {hs} != {ho}")
        if problems:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s): {'; '.join(problems)}")
            for label, rows, cols in (("spark", spark_rows, spark_cols), ("oracle", ora_rows, ora_cols)):
                print(f"  {label} {cols}: {sorted(map(str, rows))[:4]}")
        else:
            print(f"OK   {name} ({dt:.1f}s, {len(spark_rows)} rows)")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
