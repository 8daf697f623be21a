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


# Oracle result types the driver's harness may materialize differently than
# python fetchall() (e.g. HUGEINT -> pandas float64 "60000.0" vs Spark "60000").
# r1/r2 lost 3 gate queries to this; never ship an oracle emitting one.
_FORBIDDEN_ORACLE_TYPES = ("HUGEINT", "DECIMAL", "UHUGEINT")


def _oracle_type_problems(con, sql: str) -> list[str]:
    try:
        rel = con.sql(sql)
        types = [str(t).upper() for t in rel.types]
        cols = rel.columns
    except Exception as e:  # noqa: BLE001
        return [f"type-introspection error {e}"]
    return [
        f"oracle col {c} has driver-unsafe type {t} (cast to BIGINT/DOUBLE)"
        for c, t in zip(cols, types)
        if any(bad in t for bad in _FORBIDDEN_ORACLE_TYPES)
    ]


def _arrow_rows(res_arrow) -> list[tuple]:
    """Second materialization path (duckdb -> Arrow -> python), mirroring a
    harness that goes through pandas/Arrow instead of fetchall()."""
    cols = [res_arrow.column(i).to_pylist() for i in range(res_arrow.num_columns)]
    return [tuple(c[j] for c in cols) for j in range(res_arrow.num_rows)]


def main(sf_dir: str = "/root/testdata/sf0.01", *only: str) -> int:
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
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
            type_problems = _oracle_type_problems(con, oracles[name])
            res = con.execute(oracles[name])
            ora_cols = [d[0] for d in res.description]
            ora_rows = res.fetchall()
            arrow_rows = _arrow_rows(con.execute(oracles[name]).arrow())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        problems = list(type_problems)
        # both duckdb materialization paths must hash identically, else the
        # driver (which may use either) can diverge from our local check
        if value_hash(ora_rows, ora_cols) != value_hash(arrow_rows, ora_cols):
            problems.append("oracle fetchall vs arrow hash divergence")
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
