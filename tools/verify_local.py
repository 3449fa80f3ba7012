"""Local mirror of the driver's correctness gate.

Runs every queries() entry at sf0.01 and compares against oracle_sql()
in DuckDB: row count, sorted column names, and an order-insensitive
value hash (rows canonicalized to strings, sorted). Rows-only queries
are executed and reported with row counts.

Usage: python tools/verify_local.py [query_name ...]
"""

from __future__ import annotations

import math
import sys
import traceback
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # Full shortest-round-trip repr — driver-parity strictness.
        # The old %.6g hid 4th-decimal drift on values >= 100, which let
        # three queries pass locally but FAIL the driver hash in r2.
        return repr(v)
    if isinstance(v, Decimal):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return str(int(f))
        return repr(f)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_value(r[i]) for i in order) for r in rows)


def main() -> int:
    from parquet_playground_spark import get_spark, registry

    registry.load_all()
    spark = get_spark("verify-local")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    names = sys.argv[1:] or sorted(registry.QUERIES)
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        fn = registry.QUERIES[name]
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc(limit=5)
            n_fail += 1
            failures.append(name)
            continue
        if name not in registry.ORACLES:
            print(f"rows  {name}: {len(srows)} rows (rows-only)")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(registry.ORACLES[name])
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {str(exc)[:200]}")
            n_fail += 1
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems:
            sc, oc = canon_rows(scols, srows), canon_rows(ocols, orows)
            if sc != oc:
                diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(p[:400] for p in problems)}")
            n_fail += 1
            failures.append(name)
        else:
            print(f"ok    {name}: {len(srows)} rows")
            n_pass += 1
    print(
        f"\n{n_pass} oracle-pass, {n_rows_only} rows-only, {n_fail} FAIL"
        + (f": {failures}" if failures else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
