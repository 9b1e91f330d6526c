"""Self-check harness mimicking the driver's correctness gate: run every
__spark_entry__.queries() entry at a given sf_dir, run its oracle_sql in
DuckDB on the same parquet, compare row count + sorted column names +
order-insensitive values. Usage: python scripts/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from brdrq_spark.session import get_spark


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bytes):
        return v.hex()
    return v


def table_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(canon(r[i]) for i in order) for r in rows
    )


def main(sf_dir: str, only: list[str]) -> int:
    spark = get_spark("oracle_check", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            failures += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = False
        if ok_cols and ok_count:
            ok_vals = table_multiset(scols, [tuple(r) for r in srows]) == table_multiset(
                dcols, drows
            )
        status = "OK   " if (ok_cols and ok_count and ok_vals) else "FAIL "
        if status.startswith("FAIL"):
            failures += 1
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} cols_ok={ok_cols} "
            f"vals_ok={ok_vals} [{time.time()-t0:.1f}s]"
        )
        if not ok_cols:
            print(f"      spark cols {sorted(scols)}\n      duck  cols {sorted(dcols)}")
        elif not ok_vals and ok_count:
            a = table_multiset(scols, [tuple(r) for r in srows])
            b = table_multiset(dcols, drows)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"      first diffs: {diff}")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(main(sf, sys.argv[2:]))
