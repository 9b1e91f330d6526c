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


# Arrow-level canonical type names so Spark bigint == DuckDB BIGINT but NOT
# DuckDB HUGEINT (arrow decimal128) — the class of bug the driver's value-hash
# sees and a Python-native compare (hugeint -> int) silently hides.
def _canon_arrow_type(t) -> str:
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int64" if t.bit_width <= 64 else f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return "float64"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_arrow_type(t.value_type)}>"
    return str(t)


def arrow_type_mismatches(sdf, duck_rel) -> list[str]:
    """Compare Spark result types vs DuckDB arrow result types per column.

    Returns list of 'col: spark_type vs duck_type' strings for mismatches
    that would break the driver's Arrow value hash (e.g. HUGEINT/DECIMAL)."""
    _spark_to_arrow = {
        "long": "int64", "int": "int64", "integer": "int64", "bigint": "int64",
        "smallint": "int64", "tinyint": "int64",
        "double": "float64", "float": "float64",
        "string": "string", "binary": "binary", "boolean": "bool",
        "timestamp": "timestamp", "timestamp_ntz": "timestamp", "date": "date32[day]",
    }
    duck_schema = duck_rel.fetch_arrow_table().schema
    duck_types = {f.name: _canon_arrow_type(f.type) for f in duck_schema}
    out = []
    for f in sdf.schema.fields:
        s = f.dataType.simpleString()
        sc = _spark_to_arrow.get(s, s)
        dc = duck_types.get(f.name)
        if dc is not None and sc != dc:
            out.append(f"{f.name}: spark {s}->{sc} vs duck {dc}")
    return out


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
            type_mismatches = arrow_type_mismatches(sdf, con.sql(oracles[name]))
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            failures += 1
            continue
        if type_mismatches:
            print(f"FAIL  {name}: arrow type mismatch {type_mismatches}")
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
