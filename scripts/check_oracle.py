"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive multiset of values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from gtfsrt2lc_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# Spark simpleString -> acceptable Arrow type names from DuckDB. The driver's
# value hash is type-sensitive (round-1 lesson: DuckDB HUGEINT sums vs Spark
# BIGINT hashed differently despite equal values), so we flag dtype skew too.
_SPARK_TO_ARROW = {
    "bigint": {"int64"},
    "int": {"int32", "int64"},
    "smallint": {"int16"},
    "tinyint": {"int8"},
    "double": {"double", "float64"},
    "float": {"float", "float32"},
    "string": {"string", "large_string"},
    "boolean": {"bool"},
    "date": {"date32", "date32[day]"},
}


def _type_skew(sdf, arrow_schema):
    """Return [(col, spark_type, duck_arrow_type)] for scalar-type mismatches."""
    duck = {f.name: str(f.type) for f in arrow_schema}
    out = []
    for f in sdf.schema.fields:
        st = f.dataType.simpleString()
        at = duck.get(f.name)
        if at is None or st not in _SPARK_TO_ARROW:
            continue  # missing col caught by COLS DIFF; complex types skipped
        if at not in _SPARK_TO_ARROW[st]:
            out.append((f.name, st, at))
    return out


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if v is None:
        return "NULL"
    return str(v)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[SPARK ERROR] {name}: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only ] {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            dcols = list(tbl.schema.names)
            drows = [tuple(r.values()) for r in tbl.to_pylist()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[DUCK ERROR ] {name}: {e}")
            continue
        skew = _type_skew(sdf, tbl.schema)
        if skew:
            failures.append(name)
            print(f"[TYPE SKEW  ] {name}: {skew}")
            continue
        sc, sn = _normalize(scols, srows)
        dc, dn = _normalize(dcols, drows)
        if sc != dc:
            failures.append(name)
            print(f"[COLS DIFF  ] {name}: spark={sc} duck={dc}")
            continue
        if len(sn) != len(dn):
            failures.append(name)
            print(f"[COUNT DIFF ] {name}: spark={len(sn)} duck={len(dn)}")
            _show_diff(sn, dn)
            continue
        if sn != dn:
            failures.append(name)
            print(f"[VALUE DIFF ] {name} ({len(sn)} rows)")
            _show_diff(sn, dn)
            continue
        print(f"[OK         ] {name}: {len(sn)} rows")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


def _show_diff(sn, dn):
    sset, dset = set(sn), set(dn)
    for x in list(sset - dset)[:3]:
        print(f"    spark-only: {x}")
    for x in list(dset - sset)[:3]:
        print(f"    duck-only : {x}")


if __name__ == "__main__":
    raise SystemExit(main())
