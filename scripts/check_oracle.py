"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()``
on DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values (NaN-safe, value-normalized).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    # DRIVER-STRICT: the driver hashes raw values (no float rounding) and its
    # pandas sort errors on list cells — mirror both so local PASS == driver
    # PASS (round-1 lesson: a looser local gate hid 7 driver failures).
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        raise TypeError(
            "list cell in result — the driver's canonicalizer cannot hash it; "
            "project arrays to md5(concat_ws(',', arr)) scalars on both sides"
        )
    if isinstance(v, __import__("decimal").Decimal):
        raise TypeError(
            "Decimal cell (DuckDB HUGEINT?) — hashes differently from Spark's "
            "BIGINT at the driver; CAST(sum(...) AS BIGINT) in the oracle SQL"
        )
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def _duck_type_class(t: str) -> str:
    t = t.upper()
    if t == "HUGEINT" or t.startswith("DECIMAL"):
        return "DRIVER-FLOAT64"  # fetchdf() materializes these as float64
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "ts"
    return "other"


def _spark_type_class(t: str) -> str:
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t in ("float", "double"):
        return "float"
    if t.startswith("decimal"):
        return "DRIVER-FLOAT64"
    if t.startswith("timestamp") or t == "date":
        return "ts"
    return "other"


def dtype_check(con, sql, sdf) -> list[str]:
    """Schema-level dtype parity the value compare can't see.

    The driver hashes pandas frames (Spark ``toPandas`` vs DuckDB
    ``fetchdf``), so a DuckDB HUGEINT/DECIMAL column reaches it as float64
    and hash-mismatches Spark's int64 even when every value is equal —
    ``fetchall()`` collapses HUGEINT to Python int and hid exactly this in
    rounds 1 AND 2 (groupBy sums, then window sums). Compare declared types
    on both sides so local PASS truly equals driver PASS, without
    re-executing either query.
    """
    problems = []
    try:
        dtypes = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    except Exception as exc:  # DESCRIBE should accept anything EXPLAIN does
        return [f"DESCRIBE failed: {str(exc)[:120]}"]
    stypes = dict(sdf.dtypes)
    for col, dt in dtypes.items():
        dc = _duck_type_class(dt)
        sc = _spark_type_class(stypes.get(col, "other"))
        if dc == "DRIVER-FLOAT64":
            problems.append(
                f"{col}: DuckDB {dt} -> float64 at the driver vs Spark "
                f"{stypes.get(col)}; CAST(... AS BIGINT/DOUBLE) in the oracle"
            )
        elif {dc, sc} == {"int", "float"}:
            problems.append(
                f"{col}: int/float mismatch (DuckDB {dt} vs Spark {stypes.get(col)})"
            )
    return problems


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from transmog_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

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
        except Exception as exc:
            failures.append(name)
            print(f"{name}: SPARK ERROR {exc}")
            continue
        if name not in oracles:
            print(f"{name}: rows={len(srows)} (no oracle — rows-only)")
            if len(srows) == 0:
                print(f"  WARNING: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"{name}: DUCKDB ERROR {str(exc)[:300]}")
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        dtype_problems = dtype_check(con, oracles[name], sdf) if ok_cols else []
        ok_vals = False
        if ok_cols and ok_count:
            try:
                ok_vals = canon(srows, scols) == canon(drows, dcols)
            except TypeError as exc:
                print(f"{name}: DRIVER-INCOMPATIBLE CELL — {exc}")
        status = "OK" if (ok_cols and ok_count and ok_vals and not dtype_problems) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{name}: {status} rows={len(srows)}/{len(drows)} cols_match={ok_cols} vals_match={ok_vals}"
        )
        for p in dtype_problems:
            print(f"  DTYPE: {p}")
        if not ok_cols:
            print(f"  spark cols: {sorted(scols)}\n  duck  cols: {sorted(dcols)}")
        elif not ok_vals and ok_count:
            try:
                a, b = canon(srows, scols), canon(drows, dcols)
            except TypeError:
                continue
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diffs:
                print(f"  spark: {x}\n  duck : {y}")
    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
