"""Deterministic cross-engine hashing.

The driver's correctness gate compares Spark output against DuckDB running
``oracle_sql()`` on the same parquet — so every hash used in dedup /
fingerprint / MinHash operators must be computable *identically* in both
engines. md5 is the common denominator:

    Spark : conv(substr(md5(x), 1, 15), 16, 10)::long
    DuckDB: CAST('0x' || substr(md5(x), 1, 15) AS UBIGINT)

15 hex digits = 60 bits — fits int64 in both engines, no sign issues.
(Verified equal in this sandbox: 'hello' -> 419982666956583591 in both.)

For production-scale keys where no cross-engine parity is needed, prefer
``F.xxhash64`` (cheaper, codegen'd, no hex round-trip).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MD5_LONG_BITS = 60


def md5_long(col: Column) -> Column:
    """60-bit deterministic hash of a string column (DuckDB-parity)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def duck_md5_long(expr: str) -> str:
    """DuckDB SQL fragment computing the same 60-bit hash of ``expr``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS UBIGINT)::BIGINT"


def seeded(col: Column, seed: int | str) -> Column:
    """Seed-namespaced hash input: 'seed#value'."""
    return F.concat(F.lit(f"{seed}#"), col)


def duck_seeded(expr: str, seed: int | str) -> str:
    return f"('{seed}#' || {expr})"
