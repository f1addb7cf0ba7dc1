"""Portable deterministic hashing (Spark ↔ DuckDB).

md5 is the only hash primitive both engines share, so every
hash-driven operator (minhash, simhash, fingerprints, LSH buckets)
derives its integers from md5 hex: take 15 hex chars (60 bits, fits
int64) and parse. Spark's xxhash64/hash and DuckDB's hash() are NOT
interchangeable — never use them in an oracle-checked path.

These stay JVM-side in Spark (md5/conv/substring are codegen'd
built-ins) — portable hashing costs no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative int64 (JVM-side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_expr(sql_expr: str) -> str:
    """Spark-SQL-expression-string form (for use inside F.expr lambdas)."""
    return f"cast(conv(substring(md5({sql_expr}), 1, 15), 16, 10) as bigint)"


def md5_long_sql(expr: str) -> str:
    """DuckDB mirror of :func:`md5_long`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"
