"""Deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent, and Spark's parallel partial
aggregation visits rows in a nondeterministic order — two runs (or
Spark vs. another engine) can disagree in the last ulps. Every
headline metric therefore aggregates exactly: cast the operand to a
fixed-scale DECIMAL (exact, associative, codegen'd JVM-side — this is
NOT a slow path), SUM without error, and cast the final scalar back
to DOUBLE for a stable output schema. The same recipe is mirrored in
the DuckDB oracle SQL, so both engines produce the bit-identical
double.

Scale choice: DECIMAL(25,6) holds ±10^19 with 6 decimals — enough
for any TPC-H-style money/quantity sum at SF 10^5 while keeping
products (scale 12) under Spark's 38-digit decimal cap.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def _dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str) -> Column:
    """Exact (decimal) sum, returned as double."""
    return F.sum(_dec(col)).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic average: exact decimal sum / exact count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_dec(c)).cast("double") / F.count(c)


def dsum_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum` for oracle strings."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr})"
