"""Vector (embedding) column expressions.

Dot products / norms / cosine as JVM-side higher-order-function
folds over ``array<double>`` — no Python, no UDF. For oracle parity
the arrays are cast float→double first (exact), so Spark's fold and
DuckDB's list_cosine_similarity agree to ~1e-15; similarity outputs
are rounded to 6 dp, which both engines land on identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine6(a: Column, b: Column) -> Column:
    """Cosine rounded to 6 dp — the oracle-stable form."""
    return F.round(cosine(a, b), 6)


def cosine6_norms(a: Column, b: Column, na2: Column, nb2: Column) -> Column:
    """:func:`cosine6` with precomputed self-dots ``na2``/``nb2``
    (= the exact value of ``dot(a, a)`` / ``dot(b, b)``). Produces
    bit-identical results to cosine6 when the inputs really are those
    fold values — the expression tree below is the same
    ``dot / (sqrt * sqrt)`` with the two self-dot subtrees replaced
    by the columns. Used by the LSH family, where the signature pass
    computes the self-dot once per VECTOR so the per-candidate-PAIR
    projection pays one interpreted HOF fold instead of three."""
    return F.round(dot(a, b) / (F.sqrt(na2) * F.sqrt(nb2)), 6)
