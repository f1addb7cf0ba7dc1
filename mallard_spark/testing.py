"""Oracle-comparison harness: Spark result vs DuckDB on the same parquet.

Mirrors the driver's t2 gate: row count, schema (column names), and
an order-insensitive value comparison. Floats are compared EXACTLY —
the query library is designed so Spark and DuckDB produce
bit-identical doubles (exact decimal aggregation, deterministic
per-row IEEE math, unique tiebreakers); a mismatch here means a
query must be redesigned, not the tolerance loosened.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from mallard_spark.sources.readers import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values; unify dtypes."""
    out = pdf.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("bool")
        elif s.dtype == object:
            out[c] = s.astype(str)
    out = out[sorted(out.columns)]
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class used for the driver-parity strictness check."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    # The driver's value hash is dtype-sensitive (a DuckDB HUGEINT sum
    # materializes as float64 while Spark's bigint sum is int64, and the
    # hashes diverge even when every value is numerically equal) — so
    # enforce matching dtype KINDS before any coercion. int32 vs int64
    # is allowed (same kind); int vs float is not.
    for c in spark_pdf.columns:
        ks = _dtype_kind(spark_pdf[c])
        kd = _dtype_kind(duck_pdf[c])
        assert ks == kd, (
            f"{name}: col {c!r} dtype kind mismatch: spark={spark_pdf[c].dtype}"
            f" ({ks}) vs oracle={duck_pdf[c].dtype} ({kd}) — align casts on"
            f" both sides (e.g. CAST(SUM(..) AS BIGINT) in the oracle)"
        )
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating):
            ok = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not ok.all():
                idx = int(np.argmin(ok))
                diff = np.nanmax(np.abs(av - bv))
                raise AssertionError(
                    f"{name}: float col {c!r} differs, e.g. row {idx}: "
                    f"{av[idx]!r} vs {bv[idx]!r} (max abs diff {diff:.3e})"
                )
        else:
            ok = av == bv
            if not ok.all():
                idx = int(np.argmin(ok.astype(bool)))
                raise AssertionError(
                    f"{name}: col {c!r} differs, e.g. row {idx}: {av[idx]!r} vs {bv[idx]!r}"
                )


def run_compare(spark, sf_dir: str, spark_df, oracle: str, name: str = "") -> None:
    con = duck_connection(sf_dir)
    duck_pdf = con.execute(oracle).df()
    compare_frames(spark_df.toPandas(), duck_pdf, name=name)
