"""Sinks: parquet/csv/json writers with the layouts that matter at scale.

At 100 TB the write-time layout decides query cost:
- ``write_partitioned``: directory partitioning → partition pruning
  for any filter on the partition column.
- ``write_bucketed``: hash-bucketing on the join key → later joins
  and aggregations on that key are shuffle-free (Spark reads bucket
  metadata from the table catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (bucket pruning + shuffle-free joins)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table_name)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (built-in columnar alternative; same pushdown story)."""
    df.write.mode(mode).orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
